package graft.extract

import graft.html.Dom

/** Font/text attribute extraction — the engine analogue of the reference's
  * textual-attribute classifier (reference: server/modules/main/
  * textualAttribute.py:295-335, which runs a CNN per word crop and emits
  * `{bold, italic}` attributes, and server/modules/iitb/textattrib/
  * models.py:46-50, whose FontRegion additionally carries fontSize,
  * fontColor and fontDecoration). Here the markup itself carries the
  * ground truth: per block, the non-whitespace character counts under
  * bold/italic/underline/strike/colored contexts, a font size derived
  * from the heading level, and the majority `<font color>` value.
  *
  * Counting is per DOM text node over NON-WHITESPACE characters only, so
  * the counts are independent of how inline markup splits text nodes
  * (`a <b>x</b> c` counts 3 regardless of node boundaries).
  */
object TextAttributes {
  final case class BlockAttrs(idx: Int, tag: String, chars: Int,
                              boldChars: Int, italicChars: Int,
                              underlineChars: Int, strikeChars: Int,
                              coloredChars: Int, fontColor: String,
                              fontSize: Int) {
    /** Majority-styled block → attribute true (the reference flags whole
      * words; blocks aggregate by character majority). Decoration string
      * mirrors FontRegion.fontDecoration; fontColor is the block's
      * most-frequent explicit color (document order on ties). */
    def attributes: Map[String, String] = Map(
      "bold" -> (2 * boldChars > chars).toString,
      "italic" -> (2 * italicChars > chars).toString,
      "fontSize" -> fontSize.toString,
      "fontColor" -> fontColor,
      "fontDecoration" ->
        (if (2 * underlineChars > chars) "underline"
         else if (2 * strikeChars > chars) "line-through"
         else ""))
  }

  private val boldTags = Set("b", "strong")
  private val italicTags = Set("i", "em")
  private val underlineTags = Set("u", "ins")
  private val strikeTags = Set("s", "strike", "del")
  private val skip = Set("script", "style", "noscript", "head", "title", "svg")
  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dt", "dd",
    "td", "th", "pre", "blockquote", "figcaption", "caption", "article",
    "section", "main", "header", "footer", "nav", "aside", "ul", "ol",
    "table", "thead", "tbody", "tfoot", "tr", "figure", "form", "fieldset",
    "body", "html", "#root", "address", "details", "summary")

  /** Heading level → pixel font size (default body text = 0 = unstyled). */
  def fontSizeOf(tag: String): Int = tag match {
    case "h1" => 32
    case "h2" => 28
    case "h3" => 24
    case "h4" => 20
    case "h5" => 18
    case "h6" => 16
    case _    => 0
  }

  /** One row per block containing non-whitespace text, document order
    * (aligned with [[Extractor.blocksOf]] block boundaries). */
  def blockAttrs(dom: Dom): Vector[BlockAttrs] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BlockAttrs]
    var chars = 0
    var bold = 0
    var italic = 0
    var under = 0
    var strike = 0
    var colored = 0
    var curTag = "#root"
    // insertion-ordered per-color char counts within the current block
    var colorCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]

    def flush(): Unit = {
      if (chars > 0) {
        val majority =
          if (colorCounts.isEmpty) ""
          else colorCounts.maxBy(_._2)._1 // LinkedHashMap: first max wins
        out += BlockAttrs(out.length, curTag, chars, bold, italic, under,
          strike, colored, majority, fontSizeOf(curTag))
      }
      chars = 0; bold = 0; italic = 0; under = 0; strike = 0; colored = 0
      colorCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    }

    def walk(node: Int, inB: Boolean, inI: Boolean, inU: Boolean,
             inS: Boolean, color: String): Unit = {
      if (dom.isText(node)) {
        val t = dom.text(node)
        var n = 0
        var k = 0
        while (k < t.length) { if (!Character.isWhitespace(t.charAt(k))) n += 1; k += 1 }
        chars += n
        if (inB) bold += n
        if (inI) italic += n
        if (inU) under += n
        if (inS) strike += n
        if (color.nonEmpty && n > 0) {
          colored += n
          colorCounts.updateWith(color) { c => Some(c.getOrElse(0) + n) }
        }
      } else {
        val tag = dom.tag(node)
        if (!skip.contains(tag)) {
          if (blockTags.contains(tag) && node != dom.root) {
            flush()
            val saved = curTag
            curTag = tag
            dom.foreachChild(node)(walk(_, inB, inI, inU, inS, color))
            flush()
            curTag = saved
          } else {
            val b = inB || boldTags.contains(tag)
            val i = inI || italicTags.contains(tag)
            val u = inU || underlineTags.contains(tag)
            val s = inS || strikeTags.contains(tag)
            val c =
              if (tag == "font") dom.attr(node, "color").getOrElse(color)
              else color
            dom.foreachChild(node)(walk(_, b, i, u, s, c))
          }
        }
      }
    }
    walk(dom.root, inB = false, inI = false, inU = false, inS = false, color = "")
    flush()
    out.toVector
  }
}

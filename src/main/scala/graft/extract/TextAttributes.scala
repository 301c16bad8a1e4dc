package graft.extract

import graft.html.Dom

/** Font/text attribute extraction — the engine analogue of the reference's
  * textual-attribute classifier (reference: server/modules/main/
  * textualAttribute.py:295-335, which runs a CNN per word crop and emits
  * `{bold, italic}` attributes). Here the markup itself carries the ground
  * truth: per content block, the fraction of characters under
  * <b>/<strong>/<i>/<em> determines the flags, folded into the
  * `attributes` map like the reference's `Region.attributes`.
  */
object TextAttributes {
  final case class BlockAttrs(idx: Int, tag: String, chars: Int,
                              boldChars: Int, italicChars: Int) {
    /** Majority-styled block → attribute true (the reference flags whole
      * words; blocks aggregate by character majority). */
    def attributes: Map[String, String] = Map(
      "bold" -> (2 * boldChars > chars).toString,
      "italic" -> (2 * italicChars > chars).toString)
  }

  private val boldTags = Set("b", "strong")
  private val italicTags = Set("i", "em")
  private val skip = Set("script", "style", "noscript", "head", "title", "svg")
  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dt", "dd",
    "td", "th", "pre", "blockquote", "figcaption", "caption", "article",
    "section", "main", "header", "footer", "nav", "aside", "ul", "ol",
    "table", "thead", "tbody", "tfoot", "tr", "figure", "form", "fieldset",
    "body", "html", "#root", "address", "details", "summary")

  /** One row per non-empty block, document order (aligned with
    * [[Extractor.blocksOf]] block boundaries). */
  def blockAttrs(dom: Dom): Vector[BlockAttrs] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BlockAttrs]
    var chars = 0
    var bold = 0
    var italic = 0
    var curTag = "#root"

    def flush(): Unit = {
      if (chars > 0) out += BlockAttrs(out.length, curTag, chars, bold, italic)
      chars = 0; bold = 0; italic = 0
    }

    def walk(node: Int, inBold: Boolean, inItalic: Boolean): Unit = {
      if (dom.isText(node)) {
        val n = Extractor.normalize(dom.text(node)).length
        chars += n
        if (inBold) bold += n
        if (inItalic) italic += n
      } else {
        val tag = dom.tag(node)
        if (!skip.contains(tag)) {
          if (blockTags.contains(tag) && node != dom.root) {
            flush()
            val saved = curTag
            curTag = tag
            dom.foreachChild(node)(walk(_, inBold, inItalic))
            flush()
            curTag = saved
          } else {
            val b = inBold || boldTags.contains(tag)
            val i = inItalic || italicTags.contains(tag)
            dom.foreachChild(node)(walk(_, b, i))
          }
        }
      }
    }
    walk(dom.root, inBold = false, inItalic = false)
    flush()
    out.toVector
  }
}

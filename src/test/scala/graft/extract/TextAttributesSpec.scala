package graft.extract

import graft.html.Dom
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the font/text-attribute operator (the FontRegion
  * analogue): non-whitespace counting independent of text-node splits,
  * style contexts, heading font sizes, and majority fontColor. */
class TextAttributesSpec extends AnyFunSuite {

  private def attrs(html: String) =
    TextAttributes.blockAttrs(Dom.parse(html.getBytes("UTF-8")))

  test("non-whitespace counts are node-split independent") {
    val a = attrs("<p>a <b>x</b> c</p>")
    assert(a.length == 1)
    assert(a.head.chars == 3)
    assert(a.head.boldChars == 1)
  }

  test("style contexts: bold/italic/underline/strike nest and sum") {
    val a = attrs("<p><b>ab <i>cd</i></b> <u>ef</u> <s>gh</s> ij</p>").head
    assert(a.chars == 10)
    assert(a.boldChars == 4)      // ab + cd (nested in b)
    assert(a.italicChars == 2)    // cd
    assert(a.underlineChars == 2) // ef
    assert(a.strikeChars == 2)    // gh
    assert(a.attributes("bold") == "false")
  }

  test("heading blocks carry the level's font size") {
    val a = attrs("<h1>one</h1><h3>three</h3><p>body</p>")
    assert(a.map(_.fontSize) == Vector(32, 24, 0))
    assert(a.head.attributes("fontSize") == "32")
  }

  test("majority fontColor wins; first color wins ties; empty without font tags") {
    val a = attrs(
      """<p><font color="#111111">abcd</font> x <font color="#222222">ef</font></p>""").head
    assert(a.coloredChars == 6)
    assert(a.fontColor == "#111111")
    val tie = attrs(
      """<p><font color="#a">xx</font><font color="#b">yy</font></p>""").head
    assert(tie.fontColor == "#a", "document-order tie-break")
    assert(attrs("<p>plain</p>").head.fontColor == "")
  }

  test("script/style/title text is never counted") {
    val a = attrs("<head><title>t</title><style>p{}</style></head><p>ok</p>")
    assert(a.map(_.chars).sum == 2)
  }

  test("block majority flags in the attributes map") {
    val a = attrs("<p><b>bold bold bold</b> x</p>").head
    assert(a.attributes("bold") == "true")
    val d = attrs("<p><u>under under</u> x</p>").head
    assert(d.attributes("fontDecoration") == "underline")
  }
}

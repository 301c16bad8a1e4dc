package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Link-extraction semantics on hand-checkable pages, plus a regex
  * cross-check against generated pages (the same invariant the x14/x15
  * DuckDB oracle relies on). */
class OutlinksSpec extends AnyFunSuite {

  private def links(html: String): Vector[Outlink] =
    Outlinks.extract(html.getBytes("UTF-8"))

  test("extracts href + anchor text in document order") {
    val out = links(
      """<html><body><p>intro <a href="/a/1">first link</a> middle</p>
        |<div><a href="/b/2">second</a></div></body></html>""".stripMargin)
    assert(out == Vector(
      Outlink(0, "/a/1", "first link"),
      Outlink(1, "/b/2", "second")))
  }

  test("anchors without href are skipped and do not advance pos") {
    val out = links("""<a name="top">target</a><a href="/x">real</a>""")
    assert(out == Vector(Outlink(0, "/x", "real")))
  }

  test("anchor text concatenates nested text nodes, entity-decoded") {
    val out = links("""<a href="/x"><b>bold</b> &amp; plain</a>""")
    assert(out == Vector(Outlink(0, "/x", "bold & plain")))
  }

  test("resolve: absolute passes through, root-relative joins origin, bare relative joins directory") {
    val base = "https://site3.example.org/articles/42"
    assert(Outlinks.resolve(base, "https://other.org/p") == "https://other.org/p")
    assert(Outlinks.resolve(base, "/x/9") == "https://site3.example.org/x/9")
    assert(Outlinks.resolve(base, "next.html") ==
      "https://site3.example.org/articles/next.html")
    // a base with no path keeps the host as the directory
    assert(Outlinks.resolve("https://h.org", "p") == "https://h.org/p")
  }

  test("DOM walk agrees with the flat-anchor regex on generated pages (oracle invariant)") {
    val re = """<a href="([^"]*)">([^<]*)</a>""".r
    (0L until 40L).foreach { idx =>
      val page = graft.pages.PageGen.pageFull(seed = 7L, idx)
      val html = new String(page.row.html, "UTF-8")
      val expected = re.findAllMatchIn(html).zipWithIndex
        .map { case (m, i) => Outlink(i, m.group(1), m.group(2)) }.toVector
      assert(Outlinks.extract(page.row.html) == expected, s"page $idx")
    }
  }
}

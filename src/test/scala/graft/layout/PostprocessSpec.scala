package graft.layout

import graft.TestData
import graft.geom.{BBox, Geometry}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** A8 4-edge dilate vs goldens produced by executing the reference's own
  * `process_region` (post_helper.py:10-35) on crafted ink grids — covers
  * single-step expansion, ink-crossing multi-step expansion, and the
  * numpy negative-index quirks at page edges. Plus the word-level layout
  * filter and Hi-SAM line grouping operators. */
class PostprocessSpec extends AnyFunSuite {

  test("dilate4 matches reference process_region on all golden grids") {
    val cases = TestData.readResource("/golden/dilate_cases.json")
    for (c <- cases.elements.asScala) {
      val grid = new Projection.DenseInkGrid(c.get("gridW").asInt, c.get("gridH").asInt)
      for (b <- c.get("ink").elements.asScala)
        grid.fill(BBox(b.get(0).asInt, b.get(1).asInt, b.get(2).asInt, b.get(3).asInt))
      val p = c.get("probe")
      val probe = BBox.fromXyxy(p.get(0).asInt, p.get(1).asInt, p.get(2).asInt, p.get(3).asInt)
      val got = Projection.dilate4(probe, grid)
      val e = c.get("expected")
      assert((got.x, got.y, got.x2, got.y2) ==
        (e.get(0).asInt, e.get(1).asInt, e.get(2).asInt, e.get(3).asInt),
        s"probe ${(probe.x, probe.y, probe.x2, probe.y2)}")
    }
  }

  test("BoxInkGrid answers the same probes as the dense grid") {
    val boxes = Vector(BBox(10, 10, 8, 6), BBox(18, 10, 8, 6), BBox(10, 16, 4, 10))
    val dense = new Projection.DenseInkGrid(60, 40)
    boxes.foreach(dense.fill)
    val sparse = new Projection.BoxInkGrid(60, 40, boxes)
    for (x <- -1 until 60; y1 <- Seq(-1, 0, 5, 12, 39); y2 <- Seq(0, 11, 17, 40))
      assert(dense.colHasInk(x, y1, y2) == sparse.colHasInk(x, y1, y2), s"col $x $y1 $y2")
    for (y <- -1 until 40; x1 <- Seq(-1, 0, 9, 20, 59); x2 <- Seq(0, 11, 26, 60))
      assert(dense.rowHasInk(y, x1, x2) == sparse.rowHasInk(y, x1, x2), s"row $y $x1 $x2")
  }

  test("dilate4 + padClamp compose like the reference postprocess chain") {
    val boxes = Vector(BBox(40, 40, 100, 20), BBox(40, 70, 200, 40))
    val grid = new Projection.BoxInkGrid(960, 200, boxes)
    for (b <- boxes) {
      val d = Projection.dilate4(b, grid)
      assert(d.x == b.x - 1 && d.y == b.y - 1 && d.x2 == b.x2 && d.y2 == b.y2,
        "isolated stacked boxes expand exactly 1 left/top")
      val p = Geometry.padClamp(d, 5, 960, 200)
      assert(p.x == b.x - 6 && p.y == b.y - 6 && p.x2 == b.x2 + 5)
    }
  }

  test("word-level layout filter drops >=50%-contained words, ignores advertisement") {
    val words = Vector(
      Word(0, BBox(10, 10, 10, 10)),   // fully inside the figure zone
      Word(1, BBox(100, 100, 10, 10)), // outside all zones
      Word(2, BBox(23, 10, 10, 10)))   // 20% inside -> kept
    val zones = Map(
      "figure" -> Seq((5.0, 5.0, 25.0, 25.0)),
      "advertisement" -> Seq((95.0, 95.0, 115.0, 115.0))) // not a word-level class
    val kept = Filters.filterWordsLayout(words, zones)
    assert(kept.map(_.id) == Vector(1, 2))
  }

  test("hisam line grouping: affinity threshold unions transitively, group order stable") {
    def line(y: Int, x: Int = 0, w: Int = 100, h: Int = 10) =
      Hisam.Line(Vector(BBox(x, y, w, h)))
    // three adjacent lines + one far line + one horizontally-disjoint line
    val lines = Vector(line(0), line(12), line(24), line(200), line(12, x = 500))
    val paras = Hisam.lineGroups(lines, layoutThresh = 0.5)
    assert(paras.map(_.lineIds) == Vector(Vector(0, 1, 2), Vector(3), Vector(4)))
    // threshold above any achievable affinity -> singleton groups
    val singletons = Hisam.lineGroups(lines, layoutThresh = 1.1)
    assert(singletons.map(_.lineIds) == lines.indices.map(i => Vector(i)))
  }
}

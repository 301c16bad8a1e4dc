package graft.extract

import graft.pages.PageGen

object ProfileMedian {
  def main(args: Array[String]): Unit = {
    val rows = PageGen.pages(42L, 0, 500).toVector.sortBy(_.html.length)
    val median = rows(250)
    // warm
    for (_ <- 1 to 200) Extractor.extract(median.url, median.html)
    def t(tag: String, reps: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e3 / reps}%.0f us/op")
    }
    println(s"median page: ${median.html.length} bytes")
    val dom = graft.html.Dom.parse(median.html)
    val blocks = Extractor.blocksOf(dom)
    println(s"  blocks=${blocks.length} content=${blocks.count(Extractor.isContent)}")
    t("parse", 500)(graft.html.Dom.parse(median.html))
    t("blocksOf", 500)(Extractor.blocksOf(dom))
    t("full extract", 200)(Extractor.extract(median.url, median.html))
    // layout branch alone
    import graft.layout._
    import graft.geom.BBox
    val content = blocks.filter(Extractor.isContent)
    var cursor = 40
    val words = content.zipWithIndex.map { case (b, i) =>
      val lines = Extractor.lineCount(b.chars)
      val w = Word(i, BBox(40, cursor, math.max(math.min(b.chars * 8, 880), 8), lines * 20))
      cursor += lines * 20 + 10
      w
    }
    t("layout pipeline", 200)(ReadingOrderPipeline.run(words, 960, cursor + 40))
    val boxes = words.map(_.bbox)
    t("  neighbors", 500)(Neighbors.findClosestNeighbors(boxes))
    val (h, v) = Neighbors.findClosestNeighbors(boxes)
    t("  kde x2", 500) {
      graft.geom.Kde.kdeEstimateD(h, true)
      graft.geom.Kde.kdeEstimateD(v, false)
    }
  }
}

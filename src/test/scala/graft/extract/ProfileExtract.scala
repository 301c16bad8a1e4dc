package graft.extract

import graft.pages.PageGen

object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val rows = PageGen.pages(42L, 0, 2000).toVector
    // warmup
    rows.take(50).foreach(r => Extractor.extract(r.url, r.html))
    val t0 = System.nanoTime()
    var chars = 0L
    for (r <- rows.take(300)) chars += Extractor.extract(r.url, r.html).text.length
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"first 300 pages in $sec%.2f s = ${300 / sec}%.0f docs/sec single-thread; $chars chars")

    // stage timing on the biggest page
    val big = rows.maxBy(_.html.length)
    println(s"biggest page: ${big.html.length} bytes")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e6}%.1f ms"); a
    }
    val dom = t("parse")(graft.html.Dom.parse(big.html))
    val blocks = t("blocks")(Extractor.blocksOf(dom))
    println(s"  blocks: ${blocks.length} (content ${blocks.count(Extractor.isContent)})")
    t("full extract")(Extractor.extract(big.url, big.html))
    // second-biggest etc distribution
    val sizes = rows.map(_.html.length).sorted
    println(s"html sizes p50=${sizes(1000)} p90=${sizes(1800)} p99=${sizes(1980)} max=${sizes.last}")
    // stage-time the pathological page
    val bad = rows.sortBy(-_.html.length).apply(2);
    {
      import graft.layout._
      import graft.geom.{BBox, Kde}
      val ex0 = System.nanoTime()
      val dom2 = graft.html.Dom.parse(bad.html)
      val bl = Extractor.blocksOf(dom2).filter(Extractor.isContent)
      println(f"  bad page: ${bl.length} content blocks, prep ${(System.nanoTime()-ex0)/1e6}%.0f ms")
      var cursor = 40
      val words = bl.zipWithIndex.map { case (b, i) =>
        val lines = Extractor.lineCount(b.chars)
        val w = Word(i, BBox(40, cursor, math.max(math.min(b.chars*8, 880), 8), lines*20))
        cursor += lines*20 + 10
        w
      }
      def t2[A](tag: String)(f: => A): A = { val t0=System.nanoTime(); val a=f; println(f"  [$tag] ${(System.nanoTime()-t0)/1e6}%.0f ms"); a }
      val boxes = words.map(_.bbox)
      val (h, v) = t2("neighbors")(Neighbors.findClosestNeighbors(boxes))
      val x = t2("kdeH")(Kde.kdeEstimateD(h, true))
      val y = t2("kdeV")(Kde.kdeEstimateD(v, false))
      println(s"  thresholds x=$x y=$y")
      val (r, l, tp, bt) = t2("links")(Neighbors.fourDirectionLinks(boxes, x, y))
      val comps = t2("cc")(Neighbors.connectedComponents(boxes.length, Seq(r,l,tp,bt)))
      println(s"  components: ${comps.length}")
      val envs = t2("envelopes")(Paragraphs.envelopes(comps, words))
      val p1 = t2("pinp1")(Paragraphs.pinp(envs, 960, cursor+40, 0, 0, 0, 7))
      val p2 = t2("pinp2")(Paragraphs.pinp2(p1, 960, cursor+40, 0, 0, 0, 10))
      val p3 = t2("pinp3")(Paragraphs.pinp(p2, 960, cursor+40, 0, 0, 0, 7))
      println(s"  paras: ${p3.length}")
      val po = t2("paraOrder")(Paragraphs.paragraphOrder(p3))
      val fin = t2("finalOrder")(WordOrder.finalWordOrder(po.sortBy(_.order).map(_.members), words))
      println(s"  final regions: ${fin.length}")
    }
    // time the 5 biggest, two passes (JIT/GC check)
    for (pass <- 1 to 2; r <- rows.sortBy(-_.html.length).take(5)) {
      val t1 = System.nanoTime()
      val e = Extractor.extract(r.url, r.html)
      println(f"  ${r.html.length}%8d bytes -> ${(System.nanoTime()-t1)/1e6}%8.1f ms, ${e.spans.length} blocks")
    }
  }
}

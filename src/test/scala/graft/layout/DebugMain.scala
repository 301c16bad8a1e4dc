package graft.layout

import graft.TestData
import graft.TestData.payload

/** Throwaway stage-by-stage divergence finder (Test/runMain). */
object DebugMain {
  def firstDiff(got: Seq[Region], want: Seq[Region], tag: String): Unit = {
    val g = payload(got)
    val w = payload(want)
    println(s"== $tag: got ${g.length} want ${w.length}")
    val i = g.zip(w).indexWhere { case (a, b) => a != b }
    if (g.length == w.length && i < 0) println("   MATCH")
    else {
      val at = if (i < 0) math.min(g.length, w.length) else i
      println(s"   first diff at $at:")
      for (k <- math.max(0, at - 2) to math.min(math.min(g.length, w.length) - 1, at + 3))
        println(s"    [$k] got=${g(k)} want=${w(k)}")
      // is it a permutation?
      println(s"   multiset equal: ${g.sortBy(_.toString) == w.sortBy(_.toString)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val ajoy = TestData.fixture("ajoy")
    val openseg = TestData.fixture("openseg")
    val craft = TestData.fixture("craft")

    firstDiff(Merge.mergePipelineTwo(ajoy, openseg),
      TestData.golden("merge2_ajoy_openseg"), "merge2 full")
    // stage-wise for the 3-set pipeline
    val m2 = Merge.mergeTwo(ajoy, openseg)
    println(s"mergeTwo size=${m2.length}")
    val i3 = Merge.integrateThird(m2, craft)
    println(s"integrateThird size=${i3.length}")
    val ao = Merge.assignOrdersBasedOnNeighbors(i3)
    val rs = Merge.removeSmallerOverlappingRegions(ao)
    println(s"afterRemove size=${rs.length}")
    firstDiff(Merge.resolveDuplicateOrders(rs),
      TestData.golden("merge3_ajoy_openseg_craft"), "merge3 full")
    firstDiff(MergeV3.mergePipelineThreeV3(ajoy, openseg, craft),
      TestData.golden("merge3v3_ajoy_openseg_craft"), "merge3v3 full")
  }
}

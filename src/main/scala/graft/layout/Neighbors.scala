package graft.layout

import graft.geom.{BBox, Pt}

/** F4/J4/J5: edge-midpoint projections, kNN distance sampling and the
  * 4-direction nearest-neighbour join
  * (reference: server/modules/main/routils/neighbor_utils.py).
  *
  * NOTE on naming: the reference's `Right_Box` of box i minimises
  * dist(leftMid_i, rightMid_j) — i.e. it actually links to the box on the
  * LEFT — and symmetrically for the others
  * (neighbor_utils.py:219-291). The names are kept verbatim so the walks
  * (word_order) behave identically.
  */
object Neighbors {

  /** J5: per box, mean of the 3 smallest horizontal / vertical
    * edge-to-edge distances to any other box — the KDE threshold sample
    * (reference: neighbor_utils.py:101-138 `find_closest_neighbors`).
    * Fewer than 3 neighbours still divide by 3, like the reference's
    * `sum(d[:3])/3`. */
  def findClosestNeighbors(boxes: IndexedSeq[BBox]): (Array[Double], Array[Double]) = {
    val n = boxes.length
    val horizontal = new Array[Double](n)
    val vertical = new Array[Double](n)
    var i = 0
    while (i < n) {
      val hs = new java.util.ArrayList[Double](2 * n)
      val vs = new java.util.ArrayList[Double](2 * n)
      val bi = boxes(i)
      var j = 0
      while (j < n) {
        if (i != j) {
          val bj = boxes(j)
          hs.add(bi.leftMid.dist(bj.rightMid))
          hs.add(bi.rightMid.dist(bj.leftMid))
          vs.add(bi.bottomMid.dist(bj.topMid))
          vs.add(bi.topMid.dist(bj.bottomMid))
        }
        j += 1
      }
      horizontal(i) = meanOfSmallest3(hs)
      vertical(i) = meanOfSmallest3(vs)
      i += 1
    }
    (horizontal, vertical)
  }

  private def meanOfSmallest3(l: java.util.ArrayList[Double]): Double = {
    val arr = new Array[Double](l.size)
    var k = 0
    while (k < arr.length) { arr(k) = l.get(k); k += 1 }
    java.util.Arrays.sort(arr)
    var s = 0.0
    var t = 0
    while (t < 3 && t < arr.length) { s += arr(t); t += 1 }
    s / 3.0
  }

  /** J4: the four k=1 NN links. Threshold inclusivity matches the
    * reference exactly: Right uses d ≤ x (neighbor_utils.py:227), the
    * other three use d < threshold (…:246,264,282); Right/Left also
    * require the edge-midpoint Δy < 20. argmin = first minimum. */
  def fourDirectionLinks(boxes: IndexedSeq[BBox], x: Double, y: Double)
      : (Array[NLink], Array[NLink], Array[NLink], Array[NLink]) = {
    val n = boxes.length
    val right = new Array[NLink](n)
    val left = new Array[NLink](n)
    val top = new Array[NLink](n)
    val bottom = new Array[NLink](n)
    var i = 0
    while (i < n) {
      val bi = boxes(i)
      var bestR, bestL, bestT, bestB = Double.MaxValue
      var idR, idL, idT, idB = -1
      var j = 0
      while (j < n) {
        if (i != j) {
          val bj = boxes(j)
          val dR = bi.leftMid.dist(bj.rightMid)
          if (dR <= x && math.abs(bi.rightMid.y - bj.leftMid.y) < 20 && dR < bestR) {
            bestR = dR; idR = j
          }
          val dL = bi.rightMid.dist(bj.leftMid)
          if (dL < x && math.abs(bi.leftMid.y - bj.rightMid.y) < 20 && dL < bestL) {
            bestL = dL; idL = j
          }
          val dT = bi.bottomMid.dist(bj.topMid)
          if (dT < y && dT < bestT) { bestT = dT; idT = j }
          val dB = bi.topMid.dist(bj.bottomMid)
          if (dB < y && dB < bestB) { bestB = dB; idB = j }
        }
        j += 1
      }
      right(i) = if (idR >= 0) NLink(bestR, idR) else NLink.none
      left(i) = if (idL >= 0) NLink(bestL, idL) else NLink.none
      top(i) = if (idT >= 0) NLink(bestT, idT) else NLink.none
      bottom(i) = if (idB >= 0) NLink(bestB, idB) else NLink.none
      i += 1
    }
    (right, left, top, bottom)
  }

  /** Connected components of the undirected 4-direction NN graph —
    * paragraphs (reference: routils/generate_graph_utils.py:4-28 +
    * paragraph.py:15-22). Components ordered by smallest member id,
    * members ascending. */
  def connectedComponents(n: Int, links: Seq[Array[NLink]]): Vector[Vector[Int]] = {
    val uf = new graft.geom.UnionFind(n)
    for (dir <- links; i <- 0 until n) {
      val l = dir(i)
      if (!l.isNone) uf.union(i, l.id)
    }
    uf.toGroups
  }
}

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
    // primitive midpoint arrays — no per-pair allocation in the O(n²) scan
    val lx = new Array[Double](n); val ly = new Array[Double](n)
    val rx = new Array[Double](n); val ry = new Array[Double](n)
    val tx = new Array[Double](n); val ty = new Array[Double](n)
    val bx = new Array[Double](n); val by = new Array[Double](n)
    var k = 0
    while (k < n) {
      val b = boxes(k)
      lx(k) = b.leftMid.x; ly(k) = b.leftMid.y
      rx(k) = b.rightMid.x; ry(k) = b.rightMid.y
      tx(k) = b.topMid.x; ty(k) = b.topMid.y
      bx(k) = b.bottomMid.x; by(k) = b.bottomMid.y
      k += 1
    }
    val sel = new Smallest3
    var i = 0
    while (i < n) {
      sel.resetH(); sel.resetV()
      // squared distances in the O(n^2) scan; sqrt deferred to the 3 kept
      // (sqrt(dx^2+dy^2) matches scipy's euclidean exactly)
      var j = 0
      while (j < n) {
        if (i != j) {
          var dx = lx(i) - rx(j); var dy = ly(i) - ry(j)
          sel.offerH(dx * dx + dy * dy)
          dx = rx(i) - lx(j); dy = ry(i) - ly(j)
          sel.offerH(dx * dx + dy * dy)
          dx = bx(i) - tx(j); dy = by(i) - ty(j)
          sel.offerV(dx * dx + dy * dy)
          dx = tx(i) - bx(j); dy = ty(i) - by(j)
          sel.offerV(dx * dx + dy * dy)
        }
        j += 1
      }
      horizontal(i) = sel.sumSqrtH / 3.0
      vertical(i) = sel.sumSqrtV / 3.0
      i += 1
    }
    (horizontal, vertical)
  }

  /** Streaming 3-smallest selector (sum of up to 3 smallest / 3, like the
    * reference's `sum(sorted[:3])/3`). */
  private final class Smallest3 {
    private var h0, h1, h2 = Double.MaxValue
    private var v0, v1, v2 = Double.MaxValue
    private var hc, vc = 0
    def resetH(): Unit = { h0 = Double.MaxValue; h1 = Double.MaxValue; h2 = Double.MaxValue; hc = 0 }
    def resetV(): Unit = { v0 = Double.MaxValue; v1 = Double.MaxValue; v2 = Double.MaxValue; vc = 0 }
    def offerH(d: Double): Unit = {
      hc += 1
      if (d < h2) { if (d < h1) { h2 = h1; if (d < h0) { h1 = h0; h0 = d } else h1 = d } else h2 = d }
    }
    def offerV(d: Double): Unit = {
      vc += 1
      if (d < v2) { if (d < v1) { v2 = v1; if (d < v0) { v1 = v0; v0 = d } else v1 = d } else v2 = d }
    }
    def sumSqrtH: Double = {
      var s = 0.0
      if (hc > 0 && h0 != Double.MaxValue) s += math.sqrt(h0)
      if (hc > 1 && h1 != Double.MaxValue) s += math.sqrt(h1)
      if (hc > 2 && h2 != Double.MaxValue) s += math.sqrt(h2)
      s
    }
    def sumSqrtV: Double = {
      var s = 0.0
      if (vc > 0 && v0 != Double.MaxValue) s += math.sqrt(v0)
      if (vc > 1 && v1 != Double.MaxValue) s += math.sqrt(v1)
      if (vc > 2 && v2 != Double.MaxValue) s += math.sqrt(v2)
      s
    }
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
    val lx = new Array[Double](n); val ly = new Array[Double](n)
    val rx = new Array[Double](n); val ry = new Array[Double](n)
    val tx = new Array[Double](n); val ty = new Array[Double](n)
    val bx = new Array[Double](n); val by = new Array[Double](n)
    var k = 0
    while (k < n) {
      val b = boxes(k)
      lx(k) = b.leftMid.x; ly(k) = b.leftMid.y
      rx(k) = b.rightMid.x; ry(k) = b.rightMid.y
      tx(k) = b.topMid.x; ty(k) = b.topMid.y
      bx(k) = b.bottomMid.x; by(k) = b.bottomMid.y
      k += 1
    }
    // squared-threshold comparisons (d <= x  <=>  d^2 <= x^2 for d,x >= 0)
    val x2t = x * x
    val y2t = y * y
    var i = 0
    while (i < n) {
      var bestR, bestL, bestT, bestB = Double.MaxValue
      var idR, idL, idT, idB = -1
      var j = 0
      while (j < n) {
        if (i != j) {
          var dx = lx(i) - rx(j); var dy = ly(i) - ry(j)
          val dR = dx * dx + dy * dy
          if (dR <= x2t && math.abs(ry(i) - ly(j)) < 20 && dR < bestR) {
            bestR = dR; idR = j
          }
          dx = rx(i) - lx(j); dy = ry(i) - ly(j)
          val dL = dx * dx + dy * dy
          if (dL < x2t && math.abs(ly(i) - ry(j)) < 20 && dL < bestL) {
            bestL = dL; idL = j
          }
          dx = bx(i) - tx(j); dy = by(i) - ty(j)
          val dT = dx * dx + dy * dy
          if (dT < y2t && dT < bestT) { bestT = dT; idT = j }
          dx = tx(i) - bx(j); dy = ty(i) - by(j)
          val dB = dx * dx + dy * dy
          if (dB < y2t && dB < bestB) { bestB = dB; idB = j }
        }
        j += 1
      }
      right(i) = if (idR >= 0) NLink(math.sqrt(bestR), idR) else NLink.none
      left(i) = if (idL >= 0) NLink(math.sqrt(bestL), idL) else NLink.none
      top(i) = if (idT >= 0) NLink(math.sqrt(bestT), idT) else NLink.none
      bottom(i) = if (idB >= 0) NLink(math.sqrt(bestB), idB) else NLink.none
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

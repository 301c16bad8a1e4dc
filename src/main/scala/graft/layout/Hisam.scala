package graft.layout

import graft.geom.{BBox, UnionFind}

/** Hi-SAM line→paragraph grouping: lines (each a set of word boxes) are
  * unioned into paragraphs wherever a pairwise affinity clears a
  * threshold, via a disjoint set
  * (reference: routils/hisam.py:170-181, which thresholds the model's
  * line-affinity matrix with `affinity > layout_thresh` and unions with
  * routils/utils/utilities.py:5-38 `DisjointSet`; groups emitted in
  * first-member order with members ascending, like `to_group`).
  *
  * The reference's affinity comes from the Hi-SAM model head (out of
  * scope); the engine supplies [[geometricAffinity]] — a deterministic
  * envelope heuristic — and accepts any affinity function so a model-fed
  * matrix plugs in unchanged.
  */
object Hisam {

  final case class Line(words: Vector[BBox]) {
    val envelope: BBox = {
      require(words.nonEmpty, "a line has at least one word box")
      var x1, y1 = Int.MaxValue
      var x2, y2 = Int.MinValue
      for (w <- words) {
        if (w.x < x1) x1 = w.x
        if (w.y < y1) y1 = w.y
        if (w.x2 > x2) x2 = w.x2
        if (w.y2 > y2) y2 = w.y2
      }
      BBox.fromXyxy(x1, y1, x2, y2)
    }
  }

  final case class Paragraph(lineIds: Vector[Int], lines: Vector[Line])

  /** Deterministic affinity in [0,1]: horizontal-overlap fraction of the
    * narrower line, damped by the vertical gap in units of the shorter
    * line's height (adjacent overlapping lines → ~1; distant or
    * non-overlapping lines → 0). */
  def geometricAffinity(a: Line, b: Line): Double = {
    val ea = a.envelope
    val eb = b.envelope
    val xOverlap = math.min(ea.x2, eb.x2) - math.max(ea.x, eb.x)
    if (xOverlap <= 0) return 0.0
    val xFrac = xOverlap.toDouble / math.min(ea.w, eb.w).toDouble
    val gap = math.max(0, math.max(eb.y - ea.y2, ea.y - eb.y2))
    val unit = math.max(1, math.min(ea.h, eb.h))
    val damp = 1.0 / (1.0 + gap.toDouble / unit.toDouble)
    xFrac * damp
  }

  /** Threshold + union — the `affinity > layout_thresh` grouping.
    * Pairs are scanned in (i1, i2) row-major order like `np.where`. */
  def lineGroups(lines: IndexedSeq[Line], layoutThresh: Double,
                 affinity: (Line, Line) => Double = geometricAffinity): Vector[Paragraph] = {
    val n = lines.length
    val uf = new UnionFind(n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j && affinity(lines(i), lines(j)) > layoutThresh) uf.union(i, j)
        j += 1
      }
      i += 1
    }
    uf.toGroups.map(g => Paragraph(g, g.map(lines(_))))
  }
}

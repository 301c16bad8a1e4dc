package graft.layout

import graft.geom.BBox

/** F1/F2/F3/F9: the detector-side filters and projections
  * (reference: server/modules/main/processors/{openseg,doctr,v03xx,v04xx}.py).
  */
object Filters {

  /** F1: drop word boxes with conf ≤ 0
    * (reference: processors/openseg.py:39-41). */
  def confidenceFilter(rs: Seq[Region]): Vector[Region] =
    rs.iterator.filter(_.confidence > 0).toVector

  /** F2: drop boxes with h < 10 or w < 3
    * (reference: processors/openseg.py:46-47). */
  def sizeFilter(rs: Seq[Region]): Vector[Region] =
    rs.iterator.filterNot(r => r.bbox.h < 10 || r.bbox.w < 3).toVector

  /** F3: normalised ((x1,y1),(x2,y2)) × page dims → integer xywh with
    * optional symmetric padding (reference: processors/doctr.py:16-36,
    * routils/doctr_utils.py:7-28 — round-then-pad, like the reference's
    * int(round(v * dim))). */
  def geometryProjection(norm: (Double, Double, Double, Double),
                         pageW: Int, pageH: Int, padding: Int = 0): BBox = {
    val x1 = math.rint(norm._1 * pageW).toInt - padding
    val y1 = math.rint(norm._2 * pageH).toInt - padding
    val x2 = math.rint(norm._3 * pageW).toInt + padding
    val y2 = math.rint(norm._4 * pageH).toInt + padding
    BBox.fromXyxy(x1, y1, x2, y2)
  }

  /** F6-word: the word-level layout filter — drop word boxes ≥50%-inside
    * any figure/table/caption/formula zone. Unlike the component-level
    * variant, 'advertisement' is NOT in the word-level class set
    * (reference: routils/layout_filtering.py:132-158
    * `filter_words_layout`; containment test pinp_utils.py:45-57). */
  def filterWordsLayout(words: Seq[Word],
                        zones: Map[String, Seq[(Double, Double, Double, Double)]]): Vector[Word] = {
    val classes = Set("figure", "table", "caption", "formula")
    words.iterator.filterNot { w =>
      val b = w.bbox
      val tlbr = (b.x.toDouble, b.y.toDouble, b.x2.toDouble, b.y2.toDouble)
      zones.exists { case (key, values) =>
        classes.contains(key) &&
          values.exists(z => graft.geom.Geometry.isBoxInside(z, tlbr, 50.0))
      }
    }.toVector
  }

  /** F9: detection cap — top `maxDet` by confidence (descending, index
    * ascending on ties), emitted in original order, mirroring YOLO's
    * max_det (reference: processors/v03xx.py:26 = 300 lines,
    * v04xx.py:22 = 4000 words). */
  def capDetections(rs: IndexedSeq[Region], maxDet: Int): Vector[Region] = {
    if (rs.length <= maxDet) return rs.toVector
    val keep = rs.indices
      .sortBy(i => (-rs(i).confidence, i))
      .take(maxDet)
      .toSet
    rs.indices.iterator.filter(keep.contains).map(rs(_)).toVector
  }
}

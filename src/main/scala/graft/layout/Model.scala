package graft.layout

import graft.geom.BBox

/** A detected layout region: bbox + reading order + line + class label.
  *
  * Mirrors the reference's `Region` pydantic model
  * (reference: server/modules/main/models.py:88-142) plus the ad-hoc
  * `text` key the merge code attaches
  * (reference: server/modules/main/helper.py:276-281).
  */
final case class Region(
    bbox: BBox,
    order: Int = -1,
    label: String = "",
    line: Int = 0,
    confidence: Double = 0.0,
    text: String = "",
    attributes: Map[String, String] = Map.empty)

/** A candidate word/line box before ordering: id = dense per-page index. */
final case class Word(id: Int, bbox: BBox)

/** Nearest-neighbour link: (distance, neighbour id); (-1, 0) = none
  * (reference: routils/neighbor_utils.py:219-291). */
final case class NLink(dist: Double, id: Int) {
  def isNone: Boolean = dist == -1.0
}
object NLink { val none: NLink = NLink(-1.0, 0) }

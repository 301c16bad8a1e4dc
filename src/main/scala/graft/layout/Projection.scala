package graft.layout

import scala.collection.mutable.ArrayBuffer
import graft.geom.BBox

/** S7: the reference's one fully-deterministic detector — projection-profile
  * line segmentation (reference: server/modules/main/processors/
  * v1urdu.py:18-101). Our engine's analogue runs the same 1-D zero-run
  * scan over a text-density profile (ink per row) instead of binarized
  * pixels.
  */
object Projection {

  /** Peak/valley index pairs of a horizontal projection profile: for each
    * run of non-zero density, emit (start-1, end) where end is the first
    * zero after the run (reference: v1urdu.py:18-46 `find_peaks_valley`,
    * including its skip of the final element). */
  def findPeaksValley(hpp: IndexedSeq[Long]): Vector[Int] = {
    val lineIndex = ArrayBuffer.empty[Int]
    var i = 0
    var prevI = -1
    var break = false
    while (i < hpp.length - 1 && !break) {
      var index1 = i
      var index2 = 0
      var flag1 = 0
      var flag2 = 0
      var j = i
      while (j < hpp.length - 1 && flag1 == 0) {
        if (hpp(j) != 0) { index1 = j - 1; lineIndex += index1; flag1 = 1 }
        j += 1
      }
      j = index1 + 1
      while (j < hpp.length - 1 && flag2 == 0) {
        if (hpp(j) == 0 && flag1 == 1) { index2 = j; lineIndex += index2; flag2 = 1 }
        j += 1
      }
      if (flag1 == 1 && flag2 == 1) i = index2
      if (flag1 == 0 && flag2 == 0) break = true
      if (!break) {
        if (i == prevI) break = true
        prevI = i
      }
    }
    lineIndex.toVector
  }

  /** A8: pixel-run dilate — expand a box's top/bottom edges outward
    * while the profile still has ink there, the text-domain analogue of
    * the reference's binarized edge-strip probe
    * (reference: server/modules/main/post_helper.py:10-55). */
  def dilate(box: graft.geom.BBox, hpp: IndexedSeq[Long]): graft.geom.BBox = {
    var y1 = box.y
    while (y1 > 0 && hpp(y1 - 1) > 0) y1 -= 1
    var y2 = box.y2
    while (y2 < hpp.length && hpp(math.min(y2, hpp.length - 1)) > 0 && y2 < hpp.length) y2 += 1
    graft.geom.BBox(box.x, y1, box.w, y2 - y1)
  }

  /** Full-width line boxes from the profile; lines shorter than 10 units
    * are dropped, `line` is 1-based (reference: v1urdu.py:77-96). */
  def segmentLines(hpp: IndexedSeq[Long], width: Int): Vector[Region] = {
    val idx = findPeaksValley(hpp)
    val out = ArrayBuffer.empty[Region]
    var line = 1
    var i = 0
    while (i + 1 < idx.length) {
      val y1 = idx(i)
      val y2 = idx(i + 1)
      if (y2 - y1 > 10) {
        out += Region(bbox = BBox(0, y1, width, y2 - y1), line = line)
        line += 1
      }
      i += 2
    }
    out.toVector
  }
}

package graft.layout

import scala.collection.mutable.ArrayBuffer
import graft.geom.BBox

/** The "new version" 3-set ensemble merge (V-05.03), ported from
  * reference: server/modules/main/processors/merge_codes/
  * merge_ajoy_openseg_craft_v3.py. Differs from [[Merge]] by: first-match
  * break + ≥0.4 y-overlap requirement in the pairwise merge (…_v3.py:454,489),
  * band-split integrate of the third set (…_v3.py:339-421), x-overlap-aware
  * neighbour-vote order assignment (…_v3.py:55-102), and ≥0.4
  * y-overlap-fraction line grouping in duplicate resolution
  * (…_v3.py:178-249).
  */
object MergeV3 {
  import Merge.{hasSufficientYOverlap, xOverlap, yOverlap}

  /** Greedy x-overlap clustering of candidates, keeping per cluster the one
    * with max y-overlap against `region` — pops from the END of the
    * candidate list, removals are by value
    * (reference: …_v3.py:34-43 `select_best_neighbor`). */
  def selectBestNeighbor(region: Region, candidates0: Seq[Region]): Vector[Region] = {
    val candidates = ArrayBuffer.from(candidates0)
    val selected = ArrayBuffer.empty[Region]
    while (candidates.nonEmpty) {
      val candidate = candidates.remove(candidates.length - 1)
      val overlappingRest = candidates.filter(r => xOverlap(r.bbox, candidate.bbox)).toVector
      for (r <- overlappingRest) {
        val at = candidates.indexOf(r)
        if (at >= 0) candidates.remove(at)
      }
      val group = candidate +: overlappingRest
      // Python max() keeps the FIRST of equal keys
      var best = group.head
      var bestOv = yOverlap(best.bbox, region.bbox)
      for (r <- group.tail) {
        val ov = yOverlap(r.bbox, region.bbox)
        if (ov > bestOv) { best = r; bestOv = ov }
      }
      selected += best
    }
    selected.toVector
  }

  /** v3 J7: order==0 regions inherit from the nearest non-x-overlapping
    * neighbour with ≥50% y-overlap, picking the closer of best-left /
    * best-right (reference: …_v3.py:55-102). */
  def assignOrdersV3(regions0: IndexedSeq[Region]): Vector[Region] = {
    val regions = ArrayBuffer.from(regions0)
    var i = 0
    while (i < regions.length) {
      val region = regions(i)
      if (region.order == 0) {
        val box1 = region.bbox
        val x1 = box1.x
        val l = regions.filter(r => r != region && hasSufficientYOverlap(r.bbox, box1, 0.5)).toVector
        val l1 = l.filter(r => r.bbox.x < x1 && r.order > 0)
        val l2 = l.filter(r => r.bbox.x > x1 && r.order > 0)
        val l1f = l1.filterNot(r => xOverlap(r.bbox, box1))
        val l2f = l2.filterNot(r => xOverlap(r.bbox, box1))
        val sel1 = selectBestNeighbor(region, l1f)
          .sortBy(r => math.abs(r.bbox.x + r.bbox.w - x1))
        val sel2 = selectBestNeighbor(region, l2f)
          .sortBy(r => math.abs(r.bbox.x - (x1 + box1.w)))
        val chosen: Option[Region] =
          if (sel1.nonEmpty && sel2.nonEmpty) {
            val distLeft = math.abs(sel1.head.bbox.x + sel1.head.bbox.w - x1)
            val distRight = math.abs(sel2.head.bbox.x - (x1 + box1.w))
            Some(if (distLeft < distRight) sel1.head else sel2.head)
          } else if (sel1.nonEmpty) Some(sel1.head)
          else if (sel2.nonEmpty) Some(sel2.head)
          else None
        chosen.foreach { n => regions(i) = region.copy(order = n.order, line = n.line) }
      }
      i += 1
    }
    regions.toVector
  }

  /** v3 W6: duplicate orders grouped into "lines" by ≥0.4 y-overlap
    * fraction vs the group seed; lines sorted by min member y, members by x
    * (reference: …_v3.py:178-249). */
  def resolveDuplicateOrdersV3(regions0: IndexedSeq[Region]): Vector[Region] = {
    def yOverlapFraction(b1: BBox, b2: BBox): Double = {
      val ov = yOverlap(b1, b2)
      val minH = math.min(b1.h, b2.h)
      if (minH > 0) ov.toDouble / minH else 0.0
    }
    val regions = regions0.sortBy(_.order)(Ordering.Int)
    val out = ArrayBuffer.empty[Region]
    var i = 0
    var currentOrder = 0
    while (i < regions.length) {
      val baseOrder = regions(i).order
      val group = ArrayBuffer(regions(i))
      i += 1
      while (i < regions.length && regions(i).order == baseOrder) {
        group += regions(i); i += 1
      }
      if (group.length == 1) {
        out += group(0).copy(order = currentOrder); currentOrder += 1
      } else {
        val used = scala.collection.mutable.Set.empty[Int]
        val lines = ArrayBuffer.empty[ArrayBuffer[Region]]
        var idx = 0
        while (idx < group.length) {
          if (!used.contains(idx)) {
            val line = ArrayBuffer(group(idx))
            used += idx
            var jdx = idx + 1
            while (jdx < group.length) {
              if (!used.contains(jdx) &&
                  yOverlapFraction(group(idx).bbox, group(jdx).bbox) >= 0.4) {
                line += group(jdx); used += jdx
              }
              jdx += 1
            }
            lines += line
          }
          idx += 1
        }
        val sortedLines = lines.sortBy(_.iterator.map(_.bbox.y).min)
        for (line <- sortedLines; r <- line.sortBy(_.bbox.x)(Ordering.Int)) {
          out += r.copy(order = currentOrder); currentOrder += 1
        }
      }
    }
    out.toVector
  }

  /** v3 U2: integrate the third set with band-splitting of wide boxes
    * (reference: …_v3.py:339-421, the second/overriding `integrate_3json`).
    */
  def integrateThirdV3(merged0: IndexedSeq[Region], regions3: IndexedSeq[Region]): Vector[Region] = {
    if (regions3.isEmpty) return merged0.toVector
    val merged = ArrayBuffer.from(merged0)
    val final3 = ArrayBuffer.empty[Region]
    for (r3 <- regions3) {
      val box3 = r3.bbox
      if (box3.w <= 60) {
        val overlapSimple = merged.exists(r =>
          xOverlap(box3, r.bbox) && yOverlap(box3, r.bbox) > 0)
        if (!overlapSimple) final3 += r3.copy(order = 0)
      } else {
        var hasOverlapForSplit = false
        var k = 0
        var break = false
        while (k < merged.length && !break) {
          val r2 = merged(k)
          val box2 = r2.bbox
          if (xOverlap(box3, box2) && yOverlap(box3, box2) > 0) {
            hasOverlapForSplit = true
            if (box3.w > 1.4 * box2.w) {
              val segments = Seq(
                (box3.x, box2.x - box3.x),
                (box2.x + box2.w, box3.x + box3.w - (box2.x + box2.w)))
              val minWFrac = 0.1 * box3.w
              for ((xStart, width) <- segments) {
                if (width >= 50 && width >= minWFrac) {
                  val newBox = BBox(xStart, box3.y, width, box3.h)
                  val overlapsAny = merged.exists(r =>
                    xOverlap(newBox, r.bbox) && yOverlap(newBox, r.bbox) > 0)
                  if (!overlapsAny)
                    final3 += r2.copy(bbox = newBox, order = 0)
                }
              }
            }
            break = true // stop at first overlapping union region (…_v3.py:410)
          }
          k += 1
        }
        if (!hasOverlapForSplit) final3 += r3.copy(order = 0)
      }
    }
    (merged ++ final3).sortBy(_.order)(Ordering.Int).toVector
  }

  /** Full V-05.03 chain (reference: …_v3.py:423-514 `merge_3_new`). */
  def mergePipelineThreeV3(r1: IndexedSeq[Region], r2: IndexedSeq[Region],
                           r3: IndexedSeq[Region]): Vector[Region] =
    resolveDuplicateOrdersV3(
      Merge.removeSmallerOverlappingRegions(
        assignOrdersV3(
          integrateThirdV3(
            Merge.mergeTwo(r1, r2, firstMatchOnly = true, requireYOverlap = true),
            r3))))
}

package graft.layout

import scala.collection.mutable.ArrayBuffer
import graft.geom.{BBox, Geometry}

/** Detector-ensemble merge + order repair, ported operator-by-operator from
  * the reference's 2-set merge (server/modules/main/helper.py:40-319) and
  * 3-set merge (server/modules/main/processors/merge_codes/
  * merge_ajoy_openseg_craft.py:190-309). Scan order, break semantics and
  * stable sorts are part of the contract — the algorithms are
  * order-dependent and goldens pin them.
  *
  * All functions are per-page (one region list); in the Spark job they run
  * inside the typed per-page transform.
  */
object Merge {

  /** J2/J3: full-outer spatial merge of two detectors' region sets with
    * aspect-based winner selection
    * (reference: helper.py:215-319 `merge_all_regions_with_stats`).
    * Returns the merged list sorted (stably) by order.
    */
  def mergeTwo(regions1: IndexedSeq[Region], regions2: IndexedSeq[Region],
               firstMatchOnly: Boolean = false,
               requireYOverlap: Boolean = false): Vector[Region] = {
    val merged = ArrayBuffer.empty[Region]
    val used2 = scala.collection.mutable.Set.empty[Int]
    val invalid2 = scala.collection.mutable.Set.empty[Int]

    for (reg1 <- regions1) {
      val box1 = reg1.bbox
      var found = false
      var idx2 = 0
      var break = false
      while (idx2 < regions2.length && !break) {
        val reg2 = regions2(idx2)
        val box2 = reg2.bbox
        val matches =
          Geometry.boxesOverlapAdjusted(box1, box2) &&
          (!requireYOverlap || hasSufficientYOverlap(box1, box2, 0.4))
        if (matches) {
          if (box2.w > 1.3 * box1.w) {
            // F8 large-width skip (helper.py:247-250)
            invalid2 += idx2
          } else {
            found = true
            val (w1, h1) = (box1.w.toDouble, box1.h.toDouble)
            val (w2, h2) = (box2.w.toDouble, box2.h.toDouble)
            // Condition A / Condition B winner rules (helper.py:258-270)
            val selectR1 =
              (w1 >= 0.95 * w2 && w1 <= 3.5 * w2 && 0.4 * h2 <= h1 && h1 <= 1.5 * h2) ||
              (h1 > h2 && h1 <= 1.4 * h2 && 0.7 * w2 <= w1 && w1 <= 1.3 * w2)
            val m =
              if (selectR1) reg1
              else reg1.copy(bbox = box2, text = reg2.text)
            merged += m
            used2 += idx2
            if (firstMatchOnly) break = true // v3 first-match (merge_..._v3.py:489)
          }
        }
        idx2 += 1
      }
      if (!found) merged += reg1 // left-anti leg (helper.py:289-291)
    }

    // set-2 orphans: order forced to 0 (helper.py:293-302)
    var idx2 = 0
    while (idx2 < regions2.length) {
      if (!used2.contains(idx2) && !invalid2.contains(idx2)) {
        val reg2 = regions2(idx2)
        merged += Region(bbox = reg2.bbox, order = 0, line = reg2.line, text = reg2.text)
      }
      idx2 += 1
    }
    merged.sortBy(_.order)(Ordering.Int).toVector // stable, like list.sort
  }

  /** ≥ threshold-fraction y-overlap vs smaller height
    * (reference: merge_ajoy_openseg_craft_v3.py:50-53). */
  def hasSufficientYOverlap(b1: BBox, b2: BBox, threshold: Double): Boolean = {
    val overlap = yOverlap(b1, b2)
    val minH = math.min(b1.h, b2.h)
    minH > 0 && overlap.toDouble / minH >= threshold
  }

  def yOverlap(b1: BBox, b2: BBox): Int =
    math.max(0, math.min(b1.y2, b2.y2) - math.max(b1.y, b2.y))

  def xOverlap(b1: BBox, b2: BBox): Boolean =
    !(b1.x2 <= b2.x || b2.x2 <= b1.x)

  /** J7: each order==0 region inherits order/line from a neighbour via the
    * 4-fallback cascade — left-same-band, right-same-band, band-above,
    * band-below (reference: helper.py:54-112). Sequential & in-place: later
    * regions see earlier assignments. Region comparisons are BY VALUE,
    * matching Python dict equality in the list comprehensions.
    */
  def assignOrdersBasedOnNeighbors(regions0: IndexedSeq[Region]): Vector[Region] = {
    val regions = ArrayBuffer.from(regions0)
    var i1 = 0
    while (i1 < regions.length) {
      val r1 = regions(i1)
      if (r1.order == 0) {
        val box1 = r1.bbox
        val y1Min = box1.y
        val y1Max = box1.y + box1.h
        val x1 = box1.x
        def bandIdx(lo: Int, hi: Int, self: Region): Seq[Int] =
          regions.indices.filter { k =>
            val r = regions(k)
            r != self && !(r.bbox.y + r.bbox.h < lo || r.bbox.y > hi)
          }
        val l = bandIdx(y1Min, y1Max, r1)
        val l1 = l.filter(k => regions(k).bbox.x < x1 && regions(k).order > 0)
        val l2 = l.filter(k => regions(k).bbox.x > x1 && regions(k).order > 0)
        if (l1.nonEmpty) {
          val r2 = regions(l1.maxBy(k => regions(k).bbox.x))
          regions(i1) = r1.copy(order = r2.order, line = r2.line)
        } else if (l2.nonEmpty) {
          val r3 = regions(l2.minBy(k => regions(k).bbox.x))
          regions(i1) = r1.copy(order = r3.order, line = r3.line)
        } else {
          val u = regions.indices.filter(k => regions(k).bbox.y < box1.y && regions(k).order > 0)
          if (u.nonEmpty) {
            val r4 = regions(u.maxBy(k => regions(k).bbox.y))
            val u1Valid = bandIdx(r4.bbox.y, r4.bbox.y + r4.bbox.h, r4)
              .filter(k => regions(k).order > 0)
            if (u1Valid.nonEmpty) {
              val r5 = regions(u1Valid.maxBy(k => regions(k).order))
              regions(i1) = r1.copy(order = r5.order, line = r5.line + 1)
            } else {
              regions(i1) = r1.copy(order = r4.order, line = r4.line + 1)
            }
          } else {
            val u3 = regions.indices.filter(k => regions(k).bbox.y > box1.y && regions(k).order > 0)
            if (u3.nonEmpty) {
              val r6 = regions(u3.minBy(k => regions(k).bbox.y))
              val u4Valid = bandIdx(r6.bbox.y, r6.bbox.y + r6.bbox.h, r6)
                .filter(k => regions(k).order > 0)
              if (u4Valid.nonEmpty) {
                val r7 = regions(u4Valid.minBy(k => regions(k).order))
                regions(i1) = r1.copy(order = r7.order, line = r7.line - 1)
              } else {
                regions(i1) = r1.copy(order = r6.order, line = r6.line - 1)
              }
            }
          }
        }
      }
      i1 += 1
    }
    regions.toVector
  }

  /** F7: pairwise smaller-overlap suppression — i<j scan; if
    * intersection/smaller_area > 0.5 drop the smaller; when i itself is
    * dropped, break out of j (reference: helper.py:170-213). */
  def removeSmallerOverlappingRegions(regions: IndexedSeq[Region]): Vector[Region] = {
    val keep = Array.fill(regions.length)(true)
    var i = 0
    while (i < regions.length) {
      if (keep(i)) {
        val box1 = regions(i).bbox
        val area1 = box1.area
        var j = i + 1
        var break = false
        while (j < regions.length && !break) {
          if (keep(j)) {
            val box2 = regions(j).bbox
            val area2 = box2.area
            val inter = Geometry.intersectionArea(box1, box2)
            if (inter != 0L) {
              val smallerIdx = if (area1 < area2) i else j
              val smallerArea = math.min(area1, area2)
              if (inter.toDouble / smallerArea > 0.5) {
                keep(smallerIdx) = false
                if (smallerIdx == i) break = true
              }
            }
          }
          j += 1
        }
      }
      i += 1
    }
    regions.iterator.zipWithIndex.collect { case (r, k) if keep(k) => r }.toVector
  }

  /** W6: duplicate-order resolution — stable sort by order; tie-groups split
    * into y-overlap subgroups (band of the FIRST member only), each sorted
    * by x, subgroups sorted by first member's y, consecutive re-rank from 0
    * (reference: helper.py:114-168). */
  def resolveDuplicateOrders(regions0: IndexedSeq[Region]): Vector[Region] = {
    val regions = regions0.sortBy(_.order)(Ordering.Int)
    val out = ArrayBuffer.empty[Region]
    var i = 0
    var currentOrder = 0
    while (i < regions.length) {
      val baseOrder = regions(i).order
      val group = ArrayBuffer(regions(i))
      i += 1
      while (i < regions.length && regions(i).order == baseOrder) {
        group += regions(i)
        i += 1
      }
      if (group.length == 1) {
        out += group(0).copy(order = currentOrder)
        currentOrder += 1
      } else {
        val used = scala.collection.mutable.Set.empty[Int]
        val subgroups = ArrayBuffer.empty[ArrayBuffer[Region]]
        var idx = 0
        while (idx < group.length) {
          if (!used.contains(idx)) {
            val r1 = group(idx)
            val y1 = r1.bbox.y
            val y2 = y1 + r1.bbox.h
            val subgroup = ArrayBuffer(r1)
            used += idx
            var jdx = idx + 1
            while (jdx < group.length) {
              if (!used.contains(jdx)) {
                val ry1 = group(jdx).bbox.y
                val ry2 = ry1 + group(jdx).bbox.h
                if (!(ry2 < y1 || ry1 > y2)) {
                  subgroup += group(jdx)
                  used += jdx
                }
              }
              jdx += 1
            }
            subgroups += subgroup.sortBy(_.bbox.x)(Ordering.Int)
          }
          idx += 1
        }
        val sortedSub = subgroups.sortBy(_.head.bbox.y)(Ordering.Int)
        for (sub <- sortedSub; r <- sub) {
          out += r.copy(order = currentOrder)
          currentOrder += 1
        }
      }
    }
    out.toVector
  }

  /** Full 2-detector ensemble pipeline: merge → neighbour-vote orders →
    * suppression → dense re-rank (reference: helper.py:310-312). */
  def mergePipelineTwo(r1: IndexedSeq[Region], r2: IndexedSeq[Region]): Vector[Region] =
    resolveDuplicateOrders(
      removeSmallerOverlappingRegions(
        assignOrdersBasedOnNeighbors(
          mergeTwo(r1, r2))))

  /** U2: third detector's boxes with no (adjusted) overlap against the
    * merged set are unioned in with order=0, then a stable order sort
    * (reference: merge_ajoy_openseg_craft.py:190-222 `integrate_3json`). */
  def integrateThird(merged: IndexedSeq[Region], regions3: IndexedSeq[Region]): Vector[Region] = {
    if (regions3.isEmpty) return merged.toVector
    val additions = regions3.iterator.filter { r3 =>
      !merged.exists(r => Geometry.boxesOverlapAdjusted(r3.bbox, r.bbox))
    }.map(_.copy(order = 0)).toVector
    (merged ++ additions).sortBy(_.order)(Ordering.Int).toVector
  }

  /** Full 3-detector ensemble (V-05.02): 2-way merge, integrate third,
    * then the repair chain (reference: merge_ajoy_openseg_craft.py:225-309
    * `merge_all_regions`). */
  def mergePipelineThree(r1: IndexedSeq[Region], r2: IndexedSeq[Region],
                         r3: IndexedSeq[Region]): Vector[Region] =
    resolveDuplicateOrders(
      removeSmallerOverlappingRegions(
        assignOrdersBasedOnNeighbors(
          integrateThird(
            mergeTwo(r1, r2), r3))))
}

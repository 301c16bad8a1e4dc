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
    * while the profile still has ink there, the 1-D text-domain analogue of
    * the reference's binarized edge-strip probe
    * (reference: server/modules/main/post_helper.py:10-55). */
  def dilate(box: graft.geom.BBox, hpp: IndexedSeq[Long]): graft.geom.BBox = {
    var y1 = box.y
    while (y1 > 0 && hpp(y1 - 1) > 0) y1 -= 1
    var y2 = box.y2
    while (y2 < hpp.length && hpp(math.min(y2, hpp.length - 1)) > 0 && y2 < hpp.length) y2 += 1
    graft.geom.BBox(box.x, y1, box.w, y2 - y1)
  }

  /** 2-D ink lookup for the 4-edge dilate. Implementations must honour
    * Python/numpy indexing semantics on the probes, which the reference
    * relies on at page borders: a single index in [-n, -1] wraps to n+idx;
    * an index below -n is an IndexError (the reference request would
    * crash — surfaced here as an exception the job's failure path eats);
    * a slice start in [-n, -1] wraps, and a wrapped-start slice whose
    * start lands beyond its end is empty (no ink). */
  trait InkGrid {
    def width: Int
    def height: Int
    /** ink anywhere in img[y1:y2, x] (x a single python index). */
    def colHasInk(x: Int, y1: Int, y2: Int): Boolean
    /** ink anywhere in img[y, x1:x2] (y a single python index). */
    def rowHasInk(y: Int, x1: Int, x2: Int): Boolean
  }

  /** Dense byte-grid implementation (tests / small pages). */
  final class DenseInkGrid(val width: Int, val height: Int,
                           ink: Array[Boolean]) extends InkGrid {
    def this(width: Int, height: Int) = this(width, height, new Array[Boolean](width * height))
    def set(x: Int, y: Int): Unit = ink(y * width + x) = true
    def fill(b: graft.geom.BBox): Unit = {
      var y = math.max(b.y, 0)
      val yEnd = math.min(b.y2, height)
      while (y < yEnd) {
        var x = math.max(b.x, 0)
        val xEnd = math.min(b.x2, width)
        while (x < xEnd) { set(x, y); x += 1 }
        y += 1
      }
    }
    private def pyIdx(i: Int, n: Int): Int = {
      val j = if (i < 0) i + n else i
      if (j < 0 || j >= n)
        throw new IllegalStateException(s"dilate probe off the grid: $i of $n")
      j
    }
    private def pySliceStart(i: Int, n: Int): Int =
      if (i < 0) math.max(i + n, 0) else math.min(i, n)
    def colHasInk(x: Int, y1: Int, y2: Int): Boolean = {
      val xx = pyIdx(x, width)
      var y = pySliceStart(y1, height)
      val end = pySliceStart(y2, height)
      while (y < end) { if (ink(y * width + xx)) return true; y += 1 }
      false
    }
    def rowHasInk(y: Int, x1: Int, x2: Int): Boolean = {
      val yy = pyIdx(y, height)
      var x = pySliceStart(x1, width)
      val end = pySliceStart(x2, width)
      while (x < end) { if (ink(yy * width + x)) return true; x += 1 }
      false
    }
  }

  /** Box-list implementation: probes answered from the block rectangles
    * directly — O(blocks) per probe, no dense raster, so a heavy-tailed
    * page never materialises a page-sized bitmap (the scale path). */
  final class BoxInkGrid(val width: Int, val height: Int,
                         boxes: IndexedSeq[graft.geom.BBox]) extends InkGrid {
    private def pyIdx(i: Int, n: Int): Int = {
      val j = if (i < 0) i + n else i
      if (j < 0 || j >= n)
        throw new IllegalStateException(s"dilate probe off the grid: $i of $n")
      j
    }
    private def pySliceStart(i: Int, n: Int): Int =
      if (i < 0) math.max(i + n, 0) else math.min(i, n)
    def colHasInk(x: Int, y1: Int, y2: Int): Boolean = {
      val xx = pyIdx(x, width)
      val a = pySliceStart(y1, height)
      val b = pySliceStart(y2, height)
      if (a >= b) return false
      boxes.exists(r => xx >= r.x && xx < r.x2 && a < r.y2 && b > r.y)
    }
    def rowHasInk(y: Int, x1: Int, x2: Int): Boolean = {
      val yy = pyIdx(y, height)
      val a = pySliceStart(x1, width)
      val b = pySliceStart(x2, width)
      if (a >= b) return false
      boxes.exists(r => yy >= r.y && yy < r.y2 && a < r.x2 && b > r.x)
    }
  }

  /** A8 full port: 4-edge dilate — expand left, top, right, bottom IN THAT
    * ORDER, each edge probing the CURRENT strip against the ink grid, edge
    * coordinate included in the probe (so an inked box always grows by at
    * least 1 per edge until a blank strip)
    * (reference: server/modules/main/post_helper.py:10-35 `process_region`;
    * the strip bounds use the coordinates as updated by the previous
    * edges, and the bottom/right probes use the EXCLUSIVE edge row/col). */
  def dilate4(box: graft.geom.BBox, grid: InkGrid): graft.geom.BBox = {
    var x1 = box.x
    var y1 = box.y
    var x2 = box.x2
    var y2 = box.y2
    while (grid.colHasInk(x1, y1, y2)) x1 -= 1
    while (grid.rowHasInk(y1, x1, x2)) y1 -= 1
    while (grid.colHasInk(x2, y1, y2)) x2 += 1
    while (grid.rowHasInk(y2, x1, x2)) y2 += 1
    graft.geom.BBox(x1, y1, x2 - x1, y2 - y1)
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

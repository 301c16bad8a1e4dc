package graft.layout

import scala.collection.mutable.ArrayBuffer
import graft.geom.BBox

/** W1/W2 + the live final ordering path, ported from
  * reference: server/modules/main/routils/{word_order_utils,
  * new_read_order}.py. All per-page and inherently sequential — small n.
  */
object WordOrder {

  /** Result of the W2 walk: per-box reading order (0-based, -1 =
    * unreached) and line number. */
  final case class Orders(order: Array[Int], line: Array[Int])

  /** W2: global word order via the NN-chain walk
    * (reference: word_order_utils.py:127-150 `word_order`).
    *
    * Seeds at the unvisited member with no Left_Box link minimising the
    * euclidean distance of (leftMid.x, topMid.y) from the page origin
    * (word_order_utils.py:48-79); follows the Right_Box chain
    * (…:5-9); falls back to the nearest unvisited right candidate with
    * Δy ≤ 15 (…:108-125); re-seeds (incrementing the line number) when the
    * chain dies. Line numbers are global across components, starting at 0.
    *
    * A cycle in the Right_Box chain would hang the reference; here a
    * bounded iteration count breaks out deterministically.
    */
  def wordOrder(components: Seq[Vector[Int]], boxes: IndexedSeq[BBox],
                rightBox: Array[NLink], leftBox: Array[NLink]): Orders = {
    val n = boxes.length
    val visited = Array.fill(n)(false)
    val order = Array.fill(n)(-1)
    val lineNumber = Array.fill(n)(-1)
    var ord = 0
    var line = 0

    def minimumDistance(members: Vector[Int]): Int = {
      var minEuclid = Double.PositiveInfinity
      var minY = Double.PositiveInfinity
      var closest = -1
      for (j <- members if !visited(j)) {
        val x = boxes(j).leftMid.x
        val y = boxes(j).topMid.y
        val euclid = math.hypot(x, y)
        if (euclid <= minEuclid && y < minY && leftBox(j).isNone) {
          minY = y; minEuclid = euclid; closest = j
        }
      }
      closest
    }

    def calculateNextRight(members: Vector[Int], minIdx: Int): Int = {
      var minX = Double.PositiveInfinity
      var closest = -1
      for (j <- members if !visited(j)) {
        val xd = math.abs(boxes(minIdx).rightMid.x - boxes(j).leftMid.x)
        val yd = math.abs(boxes(minIdx).rightMid.y - boxes(j).leftMid.y)
        if (xd < minX && yd <= 15) { minX = xd; closest = j }
      }
      closest
    }

    for (members <- components) {
      var minIdx = minimumDistance(members)
      val anyUnvisited = members.exists(j => !visited(j))
      var guard = 0
      val maxIter = 4 * n + 16
      while (anyUnvisited && minIdx != -1 && guard < maxIter) {
        if (!visited(minIdx)) {
          visited(minIdx) = true
          order(minIdx) = ord
          lineNumber(minIdx) = line
          ord += 1
        }
        val next = if (rightBox(minIdx).isNone) -1 else rightBox(minIdx).id
        if (next != -1) minIdx = next
        else {
          val nr = calculateNextRight(members, minIdx)
          if (nr != -1) minIdx = nr
          else { minIdx = minimumDistance(members); line += 1 }
        }
        guard += 1
      }
    }
    Orders(order, lineNumber)
  }

  /** W1: line grouping + within-line x sort over (x1,y1,x2,y2) boxes
    * already sorted by y — a new line starts when y1 ≥ current + 0.75·mean
    * height (reference: new_read_order.py:194-229 `sort_words`). */
  def sortWords(boxes: Seq[(Int, Int, Int, Int)]): Vector[Vector[(Int, Int, Int, Int)]] = {
    if (boxes.isEmpty) return Vector.empty
    val meanHeight = boxes.map(b => b._4 - b._2).sum.toDouble / boxes.length
    var currentLine = boxes.head._2.toDouble
    val lines = ArrayBuffer.empty[ArrayBuffer[(Int, Int, Int, Int)]]
    var tmp = ArrayBuffer.empty[(Int, Int, Int, Int)]
    for (box <- boxes) {
      if (box._2 >= currentLine + meanHeight * 0.75) {
        lines += tmp
        tmp = ArrayBuffer(box)
        currentLine = box._2.toDouble
      } else tmp += box
    }
    lines += tmp
    lines.map(_.sortBy(_._1).toVector).toVector
  }

  /** The live final ordering: per paragraph (in the given component
    * order), stable y-sort the member boxes, group into lines with
    * [[sortWords]], then emit 1-based (order, line-within-paragraph)
    * regions; duplicate coordinates resolved via first-match + visited
    * (reference: new_read_order.py:363-423 `get_final_word_order`,
    * box-id lookup …:6-15). */
  def finalWordOrder(components: Seq[Vector[Int]], words: IndexedSeq[Word]): Vector[Region] = {
    val visited = Array.fill(words.length)(false)
    val regions = ArrayBuffer.empty[Region]
    var order = 0
    // first-match semantics of the reference's linear scan
    // (new_read_order.py:6-15), precomputed as a first-wins hash index
    val coordIndex = new java.util.HashMap[(Int, Int, Int, Int), Int](words.length * 2)
    for (k <- words.indices) {
      val w = words(k).bbox
      coordIndex.putIfAbsent((w.x, w.y, w.x2, w.y2), k)
    }
    def boxIdFromCoordinates(b: (Int, Int, Int, Int)): Int =
      coordIndex.getOrDefault(b, -1)
    val byId = words.iterator.map(w => w.id -> w.bbox).toMap
    for (members <- components) {
      val coords = members.map { id =>
        val b = byId(id); (b.x, b.y, b.x2, b.y2)
      }
      val sortedY = coords.sortBy(_._2)(Ordering.Int)
      val lines = sortWords(sortedY)
      var cc = 0
      for (line <- lines) {
        cc += 1
        for (box <- line) {
          val boxId = boxIdFromCoordinates(box)
          if (boxId >= 0 && !visited(boxId)) {
            order += 1
            visited(boxId) = true
            regions += Region(
              bbox = BBox(box._1, box._2, box._3 - box._1, box._4 - box._2),
              order = order,
              line = cc)
          }
        }
      }
    }
    regions.toVector
  }
}

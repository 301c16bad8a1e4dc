package graft.geom

import scala.collection.mutable

/** Disjoint-set over dense Int ids with path compression.
  *
  * Local (per-page) connected components — the reference groups word boxes
  * into paragraphs via undirected NN-link components
  * (reference: server/modules/main/routils/utils/utilities.py:5-38,
  * routils/paragraph.py:15-22). Components never cross a page, so this is a
  * plain in-memory structure, not GraphX.
  */
final class UnionFind(n: Int) {
  private val parent = Array.tabulate(n)(identity)

  def find(i: Int): Int = {
    var root = i
    while (parent(root) != root) root = parent(root)
    var cur = i
    while (parent(cur) != root) { val next = parent(cur); parent(cur) = root; cur = next }
    root
  }

  def union(a: Int, b: Int): Unit = parent(find(a)) = find(b)

  /** Groups in first-seen order of their root, members ascending — matches
    * the reference's `to_group` (utilities.py:27-38) and, for the NN graph,
    * networkx's insertion-ordered `connected_components`. */
  def toGroups: Vector[Vector[Int]] = {
    val groups = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < parent.length) {
      groups.getOrElseUpdate(find(i), mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    groups.valuesIterator.map(_.toVector).toVector
  }
}

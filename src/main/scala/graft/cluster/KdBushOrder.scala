package graft.cluster

import graft.geo.Mercator

/** Order-exact re-derivation of the published kdbush v4 flat static 2-D
  * index (mourner/kdbush, ISC — the tree the reference engine builds per
  * zoom: arrow-cluster-engine.ts:418-425, nodeSize 64, Float32Array
  * coords), re-implemented from the published algorithm: Floyd-Rivest
  * select around the midpoint with alternating axes, leaves of <= nodeSize
  * entries scanned linearly, and `within()` walking mid → right half →
  * left half via an explicit LIFO stack.
  *
  * graft's default hierarchy queries never need this — membership comes
  * from parent pointers. It exists ONLY to reproduce the reference's
  * child-visit ORDER (`_getChildIndices`, arrow-cluster-engine.ts:270-302
  * — the order its DFS leaf pagination pages in), which
  * [[GreedyCore.buildLevels]] turns into per-record `child_rank` stamps
  * when [[ClusterOptions.insertionRanks]] is on. `tools/kdbush_order.mjs`
  * is the JS twin that generates the committed golden;
  * GoldenDifferentialSpec ties the two together page-for-page.
  *
  * Coordinates are f32-quantized on store ([[Mercator.fround]] — what a
  * Float32Array does); query points stay raw doubles, distances are
  * boundary-inclusive (<= r²). Both match the reference's
  * Float32Array-backed trees queried with raw data coords.
  */
private[cluster] final class KdBushOrder(
    xs: Array[Double], ys: Array[Double], n: Int, nodeSize: Int = 64) {

  private val ids = Array.tabulate(n)(identity)
  private val coords = new Array[Double](2 * n)

  locally {
    var i = 0
    while (i < n) {
      coords(2 * i) = Mercator.fround(xs(i))
      coords(2 * i + 1) = Mercator.fround(ys(i))
      i += 1
    }
    sort(0, n - 1, 0)
  }

  /** All ids within distance r of (qx, qy), in kd traversal order —
    * bit-compatible with kdbush v4 `within`.
    */
  def within(qx: Double, qy: Double, r: Double): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](16)
    val stack = new scala.collection.mutable.ArrayBuffer[Int](48)
    stack += 0 += (n - 1) += 0
    val r2 = r * r
    while (stack.nonEmpty) {
      val axis = stack.remove(stack.length - 1)
      val right = stack.remove(stack.length - 1)
      val left = stack.remove(stack.length - 1)

      if (right - left <= nodeSize) {
        var i = left
        while (i <= right) {
          if (sqDist(coords(2 * i), coords(2 * i + 1), qx, qy) <= r2) out += ids(i)
          i += 1
        }
      } else {
        val m = (left + right) >> 1
        val x = coords(2 * m)
        val y = coords(2 * m + 1)
        if (sqDist(x, y, qx, qy) <= r2) out += ids(m)

        if (if (axis == 0) qx - r <= x else qy - r <= y) {
          stack += left += (m - 1) += (1 - axis)
        }
        if (if (axis == 0) qx + r >= x else qy + r >= y) {
          stack += (m + 1) += right += (1 - axis)
        }
      }
    }
    out.toArray
  }

  private def sqDist(ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = ax - bx
    val dy = ay - by
    dx * dx + dy * dy
  }

  private def sort(left: Int, right: Int, axis: Int): Unit = {
    if (right - left <= nodeSize) return
    val m = (left + right) >> 1
    select(m, left, right, axis)
    sort(left, m - 1, 1 - axis)
    sort(m + 1, right, 1 - axis)
  }

  /** Floyd-Rivest selection: after it, coords(2*k+axis) is in its sorted
    * position with smaller values left of k and larger right of k.
    */
  private def select(k: Int, left0: Int, right0: Int, axis: Int): Unit = {
    var left = left0
    var right = right0
    while (right > left) {
      if (right - left > 600) {
        val n1 = (right - left + 1).toDouble
        val m1 = (k - left + 1).toDouble
        val z = math.log(n1)
        val s = 0.5 * math.exp(2 * z / 3)
        val sd = 0.5 * math.sqrt(z * s * (n1 - s) / n1) *
          (if (m1 - n1 / 2 < 0) -1 else 1)
        val newLeft = math.max(left, math.floor(k - m1 * s / n1 + sd).toInt)
        val newRight = math.min(right, math.floor(k + (n1 - m1) * s / n1 + sd).toInt)
        select(k, newLeft, newRight, axis)
      }

      val t = coords(2 * k + axis)
      var i = left
      var j = right

      swapItem(left, k)
      if (coords(2 * right + axis) > t) swapItem(left, right)

      while (i < j) {
        swapItem(i, j)
        i += 1
        j -= 1
        while (coords(2 * i + axis) < t) i += 1
        while (coords(2 * j + axis) > t) j -= 1
      }

      if (coords(2 * left + axis) == t) swapItem(left, j)
      else {
        j += 1
        swapItem(j, right)
      }

      if (j <= k) left = j + 1
      if (k <= j) right = j - 1
    }
  }

  private def swapItem(i: Int, j: Int): Unit = {
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val tx = coords(2 * i); coords(2 * i) = coords(2 * j); coords(2 * j) = tx
    val ty = coords(2 * i + 1); coords(2 * i + 1) = coords(2 * j + 1); coords(2 * j + 1) = ty
  }
}

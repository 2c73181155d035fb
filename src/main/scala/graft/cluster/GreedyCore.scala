package graft.cluster

import scala.collection.mutable.ArrayBuffer

import graft.geo.Mercator
import graft.ids.ClusterId

/** Engine options (reference defaults: arrow-cluster-engine.ts:41-47).
  *
  * @param insertionRanks also stamp every record's `child_rank` — its
  *   position in its parent's reference-order child list (kdbush `within`
  *   traversal order, [[KdBushOrder]]) — enabling
  *   `getLeaves(insertionOrder = true)` to page leaves in the reference's
  *   own DFS order. Off by default: one kd-sort per level, measured at
  *   +16% on the 200k end-to-end exact build (bench section
  *   `build_insertion_ranks`: 2.70 → 3.13 s), and the default
  *   ascending-id DFS needs no ranks.
  */
final case class ClusterOptions(
    minZoom: Int = 0,
    maxZoom: Int = 16,
    radius: Double = 40.0,
    extent: Double = 512.0,
    minPoints: Int = 2,
    insertionRanks: Boolean = false) {
  require(maxZoom <= 30 && maxZoom >= minZoom && minZoom >= 0, "bad zoom range")
  require(maxZoom + 1 < 32, "cluster-ID packing needs creationZoom+1 < 32")
}

/** One record of one zoom level — the engine's level schema and the
  * `getClusters` output schema rolled into one (SURVEY §1.3/§1.4).
  *
  * For leaves, (lng, lat) are the ORIGINAL source coordinates (the
  * reference's no-trig singleton fast path, arrow-cluster-engine.ts:175-181);
  * for clusters they are the inverse-projected weighted centroid.
  *
  * `child_rank` is this record's position in its parent's reference-order
  * child list (stamped on the same single row as `parent_id`): the kdbush
  * `within` traversal order when the exact build ran with
  * [[ClusterOptions.insertionRanks]]; the record id in grid mode (where
  * insertion order is undefined and id order IS the documented child
  * order); -1 when unstamped.
  */
final case class LevelRow(
    zoom: Int,
    mx: Double,
    my: Double,
    id: Long,
    parent_id: Long,
    point_count: Long,
    is_cluster: Boolean,
    lng: Double,
    lat: Double,
    child_rank: Long = -1L)

/** Single-pass greedy hierarchical clustering, semantics per the reference
  * algorithm (arrow-cluster-engine.ts:354-416): for each unprocessed point
  * in index order at zoom z, fuse all unprocessed neighbors within
  * r = radius/(extent·2^z) into a weighted-centroid cluster when the fused
  * count reaches minPoints; otherwise pass the point through unchanged.
  *
  * This core is deliberately Spark-free: it runs inside one `mapPartitions`
  * task (exact mode) or per spatial partition (scale mode, see
  * [[ClusterEngine]]). Data is struct-of-arrays over PRIMITIVE arrays (no
  * boxing in the hot loop — the JS reference's flat Float64Array discipline,
  * arrow-cluster-engine.ts:7-12, carried over); the spatial index is a
  * uniform grid with cell size r (≤ 9-cell probe replaces the reference's
  * KD-tree — same result set, simpler construction).
  *
  * Precision contract (SURVEY §1.3): input coords are f32-quantized
  * (`Mercator.fround`); neighbor distances are computed against quantized
  * coordinates (the reference stores f32 in its KD-tree) while cluster
  * centroids stay f64 in the data arrays.
  */
object GreedyCore {
  private val UNPROCESSED = Int.MaxValue

  /** Growable primitive int buffer (neighbor lists, grid cells). */
  private final class IntBuf(initial: Int = 8) {
    var arr = new Array[Int](initial)
    var len = 0
    def clear(): Unit = len = 0
    def add(v: Int): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, len * 2)
      arr(len) = v; len += 1
    }
    def apply(i: Int): Int = arr(i)
    def sortInPlace(): Unit = java.util.Arrays.sort(arr, 0, len)
  }

  /** Mutable struct-of-primitive-arrays working state for one zoom level. */
  final class Level(initialCapacity: Int) {
    private var cap = math.max(initialCapacity, 16)
    var size: Int = 0
    var xs = new Array[Double](cap)
    var ys = new Array[Double](cap)
    var ids = new Array[Long](cap)
    var counts = new Array[Long](cap)
    var parents = new Array[Long](cap)
    var zooms = new Array[Int](cap)
    var origLng = new Array[Double](cap)
    var origLat = new Array[Double](cap)
    var ranks = new Array[Long](cap) // child_rank stamps; -1 = unstamped

    private def grow(): Unit = {
      cap *= 2
      xs = java.util.Arrays.copyOf(xs, cap)
      ys = java.util.Arrays.copyOf(ys, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
      counts = java.util.Arrays.copyOf(counts, cap)
      parents = java.util.Arrays.copyOf(parents, cap)
      zooms = java.util.Arrays.copyOf(zooms, cap)
      origLng = java.util.Arrays.copyOf(origLng, cap)
      origLat = java.util.Arrays.copyOf(origLat, cap)
      ranks = java.util.Arrays.copyOf(ranks, cap)
    }

    def add(x: Double, y: Double, id: Long, count: Long, parent: Long,
        zoom: Int, oLng: Double, oLat: Double): Unit = {
      if (size == cap) grow()
      xs(size) = x; ys(size) = y; ids(size) = id; counts(size) = count
      parents(size) = parent; zooms(size) = zoom
      origLng(size) = oLng; origLat(size) = oLat
      ranks(size) = -1L
      size += 1
    }

    // rank not copied: a record reaching the next level is by construction
    // unstamped (stamped records were consumed by their cluster), so the
    // copy starts at -1 like any fresh record
    def copyRecord(from: Level, i: Int): Unit =
      add(from.xs(i), from.ys(i), from.ids(i), from.counts(i), from.parents(i),
        from.zooms(i), from.origLng(i), from.origLat(i))
  }

  /** Uniform grid over f32-quantized coords; `within` returns all indices at
    * squared distance ≤ r² from the (unquantized) query point, in index
    * order (deterministic).
    *
    * Zero boxing: cells live in an open-addressing long→head map with a
    * per-point `next` chain (two flat int arrays replace a HashMap of
    * boxed Longs and per-cell buffers — the dominant cost at 200k+ points).
    * Quantized coordinates are precomputed once per level.
    */
  private final class Grid(level: Level, r: Double) {
    private val n = level.size
    private val invR = 1.0 / r
    private val r2 = r * r
    private val qx = new Array[Double](n)
    private val qy = new Array[Double](n)
    private val nextIdx = new Array[Int](n)
    private val cap = Integer.highestOneBit(math.max(4, n * 2) * 2 - 1)
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val heads = new Array[Int](cap)
    java.util.Arrays.fill(heads, -1)

    private def hashSlot(k: Long): Int = {
      val h = k * -7046029254386353131L
      (h ^ (h >>> 32)).toInt & mask
    }

    locally {
      var i = 0
      while (i < n) {
        qx(i) = Mercator.fround(level.xs(i))
        qy(i) = Mercator.fround(level.ys(i))
        val k = key(math.floor(qx(i) * invR).toInt, math.floor(qy(i) * invR).toInt)
        var s = hashSlot(k)
        while (heads(s) != -1 && keys(s) != k) s = (s + 1) & mask
        keys(s) = k
        nextIdx(i) = heads(s)
        heads(s) = i
        i += 1
      }
    }

    private def key(cx: Int, cy: Int): Long = (cx.toLong << 32) | (cy & 0xffffffffL)

    private def cellHead(k: Long): Int = {
      var s = hashSlot(k)
      while (heads(s) != -1) {
        if (keys(s) == k) return heads(s)
        s = (s + 1) & mask
      }
      -1
    }

    def within(x: Double, y: Double, out: IntBuf): Unit = {
      out.clear()
      val cx = math.floor(x * invR).toInt
      val cy = math.floor(y * invR).toInt
      var dx = -1
      while (dx <= 1) {
        var dy = -1
        while (dy <= 1) {
          var i = cellHead(key(cx + dx, cy + dy))
          while (i != -1) {
            val ddx = qx(i) - x
            val ddy = qy(i) - y
            if (ddx * ddx + ddy * ddy <= r2) out.add(i)
            i = nextIdx(i)
          }
          dy += 1
        }
        dx += 1
      }
      // index order keeps the pass deterministic regardless of hash layout
      out.sortInPlace()
    }
  }

  /** Build all levels z ∈ [minZoom, maxZoom+1] for `points` = (rowId, lng,
    * lat) in stable order, already null/NaN-filtered. `totalPoints` feeds the
    * cluster-ID encoding (must equal points.length in exact mode).
    */
  def buildLevels(
      points: Array[(Long, Double, Double)],
      opts: ClusterOptions): Iterator[LevelRow] = {
    val totalPoints = points.length.toLong
    var cur = new Level(points.length)
    points.foreach { case (rowId, lng, lat) =>
      cur.add(
        Mercator.fround(Mercator.lngX(lng)), Mercator.fround(Mercator.latY(lat)),
        rowId, 1L, -1L, UNPROCESSED, lng, lat)
    }
    val out = ArrayBuffer.empty[LevelRow]
    var z = opts.maxZoom
    while (z >= opts.minZoom) {
      val next = clusterPass(cur, z, opts, totalPoints)
      if (opts.insertionRanks) stampRanks(cur, z, opts, totalPoints)
      emit(cur, z + 1, out) // cur's parent stamps are final once the pass ran
      cur = next
      z -= 1
    }
    emit(cur, opts.minZoom, out)
    out.iterator
  }

  /** Stamp each just-fused record's `child_rank` — its position among its
    * parent's children in the reference's child-visit order
    * (`_getChildIndices`, arrow-cluster-engine.ts:270-302: a kdbush
    * `within` probe of the child level at the ORIGIN record's raw coords
    * with the pass radius, filtered to the parent's children). Runs right
    * after the z-pass, when `cur`'s parent stamps are final and every
    * non-(-1) parent was created in THIS pass — so each parent's origin
    * index is decodable from its id and probed exactly once.
    */
  private def stampRanks(
      cur: Level, z: Int, opts: ClusterOptions, totalPoints: Long): Unit = {
    val r = opts.radius / (opts.extent * math.pow(2.0, z.toDouble))
    val tree = new KdBushOrder(cur.xs, cur.ys, cur.size)
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < cur.size) {
      val pid = cur.parents(i)
      if (pid != -1L && seen.add(pid)) {
        val originIdx = ((pid - totalPoints) >> 5).toInt
        val nbs = tree.within(cur.xs(originIdx), cur.ys(originIdx), r)
        var rank = 0L
        var j = 0
        while (j < nbs.length) {
          val nb = nbs(j)
          if (cur.parents(nb) == pid) {
            cur.ranks(nb) = rank
            rank += 1
          }
          j += 1
        }
      }
      i += 1
    }
  }

  private def emit(level: Level, zoom: Int, out: ArrayBuffer[LevelRow]): Unit = {
    var i = 0
    val n = level.size
    while (i < n) {
      val isCluster = level.origLng(i).isNaN
      out += LevelRow(
        zoom, level.xs(i), level.ys(i), level.ids(i), level.parents(i),
        level.counts(i), isCluster,
        if (isCluster) Mercator.xLng(level.xs(i)) else level.origLng(i),
        if (isCluster) Mercator.yLat(level.ys(i)) else level.origLat(i),
        level.ranks(i))
      i += 1
    }
  }

  /** One greedy pass: consume level z+1, produce level z (reference
    * _cluster, arrow-cluster-engine.ts:354-416).
    */
  private def clusterPass(
      cur: Level, z: Int, opts: ClusterOptions, totalPoints: Long): Level = {
    val r = opts.radius / (opts.extent * math.pow(2.0, z.toDouble))
    val grid = new Grid(cur, r)
    val next = new Level(cur.size)
    val neighbors = new IntBuf(16)
    var i = 0
    val n = cur.size
    while (i < n) {
      if (cur.zooms(i) > z) {
        cur.zooms(i) = z
        val x = cur.xs(i)
        val y = cur.ys(i)
        grid.within(x, y, neighbors)
        val originCount = cur.counts(i)
        var numPoints = originCount
        var j = 0
        while (j < neighbors.len) {
          val nb = neighbors(j)
          if (cur.zooms(nb) > z) numPoints += cur.counts(nb)
          j += 1
        }
        if (numPoints > originCount && numPoints >= opts.minPoints) {
          // fuse: weighted centroid, stamp children's parent pointers
          var wx = x * originCount
          var wy = y * originCount
          val id = ClusterId.encode(i.toLong, z, totalPoints)
          j = 0
          while (j < neighbors.len) {
            val nb = neighbors(j)
            if (cur.zooms(nb) > z) {
              cur.zooms(nb) = z
              wx += cur.xs(nb) * cur.counts(nb)
              wy += cur.ys(nb) * cur.counts(nb)
              cur.parents(nb) = id
            }
            j += 1
          }
          cur.parents(i) = id
          next.add(wx / numPoints, wy / numPoints, id, numPoints, -1L,
            UNPROCESSED, Double.NaN, Double.NaN)
        } else {
          // pass through unchanged; if the minPoints gate failed, the
          // probed neighbors also pass through (marked processed)
          next.copyRecord(cur, i)
          if (numPoints > 1) {
            j = 0
            while (j < neighbors.len) {
              val nb = neighbors(j)
              if (cur.zooms(nb) > z) {
                cur.zooms(nb) = z
                next.copyRecord(cur, nb)
              }
              j += 1
            }
          }
        }
      }
      i += 1
    }
    next
  }
}

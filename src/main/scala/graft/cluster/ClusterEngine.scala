package graft.cluster

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.geo.Mercator
import graft.ids.ClusterId

/** Spark-native multi-resolution cluster index (reference:
  * arrow-cluster-engine.ts `load`, SURVEY §3.1).
  *
  * Exact mode (this class): the greedy pass is inherently sequential
  * (first-come order by row id), so the hierarchy is built inside ONE
  * `mapPartitions` task over a single sorted partition — the executors, not
  * the driver, do the work, and results are partition-count-invariant by
  * construction. Fine to ~10M points per build — MEASURED, not asserted:
  * 10M uniform points build in 245.9 s with a 48 GB driver/executor heap
  * (the default 8 GB OOMs; `bench_exact10m.json`, r9), vs ~9-10 s for the
  * shuffle-parallel [[ClusterEngine.loadDistributed]] build at the SAME
  * 10M on the default heap (`bench_grid10m.json`, 32 cores, r9) — a ~26×
  * gap, so the crossover to the distributed build (Morton/grid,
  * near-linear, any heap) sits well below 10M for throughput and AT 10M
  * for feasibility. The
  * scalable grid-binned variant with different (documented) semantics
  * lives in [[graft.operators.Spatial]] as a declarative groupBy.
  *
  * The resulting per-zoom level table is a persisted Dataset[LevelRow]
  * keyed by `zoom` — every query below is an ordinary pruned scan of it.
  */
/** One parent→child edge of the cluster hierarchy. */
final case class ChildEdge(id: Long, parentId: Long, isCluster: Boolean, pointCount: Long)

/** One `getClusters` result row (serve-mode return type; same fields as the
  * DataFrame path's projection).
  */
final case class ClusterRow(
    id: Long, lng: Double, lat: Double, pointCount: Long, isCluster: Boolean)

/** Columnar serve-mode result — the reference's own output shape
  * (`ClusterOutput`: positions/ids/pointCounts/isCluster typed arrays,
  * arrow-cluster-engine.ts:126-193). Parallel primitive arrays, one entry
  * per result record: zero boxing on the hot serve path, which at 1M-row
  * levels is the difference between filling five flat arrays and churning
  * a million short-lived row objects through the GC per probe.
  */
final class ClusterBatch(
    val id: Array[Long], val lng: Array[Double], val lat: Array[Double],
    val pointCount: Array[Long], val isCluster: Array[Boolean]) {
  def size: Int = id.length
  def row(i: Int): ClusterRow =
    ClusterRow(id(i), lng(i), lat(i), pointCount(i), isCluster(i))
}

/** The row-shaped serve result as a LAZY view over a [[ClusterBatch]]:
  * `apply(i)` materializes one [[ClusterRow]] on access and nothing is
  * allocated up front beyond the batch's five primitive arrays. This is
  * what keeps `getClustersLocal` at batch-path cost at deep zooms — the
  * pre-r8 eager `Array[ClusterRow]` allocated a million short-lived row
  * objects per 1M-point world probe (150–640 ms GC spikes vs ~13 ms
  * batch); callers that iterate still pay per-row boxing, but only for
  * the rows they actually touch, and the probe itself allocates none.
  */
final class ClusterRows(val batch: ClusterBatch)
    extends scala.collection.immutable.IndexedSeq[ClusterRow] {
  def length: Int = batch.size
  def apply(i: Int): ClusterRow = batch.row(i)
}

/** One zoom level snapshotted into driver-local primitive struct-of-arrays,
  * sorted by `mx` so a bbox probe is a binary-searched x-slice plus a y
  * filter — the reference's pre-allocated in-memory query loop
  * (arrow-cluster-engine.ts:29-33,126-193) re-expressed over the SAME level
  * rows the DataFrame path scans.
  */
private final class LevelSnapshot(
    val mx: Array[Double], val my: Array[Double], val id: Array[Long],
    val lng: Array[Double], val lat: Array[Double],
    val pointCount: Array[Long], val isCluster: Array[Boolean]) {

  /** First index with mx >= x (arrays sorted by mx). */
  private def lowerBound(x: Double): Int = {
    var lo = 0; var hi = mx.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (mx(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Number of rows the same range predicate selects (first pass of the
    * zero-boxing columnar fill).
    */
  def countRange(xLo: Double, xHi: Double, yLo: Double, yHi: Double): Int = {
    var i = lowerBound(xLo)
    var n = 0
    while (i < mx.length && mx(i) <= xHi) {
      if (my(i) >= yLo && my(i) <= yHi) n += 1
      i += 1
    }
    n
  }

  /** Copy matching rows into the batch arrays starting at `at`; returns the
    * next free slot. Same predicate and order as [[query]].
    */
  def fillRange(xLo: Double, xHi: Double, yLo: Double, yHi: Double,
      b: ClusterBatch, at: Int): Int = {
    var i = lowerBound(xLo)
    var o = at
    while (i < mx.length && mx(i) <= xHi) {
      if (my(i) >= yLo && my(i) <= yHi) {
        b.id(o) = id(i); b.lng(o) = lng(i); b.lat(o) = lat(i)
        b.pointCount(o) = pointCount(i); b.isCluster(o) = isCluster(i)
        o += 1
      }
      i += 1
    }
    o
  }
}

final class ClusterIndex private[cluster] (
    val levels: Dataset[LevelRow],
    val numPoints: Long,
    val opts: ClusterOptions,
    /** Whether `child_rank` stamps are populated — always true for grid
      * builds (rank = id), true for exact builds iff
      * [[ClusterOptions.insertionRanks]] was on. Gates
      * `getLeaves(insertionOrder = true)` with a clear error instead of a
      * silently wrong page order.
      */
    private[cluster] val ranksAvailable: Boolean,
    /** The Dataset whose persistence BACKS `levels` when they differ —
      * grid mode's `levels` is a lazy union over the persisted Morton fold,
      * and unpersisting the union plan would not free the fold's cache
      * (CacheManager matches cache entries by plan sameResult, not by
      * containment). persist/unpersist go through this handle.
      */
    private[cluster] val cacheHandle: Option[Dataset[_]] = None) {
  import levels.sparkSession.implicits._

  def level(zoom: Int): Dataset[LevelRow] = {
    val z = limitZoom(zoom)
    levels.filter($"zoom" === z)
  }

  /** P11: clamp to [minZoom, maxZoom+1] (arrow-cluster-engine.ts:428-433). */
  def limitZoom(zoom: Int): Int =
    math.max(opts.minZoom, math.min(math.floor(zoom.toDouble).toInt, opts.maxZoom + 1))

  /** P10 bbox normalization (arrow-cluster-engine.ts:130-138) shared by the
    * DataFrame and serve-mode query paths so both evaluate the IDENTICAL
    * predicate: projected x ranges (empty = whole world, two = the
    * antimeridian-crossing split) plus the projected y range.
    */
  private def bboxRanges(bbox: (Double, Double, Double, Double))
      : (Seq[(Double, Double)], Double, Double) = {
    val (minLng0, minLat, maxLng0, maxLat) = bbox
    val wholeWorld = maxLng0 - minLng0 >= 360.0
    val minLng = if (wholeWorld) -180.0 else ((minLng0 + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    val maxLng = if (wholeWorld) 180.0 else ((maxLng0 + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    val minY = Mercator.latY(math.min(math.max(maxLat, -90.0), 90.0)) // north edge = small y
    val maxY = Mercator.latY(math.min(math.max(minLat, -90.0), 90.0))
    val xRanges =
      if (wholeWorld) Seq.empty
      else if (minLng > maxLng) // crosses the antimeridian → two ranges
        Seq((Mercator.lngX(minLng), Mercator.lngX(180.0)),
          (Mercator.lngX(-180.0), Mercator.lngX(maxLng)))
      else Seq((Mercator.lngX(minLng), Mercator.lngX(maxLng)))
    (xRanges, minY, maxY)
  }

  /** Q1/Q2: clusters and points inside bbox at zoom
    * (arrow-cluster-engine.ts:126-193). bbox = (minLng, minLat, maxLng,
    * maxLat); antimeridian-crossing boxes become one OR-of-two-ranges
    * predicate (same result set as the reference's two-query union).
    */
  def getClusters(bbox: (Double, Double, Double, Double), zoom: Int): DataFrame = {
    val (xRanges, minY, maxY) = bboxRanges(bbox)
    val inY = $"my" >= minY && $"my" <= maxY
    val inX = xRanges.map { case (lo, hi) => $"mx" >= lo && $"mx" <= hi }
      .reduceOption(_ || _).getOrElse(lit(true))
    // mx/my (the engine's native mercator coords) ride along AFTER the
    // reference-shaped columns: consumers reading positionally (serve
    // fallback, specs) see the same first five columns, while verification
    // probes get coordinates whose doubles are CROSS-ENGINE BIT-EXACT —
    // every op producing mx/my (lngX, fround, centroid mults/adds/div) is
    // IEEE-exact, whereas lat's inverse projection (yLat: atan∘exp)
    // wobbles by 1 ULP between math libraries (measured: 1 of 5 q31 rows
    // vs the independent JS build) and lng's (xLng) is exact arithmetic.
    level(zoom).filter(inX && inY)
      .select($"id", $"lng", $"lat", $"point_count", $"is_cluster", $"mx", $"my")
  }

  // serve-mode snapshots, lazily built once per zoom; the first probe of a
  // zoom decides snapshot-vs-fallback from the level's row count and the
  // remaining index-wide budget. The map holds cheap memo CELLS, not the
  // snapshots themselves: computeIfAbsent only allocates a cell (O(1), as
  // the CHM contract requires — the build runs Spark jobs and must not
  // execute under a bin lock, where it would stall unrelated zooms hashing
  // to the same bin), while the cell's lazy val gives exactly-once build
  // semantics on the cell's own monitor. A failed build leaves the lazy val
  // uninitialized, so the next probe retries (the budget reservation is
  // refunded in the builder's catch).
  private final class SnapshotCell(thunk: () => Option[LevelSnapshot]) {
    lazy val value: Option[LevelSnapshot] = thunk()
  }
  private val snapshots =
    new java.util.concurrent.ConcurrentHashMap[Int, SnapshotCell]()
  private val snapshotRowsUsed = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Reserve `n` snapshot rows against [[serveTotalSnapshotRows]] with a CAS
    * loop — a plain check-then-add would let concurrent first probes of
    * different zooms all pass the check and overshoot the documented
    * driver-heap bound. Returns false (no reservation) when over budget.
    */
  private def tryReserveSnapshotRows(n: Long): Boolean = {
    while (true) {
      val cur = snapshotRowsUsed.get()
      if (cur + n > serveTotalSnapshotRows) return false
      if (snapshotRowsUsed.compareAndSet(cur, cur + n)) return true
    }
    false // unreachable
  }

  /** Serve-mode caps, adjustable BEFORE the first probe of a zoom (the
    * snapshot decision is made once per zoom per index and then sticks
    * until [[unpersist]]): a level with more than [[serveMaxSnapshotRows]]
    * rows (default 10M ≈ 560 MB of driver heap) is never snapshotted, and
    * [[serveTotalSnapshotRows]] (default 20M ≈ 1.1 GB) bounds the SUM of
    * snapshot rows across all zooms, so panning the whole zoom ladder
    * cannot accumulate unbounded driver heap — levels beyond either cap
    * answer through the distributed scan instead.
    */
  @volatile var serveMaxSnapshotRows: Long = 10000000L
  @volatile var serveTotalSnapshotRows: Long = 20000000L

  /** Bound on the DRIVER-side result of the serve-row fallback (a level
    * beyond the snapshot caps answers [[getClustersLocal]] through the
    * distributed scan). The row API's contract is an in-process array, so
    * its result is inherently driver-sized — this cap makes that explicit:
    * the fallback streams through `toLocalIterator` and ABORTS with an
    * error once the bbox result exceeds it, instead of collecting an
    * unbounded level as boxed rows (a world-bbox probe of a >10M-row level
    * would otherwise materialize the whole level on the driver). Callers
    * with genuinely huge results belong on [[getClusters]], which stays
    * distributed.
    */
  @volatile var serveMaxFallbackRows: Long = 10000000L

  /** Q1/Q2 at interactive latency: the driver-local serve mode. The first
    * probe of a zoom snapshots that level into sorted primitive SoA arrays
    * IF it fits the caps above; subsequent probes binary-search the
    * snapshot in-process — no Spark job, sub-ms at the reference's
    * 200k-point protocol — matching the reference's pan/zoom query loop
    * (arrow-cluster-engine.ts:126-193, benchmarks/run.ts:38-42). The
    * snapshot fill streams a DISTRIBUTED `orderBy(mx)` through
    * `toLocalIterator` straight into the primitive arrays, so the driver
    * never holds the level as boxed rows or sorts it locally. A level
    * beyond the caps falls back to the distributed [[getClusters]] scan,
    * so the 100 TB path is always available and the two paths return
    * identical rows ([[bboxRanges]] is shared; ServeModeSpec proves
    * equality on the golden fixture). `unpersist()` drops all snapshots
    * and resets the budget.
    */
  def getClustersLocal(bbox: (Double, Double, Double, Double), zoom: Int): ClusterRows =
    new ClusterRows(getClustersLocalBatch(bbox, zoom))

  /** The serve-mode probe in the reference's own COLUMNAR output shape
    * (`ClusterOutput` typed arrays): count pass → exact-size primitive
    * arrays → fill pass, zero per-row boxing. This is the PRIMARY serve
    * path — [[getClustersLocal]] is a lazy row view over its result — so
    * a 1M-row world probe allocates five flat arrays regardless of which
    * API the caller holds (ServeModeSpec locks row/batch equivalence).
    */
  def getClustersLocalBatch(bbox: (Double, Double, Double, Double), zoom: Int): ClusterBatch = {
    val z = limitZoom(zoom)
    val snap = snapshots.computeIfAbsent(z,
      _ => new SnapshotCell(() => buildSnapshot(z))).value
    snap match {
      case Some(s) =>
        val (xRanges0, minY, maxY) = bboxRanges(bbox)
        val xRanges =
          if (xRanges0.isEmpty) Seq((Double.NegativeInfinity, Double.PositiveInfinity))
          else xRanges0
        // count-then-fill: the probe allocates exactly its result size —
        // no level-sized buffer, no grow-copies (the pre-r7 pre-sized
        // append allocated a level-sized buffer PER PROBE, the diagnosed
        // GC churn at 1M points)
        var n = 0
        xRanges.foreach { case (lo, hi) => n += s.countRange(lo, hi, minY, maxY) }
        val b = new ClusterBatch(new Array[Long](n), new Array[Double](n),
          new Array[Double](n), new Array[Long](n), new Array[Boolean](n))
        var at = 0
        xRanges.foreach { case (lo, hi) => at = s.fillRange(lo, hi, minY, maxY, b, at) }
        b
      case None =>
        // above-cap fallback: stream the distributed result into growable
        // PRIMITIVE builders and abort as soon as it exceeds
        // serveMaxFallbackRows — toLocalIterator pulls partitions lazily,
        // so an over-cap probe stops after ~cap rows instead of
        // materializing the whole level on the driver
        val bId = scala.collection.mutable.ArrayBuilder.make[Long]
        val bLng = scala.collection.mutable.ArrayBuilder.make[Double]
        val bLat = scala.collection.mutable.ArrayBuilder.make[Double]
        val bPc = scala.collection.mutable.ArrayBuilder.make[Long]
        val bIc = scala.collection.mutable.ArrayBuilder.make[Boolean]
        var n = 0L
        val it = getClusters(bbox, zoom).toLocalIterator()
        while (it.hasNext) {
          if (n >= serveMaxFallbackRows)
            throw new IllegalStateException(
              s"getClustersLocal fallback at zoom $z exceeds serveMaxFallbackRows=" +
                s"$serveMaxFallbackRows rows; the serve APIs return a driver-sized result — " +
                "use getClusters(bbox, zoom) to keep the result distributed")
          val r = it.next()
          bId += r.getLong(0); bLng += r.getDouble(1); bLat += r.getDouble(2)
          bPc += r.getLong(3); bIc += r.getBoolean(4)
          n += 1
        }
        new ClusterBatch(bId.result(), bLng.result(), bLat.result(),
          bPc.result(), bIc.result())
    }
  }

  /** One zoom's snapshot decision + fill (runs outside any map lock, once
    * per zoom via [[SnapshotCell]]).
    */
  private def buildSnapshot(z: Int): Option[LevelSnapshot] = {
    {
      val n = level(z).count()
      if (n > serveMaxSnapshotRows || n > Int.MaxValue.toLong ||
          !tryReserveSnapshotRows(n))
        None
      else try {
        val ni = n.toInt
        val mx = new Array[Double](ni); val my = new Array[Double](ni)
        val id = new Array[Long](ni); val lng = new Array[Double](ni)
        val lat = new Array[Double](ni); val pc = new Array[Long](ni)
        val ic = new Array[Boolean](ni)
        val it = level(z)
          .select($"mx", $"my", $"id", $"lng", $"lat", $"point_count", $"is_cluster")
          .orderBy($"mx")
          .toLocalIterator()
        var i = 0
        while (it.hasNext && i < ni) {
          val r = it.next()
          mx(i) = r.getDouble(0); my(i) = r.getDouble(1); id(i) = r.getLong(2)
          lng(i) = r.getDouble(3); lat(i) = r.getDouble(4); pc(i) = r.getLong(5)
          ic(i) = r.getBoolean(6)
          i += 1
        }
        require(i == ni && !it.hasNext,
          s"level $z changed size during snapshot (expected $ni rows, saw ${if (it.hasNext) "more" else i.toString})")
        Some(new LevelSnapshot(mx, my, id, lng, lat, pc, ic))
      } catch {
        case t: Throwable => // refund the reservation — nothing was admitted
          snapshotRowsUsed.addAndGet(-n); throw t
      }
    }
  }

  /** Q3: direct children of a cluster (arrow-cluster-engine.ts:198-226).
    * Parent pointers are explicit in the level table, so this is a pruned
    * equality scan — no spatial candidate pass needed. `insertionOrder`
    * returns them sorted in the reference's own child-visit order (the
    * `child_rank` stamps — see [[getLeaves]]); default is unordered (the
    * reference's order is a property of its kd-tree, not a contract most
    * callers need).
    */
  def getChildren(clusterId: Long, insertionOrder: Boolean = false): Dataset[LevelRow] = {
    require(!insertionOrder || ranksAvailable,
      "insertionOrder needs child_rank stamps — build the exact index with " +
        "ClusterOptions(insertionRanks = true)")
    val childZoom = ClusterId.originLevel(clusterId, numPoints)
    val base = levels.filter($"zoom" === childZoom && $"parent_id" === clusterId)
    if (insertionOrder) base.orderBy($"child_rank") else base
  }

  /** Full hierarchy closure (the reference's cluster-structure memoization,
    * arrow-cluster-layer.ts:305-334, made whole-table instead of per-probe):
    * ONE top-down sweep from the minZoom roots computes every record's
    * absolute root-to-record `_path`; every subtree query — leaves,
    * descendants, navigation — is then a narrow filter over this single set
    * of materialized per-level RDDs. At 100 TB the closure costs one
    * build-shaped job set, paid once per index, after which navigation is a
    * scan, not a walk; repeated probes (paginate → materialize the same
    * cluster, or q56/q57/q58 probing overlapping subtrees) share it for
    * free, with no per-probe memo to size or evict.
    *
    * Each parent edge is stamped at exactly one zoom — the parent's origin
    * level — so every record has exactly one edge row and the closure is
    * well-defined. Phase A resolves cluster paths by pointer doubling;
    * phase B attaches every remaining record in one flat join (see the
    * inline phase comments). The broadcast-vs-shuffle choice everywhere
    * acts on the exact driver-known cluster count — a cluster table beyond
    * 100k rows ships as shuffle joins instead of OOMing the driver with a
    * broadcast build.
    *
    * Lexicographic order on `_path` IS the reference's DFS leaf order
    * (arrow-cluster-engine.ts:312-348) with children visited in
    * ascending-id order; lexicographic order on the lockstep `_rpath`
    * (per-level `child_rank` stamps) is the reference's OWN child-visit
    * order (kdbush `within` traversal — see [[KdBushOrder]]), when the
    * build stamped ranks. Within any subtree, absolute paths share the
    * root-to-subtree prefix, so sorting by the absolute path equals
    * sorting by the subtree-relative one.
    */
  private lazy val fullWalk: DataFrame = buildWalk(withRanks = false)

  /** The closure with the lockstep `_rpath` rank path — built ONLY when
    * insertion-order pagination is first used: carrying a second long array
    * on every closure row measurably taxes the default navigation queries
    * that never sort by it (~+50% on the exact-build closure at sf0.1).
    */
  private lazy val fullWalkRanked: DataFrame = buildWalk(withRanks = true)

  private def buildWalk(withRanks: Boolean): DataFrame = {
    val walkT0 = System.nanoTime()
    val debug = sys.env.contains("GRAFT_WALK_DEBUG")

    // ── Phase A: CLUSTER ancestor paths by pointer doubling. Every merged
    // cluster has exactly ONE stamped edge row (parent's origin level), so
    // the cluster edge set is one pruned scan of the level table — a small
    // fraction of the records (branching ≥ 2 ⇒ ≤ half, typically ~5%).
    // Doubling then resolves every cluster's full root path in
    // ceil(log2(depth)) self-joins of that small set, instead of one join
    // per zoom level: sequential depth ~5 rather than ~17, independent of
    // maxZoom, with each round an ordinary shuffle (or broadcast, chosen on
    // the exact driver-known cluster count) join — the shape that holds
    // when the cluster table itself is billions of rows.
    //
    // State per cluster: `_top` = furthest ancestor not yet folded into
    // `_seg`; `_seg` = ids from _top's child down to the cluster itself
    // (`_rseg` = the same segment's child_rank stamps, carried in lockstep
    // so DFS ordering by the reference's child-visit order is one sort of
    // the finished `_rpath`). A root's seed is (_top = -1, _seg = [id]) —
    // the seed path is [id], not [], because a minZoom root has no edge row
    // of its own, so its id must enter descendants' paths here or
    // subtreeRows could never match it; its rank seed is [-1] (a probe
    // never compares the root position). When a pending row joins a
    // finished ancestor, its path closes.
    val stamped = levels.toDF().where($"is_cluster" && $"parent_id" =!= -1L)
    val rootsDf = levels.toDF().where($"zoom" === opts.minZoom && $"is_cluster")
    // unions SUM their inputs' partition counts — left unchecked, each
    // round would double the task count (32 → 512 across four rounds) and
    // drown the job in scheduling overhead; coalesce (narrow, no shuffle)
    // pins every round at the configured parallelism
    val nParts = math.max(1,
      levels.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    // column sets are assembled conditionally: the rank columns exist only
    // in the ranked walk (see fullWalkRanked)
    def ranked(cols: Seq[Column], extra: Column*): Seq[Column] =
      if (withRanks) cols ++ extra else cols
    var st = stamped.select(ranked(
      Seq($"id", $"parent_id".as("_top"), array($"id").as("_seg")),
      array($"child_rank").as("_rseg")): _*)
      .unionByName(rootsDf.select(ranked(
        Seq($"id", lit(-1L).as("_top"), array($"id").as("_seg")),
        array(lit(-1L)).as("_rseg")): _*))
      .coalesce(nParts)
      .localCheckpoint(false)
    // lazy checkpoints: each round's count aggregation is the first action
    // and materializes the blocks — one job per round, not a checkpoint job
    // plus a count job
    val counts0 = st
      .agg(count(lit(1)), count(when($"_top" =!= -1L, 1))).collect()(0)
    val clusterCount = counts0.getLong(0)
    var pendCnt = counts0.getLong(1)
    if (debug) println(f"[walk] cluster edges: $clusterCount ($pendCnt pending) " +
      f"${(System.nanoTime() - walkT0) / 1e9}%.2f s")
    var iter = 0
    while (pendCnt > 0) {
      require(iter < 8, s"cluster hierarchy deeper than 2^8 — malformed parent edges")
      val t0 = System.nanoTime()
      val b0 = st.select(ranked(
        Seq($"id".as("_tid"), $"_top".as("_ttop"), $"_seg".as("_tseg")),
        $"_rseg".as("_trseg")): _*)
      val b = if (clusterCount <= 100000) broadcast(b0) else b0
      val stepped = st.where($"_top" =!= -1L)
        .join(b, $"_top" === $"_tid")
        .select(ranked(
          Seq($"id", $"_ttop".as("_top"), concat($"_tseg", $"_seg").as("_seg")),
          concat($"_trseg", $"_rseg").as("_rseg")): _*)
      st = st.where($"_top" === -1L).unionByName(stepped)
        .coalesce(nParts).localCheckpoint(false)
      // one aggregation serves both loop control and the conservation
      // guard: the inner join above silently DROPS a pending cluster whose
      // _top points at no row (dangling parent edge) — losing its whole
      // subtree from the closure — so the total must stay put every round
      val counts = st.agg(count(lit(1)), count(when($"_top" =!= -1L, 1))).collect()(0)
      require(counts.getLong(0) == clusterCount,
        s"hierarchy closure lost ${clusterCount - counts.getLong(0)} clusters to " +
          s"dangling parent edges in round $iter — malformed hierarchy")
      pendCnt = counts.getLong(1)
      if (debug) println(f"[walk] doubling round $iter pending=$pendCnt " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      iter += 1
    }
    val clusterPaths0 = st.select(ranked(
      Seq($"id".as("_cid"), $"_seg".as("_path")), $"_rseg".as("_rpath")): _*)
    val clusterPaths =
      if (clusterCount <= 100000) broadcast(clusterPaths0) else clusterPaths0

    // ── Phase B: attach everything in two flat joins. A record's parent
    // edge is stamped on exactly one of its level rows, so one scan of the
    // level table joined to the cluster-path table yields every record's
    // path in a single job — the leaf mass is touched once, not per level.
    val walk =
      if (clusterCount == 0) emptyWalk
      else {
        val edges = levels.toDF().where($"parent_id" =!= -1L)
          .join(clusterPaths, $"parent_id" === $"_cid")
          // uniformly path(x) = path(parent(x)) ++ [x], cluster or leaf
          .select(ranked(
            Seq($"id", $"parent_id", $"point_count", $"is_cluster", $"lng", $"lat",
              concat($"_path", array($"id")).as("_path")),
            concat($"_rpath", array($"child_rank")).as("_rpath")): _*)
        edges.localCheckpoint(false)
      }
    if (debug) println(f"[walk] total: ${(System.nanoTime() - walkT0) / 1e9}%.2f s")
    walk
  }

  // carries _rpath unconditionally: the empty frame costs nothing and both
  // walks' consumers can select from it
  private def emptyWalk: DataFrame =
    levels.toDF().where(lit(false))
      .select($"id", $"parent_id", $"point_count", $"is_cluster", $"lng", $"lat")
      .withColumn("_path", typedLit(Array.empty[Long]))
      .withColumn("_rpath", typedLit(Array.empty[Long]))

  /** Subtree rows for a set of roots = filter of [[fullWalk]]: a record is
    * under one of `roots` iff a STRICT ancestor of it (its path minus its
    * own trailing id) is that root. Probed roots' own rows are therefore
    * excluded — a subtree is its strict descendants — but a root nested
    * inside another probed root's subtree still appears as a descendant of
    * the outer root, exactly like the old per-root walk.
    */
  private def subtreeRows(roots: Seq[Long], withPath: Boolean = true,
      ranked: Boolean = false): DataFrame = {
    val base =
      if (roots.isEmpty) emptyWalk
      else (if (ranked) fullWalkRanked else fullWalk).where(arrays_overlap(
        slice($"_path", lit(1), size($"_path") - 1), typedLit(roots.toArray)))
    if (withPath) base else base.drop("_path", "_rpath")
  }

  private def leavesWithPath(clusterId: Long, ranked: Boolean = false): DataFrame =
    subtreeRows(Seq(clusterId), ranked = ranked).where(!$"is_cluster")

  /** Q4: all leaves under a cluster with limit/offset
    * (arrow-cluster-engine.ts:231-235,312-348). Pagination orders by
    * ascending leaf id; by DFS position with ascending-id child order
    * (`dfsOrder = true` — graft's default deterministic DFS); or by DFS
    * position in the REFERENCE's own child-visit order
    * (`insertionOrder = true` — the kdbush `within` order its
    * `_appendLeafIndices` pages in, available when the build stamped
    * `child_rank`: exact builds with [[ClusterOptions.insertionRanks]], all
    * grid builds). GoldenDifferentialSpec proves insertion-order pages
    * equal the independent reference implementation page-for-page at equal
    * offsets. All three are a distributed sort + offset/limit — Spark plans
    * the page as top-K, so the driver only ever sees `limit` rows.
    */
  def getLeaves(clusterId: Long, limit: Int = 10, offset: Int = 0,
      dfsOrder: Boolean = false, insertionOrder: Boolean = false): DataFrame = {
    require(!insertionOrder || ranksAvailable,
      "insertionOrder pagination needs child_rank stamps — build the exact " +
        "index with ClusterOptions(insertionRanks = true)")
    val all = leavesWithPath(clusterId, ranked = insertionOrder)
    val sortKey =
      if (insertionOrder) col("_rpath")
      else if (dfsOrder) col("_path")
      else col("id")
    val page =
      if (limit == Int.MaxValue) all.sort(sortKey).offset(offset)
      else all.sort(sortKey).offset(offset).limit(limit)
    page.sort(sortKey)
      .select($"id".as("row_id"), $"lng", $"lat", $"point_count")
  }

  /** Q5: first zoom at which the cluster expands into >1 children
    * (arrow-cluster-engine.ts:240-256). Driver loop bounded by maxZoom.
    */
  def getClusterExpansionZoom(clusterId: Long): Int = {
    var cid = clusterId
    var expansionZoom = ClusterId.originLevel(cid, numPoints) - 1
    var done = false
    while (!done && expansionZoom <= opts.maxZoom) {
      val children = getChildren(cid).select($"id", $"is_cluster")
        .collect()
      expansionZoom += 1
      if (children.length != 1) done = true
      else {
        val head = children.head
        if (!head.getBoolean(1)) done = true
        else cid = head.getLong(0)
      }
    }
    expansionZoom
  }

  /** Batched subtree walk for MANY roots at once — the [[subtreeRows]]
    * sweep with ONE final collect of the edge set. Edge count is cluster
    * metadata (bounded by the cluster count, not the leaf count); callers
    * needing leaf-scale data use the DataFrame paths instead.
    */
  def subtreeEdges(roots: Seq[Long]): Array[ChildEdge] =
    subtreeRows(roots, withPath = false)
      .select($"id", $"parent_id", $"is_cluster", $"point_count")
      .collect()
      .map(r => ChildEdge(r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))

  /** Q8: all descendant cluster ids (BFS over parent edges,
    * arrow-cluster-layer.ts:305-334).
    */
  def getDescendants(clusterId: Long): Array[Long] =
    subtreeEdges(Seq(clusterId)).filter(_.isCluster).map(_.id)

  /** Q5 for many clusters from one batched subtree walk: driver-side chain
    * walk over the collected edges (no per-cluster Spark jobs).
    */
  def navigationSummary(roots: Seq[Long]): Seq[(Long, Int, Long)] = {
    val edges = subtreeEdges(roots)
    val childMap = edges.groupBy(_.parentId)
    roots.map { root =>
      // expansion zoom: same loop as getClusterExpansionZoom, over the map
      var cid = root
      var ez = ClusterId.originLevel(cid, numPoints) - 1
      var done = false
      while (!done && ez <= opts.maxZoom) {
        val ch = childMap.getOrElse(cid, Array.empty[ChildEdge])
        ez += 1
        if (ch.length != 1) done = true
        else if (!ch(0).isCluster) done = true
        else cid = ch(0).id
      }
      // descendant closure: clusters only, from the same edge set
      var frontier = List(root)
      var nDesc = 0L
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(p =>
          childMap.getOrElse(p, Array.empty[ChildEdge]).filter(_.isCluster).map(_.id))
        nDesc += next.length
        frontier = next
      }
      (root, ez, nDesc)
    }
  }

  /** Q7: materialize the original rows under a cluster — join leaf row-ids
    * back to the source (late materialization; picking.ts:14-51).
    */
  def materializeLeaves(clusterId: Long, source: DataFrame, rowIdCol: String,
      limit: Int = 10, offset: Int = 0): DataFrame = {
    val leafIds = getLeaves(clusterId, limit, offset).select($"row_id")
    source.join(broadcast(leafIds), source(rowIdCol) === leafIds("row_id"), "inner")
  }

  def indexedPointCount: Long = numPoints

  /** Persist the BUILT index to `path` (levels parquet + a 1-row metadata
    * parquet), reloadable by [[ClusterEngine.loadIndex]] with every query
    * surface intact — bbox scans, serve snapshots, children, paginated
    * leaves, navigation, and (when stamped) insertion-order ranks. The
    * reference has no index persistence at all (it rebuilds from source on
    * every process start); at 100 TB the build is the expensive step, so
    * save/load IS the production deployment shape: build once on the big
    * cluster, serve anywhere. Levels are plain parquet — partition-count
    * independent, readable by any engine for audit.
    */
  def save(path: String): Unit = {
    val spark = levels.sparkSession
    import spark.implicits._
    // exact-mode levels live in ONE partition (the greedy pass's single
    // task) — written as-is, the save is a single-threaded parquet encode.
    // Spread cores-shy level tables across the executors before writing:
    // same rows, same reload surface (plain parquet), wall time bound by
    // the widest writer instead of one task; already-parallel level tables
    // (grid/Morton mode) write unchanged. HASH-partitioned on the id
    // column, not round-robin: a keyless repartition first locally SORTS
    // its input for retry determinism (spark.sql.execution.sortBeforeRepartition
    // — 1.2M rows sorted inside the single upstream task at sf0.1; measured
    // 2.8-3.7 s → 1.4-1.8 s warm with the hash spread), and a deterministic
    // key sidesteps the round-robin retry-duplication caveat outright
    // (guide §2.5). ids are dense longs, so the spread is uniform.
    val lv = levels.toDF()
    val parts = spark.sparkContext.defaultParallelism
    val spread =
      if (levels.rdd.getNumPartitions < parts) lv.repartition(parts, col("id"))
      else lv
    spread.write.mode("overwrite").parquet(s"$path/levels")
    Seq((numPoints, opts.minZoom, opts.maxZoom, opts.radius, opts.extent,
      opts.minPoints, opts.insertionRanks, ranksAvailable))
      .toDF("num_points", "min_zoom", "max_zoom", "radius", "extent",
        "min_points", "insertion_ranks", "ranks_available")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def persist(): this.type = {
    cacheHandle.getOrElse(levels).persist(StorageLevel.MEMORY_AND_DISK); this
  }
  def unpersist(): this.type = {
    snapshots.clear(); snapshotRowsUsed.set(0L)
    cacheHandle.getOrElse(levels).unpersist(); this
  }
}

/** Rebuild-gating cache for one index kind (C1,
  * arrow-cluster-layer.ts:94-106 + comparator at :46-55): the reference
  * rebuilds when ANY cluster option changes, holding exactly one live index
  * per data source. Keyed per (session, dir) — concurrent sessions each
  * keep their own index instead of thrashing (and leaking) each other's —
  * with a hit requiring the full [[ClusterOptions]] to match: a caller
  * re-loading the same dir with, say, a different radius gets a fresh
  * build, and the superseded index's persisted levels are freed instead of
  * leaking. Entries of stopped sessions are dropped on every access.
  * Synchronized so concurrent first queries build once instead of racing
  * two expensive builds.
  */
private[graft] final class IndexCache {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (ClusterOptions, ClusterIndex)]

  def get(spark: SparkSession, dir: String, opts: ClusterOptions)(
      load: => ClusterIndex): ClusterIndex = synchronized {
    cache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    cache.get((spark, dir)) match {
      case Some((o, idx)) if o == opts && !spark.sparkContext.isStopped =>
        idx
      case prev =>
        prev.foreach { case (_, idx) =>
          if (!spark.sparkContext.isStopped) idx.unpersist()
        }
        val idx = load
        cache.put((spark, dir), (opts, idx))
        idx
    }
  }
}

object ClusterEngine {

  /** Build the hierarchy (reference `load`, SURVEY §3.1).
    *
    * @param points    any DataFrame with lng/lat columns
    * @param lngCol    longitude column name
    * @param latCol    latitude column name
    * @param idCol     stable row-id column (None → assigned by input order,
    *                  which in exact mode is the sorted single partition)
    * @param filterMask P3: predicate applied before indexing — by
    *                  construction `load(df, mask=p)` ≡ `load(df.where(p))`
    */
  def load(
      points: DataFrame,
      opts: ClusterOptions = ClusterOptions(),
      lngCol: String = "lng",
      latCol: String = "lat",
      idCol: Option[String] = None,
      filterMask: Option[Column] = None): ClusterIndex = {
    val spark = points.sparkSession
    import spark.implicits._

    val masked = filterMask.fold(points)(points.where(_))
    val lng = col(lngCol)
    val lat = col(latCol)
    // P2: null/NaN geometry silently excluded (arrow-cluster-engine.ts:84-91)
    val clean = masked
      .where(lng.isNotNull && lat.isNotNull && !isnan(lng) && !isnan(lat))
    val withId = idCol match {
      case Some(c) => clean.select(col(c).cast("long").as("row_id"),
        lng.cast("double").as("lng"), lat.cast("double").as("lat"))
      case None => clean.select(lng.cast("double").as("lng"), lat.cast("double").as("lat"))
        .coalesce(1)
        .withColumn("row_id", monotonically_increasing_id())
        .select($"row_id", $"lng", $"lat")
    }
    // Exact mode: one sorted partition → the greedy pass runs as a single
    // executor task; results are independent of upstream partitioning.
    val single = withId.as[(Long, Double, Double)]
      .repartition(1)
      .sortWithinPartitions($"row_id")
    val levels = single.mapPartitions { it =>
      val pts = it.toArray
      GreedyCore.buildLevels(pts, opts)
    }
    val cached = levels.persist(StorageLevel.MEMORY_AND_DISK)
    val total = cached.filter(col("zoom") === opts.maxZoom + 1).count()
    new ClusterIndex(cached, total, opts, ranksAvailable = opts.insertionRanks)
  }

  /** Reload an index persisted by [[ClusterIndex.save]]: the levels read
    * back as an ordinary parquet scan (pruned + predicate-pushed like any
    * other), metadata reconstructs the exact [[ClusterOptions]], and every
    * query surface works unchanged. No rebuild, no source data needed —
    * the deployment shape for serving a hierarchy that was expensive to
    * build (IndexPersistenceSpec proves scan/serve/navigation equality
    * with the original).
    */
  def loadIndex(spark: SparkSession, path: String): ClusterIndex = {
    import spark.implicits._
    val m = spark.read.parquet(s"$path/meta").collect()(0)
    val opts = ClusterOptions(
      minZoom = m.getAs[Int]("min_zoom"),
      maxZoom = m.getAs[Int]("max_zoom"),
      radius = m.getAs[Double]("radius"),
      extent = m.getAs[Double]("extent"),
      minPoints = m.getAs[Int]("min_points"),
      insertionRanks = m.getAs[Boolean]("insertion_ranks"))
    val levels = spark.read.parquet(s"$path/levels").as[LevelRow]
      .persist(StorageLevel.MEMORY_AND_DISK)
    new ClusterIndex(levels, m.getAs[Long]("num_points"), opts,
      ranksAvailable = m.getAs[Boolean]("ranks_available"))
  }

  /** The scale-mode build behind the SAME query surface: levels come from
    * [[GridHierarchy]] (shuffle-parallel, partition-count invariant), and
    * every ClusterIndex query — bbox scan, children, paginated leaves,
    * expansion zoom, descendants, materialization — works unchanged
    * because the level schema and the ID-space conventions (leaf ids <
    * totalPoints; cluster low bits = creationZoom+1) are shared.
    */
  def loadDistributed(
      points: DataFrame,
      opts: ClusterOptions = ClusterOptions(),
      lngCol: String = "lng",
      latCol: String = "lat",
      idCol: String = "row_id"): ClusterIndex = {
    val spark = points.sparkSession
    import spark.implicits._
    // MortonHierarchy ≡ GridHierarchy bit-for-bit (MortonHierarchySpec),
    // in ONE range shuffle instead of one shuffle per level
    val (levelsDf, cacheHandle) =
      MortonHierarchy.buildCached(points, opts, lngCol, latCol, idCol)
    val levels = levelsDf.as[LevelRow]
    val total = levels.filter($"zoom" === opts.maxZoom + 1).count()
    // grid mode always stamps child_rank (= id: its documented child order)
    new ClusterIndex(levels, total, opts, ranksAvailable = true,
      cacheHandle = Some(cacheHandle))
  }
}

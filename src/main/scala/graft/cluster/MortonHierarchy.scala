package graft.cluster

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.geo.Mercator

/** The grid hierarchy ([[GridHierarchy]] semantics, bit-for-bit) in ONE
  * range shuffle instead of one shuffle per zoom level.
  *
  * Why it is possible: positions are f32-quantized at every level, and a
  * fused cell's frounded centroid can never leave its cell (the weighted
  * mean of members lies in [min, max] of the members, both endpoints are
  * f32 fixed points of fround, and floor(x/r) is monotone), so a record's
  * cell at EVERY coarser zoom is the dyadic prefix of its finest-zoom cell
  * — `cell(z) = cell(maxZoom) >> (maxZoom - z)` exactly, by nested integer
  * floor division. Morton-ordering the finest cells therefore makes every
  * cell of every level a CONTIGUOUS run, and the whole 17-level fold
  * becomes a segmented reduction over one sorted scan:
  *
  *   1. project + finest-cell + Morton code (pure map);
  *   2. `repartitionByRange(morton)` + in-partition sort — the ONLY
  *      shuffle, O(total) once instead of O(total) per level;
  *   3. one `mapPartitions` folds all levels sequentially inside each
  *      partition, emitting every level's stamped rows as it goes —
  *      exactly the per-level arithmetic of [[GridHierarchy]] (same sums,
  *      same fround, same ids), just executed on Morton-contiguous runs;
  *   4. cells that touch a partition's first or last Morton code may
  *      continue in a neighbouring partition, so their resolution defers
  *      to a driver merge: ≤ 2 open cells per partition per level, each
  *      shipping either its ≤ 4 child records or (finest level, or any
  *      level where ≥ 2 local members already guarantee fusion) partial
  *      sums — O(partitions × levels) rows total, independent of data
  *      size. The driver replays the identical fold arithmetic on them.
  *
  * 100 TB posture: the per-level formulation shuffles the corpus ~17
  * times (the fine levels barely shrink on sparse data); this shuffles it
  * once and streams each partition in Morton order, with constant-size
  * boundary state per partition — the same plan shape at any scale.
  * Determinism: every sum folds in (morton, id) order, so the build is
  * partition-count invariant by construction (the per-level build relies
  * on fround absorbing shuffle-order noise; here the order is fixed).
  */
object MortonHierarchy {

  /** One record of the fold (any level): position, identity, mass, and its
    * finest-level cell (whose prefixes are its cells at every zoom).
    */
  // NOT `private`: janino-generated UnsafeProjection code instantiates and
  // reads these from outside the object; `private` forces every projection
  // of the build to fall back to interpreted mode (a per-row throughput tax
  // on the 100× path). MortonHierarchySpec pins codegen with a log guard.
  final case class Rec(
      id: Long, mx: Double, my: Double, lng: Double, lat: Double,
      cnt: Long, isCluster: Boolean, fcx: Long, fcy: Long)

  /** mapPartitions output — a union row: emitted level rows (kind 0),
    * driver-deferred member records of open cells (kind 1), and partial
    * sums of open cells whose fusion is already certain (kind 2).
    */
  final case class Out(
      kind: Int,
      zoom: Int, mx: Double, my: Double, id: Long, parent_id: Long,
      point_count: Long, is_cluster: Boolean, lng: Double, lat: Double,
      child_rank: Long,
      z: Int, ccx: Long, ccy: Long,
      pn: Long, pswx: Double, pswy: Double,
      ord: Long)

  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    (x | (x << 1)) & 0x5555555555555555L
  }
  private def morton(cx: Long, cy: Long): Long = spread(cx) | (spread(cy) << 1)

  /** Same output contract as [[GridHierarchy.build]]: the persisted union
    * of all level tables (zoom maxZoom+1 … minZoom), LevelRow schema.
    */
  def build(
      points: DataFrame,
      opts: ClusterOptions = ClusterOptions(),
      lngCol: String = "lng",
      latCol: String = "lat",
      idCol: String = "row_id"): DataFrame = {
    require(opts.minPoints <= 2,
      "MortonHierarchy fuses any multi-member cell; minPoints > 2 needs ClusterEngine")
    val maxCellsPerAxis =
      math.ceil(opts.extent * math.pow(2.0, opts.maxZoom.toDouble) / opts.radius).toLong
    require(maxCellsPerAxis < (1L << 27),
      s"cell-ID packing holds ${1L << 27} cells per axis but " +
        s"maxZoom=${opts.maxZoom} radius=${opts.radius} extent=${opts.extent} " +
        s"needs $maxCellsPerAxis — lower maxZoom (<= 23 at defaults) or use ClusterEngine")
    val spark = points.sparkSession
    import spark.implicits._

    val lat = col(latCol)
    val lng = {
      val d = col(lngCol).cast("double")
      d - lit(360.0) * floor((d + lit(180.0)) / lit(360.0))
    }
    val totalPoints = points.count()
    val minZoom = opts.minZoom
    val maxZoom = opts.maxZoom
    val rFinest = opts.radius / (opts.extent * math.pow(2.0, maxZoom.toDouble))

    // pure map: clean → project → finest cell → Morton. The spread is the
    // same bit-fold as the Scala `morton` above, so Spark's range sort and
    // the in-partition fold agree on the order.
    def spreadCol(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      var x = v.bitwiseAND(lit(0xffffffffL))
      x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
      x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
      x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
      x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
      (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    }
    val base = points
      .where(lng.isNotNull && lat.isNotNull && !isnan(lng) && !isnan(lat))
      .select(
        col(idCol).cast("long").as("id"),
        Mercator.froundCol(Mercator.lngXCol(lng)).as("mx"),
        Mercator.froundCol(Mercator.latYCol(lat.cast("double"))).as("my"),
        lng.as("lng"),
        lat.cast("double").as("lat"))
      .withColumn("fcx", floor(col("mx") / rFinest).cast("long"))
      .withColumn("fcy", floor(col("my") / rFinest).cast("long"))
      .withColumn("_m", spreadCol(col("fcx")).bitwiseOR(shiftleft(spreadCol(col("fcy")), 1)))
      .repartitionByRange(col("_m"), col("id"))
      .sortWithinPartitions(col("_m"), col("id"))

    def cellId(z: Int, cx: Long, cy: Long): Long =
      (((cx << 27) | (cy & ((1L << 27) - 1))) << 5 | (z + 1).toLong) + totalPoints

    val folded: Dataset[Out] = base
      .select(col("id"), col("mx"), col("my"), col("lng"), col("lat"), col("fcx"), col("fcy"))
      .as[(Long, Double, Double, Double, Double, Long, Long)]
      .mapPartitions { it =>
        val recs0 = new ArrayBuffer[Rec]()
        it.foreach { case (id, mx, my, lg, lt, fcx, fcy) =>
          recs0 += Rec(id, mx, my, lg, lt, 1L, isCluster = false, fcx, fcy)
        }
        if (recs0.isEmpty) Iterator.empty
        else {
          // a cell is OPEN (may continue in a neighbour) iff it contains
          // the partition's first or last finest Morton code — fixed per
          // partition, valid at every level by prefix nesting
          val loFcx = recs0.head.fcx; val loFcy = recs0.head.fcy
          val hiFcx = recs0.last.fcx; val hiFcy = recs0.last.fcy

          var cur = recs0
          val levelIter = (maxZoom to minZoom by -1).iterator.flatMap { z =>
            val out = new ArrayBuffer[Out]()
            val shift = maxZoom - z
            val openLo = (loFcx >> shift, loFcy >> shift)
            val openHi = (hiFcx >> shift, hiFcy >> shift)
            val next = new ArrayBuffer[Rec](cur.length)
            var i = 0
            val n = cur.length
            while (i < n) {
              val ccx = cur(i).fcx >> shift
              val ccy = cur(i).fcy >> shift
              var j = i
              while (j < n && (cur(j).fcx >> shift) == ccx && (cur(j).fcy >> shift) == ccy) j += 1
              val m = j - i
              val open = (ccx, ccy) == openLo || (ccx, ccy) == openHi
              if (!open) {
                if (m >= 2) {
                  val cid = cellId(z, ccx, ccy)
                  var cnt = 0L; var swx = 0.0; var swy = 0.0
                  var k = i
                  while (k < j) {
                    val r = cur(k)
                    out += Out(0, z + 1, r.mx, r.my, r.id, cid, r.cnt, r.isCluster,
                      r.lng, r.lat, r.id, 0, 0L, 0L, 0L, 0.0, 0.0, 0L)
                    cnt += r.cnt; swx += r.mx * r.cnt; swy += r.my * r.cnt
                    k += 1
                  }
                  val cmx = Mercator.fround(swx / cnt)
                  val cmy = Mercator.fround(swy / cnt)
                  next += Rec(cid, cmx, cmy, Mercator.xLng(cmx), Mercator.yLat(cmy),
                    cnt, isCluster = true, cur(i).fcx, cur(i).fcy)
                } else {
                  val r = cur(i)
                  out += Out(0, z + 1, r.mx, r.my, r.id, -1L, r.cnt, r.isCluster,
                    r.lng, r.lat, -1L, 0, 0L, 0L, 0L, 0.0, 0.0, 0L)
                  next += r
                }
              } else {
                // open cell: fate decided at the driver merge. With >= 2
                // local members fusion is already certain — emit their
                // stamped rows here and ship partial sums; a single local
                // member defers entirely (its stamp depends on the global
                // member count).
                if (m >= 2) {
                  val cid = cellId(z, ccx, ccy)
                  var cnt = 0L; var swx = 0.0; var swy = 0.0
                  var k = i
                  while (k < j) {
                    val r = cur(k)
                    out += Out(0, z + 1, r.mx, r.my, r.id, cid, r.cnt, r.isCluster,
                      r.lng, r.lat, r.id, 0, 0L, 0L, 0L, 0.0, 0.0, 0L)
                    cnt += r.cnt; swx += r.mx * r.cnt; swy += r.my * r.cnt
                    k += 1
                  }
                  out += Out(2, 0, 0.0, 0.0, 0L, 0L, cnt, false, 0.0, 0.0, 0L,
                    z, ccx, ccy, m.toLong, swx, swy, morton(cur(i).fcx, cur(i).fcy))
                } else {
                  val r = cur(i)
                  out += Out(1, 0, r.mx, r.my, r.id, 0L, r.cnt, r.isCluster,
                    r.lng, r.lat, 0L, z, ccx, ccy, 0L, 0.0, 0.0,
                    morton(r.fcx, r.fcy))
                }
                // the open cell's record (if any) is driver-owned from here
              }
              i = j
            }
            cur = next
            out.iterator
          }
          // final level: survivors of the minZoom pass
          val tail = () => cur.iterator.map(r =>
            Out(0, minZoom, r.mx, r.my, r.id, -1L, r.cnt, r.isCluster,
              r.lng, r.lat, -1L, 0, 0L, 0L, 0L, 0.0, 0.0, 0L))
          levelIter ++ tail()
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    folded.count()

    // ── driver merge of the open-cell boundary state ─────────────────────
    final case class DRec(id: Long, mx: Double, my: Double, lng: Double,
      lat: Double, cnt: Long, isCluster: Boolean, ord: Long)
    val packets = folded.filter(col("kind") > 0).collect()
    val emitted = new ArrayBuffer[LevelRow]()
    // records resolved at the previous (deeper) pass, keyed by their cell
    // at the CURRENT level — a parent cell can receive up to 4 of them
    var carried = Map.empty[(Long, Long), Seq[DRec]]
    var z = maxZoom
    while (z >= minZoom) {
      val here = packets.filter(_.z == z)
      val keys = here.map(o => (o.ccx, o.ccy)).toSet ++ carried.keySet
      val nextCarried = scala.collection.mutable.Map.empty[(Long, Long), List[DRec]]
      keys.toSeq.sorted.foreach { key =>
        val (ccx, ccy) = key
        val members = here.filter(o => o.kind == 1 && (o.ccx, o.ccy) == key)
          .map(o => DRec(o.id, o.mx, o.my, o.lng, o.lat, o.point_count, o.is_cluster, o.ord))
          .toBuffer ++ carried.getOrElse(key, Seq.empty)
        val partials = here.filter(o => o.kind == 2 && (o.ccx, o.ccy) == key)
        val mTotal = members.size + partials.map(_.pn).sum
        val resolved: DRec =
          if (mTotal >= 2) {
            val cid = cellId(z, ccx, ccy)
            // fold in morton order — members and partials interleaved by ord
            val contributions: Seq[Either[DRec, Out]] =
              (members.map(m => (m.ord, Left(m): Either[DRec, Out])) ++
                partials.map(p => (p.ord, Right(p): Either[DRec, Out])))
                .sortBy(_._1).map(_._2).toSeq
            var cnt = 0L; var swx = 0.0; var swy = 0.0
            contributions.foreach {
              case Left(m) =>
                emitted += LevelRow(z + 1, m.mx, m.my, m.id, cid, m.cnt,
                  m.isCluster, m.lng, m.lat, m.id)
                cnt += m.cnt; swx += m.mx * m.cnt; swy += m.my * m.cnt
              case Right(p) =>
                cnt += p.point_count; swx += p.pswx; swy += p.pswy
            }
            val cmx = Mercator.fround(swx / cnt)
            val cmy = Mercator.fround(swy / cnt)
            // the resolved record's ord is the MIN finest-scale ord of all
            // contributions (member ords and partial ords are both finest-
            // cell mortons), so shallower-level folds interleave in true
            // Morton order no matter where partition boundaries fell — a
            // cell-scale morton(ccx,ccy) or a packets-then-carried
            // headOption would be incomparable with finest-scale ords and
            // leave the fold order partitioning-dependent
            DRec(cid, cmx, cmy, Mercator.xLng(cmx), Mercator.yLat(cmy),
              cnt, isCluster = true,
              (members.map(_.ord) ++ partials.map(_.ord)).min)
          } else {
            val m = members.head // mTotal == 1 ⇒ exactly one member, no partials
            emitted += LevelRow(z + 1, m.mx, m.my, m.id, -1L, m.cnt,
              m.isCluster, m.lng, m.lat, -1L)
            m
          }
        val pkey = (ccx >> 1, ccy >> 1)
        nextCarried(pkey) = nextCarried.getOrElse(pkey, Nil) :+ resolved
      }
      carried = nextCarried.toMap.map { case (k, v) => k -> (v: Seq[DRec]) }
      z -= 1
    }
    carried.toSeq.sortBy(_._1).foreach { case (_, rs) =>
      rs.foreach { r =>
        emitted += LevelRow(minZoom, r.mx, r.my, r.id, -1L, r.cnt, r.isCluster,
          r.lng, r.lat, -1L)
      }
    }

    val levelCols = Seq("zoom", "mx", "my", "id", "parent_id", "point_count",
      "is_cluster", "lng", "lat", "child_rank")
    val all = folded.filter(col("kind") === 0)
      .select(levelCols.map(col): _*)
      .unionByName(spark.createDataFrame(emitted.toSeq).select(levelCols.map(col): _*))
      .persist(StorageLevel.MEMORY_AND_DISK)
    all.count()
    folded.unpersist()
    all
  }
}

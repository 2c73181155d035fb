package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{GraftQuery, Tables}
import graft.cluster.{ClusterEngine, ClusterIndex, ClusterOptions, IncrementalGrid, MortonHierarchy}
import graft.geo.Mercator
import graft.style.Style

/** Spatial operator surface for the driver contract.
  *
  * The testdata has no geo table, so a deterministic synthetic point cloud is
  * derived from `events` with pure integer/double arithmetic — bit-identical
  * in Spark and DuckDB, which makes the projection pipeline (P5-P9)
  * oracle-checkable. Transcendental outputs (ln/sin/atan) are f32-quantized
  * at the boundary (the reference's own precision contract, SURVEY §1.3) so
  * libm-vs-JVM 1-ulp differences cannot flip a comparison.
  *
  * Greedy hierarchy queries (A1/A2) have no SQL equivalent → rows-only
  * checks here; their correctness gate is the invariant + metamorphic suite
  * in ClusterEngineSpec.
  */
object Spatial {

  def all: Seq[GraftQuery] = Seq(
    mercatorProject, gridCluster, styleColumns, greedyHierarchy, hierarchyLevels,
    clusterChildren, clusterLeaves, hierarchyNavigation, materializedLeaves,
    geoParquetRoundtrip, gridHierarchyProfile, gridMinPointsProfile,
    distChildren, distLeaves, distNavigation, distMaterialize,
    arrowIpcRoundtrip, zorderProfile, indexRoundtrip, incrementalMergeProfile,
    storeMergeProfile)

  /** The hierarchy is built once per (data dir, session, options) and shared
    * by every query on it (the reference's engine-rebuild gating, C1 — build
    * cost is paid once, queries are pruned scans of the persisted level
    * table; ANY option change triggers a rebuild and frees the old index,
    * see [[graft.cluster.IndexCache]]).
    */
  private val indexCache = new graft.cluster.IndexCache

  private def index(spark: SparkSession, dir: String): ClusterIndex = {
    val opts = ClusterOptions()
    indexCache.get(spark, dir, opts)(
      ClusterEngine.load(
        pointsDf(spark, dir), opts, idCol = Some("event_id")).persist())
  }

  /** Largest cluster at `zoom` — a deterministic probe target for the
    * navigation queries (ties broken by id).
    */
  private def largestClusterId(idx: ClusterIndex, zoom: Int): Long =
    idx.getClusters((-180.0, -85.0, 180.0, 85.0), zoom)
      .where(col("is_cluster"))
      .orderBy(desc("point_count"), col("id"))
      .limit(1).collect()(0).getLong(0)

  /** The distributed (GridHierarchy) build behind the same ClusterIndex
    * surface — the 100 TB navigation path, shared across q44 + q55-q58.
    */
  private val distIndexCache = new graft.cluster.IndexCache
  private def distIndex(spark: SparkSession, dir: String): ClusterIndex = {
    val opts = ClusterOptions()
    distIndexCache.get(spark, dir, opts)(
      ClusterEngine.loadDistributed(
        pointsDf(spark, dir), opts, idCol = "event_id"))
  }

  /** Largest cluster CREATED at pass z (origin level z+1) on the distributed
    * build — restricting to that pass makes the probe expressible in the
    * DuckDB level fold (its children all live in lvl(z+1)).
    */
  private def largestDistClusterAt(idx: ClusterIndex, z: Int): Long = {
    val tot = idx.numPoints
    idx.level(z).toDF()
      .where(col("is_cluster") && col("id") >= tot &&
        ((col("id") - tot) % 32) === (z + 1))
      .orderBy(desc("point_count"), col("id"))
      .limit(1).collect()(0).getLong(3)
  }

  /** Shared synthetic point cloud: lng/lat as exact centesimal grids. */
  private[graft] def pointsDf(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      ((col("event_id") % 36000) / 100.0 - 180.0).as("lng"),
      (((col("user_id") * 9973 + col("event_id")) % 17000) / 100.0 - 85.0).as("lat"))

  private[graft] val pointsSql =
    """SELECT event_id,
      |  (event_id % 36000) / 100.0 - 180.0 AS lng,
      |  ((user_id * 9973 + event_id) % 17000) / 100.0 - 85.0 AS lat
      |FROM events""".stripMargin

  private def projected(spark: SparkSession, dir: String): DataFrame =
    pointsDf(spark, dir).select(
      col("event_id"), col("lng"), col("lat"),
      Mercator.froundCol(Mercator.lngXCol(col("lng"))).as("mx"),
      Mercator.froundCol(Mercator.latYCol(col("lat"))).as("my"))

  private val projectedSql =
    s"""SELECT event_id, lng, lat,
       |  CAST(CAST(lng / 360.0 + 0.5 AS REAL) AS DOUBLE) AS mx,
       |  CAST(CAST(
       |    LEAST(GREATEST(
       |      0.5 - 0.25 * LN((1.0 + SIN(RADIANS(lat))) / (1.0 - SIN(RADIANS(lat)))) / PI(),
       |      0.0), 1.0)
       |  AS REAL) AS DOUBLE) AS my
       |FROM ($pointsSql)""".stripMargin

  /** P5/P6/P9: web-mercator projection with f32 quantization. */
  val mercatorProject: GraftQuery = GraftQuery.sql(
    "q15_mercator_project",
    s"""SELECT * FROM ($projectedSql) ORDER BY event_id""".stripMargin) { (spark, dir) =>
    projected(spark, dir).orderBy("event_id")
  }

  // zoom-6 grid cell size: radius/(extent·2^z) = 40/(512·64), exactly 5/4096
  private val CellZ6 = 40.0 / (512.0 * 64.0)

  /** Scale-path clustering: grid-binned aggregation (the declarative,
    * shuffle-parallel variant of A1 — semantics differ from greedy by
    * design; this is the one that survives 100 TB). Weighted centroids are
    * decimal-exact for oracle parity.
    */
  val gridCluster: GraftQuery = GraftQuery.sql(
    "q16_grid_cluster",
    s"""SELECT CAST(FLOOR(mx / $CellZ6) AS BIGINT) AS cell_x,
       |  CAST(FLOOR(my / $CellZ6) AS BIGINT) AS cell_y,
       |  COUNT(*) AS point_count,
       |  CAST(SUM(CAST(lng AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS centroid_lng,
       |  CAST(SUM(CAST(lat AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS centroid_lat
       |FROM ($projectedSql)
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    projected(spark, dir)
      .groupBy(
        floor(col("mx") / CellZ6).cast("long").as("cell_x"),
        floor(col("my") / CellZ6).cast("long").as("cell_y"))
      .agg(
        count(lit(1)).as("point_count"),
        (sum(col("lng").cast(DecimalType(12, 2))).cast("double") / count(lit(1))).as("centroid_lng"),
        (sum(col("lat").cast(DecimalType(12, 2))).cast("double") / count(lit(1))).as("centroid_lat"))
      .orderBy("cell_x", "cell_y")
  }

  /** D1-D5 styling columns over grid clusters (log radius f32-quantized;
    * fill/text colors CSV-encoded so the harness hashes scalar columns).
    * The priority CASE (D1) and the WCAG-luminance text choice (D3) are
    * mirrored formula-for-formula in the oracle — pow() 1-ulp noise cannot
    * flip the > 0.5 branch because the three candidate luminances are far
    * from the threshold.
    */
  val styleColumns: GraftQuery = GraftQuery.sql(
    "q17_style_columns",
    s"""WITH grid AS (
       |  SELECT CAST(FLOOR(mx / $CellZ6) AS BIGINT) AS cell_x,
       |    CAST(FLOOR(my / $CellZ6) AS BIGINT) AS cell_y,
       |    COUNT(*) AS point_count
       |  FROM ($projectedSql) GROUP BY 1, 2
       |), tot AS (SELECT COUNT(*) AS total FROM events),
       |f AS (
       |  SELECT cell_x, cell_y, point_count,
       |    CASE WHEN point_count >= 3 THEN 255 WHEN point_count >= 2 THEN 0 ELSE 230 END AS fr,
       |    CASE WHEN point_count >= 3 THEN 140 WHEN point_count >= 2 THEN 180 ELSE 230 END AS fg,
       |    CASE WHEN point_count >= 3 THEN 0 WHEN point_count >= 2 THEN 255 ELSE 230 END AS fb,
       |    CASE WHEN point_count >= 3 THEN 255 WHEN point_count >= 2 THEN 255 ELSE 200 END AS fa
       |  FROM grid
       |)
       |SELECT cell_x, cell_y, point_count,
       |  CAST(CAST(4.0 + LN(point_count + 1.0) / LN(total + 1.0) * 50.0 AS REAL) AS DOUBLE) AS radius,
       |  CASE WHEN point_count > 1 THEN CAST(point_count AS VARCHAR) END AS label,
       |  point_count > 1 AS is_cluster,
       |  CONCAT(fr, ',', fg, ',', fb, ',', fa) AS fill_color,
       |  CASE WHEN
       |      0.2126 * (CASE WHEN fr/255.0 <= 0.03928 THEN fr/255.0/12.92 ELSE POWER((fr/255.0+0.055)/1.055, 2.4) END)
       |    + 0.7152 * (CASE WHEN fg/255.0 <= 0.03928 THEN fg/255.0/12.92 ELSE POWER((fg/255.0+0.055)/1.055, 2.4) END)
       |    + 0.0722 * (CASE WHEN fb/255.0 <= 0.03928 THEN fb/255.0/12.92 ELSE POWER((fb/255.0+0.055)/1.055, 2.4) END)
       |    > 0.5 THEN '0,0,0,255' ELSE '255,255,255,255' END AS text_color
       |FROM f, tot
       |ORDER BY cell_x, cell_y""".stripMargin) { (spark, dir) =>
    val grid = projected(spark, dir)
      .groupBy(
        floor(col("mx") / CellZ6).cast("long").as("cell_x"),
        floor(col("my") / CellZ6).cast("long").as("cell_y"))
      .agg(count(lit(1)).as("point_count"))
    val tot = Tables.events(spark, dir).agg(count(lit(1)).as("total"))
    val isCluster = col("point_count") > 1
    // D1 priority CASE driven by cluster size (selected > focused > primary);
    // light primary so BOTH text-color branches are exercised
    val fill = Style.fillColorWhen(
      col("point_count") >= 3, col("point_count") >= 2,
      primary = (230, 230, 230, 200))
    grid.join(broadcast(tot))
      .select(
        col("cell_x"), col("cell_y"), col("point_count"),
        Mercator.froundCol(
          lit(4.0) + log(col("point_count") + 1.0) / log(col("total") + 1.0) * 50.0)
          .as("radius"),
        Style.labelText(isCluster, col("point_count")).as("label"),
        isCluster.as("is_cluster"),
        concat_ws(",", fill.cast("array<string>")).as("fill_color"),
        concat_ws(",", Style.textColor(fill).cast("array<string>")).as("text_color"))
      .orderBy("cell_x", "cell_y")
  }

  /** The exact-build navigation oracles (q18/q19/q31–q34): the DuckDB side
    * reads EXPECTED rows committed under `src/test/resources/nav_sf001/`,
    * generated by `tools/nav_expected.mjs` — the same INDEPENDENT
    * published-algorithm implementation (tools/supercluster_core.mjs) whose
    * 500-point output the golden differential locks bit-exactly, run on the
    * sf0.01 events points. The greedy build is sequential and therefore not
    * SQL-expressible, so an independent reimplementation IS the strongest
    * available oracle; committing its output makes the driver's hash gate
    * exact. Probes project mercator `my` instead of `lat`: every op behind
    * id/count/lng/mx/my is IEEE-exact (bit-identical across JS/JVM/DuckDB),
    * while `lat`'s inverse projection (atan∘exp) wobbles by 1 ULP between
    * math libraries — the golden differential still verifies lat/lng to
    * 1e-7 on the locked fixture, and q32/q34 emit exact ORIGINAL lat/lng
    * re-derived by the oracle from the events table itself. NOTE: the
    * expected files encode the sf0.01 fixture — a testdata regeneration
    * requires re-running nav_expected.mjs (command in its header).
    */
  private val navExpectedDir = "/root/repo/src/test/resources/nav_sf001"

  /** A1/A2 exact greedy hierarchy + Q1 world query at z4: full level-4
    * contents, id/count/flag plus bit-exact lng + mercator my.
    */
  val greedyHierarchy: GraftQuery = GraftQuery.sql(
    "q18_greedy_hierarchy",
    s"""SELECT id, lng, my, point_count, is_cluster
       |FROM read_csv('$navExpectedDir/q18_expected.csv', header=true, columns={
       |  'id':'BIGINT','lng':'DOUBLE','my':'DOUBLE','point_count':'BIGINT','is_cluster':'BOOLEAN'})
       |ORDER BY id""".stripMargin) { (spark, dir) =>
    index(spark, dir).getClusters((-180.0, -85.0, 180.0, 85.0), 4)
      .select(col("id"), col("lng"), col("my"), col("point_count"), col("is_cluster"))
      .orderBy("id")
  }

  /** Q3: direct children of the largest z3 cluster. */
  val clusterChildren: GraftQuery = GraftQuery.sql(
    "q31_cluster_children",
    s"""SELECT id, parent_id, point_count, is_cluster, lng, my
       |FROM read_csv('$navExpectedDir/q31_expected.csv', header=true, columns={
       |  'id':'BIGINT','parent_id':'BIGINT','point_count':'BIGINT',
       |  'is_cluster':'BOOLEAN','lng':'DOUBLE','my':'DOUBLE'})
       |ORDER BY id""".stripMargin) { (spark, dir) =>
    val idx = index(spark, dir)
    idx.getChildren(largestClusterId(idx, 3))
      .select(col("id"), col("parent_id"), col("point_count"), col("is_cluster"),
        col("lng"), col("my"))
      .orderBy("id")
  }

  /** Q4: paginated leaves of the largest z3 cluster (limit 25, offset 5).
    * Leaf rows carry the ORIGINAL source coords, so the oracle re-derives
    * lng/lat exactly from the events table; only the page's ids are
    * committed.
    */
  val clusterLeaves: GraftQuery = GraftQuery.sql(
    "q32_cluster_leaves",
    s"""WITH exp AS (
       |  SELECT row_id FROM read_csv('$navExpectedDir/q32_expected.csv',
       |    header=true, columns={'row_id':'BIGINT'})
       |), pts AS ($pointsSql)
       |SELECT e.row_id, p.lng, p.lat, CAST(1 AS BIGINT) AS point_count
       |FROM exp e JOIN pts p ON p.event_id = e.row_id
       |ORDER BY e.row_id""".stripMargin) { (spark, dir) =>
    val idx = index(spark, dir)
    idx.getLeaves(largestClusterId(idx, 3), limit = 25, offset = 5)
  }

  /** Q5 + Q8: expansion zoom and descendant-closure size for the 5 largest
    * z2 clusters (driver-side loops bounded by the zoom-level count).
    * All-integer output — the committed expected rows ARE the oracle.
    */
  val hierarchyNavigation: GraftQuery = GraftQuery.sql(
    "q33_hierarchy_nav",
    s"""SELECT cluster_id, point_count, expansion_zoom, n_descendants
       |FROM read_csv('$navExpectedDir/q33_expected.csv', header=true, columns={
       |  'cluster_id':'BIGINT','point_count':'BIGINT',
       |  'expansion_zoom':'INTEGER','n_descendants':'BIGINT'})
       |ORDER BY cluster_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val idx = index(spark, dir)
    val tops = idx.getClusters((-180.0, -85.0, 180.0, 85.0), 2)
      .where(col("is_cluster"))
      .orderBy(desc("point_count"), col("id"))
      .limit(5).select(col("id"), col("point_count"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val counts = tops.toMap
    idx.navigationSummary(tops.map(_._1).toSeq)
      .map { case (cid, ez, nDesc) => (cid, counts(cid), ez, nDesc) }
      .toDF("cluster_id", "point_count", "expansion_zoom", "n_descendants")
      .orderBy("cluster_id")
  }

  /** S4: GeoParquet sink round-trip — write the point cloud as GeoParquet
    * (ZSTD + `geo` footer metadata), read it back, and report count + bbox
    * + the geo version actually parsed from the written footer. The oracle
    * recomputes count/bbox from the source, so a broken write or a missing
    * footer fails the compare.
    */
  val geoParquetRoundtrip: GraftQuery = GraftQuery.sql(
    "q42_geoparquet_roundtrip",
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(lng) AS min_lng, MIN(lat) AS min_lat,
       |  MAX(lng) AS max_lng, MAX(lat) AS max_lat,
       |  '1.1.0' AS geo_version
       |FROM ($pointsSql)""".stripMargin) { (spark, dir) =>
    // deterministic per-dataset scratch dir, overwritten each run — repeated
    // verify/bench invocations must not accumulate temp copies of the data
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_geo_rt_${math.abs(dir.hashCode)}/pts"
    val src = pointsDf(spark, dir)
      .select(col("event_id"), array(col("lng"), col("lat")).as("geometry"))
    graft.io.GeoParquet.write(src, out)
    val version = graft.io.GeoParquet.readGeoMetadata(spark, out)
      .flatMap("\"version\":\"([^\"]+)\"".r.findFirstMatchIn(_)).map(_.group(1))
    val g = col("geometry")
    spark.read.parquet(out).agg(
      count(lit(1)).as("n_rows"),
      min(element_at(g, 1)).as("min_lng"), min(element_at(g, 2)).as("min_lat"),
      max(element_at(g, 1)).as("max_lng"), max(element_at(g, 2)).as("max_lat"))
      .withColumn("geo_version", lit(version.orNull))
  }

  /** S2/S3: Arrow IPC stream sink + source round-trip — write the events
    * projection as multi-batch `.arrows` files, read them back, aggregate.
    * The oracle recomputes the aggregates from the source table, so a
    * lossy serialize/deserialize (dropped rows, mangled values) fails the
    * hash compare.
    */
  val arrowIpcRoundtrip: GraftQuery = GraftQuery.sql(
    "q59_arrow_ipc_roundtrip",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  CAST(MIN(event_id) AS BIGINT) AS min_id,
      |  CAST(MAX(event_id) AS BIGINT) AS max_id
      |FROM events""".stripMargin) { (spark, dir) =>
    // deterministic per-dataset scratch dir (ArrowIpc.write overwrites it)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ipc_rt_${math.abs(dir.hashCode)}"
    val src = Tables.events(spark, dir).select(col("event_id"), col("value"))
    graft.io.ArrowIpc.write(src, out)
    graft.io.ArrowIpc.read(spark, out).agg(
      count(lit(1)).as("n_rows"),
      sum(col("event_id")).cast("long").as("sum_id"),
      sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"),
      min(col("event_id")).cast("long").as("min_id"),
      max(col("event_id")).cast("long").as("max_id"))
  }

  /** Z-order layout math (storage-side bbox pruning, [[graft.io.ZOrder]]):
    * Morton codes + their coarse-bucket profile, bit-identical across
    * engines (pure integer shift/mask fold). The layout writer itself is
    * exercised in ZOrderSpec (disjoint per-file code ranges).
    */
  val zorderProfile: GraftQuery = GraftQuery.sql(
    "q61_zorder_profile",
    s"""WITH m AS (
       |  SELECT event_id, ${graft.io.ZOrder.mortonSql("mx", "my")} AS z
       |  FROM ($projectedSql)
       |)
       |SELECT z // 1048576 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(MIN(z) AS BIGINT) AS z_min,
       |  CAST(MAX(z) AS BIGINT) AS z_max,
       |  CAST(SUM(event_id) AS BIGINT) AS id_sum
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    projected(spark, dir)
      .select(col("event_id"),
        graft.io.ZOrder.mortonCol(col("mx"), col("my")).as("z"))
      .groupBy((col("z") / 1048576L).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("z")).as("z_min"),
        max(col("z")).as("z_max"),
        sum(col("event_id")).cast("long").as("id_sum"))
      .orderBy("bucket")
  }

  /** DuckDB mirror of [[graft.cluster.GridHierarchy]]: 17 chained
    * grid-snap aggregations, each level consuming the previous. The whole
    * DISTRIBUTED hierarchy build is oracle-checked level by level
    * (f32-quantized centroids make the fold engine- and
    * partitioning-independent).
    */
  /** Cell-id packing at pass z — THE one SQL mirror of
    * GridHierarchy.scala:92-93, shared by the level fold, the edge CTEs,
    * and the children probe so the three can never drift apart. Contains
    * literal `|` (bitwise OR): assembled via @PIPE@, never under an outer
    * stripMargin.
    */
  private def cellIdSqlAtPass(z: Int): String = {
    val r = 40.0 / (512.0 * math.pow(2.0, z.toDouble))
    s"""((CAST(FLOOR(mx / $r) AS BIGINT) << 27
       |      @PIPE@ (CAST(FLOOR(my / $r) AS BIGINT) & 134217727)) << 5
       |      @PIPE@ ${z + 1}) + (SELECT COUNT(*) FROM events)""".stripMargin
      .replace("@PIPE@", "|")
  }

  private def gridBaseCte: String =
    s"""lvl17 AS (
       |  SELECT event_id AS id,
       |    CAST(CAST(lng / 360.0 + 0.5 AS REAL) AS DOUBLE) AS mx,
       |    CAST(CAST(LEAST(GREATEST(
       |      0.5 - 0.25 * LN((1.0 + SIN(RADIANS(lat))) / (1.0 - SIN(RADIANS(lat)))) / PI(),
       |      0.0), 1.0) AS REAL) AS DOUBLE) AS my,
       |    CAST(1 AS BIGINT) AS point_count, FALSE AS is_cluster
       |  FROM ($pointsSql)
       |)""".stripMargin

  private def gridLevelCtes: Seq[String] = {
    val lvls = (16 to 0 by -1).map { z =>
      s"""lvl$z AS (
         |  SELECT
         |    CASE WHEN COUNT(*) >= 2 THEN cell_id ELSE MIN(id) END AS id,
         |    CASE WHEN COUNT(*) >= 2
         |      THEN CAST(CAST(SUM(mx * point_count) / SUM(point_count) AS REAL) AS DOUBLE)
         |      ELSE MIN(mx) END AS mx,
         |    CASE WHEN COUNT(*) >= 2
         |      THEN CAST(CAST(SUM(my * point_count) / SUM(point_count) AS REAL) AS DOUBLE)
         |      ELSE MIN(my) END AS my,
         |    CAST(SUM(point_count) AS BIGINT) AS point_count,
         |    CASE WHEN COUNT(*) >= 2 THEN TRUE
         |      ELSE CAST(MIN(CAST(is_cluster AS INT)) AS BOOLEAN) END AS is_cluster
         |  FROM (
         |    SELECT *, @CELLID@ AS cell_id
         |    FROM lvl${z + 1})
         |  GROUP BY cell_id
         |)""".stripMargin.replace("@CELLID@", cellIdSqlAtPass(z))
    }
    gridBaseCte +: lvls
  }

  /** The level fold with a minPoints fusion gate — the SQL mirror of
    * GridHierarchy's window formulation: a cell fuses iff it holds >= 2
    * member records AND their summed mass >= minPoints; otherwise EVERY
    * member passes through (the GROUP BY form of [[gridLevelCtes]] cannot
    * express per-member passthrough, the window form is exactly it).
    */
  private def gridLevelCtesMp(mp: Int): Seq[String] = {
    val lvls = (16 to 0 by -1).map { z =>
      s"""lvl$z AS (
         |  SELECT
         |    CASE WHEN _f THEN cell_id ELSE id END AS id,
         |    CASE WHEN _f THEN CAST(CAST(_swx / _scnt AS REAL) AS DOUBLE) ELSE mx END AS mx,
         |    CASE WHEN _f THEN CAST(CAST(_swy / _scnt AS REAL) AS DOUBLE) ELSE my END AS my,
         |    CAST(CASE WHEN _f THEN _scnt ELSE point_count END AS BIGINT) AS point_count,
         |    CASE WHEN _f THEN TRUE ELSE is_cluster END AS is_cluster
         |  FROM (
         |    SELECT *, (_n >= 2 AND _scnt >= $mp) AS _f
         |    FROM (
         |      SELECT *,
         |        COUNT(*) OVER w AS _n,
         |        SUM(point_count) OVER w AS _scnt,
         |        SUM(mx * point_count) OVER w AS _swx,
         |        SUM(my * point_count) OVER w AS _swy,
         |        ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY id) AS _rn
         |      FROM (SELECT *, @CELLID@ AS cell_id FROM lvl${z + 1})
         |      WINDOW w AS (PARTITION BY cell_id)
         |    )
         |  )
         |  WHERE (_f AND _rn = 1) OR NOT _f
         |)""".stripMargin.replace("@CELLID@", cellIdSqlAtPass(z))
    }
    gridBaseCte +: lvls
  }

  private def profileUnionSql: String =
    (17 to 0 by -1).map { z =>
      s"""SELECT $z AS zoom, CAST(COUNT(*) AS BIGINT) AS n_records,
         |  CAST(SUM(CASE WHEN is_cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_clusters,
         |  CAST(SUM(point_count) AS BIGINT) AS total_points,
         |  CAST(MAX(point_count) AS BIGINT) AS max_cluster_size,
         |  CAST(SUM(CAST(FLOOR(mx * 1048576.0) AS BIGINT)) AS BIGINT) AS mx_sum,
         |  CAST(SUM(CAST(FLOOR(my * 1048576.0) AS BIGINT)) AS BIGINT) AS my_sum
         |FROM lvl$z""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def gridProfileSql: String =
    s"WITH ${gridLevelCtes.mkString(",\n")}\n" +
      s"SELECT * FROM (\n$profileUnionSql\n) ORDER BY zoom"

  private def gridMpProfileSql: String =
    s"WITH ${gridLevelCtesMp(5).mkString(",\n")}\n" +
      s"SELECT * FROM (\n$profileUnionSql\n) ORDER BY zoom"

  /** DuckDB mirror of Q3-on-the-distributed-build: replay the level fold,
    * pick the largest cluster created at pass 3, and select the lvl4 rows
    * whose pass-3 cell id equals it (= its children).
    */
  private def distChildrenSql: String = {
    val tail =
      """l4c AS (
        |  SELECT *, @CELLID@ AS cid
        |  FROM lvl4
        |),
        |@TARGET@
        |SELECT l4c.id AS id, mx, my,
        |  CAST(point_count AS BIGINT) AS point_count, is_cluster
        |FROM l4c, target WHERE l4c.cid = target.id
        |ORDER BY id""".stripMargin
        .replace("@CELLID@", cellIdSqlAtPass(3))
        .replace("@TARGET@", distTargetCte)
    s"WITH ${gridLevelCtes.mkString(",\n")},\n" + tail
  }

  /** Q3 on the 100 TB path: direct children of the largest pass-3 cluster in
    * the DISTRIBUTED hierarchy, hash-matched against DuckDB replaying the
    * identical fold (f32-quantized centroids keep both engines bit-equal).
    */
  val distChildren: GraftQuery = GraftQuery.sql(
    "q55_dist_children", distChildrenSql) { (spark, dir) =>
    val idx = distIndex(spark, dir)
    idx.getChildren(largestDistClusterAt(idx, 3)).toDF()
      .select(col("id"), col("mx"), col("my"), col("point_count"), col("is_cluster"))
      .orderBy("id")
  }

  /** Parent-edge CTEs replaying [[graft.cluster.GridHierarchy]]'s merge
    * decisions in DuckDB: at pass z, a lvl(z+1) record's parent is its cell
    * id iff >= 2 records share the cell (the window-count QUALIFY mirrors
    * the fold's fuse test, GridHierarchy.scala:140-148). `edges` is the
    * union over all passes — the whole hierarchy's parent→child edge set,
    * which a recursive CTE can then walk for any subtree.
    */
  private def edgeCtes: Seq[String] = {
    val perPass = (16 to 0 by -1).map { z =>
      s"""edg$z AS (
         |  SELECT id AS child, is_cluster AS child_is_cluster,
         |    @CELLID@ AS parent
         |  FROM lvl${z + 1}
         |  QUALIFY COUNT(*) OVER (PARTITION BY parent) >= 2
         |)""".stripMargin.replace("@CELLID@", cellIdSqlAtPass(z))
    }
    perPass :+ ("edges AS (" +
      (16 to 0 by -1).map(z => s"SELECT * FROM edg$z").mkString(" UNION ALL ") + ")")
  }

  /** Shared oracle target: the same largest-pass-3 cluster
    * [[largestDistClusterAt]] probes on the Spark side.
    */
  private def distTargetCte: String = {
    val tot = "(SELECT COUNT(*) FROM events)"
    s"""target AS (
       |  SELECT id FROM lvl3
       |  WHERE is_cluster AND id >= $tot AND (id - $tot) % 32 = 4
       |  ORDER BY point_count DESC, id LIMIT 1
       |)""".stripMargin
  }

  /** Recursive closure of the target cluster's subtree over `edges` —
    * shared by the q56/q58 oracles.
    */
  private val subClosureCte =
    """sub(node) AS (
      |  SELECT id FROM target
      |  UNION
      |  SELECT e.child FROM sub s JOIN edges e ON e.parent = s.node
      |)""".stripMargin

  /** Q4 on the distributed build: paginated leaves of the largest pass-3
    * cluster, hash-matched against DuckDB replaying the fold, deriving the
    * parent edges, and walking the subtree with a recursive CTE. Leaves are
    * subtree nodes that join the source points (cluster ids exceed every
    * row id by construction); the page is the same ORDER BY id
    * OFFSET/LIMIT the Spark side plans as a distributed top-K.
    */
  private def distLeavesSql: String =
    s"WITH RECURSIVE ${(gridLevelCtes ++ edgeCtes).mkString(",\n")},\n" +
      distTargetCte + ",\n" + subClosureCte + "\n" +
      s"""SELECT s.node AS row_id, p.lng, p.lat, CAST(1 AS BIGINT) AS point_count
         |FROM sub s JOIN ($pointsSql) p ON p.event_id = s.node
         |ORDER BY row_id LIMIT 25 OFFSET 5""".stripMargin

  val distLeaves: GraftQuery = GraftQuery.sql(
    "q56_dist_leaves", distLeavesSql) { (spark, dir) =>
    val idx = distIndex(spark, dir)
    idx.getLeaves(largestDistClusterAt(idx, 3), limit = 25, offset = 5)
  }

  /** Q5 + Q8 on the distributed build: expansion zoom and descendant-closure
    * size for the 5 largest pass-2 clusters, oracle-checked end-to-end.
    * Expansion zoom: in the grid fold a cell fuses only with >= 2 members,
    * so every cluster has >= 2 children and the reference's expansion loop
    * (ClusterEngine.navigationSummary) always exits on its first step — at
    * the root's origin level, `(id - total) % 32`. The descendant-cluster
    * count is the recursive closure restricted to cluster children.
    */
  private def distNavSql: String = {
    val tot = "(SELECT COUNT(*) FROM events)"
    s"WITH RECURSIVE ${(gridLevelCtes ++ edgeCtes).mkString(",\n")},\n" +
      s"""tops AS (
         |  SELECT id, point_count FROM lvl2
         |  WHERE is_cluster AND id >= $tot AND (id - $tot) % 32 = 3
         |  ORDER BY point_count DESC, id LIMIT 5
         |),
         |nav(root, node, node_is_cluster) AS (
         |  SELECT id, id, FALSE FROM tops
         |  UNION
         |  SELECT n.root, e.child, e.child_is_cluster
         |  FROM nav n JOIN edges e ON e.parent = n.node
         |)
         |SELECT t.id AS cluster_id,
         |  CAST(t.point_count AS BIGINT) AS point_count,
         |  CAST((t.id - $tot) % 32 AS INT) AS expansion_zoom,
         |  CAST(SUM(CASE WHEN n.node_is_cluster THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_descendants
         |FROM nav n JOIN tops t ON t.id = n.root
         |GROUP BY t.id, t.point_count
         |ORDER BY cluster_id""".stripMargin
  }

  val distNavigation: GraftQuery = GraftQuery.sql(
    "q57_dist_nav", distNavSql) { (spark, dir) =>
    import spark.implicits._
    val idx = distIndex(spark, dir)
    val tot = idx.numPoints
    val tops = idx.level(2).toDF()
      .where(col("is_cluster") && col("id") >= tot && ((col("id") - tot) % 32) === 3)
      .orderBy(desc("point_count"), col("id"))
      .limit(5).select(col("id"), col("point_count"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val counts = tops.toMap
    idx.navigationSummary(tops.map(_._1).toSeq)
      .map { case (cid, ez, nDesc) => (cid, counts(cid), ez, nDesc) }
      .toDF("cluster_id", "point_count", "expansion_zoom", "n_descendants")
      .orderBy("cluster_id")
  }

  /** Q7 on the distributed build: the first 25 leaves (by id) of the same
    * target cluster joined back to the source rows — the oracle pages the
    * recursive closure identically, then re-reads lng/lat from the points.
    */
  private def distMaterializeSql: String =
    s"WITH RECURSIVE ${(gridLevelCtes ++ edgeCtes).mkString(",\n")},\n" +
      distTargetCte + ",\n" + subClosureCte + "\n" +
      s"""SELECT page.node AS event_id, p.lng, p.lat
         |FROM (
         |  SELECT s.node FROM sub s JOIN ($pointsSql) q ON q.event_id = s.node
         |  ORDER BY s.node LIMIT 25 OFFSET 0
         |) page JOIN ($pointsSql) p ON p.event_id = page.node
         |ORDER BY event_id""".stripMargin

  val distMaterialize: GraftQuery = GraftQuery.sql(
    "q58_dist_materialize", distMaterializeSql) { (spark, dir) =>
    val idx = distIndex(spark, dir)
    idx.materializeLeaves(largestDistClusterAt(idx, 3), pointsDf(spark, dir), "event_id",
        limit = 25, offset = 0)
      .select(col("event_id"), col("lng"), col("lat"))
      .orderBy("event_id")
  }

  /** Distributed (shuffle-parallel) hierarchy build, profiled per zoom —
    * the 100 TB clustering path, hash-matched against DuckDB running the
    * identical 17-level fold. The build is shared with the q55-q58
    * navigation queries through [[distIndex]] (C1 rebuild gating: one build,
    * many queries).
    */
  private def profileAgg(levels: DataFrame): DataFrame =
    levels.groupBy(col("zoom"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("is_cluster"), 1L).otherwise(0L)).as("n_clusters"),
        sum(col("point_count")).as("total_points"),
        max(col("point_count")).as("max_cluster_size"),
        sum(floor(col("mx") * 1048576.0).cast("long")).as("mx_sum"),
        sum(floor(col("my") * 1048576.0).cast("long")).as("my_sum"))
      .orderBy("zoom")

  val gridHierarchyProfile: GraftQuery = GraftQuery.sql(
    "q44_grid_hierarchy_profile", gridProfileSql) { (spark, dir) =>
    profileAgg(distIndex(spark, dir).levels.toDF())
  }

  /** The minPoints fusion gate on the SCALE path (reference minPoints
    * option, arrow-cluster-engine.ts:389-401, previously exact-mode-only
    * here): cells fuse only at >= 2 members AND >= minPoints total mass;
    * below-gate cells pass every member through. Hash-matched against
    * DuckDB replaying the identical gated fold as window functions —
    * per-member passthrough included.
    */
  private val mpIndexCache = new graft.cluster.IndexCache
  val gridMinPointsProfile: GraftQuery = GraftQuery.sql(
    "q99_grid_minpoints", gridMpProfileSql) { (spark, dir) =>
    val opts = ClusterOptions(minPoints = 5)
    val idx = mpIndexCache.get(spark, dir, opts)(
      ClusterEngine.loadDistributed(pointsDf(spark, dir), opts, idCol = "event_id"))
    profileAgg(idx.levels.toDF())
  }

  /** Incremental index maintenance on the scale path: build on the first
    * 90% of the points, fold the remaining 10% in through
    * [[IncrementalGrid.merge]] (the streaming-ingest shape — only the
    * ingested points' ancestor cells recompute), and profile the merged
    * hierarchy. The oracle is the SAME full 17-level DuckDB fold over all
    * points that q44 replays: merge must be indistinguishable from a
    * fresh build of the union, so the incremental path earns the batch
    * path's oracle verbatim.
    */
  private val mergedIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def mergedIndex(spark: SparkSession, dir: String): DataFrame =
    mergedIndexCache.computeIfAbsent((spark, dir), { _ =>
      val pts = pointsDf(spark, dir)
      val cut = (pts.count() * 9L) / 10L
      val base = MortonHierarchy.build(
        pts.where(col("event_id") < cut), ClusterOptions(), "lng", "lat", "event_id")
      IncrementalGrid.merge(
        base, pts.where(col("event_id") >= cut), cut, ClusterOptions(),
        "lng", "lat", "event_id")
    })

  /** Force q103's shared build+merge (Bench attributes it to its own
    * `incr_merge_build` key so the q103 query number measures the
    * recurring profile scan, the ivf_exact_build discipline).
    */
  private[graft] def warmIncrementalMergeIndex(spark: SparkSession, dir: String): Unit = {
    mergedIndex(spark, dir); ()
  }

  val incrementalMergeProfile: GraftQuery = GraftQuery.sql(
    "q103_incremental_merge", gridProfileSql) { (spark, dir) =>
    profileAgg(mergedIndex(spark, dir))
  }

  /** q103's ingest fold run through the STORAGE-BACKED index
    * ([[graft.cluster.IndexStore]]): build on the first 90%, save as the
    * bucket-partitioned store, fold the last 10% in via dynamic partition
    * overwrite of only the touched buckets, reload, profile. Earns q44's
    * full 17-level DuckDB fold oracle verbatim — a store roundtrip plus a
    * partial-rewrite merge must be indistinguishable from a fresh build
    * of the union (broken bucket routing, id re-offset, or overwrite
    * scope would all surface as a hash mismatch).
    */
  private val storeMergeIdx =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def storeMergeLevels(spark: SparkSession, dir: String): DataFrame =
    storeMergeIdx.computeIfAbsent((spark, dir), { _ =>
      val pts = pointsDf(spark, dir)
      val cut = (pts.count() * 9L) / 10L
      val path = graft.io.Scratch.dir("graft_store_merge")
      // bucketZoom 1 for this corpus size: q104's ingest slice is uniform
      // (ids must continue the id space, so the batch can't be spatially
      // local) — the degenerate full-rewrite case — and the store should
      // hold file counts proportionate to its ~100k points. The locality
      // win is bench_store_merge.json / IndexStoreSpec's claim.
      graft.cluster.IndexStore.save(
        MortonHierarchy.build(
          pts.where(col("event_id") < cut), ClusterOptions(), "lng", "lat", "event_id"),
        path, cut, ClusterOptions(), bucketZoom = 1)
      graft.cluster.IndexStore.mergeInto(
        spark, path, pts.where(col("event_id") >= cut),
        "lng", "lat", "event_id")
      graft.cluster.IndexStore.load(spark, path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  private[graft] def warmStoreMergeIndex(spark: SparkSession, dir: String): Unit = {
    storeMergeLevels(spark, dir); ()
  }

  val storeMergeProfile: GraftQuery = GraftQuery.sql(
    "q104_store_merge", gridProfileSql) { (spark, dir) =>
    profileAgg(storeMergeLevels(spark, dir))
  }

  /** Q7: leaves of the largest z3 cluster joined back to the source rows
    * (late materialization / picking).
    */
  val materializedLeaves: GraftQuery = GraftQuery.sql(
    "q34_materialize_leaves",
    s"""WITH exp AS (
       |  SELECT event_id FROM read_csv('$navExpectedDir/q34_expected.csv',
       |    header=true, columns={'event_id':'BIGINT'})
       |), pts AS ($pointsSql)
       |SELECT e.event_id, p.lng, p.lat
       |FROM exp e JOIN pts p USING (event_id)
       |ORDER BY e.event_id""".stripMargin) { (spark, dir) =>
    val idx = index(spark, dir)
    idx.materializeLeaves(largestClusterId(idx, 3), pointsDf(spark, dir), "event_id",
        limit = 25, offset = 0)
      .select(col("event_id"), col("lng"), col("lat"))
      .orderBy("event_id")
  }

  /** Index persistence roundtrip: save the built exact index to parquet,
    * reload it WITHOUT the source data, and emit the reloaded index's
    * per-zoom profile — which must equal q19's committed expected rows
    * exactly (the oracle replays the same file), so a broken write, a
    * lost column, or a metadata mismatch fails the hash compare. The
    * reference rebuilds from source on every start; at 100 TB the build
    * is the expensive step, so save/load is the deployment shape
    * (IndexPersistenceSpec proves the full query surface survives).
    */
  val indexRoundtrip: GraftQuery = GraftQuery.sql(
    "q83_index_roundtrip",
    s"""SELECT zoom, n_records, n_clusters, total_points, max_cluster_size
       |FROM read_csv('$navExpectedDir/q19_expected.csv', header=true, columns={
       |  'zoom':'INTEGER','n_records':'BIGINT','n_clusters':'BIGINT',
       |  'total_points':'BIGINT','max_cluster_size':'BIGINT'})
       |ORDER BY zoom""".stripMargin) { (spark, dir) =>
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_index_roundtrip"
    index(spark, dir).save(path)
    val reloaded = ClusterEngine.loadIndex(spark, path)
    // the reloaded serving cache dies with this rep (the next rep reloads
    // fresh) — release it after the action instead of leaking one
    // persisted level table per rep
    graft.ScratchFrames.trackPersisted(reloaded.levels.toDF()): Unit
    reloaded.levels.groupBy(col("zoom"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("is_cluster"), 1L).otherwise(0L)).as("n_clusters"),
        sum(col("point_count")).as("total_points"),
        max(col("point_count")).as("max_cluster_size"))
      .orderBy("zoom")
  }

  /** Per-zoom level-table profile of the greedy hierarchy (all-integer —
    * the committed expected rows are the oracle; see [[navExpectedDir]]).
    */
  val hierarchyLevels: GraftQuery = GraftQuery.sql(
    "q19_hierarchy_levels",
    s"""SELECT zoom, n_records, n_clusters, total_points, max_cluster_size
       |FROM read_csv('$navExpectedDir/q19_expected.csv', header=true, columns={
       |  'zoom':'INTEGER','n_records':'BIGINT','n_clusters':'BIGINT',
       |  'total_points':'BIGINT','max_cluster_size':'BIGINT'})
       |ORDER BY zoom""".stripMargin) { (spark, dir) =>
    val idx = index(spark, dir)
    idx.levels.groupBy(col("zoom"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("is_cluster"), 1L).otherwise(0L)).as("n_clusters"),
        sum(col("point_count")).as("total_points"),
        max(col("point_count")).as("max_cluster_size"))
      .orderBy("zoom")
  }
}

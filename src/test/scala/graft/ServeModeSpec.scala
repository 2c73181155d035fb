package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{ClusterEngine, ClusterOptions, ClusterRow}

/** Serve-mode ↔ DataFrame-path equivalence: `getClustersLocal` must return
  * EXACTLY the rows `getClusters` scans out of the level table, for every
  * bbox shape the normalization handles (whole world, ordinary, tiny,
  * antimeridian-crossing, polar), on the same golden fixture the
  * differential suite locks (LCG-42, 500 points, radius 75). Also proves
  * the cap fallback and the distributed build serve the same rows.
  */
class ServeModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pointsDf = {
    import spark.implicits._
    PointFixtures.uniform(500).toSeq.toDF("row_id", "lng", "lat")
  }

  private lazy val idx =
    ClusterEngine.load(pointsDf, ClusterOptions(radius = 75.0), idCol = Some("row_id")).persist()

  private val bboxes = Seq(
    "world" -> (-180.0, -85.0, 180.0, 85.0),
    "ordinary" -> (-50.0, -30.0, 40.0, 60.0),
    "tiny" -> (10.0, 10.0, 11.0, 11.0),
    "antimeridian" -> (150.0, -20.0, -150.0, 50.0),
    "polar" -> (-180.0, 60.0, 180.0, 90.0))

  private def dfRows(index: graft.cluster.ClusterIndex,
      bbox: (Double, Double, Double, Double), z: Int): Set[ClusterRow] =
    index.getClusters(bbox, z).collect().map(r =>
      ClusterRow(r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toSet

  test("serve mode equals the DataFrame scan for every bbox shape and zoom") {
    var nonEmpty = 0
    for (z <- Seq(0, 3, 8, 14, 16); (name, bbox) <- bboxes) {
      val local = idx.getClustersLocal(bbox, z).toSet
      val df = dfRows(idx, bbox, z)
      assert(local == df, s"serve-mode mismatch at z=$z bbox=$name")
      if (df.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 10, "fixture must actually exercise non-empty results")
  }

  test("the columnar batch API returns exactly the row API's rows, in order") {
    for (z <- Seq(0, 3, 8, 14, 16); (name, bbox) <- bboxes) {
      val rows = idx.getClustersLocal(bbox, z)
      val batch = idx.getClustersLocalBatch(bbox, z)
      assert(batch.size == rows.length, s"size at z=$z bbox=$name")
      assert((0 until batch.size).forall(i => batch.row(i) == rows(i)),
        s"batch/row divergence at z=$z bbox=$name")
    }
    // fallback path too: a capped index answers the batch through collect
    val capped = ClusterEngine.load(pointsDf, ClusterOptions(radius = 75.0), idCol = Some("row_id"))
    capped.serveMaxSnapshotRows = 1
    val rows = capped.getClustersLocal(bboxes(1)._2, 8).sortBy(_.id)
    val batch = capped.getClustersLocalBatch(bboxes(1)._2, 8)
    assert((0 until batch.size).map(batch.row).sortBy(_.id) == rows.toSeq)
    capped.unpersist()
  }

  test("a level over the snapshot cap falls back to the DataFrame path with equal rows") {
    // fresh index: the snapshot decision is made once per zoom per index
    val fresh = ClusterEngine.load(pointsDf, ClusterOptions(radius = 75.0), idCol = Some("row_id"))
    fresh.serveMaxSnapshotRows = 0
    try {
      for ((name, bbox) <- bboxes) {
        val viaFallback = fresh.getClustersLocal(bbox, 8).toSet
        assert(viaFallback == dfRows(fresh, bbox, 8), s"fallback mismatch at bbox=$name")
      }
    } finally fresh.unpersist()
  }

  test("the fallback never materializes an above-cap result: it errors, and getClusters still serves") {
    // above-cap level + world bbox: the row-API fallback must ABORT instead
    // of collecting the whole level to the driver as boxed rows
    val fresh = ClusterEngine.load(pointsDf, ClusterOptions(radius = 75.0), idCol = Some("row_id"))
    fresh.serveMaxSnapshotRows = 0 // force the fallback path for every zoom
    fresh.serveMaxFallbackRows = 5 // z16 has 500 leaves — far over this cap
    try {
      val world = bboxes.head._2
      val e = intercept[IllegalStateException](fresh.getClustersLocal(world, 16))
      assert(e.getMessage.contains("serveMaxFallbackRows"))
      assert(e.getMessage.contains("getClusters"), "error must route callers to the distributed API")
      // the distributed API is the sanctioned path and still serves the level
      assert(fresh.getClusters(world, 16).count() == 500)
      // a bbox whose RESULT fits the cap still answers through the fallback
      // (the bound is on the result, not the level)
      val tiny = fresh.getClustersLocal(bboxes(2)._2, 16)
      assert(tiny.length <= 5 && tiny.toSet == dfRows(fresh, bboxes(2)._2, 16))
    } finally fresh.unpersist()
  }

  test("the total snapshot budget stops accumulation but never changes results") {
    // budget admits roughly one level: later zooms must fall back, equal rows
    val fresh = ClusterEngine.load(pointsDf, ClusterOptions(radius = 75.0), idCol = Some("row_id"))
    fresh.serveTotalSnapshotRows = fresh.level(16).count()
    try {
      for (z <- Seq(16, 8, 0); (name, bbox) <- bboxes) {
        val local = fresh.getClustersLocal(bbox, z).toSet
        assert(local == dfRows(fresh, bbox, z), s"budgeted serve mismatch at z=$z bbox=$name")
      }
    } finally fresh.unpersist()
  }

  test("the distributed (grid) build serves identically too") {
    val grid = ClusterEngine.loadDistributed(pointsDf, ClusterOptions(radius = 75.0), idCol = "row_id")
    try {
      for (z <- Seq(0, 8, 16); (name, bbox) <- bboxes) {
        val local = grid.getClustersLocal(bbox, z).toSet
        assert(local == dfRows(grid, bbox, z), s"grid serve mismatch at z=$z bbox=$name")
      }
    } finally grid.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIvf, AnnIvfPq, AnnPq, AnnServeRegistry}

/** `graft_ann_serve` — the calibrated serving tier reachable from pure
  * SQL (r13 verdict #5): row-identical to the Scala serve() on both
  * encodings, loud on every un-vouched request (no covering calibration,
  * no vecstore sidecar), and stale-snapshot-safe across re-saves.
  */
class AnnServeSqlSpec extends AnyFunSuite {
  private lazy val spark = { GraftExtensions.register(SparkTestSession.spark); SparkTestSession.spark }
  private val sf = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val built = {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    val cb = AnnPq.train(emb, exactMeans = false)
    val coded = AnnIvfPq.index(indexed, AnnPq.encode(emb, cb)).cache()
    coded.count()
    (coded, centroids, cb)
  }
  private lazy val dir = {
    val (coded, centroids, cb) = built
    val d = java.nio.file.Files.createTempDirectory("graft_sql_serve").toString
    AnnIvfPq.saveIndex(coded, centroids, cb, d)
    AnnIvfPq.saveVectorStore(emb, d)
    val c = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb)
    AnnIvfPq.saveCalibration(spark, d, c)
    d
  }
  private lazy val queries = emb.where(col("vec_id") < 20)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
      col("dist"), col("rk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toIndexedSeq

  private def sqlServe(path: String): org.apache.spark.sql.DataFrame = {
    queries.createOrReplaceTempView("ann_sql_queries")
    spark.sql(
      s"""SELECT query_id, h.neighbor_id AS neighbor_id, h.dist AS dist,
         |       h.rk AS rk
         |FROM (
         |  SELECT vec_id AS query_id,
         |         explode(graft_ann_serve('$path', vec_id, embedding)) AS h
         |  FROM ann_sql_queries
         |)""".stripMargin)
  }

  test("graft_ann_serve == Scala serve(), row-for-row (raw encoding)") {
    AnnServeRegistry.reset()
    val viaSql = rows(sqlServe(dir))
    val viaScala = rows(AnnIvfPq.serve(spark, dir, queries, emb))
    assert(viaSql == viaScala, "SQL serving diverged from the Scala serve()")
    assert(viaSql.nonEmpty)
  }

  test("graft_ann_serve == Scala serve() on the residual encoding") {
    val (coded, centroids, _) = built
    val indexed = emb.join(coded.select(col("vec_id"), col("_centroid")), Seq("vec_id"))
    val rcb = AnnIvfPq.trainResidual(indexed, centroids, exactMeans = false)
    val rcoded = AnnIvfPq.encodeResidual(indexed, centroids, rcb)
    val d = java.nio.file.Files.createTempDirectory("graft_sql_res").toString
    AnnIvfPq.saveIndex(rcoded, centroids, rcb, d, residual = true)
    AnnIvfPq.saveVectorStore(emb, d)
    val rcal = AnnIvfPq.calibrateEndToEnd(rcoded, centroids, rcb, emb, residual = true)
    AnnIvfPq.saveCalibration(spark, d, rcal)
    assert(rcal.metTarget)
    AnnServeRegistry.reset()
    assert(rows(sqlServe(d)) == rows(AnnIvfPq.serve(spark, d, queries, emb)))
  }

  test("graft_ann_serve: 5-arg form pins (targetRecall, topK); deeper topK than the stored calibration throws loudly") {
    AnnServeRegistry.reset()
    queries.createOrReplaceTempView("ann_sql_queries")
    // topK=5 exceeds the stored topK=3 calibration: covers() refuses and
    // the SQL tier must throw with the remedy, not silently degrade
    val e = intercept[Exception] {
      spark.sql(
        s"""SELECT explode(graft_ann_serve('$dir', vec_id, embedding, 0.9, 5))
           |FROM ann_sql_queries""".stripMargin).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("calibration")),
      s"expected a loud no-covering-calibration error, got $e")
  }

  test("generation pinning (r14 advice): one re-save keeps the pinned snapshot; two fail loudly; a foreign pin aliases to the local snapshot") {
    AnnServeRegistry.reset()
    val savedFreshness = AnnServeRegistry.freshnessMs
    AnnServeRegistry.freshnessMs = 0L
    try {
      AnnServeRegistry.warm(dir)
      val g1 = AnnServeRegistry.pin(dir)
      assert(g1 >= 0L)
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .collect()(0).getSeq[Double](0).toArray
      val r1 = AnnServeRegistry.search(dir, 0L, qv, 0.9, 3, g1).toSeq
      // re-save #1 (a calibration re-stamp changes the save fingerprint):
      // warm retires g1 — a query pinned to it still answers identically
      val cal = AnnIvfPq.loadCalibration(spark, dir).get
      AnnIvfPq.saveCalibration(spark, dir, cal)
      AnnServeRegistry.warm(dir)
      val g2 = AnnServeRegistry.pin(dir)
      assert(g2 != g1, "a fingerprint change must mint a new generation")
      assert(AnnServeRegistry.search(dir, 0L, qv, 0.9, 3, g1).toSeq == r1,
        "a query pinned across ONE re-save must keep its snapshot")
      // re-save #2: g1's snapshot is gone — the same-JVM pin fails LOUDLY
      // instead of silently mixing saves
      AnnIvfPq.saveCalibration(spark, dir, cal)
      AnnServeRegistry.warm(dir)
      val e = intercept[IllegalStateException] {
        AnnServeRegistry.search(dir, 0L, qv, 0.9, 3, g1)
      }
      assert(e.getMessage.contains("superseded"), s"got: ${e.getMessage}")
      // a FOREIGN pin (minted in another JVM — never pin()'d here)
      // aliases to this JVM's snapshot and serves consistently
      val g3 = AnnServeRegistry.pin(dir)
      val foreign = 987654321L
      val rF = AnnServeRegistry.search(dir, 0L, qv, 0.9, 3, foreign).toSeq
      assert(rF == AnnServeRegistry.search(dir, 0L, qv, 0.9, 3, g3).toSeq,
        "a foreign pin must serve the locally-warmed snapshot")
    } finally AnnServeRegistry.freshnessMs = savedFreshness
  }

  test("graft_ann_serve: a save without the vecstore sidecar throws with the remedy") {
    val (coded, centroids, cb) = built
    val bare = java.nio.file.Files.createTempDirectory("graft_sql_bare").toString
    AnnIvfPq.saveIndex(coded, centroids, cb, bare)
    val c = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb)
    AnnIvfPq.saveCalibration(spark, bare, c)
    AnnServeRegistry.reset()
    val e = intercept[Exception] { sqlServe(bare).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("saveVectorStore")),
      s"expected the vecstore remedy in the error, got $e")
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.AnnIvf

/** IVF index quality: deterministic build, full coverage, and recall@3
  * against exact brute force above a locked floor.
  */
class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("every vector is assigned to exactly one centroid") {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    assert(indexed.count() == emb.count())
    assert(indexed.groupBy("vec_id").count().where(col("count") =!= 1).count() == 0)
    assert(centroids.count() == 16)
  }

  test("recall@3 vs exact brute force is at least 0.6") {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    val queries = emb.where(col("vec_id") < 50)
    val ivf = AnnIvf.search(queries, indexed, centroids, nprobe = 6, topK = 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("nv")).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (ivf intersect exact).size.toDouble / exact.size
    info(f"recall@3 = $recall%.3f (ivf=${ivf.size}, exact=${exact.size})")
    assert(recall >= 0.6, f"recall too low: $recall%.3f")
  }

  test("auto-nprobe reaches the 0.9 recall target on BOTH corpus regimes") {
    // the r7 gap: fixed nprobe=4 measured 0.63 recall@3 on a near-uniform
    // corpus. autoNprobe must adapt: small probe counts when the corpus
    // clusters, large (up to k = full scan) when it doesn't — and the
    // SEARCHED recall must actually clear the target in both regimes
    // (0.85 asserted: the calibration is a 32-query sample estimate).
    def measuredRecall(corpus: org.apache.spark.sql.DataFrame): (Int, Double) = {
      val (indexed, centroids) = AnnIvf.buildIndex(corpus)
      val np = AnnIvf.autoNprobe(indexed, centroids, targetRecall = 0.9)
      val queries = corpus.where(col("vec_id") < 50)
      val ivf = AnnIvf.search(queries, indexed, centroids, nprobe = np, topK = 3)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
      val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          VectorFunctions.cosine(col("qv"), col("nv")).as("cos_sim"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (np, (ivf intersect exact).size.toDouble / exact.size)
    }

    // the testdata embeddings are the corpus where the old fixed nprobe=4
    // measurably under-recalled (0.727 at nprobe=6 in the floor test
    // above): auto must respond with a deeper probe AND actually clear
    // the target there
    val (npEmb, recEmb) = measuredRecall(emb)
    info(f"testdata fixture: nprobe=$npEmb recall@3=$recEmb%.3f")
    assert(recEmb >= 0.85, f"testdata recall $recEmb%.3f < 0.85")
    assert(npEmb > 4,
      s"the old fixed default (4) under-recalls this corpus; auto chose $npEmb")

    // a second, independently-shaped corpus: seeded i.i.d. vectors. The
    // point is per-corpus adaptation — whatever probe depth calibration
    // picks here, the searched recall must clear the target too.
    val rnd = new scala.util.Random(1234)
    import spark.implicits._
    val iid = (0L until 2000L).map { i =>
      (i, Array.fill(16)(rnd.nextDouble() * 2.0 - 1.0))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .cache()
    val (npIid, recIid) = measuredRecall(iid)
    info(f"iid fixture: nprobe=$npIid recall@3=$recIid%.3f")
    assert(recIid >= 0.85, f"iid recall $recIid%.3f < 0.85")
  }

  test("saved+reloaded index searches bit-identically to the in-session build") {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_persist").toString
    AnnIvf.saveIndex(indexed, centroids, path)
    val (ix2, c2) = AnnIvf.loadIndex(spark, path)
    val queries = emb.where(col("vec_id") < 20)
    def rows(ix: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      AnnIvf.search(queries, ix, c, nprobe = 6, topK = 3)
        .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    assert(rows(ix2, c2) == rows(indexed, centroids))
    // and the calibrated default path works off the reloaded structures too
    assert(AnnIvf.searchAuto(queries, ix2, c2).count() > 0)
  }

  test("searchAuto works with an integer id column (calibration casts pin the layout)") {
    // the calibration fold reads getLong/getInt off fixed positions;
    // search/buildIndex accept any numeric id type, so an INT vec_id must
    // calibrate (not ClassCastException) and rank like the long-id run
    val embInt = emb.select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
    val (indexed, centroids) = AnnIvf.buildIndex(embInt)
    val queries = embInt.where(col("vec_id") < 20)
    val got = AnnIvf.searchAuto(queries, indexed, centroids)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"), col("rk"))
      .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val (indexedL, centroidsL) = AnnIvf.buildIndex(emb)
    val want = AnnIvf.searchAuto(emb.where(col("vec_id") < 20), indexedL, centroidsL)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
      .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("search is deterministic across runs") {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    def run() = AnnIvf.search(emb.where(col("vec_id") < 10), indexed, centroids)
      .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}

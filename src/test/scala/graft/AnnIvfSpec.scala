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

  test("search is deterministic across runs") {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    def run() = AnnIvf.search(emb.where(col("vec_id") < 10), indexed, centroids)
      .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}

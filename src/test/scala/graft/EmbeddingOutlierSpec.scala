package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** q87 outlier-flag properties beyond the value oracle: the ceil(5%)
  * count contract per label, a planted far point ranking first, and
  * partitioning-invariance of the decimal-summed distances.
  */
class EmbeddingOutlierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planted far point ranks first; exactly ceil(n/20) flagged") {
    import spark.implicits._
    val near = (0 until 40).map(i =>
      (i.toLong, 0, Array(0.01f * (i % 10), 0.1f, -0.1f, 0.05f)))
    val far = Seq((99L, 0, Array(50.0f, -50.0f, 50.0f, -50.0f)))
    val emb = (near ++ far).toDF("vec_id", "label", "embedding")
    val rows = Similarity.embeddingOutlierReport(emb).collect()
    val byId = rows.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("rk"), r.getAs[Boolean]("is_outlier"))).toMap
    assert(byId(99L)._1 == 1L, "the far point must rank first")
    assert(byId(99L)._2, "the far point must be flagged")
    // ceil(41/20) = 3
    assert(rows.count(_.getAs[Boolean]("is_outlier")) == 3)
  }

  test("flag count is exactly ceil(n_label/20) for every label (sf0.001)") {
    val rows = Similarity.embeddingOutlierReport(
      Tables.embeddings(spark, "/root/testdata/sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("label")).foreach { case (label, rs) =>
      val n = rs.length
      val flagged = rs.count(_.getAs[Boolean]("is_outlier"))
      assert(flagged == (n + 19) / 20,
        s"label $label: $flagged flagged of $n, want ceil(n/20) = ${(n + 19) / 20}")
    }
  }

  test("report is partition-count invariant (1/3/32 partitions)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = Similarity.embeddingOutlierReport(emb).orderBy("label", "rk").collect().toSeq
    for (p <- Seq(1, 3, 32)) {
      val got = Similarity.embeddingOutlierReport(emb.repartition(p))
        .orderBy("label", "rk").collect().toSeq
      assert(got == base, s"distances must not depend on partitioning (p=$p)")
    }
  }
}

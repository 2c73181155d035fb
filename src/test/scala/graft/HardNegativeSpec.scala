package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** q88 contrastive-pair mining properties beyond the value oracle: the
  * positive shares the anchor's label, negatives never do, negative ranks
  * are contiguous and similarity-monotone, the margin is exactly
  * round(pos_sim − neg_sim, 12), and the report is partitioning-invariant.
  */
class HardNegativeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def syntheticEmb = {
    import spark.implicits._
    // anchor 0 ("a"); one same-label candidate (1), two different-label
    // candidates where the NEAREST overall is a negative (2) — the case
    // hard-negative mining exists for (margin goes negative).
    Seq(
      (0L, "a", Array(1f, 0f)),
      (1L, "a", Array(0.6f, 0.8f)),
      (2L, "b", Array(0.8f, 0.6f)),
      (3L, "b", Array(0f, 1f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("picks the top same-label positive and ranked different-label negatives") {
    val rows = Similarity.hardNegativeReport(syntheticEmb, anchorMax = 1, kNeg = 2)
      .orderBy("neg_rk").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("anchor_id") == 0L))
    assert(rows.forall(_.getAs[Long]("pos_id") == 1L),
      "the only same-label candidate must be the positive")
    assert(rows.map(_.getAs[Long]("neg_id")).toSeq == Seq(2L, 3L),
      "negatives must rank by descending cosine (2 is nearer than 3)")
    val r1 = rows(0)
    assert(r1.getAs[Double]("neg_sim") > r1.getAs[Double]("pos_sim"),
      "this fixture's hardest negative outranks the positive")
    assert(r1.getAs[Double]("margin") < 0.0)
    rows.foreach { r =>
      val expect = BigDecimal(r.getAs[Double]("pos_sim") - r.getAs[Double]("neg_sim"))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("margin") == expect,
        "margin must be round(pos_sim - neg_sim, 12) of the reported sims")
    }
  }

  test("exact ties resolve on cand_id through the approx shortlist") {
    import spark.implicits._
    // six IDENTICAL negatives (exact cosine ties): the prefilter's ε-band
    // must keep them all so the exact rerank picks the 3 smallest ids —
    // the same answer the all-decimal plan gives
    val emb = (Seq((0L, "a", Array(1f, 0f)), (1L, "a", Array(0.5f, 0.5f))) ++
      (2L to 7L).map(i => (i, "b", Array(0.9f, 0.1f))))
      .toDF("vec_id", "label", "embedding")
    val rows = Similarity.hardNegativeReport(emb, anchorMax = 1, kNeg = 3)
      .orderBy("neg_rk").collect()
    assert(rows.map(_.getAs[Long]("neg_id")).toSeq == Seq(2L, 3L, 4L),
      "tied negatives must rank by ascending cand_id")
    assert(rows.map(_.getAs[Double]("neg_sim")).distinct.length == 1)
  }

  test("labels are consistent and ranks contiguous on sf0.001") {
    val rows = Similarity.hardNegativeReport(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), anchorMax = 50, kNeg = 3)
      .collect()
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Any]("label")).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      assert(r.getAs[Any]("label") == emb(a))
      assert(emb(r.getAs[Long]("pos_id")) == emb(a), "positive must share the anchor label")
      assert(emb(r.getAs[Long]("neg_id")) != emb(a), "negative must not share the anchor label")
    }
    rows.groupBy(_.getAs[Long]("anchor_id")).foreach { case (a, rs) =>
      val ranks = rs.map(_.getAs[Long]("neg_rk")).sorted.toSeq
      assert(ranks.size <= 3 && ranks == (1L to ranks.size).toSeq,
        s"anchor $a negative ranks must be contiguous 1..n<=3: $ranks")
      val byRank = rs.sortBy(_.getAs[Long]("neg_rk")).map(_.getAs[Double]("neg_sim")).toSeq
      assert(byRank == byRank.sorted.reverse,
        s"anchor $a negative sims must be non-increasing in rank")
    }
  }

  test("report is partition-count invariant (1/3/32 partitions)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = Similarity.hardNegativeReport(emb, 50, 3)
      .orderBy("anchor_id", "neg_rk").collect().toSeq
    for (p <- Seq(1, 3, 32)) {
      val got = Similarity.hardNegativeReport(emb.repartition(p), 50, 3)
        .orderBy("anchor_id", "neg_rk").collect().toSeq
      assert(got == base, s"hard negatives must not depend on input partitioning (p=$p)")
    }
  }
}

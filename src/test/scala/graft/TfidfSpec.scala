package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q86 tf-idf ranking properties beyond the value oracle: ubiquitous
  * terms are worthless (ln(N/N) = 0), per-doc ranks are contiguous and
  * score-monotone, and the report is partitioning-invariant.
  */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a corpus-wide term scores 0 and loses to any rarer term") {
    import spark.implicits._
    val docs = Seq(
      (0L, "common rare common"),
      (1L, "common filler1"),
      (2L, "common filler2"),
      (3L, "common filler3")).toDF("doc_id", "text")
    val r = TextOps.tfidfReport(docs, 3).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("term")) ->
        (x.getAs[Double]("score"), x.getAs[Long]("rk"))).toMap
    assert(r((0L, "common"))._1 == 0.0, "df == N ⇒ idf = ln(1) = 0")
    assert(r((0L, "rare"))._2 < r((0L, "common"))._2,
      "the doc-specific term must outrank the ubiquitous one")
    assert(r((0L, "rare"))._1 > 0.0)
  }

  test("per-doc top-5 is bounded, contiguous, and score-monotone (sf0.001)") {
    val rows = TextOps.tfidfReport(Tables.documents(spark, "/root/testdata/sf0.001"), 5)
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("rk"), x.getAs[Double]("score")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks.size <= 5 && ranks == (1L to ranks.size).toSeq,
        s"doc $doc ranks must be contiguous 1..n≤5: $ranks")
      val byRank = rs.sortBy(_._2).map(_._3).toSeq
      assert(byRank == byRank.sorted.reverse, s"doc $doc scores must be non-increasing in rank")
    }
  }

  test("report is partition-count invariant (1/3/32 partitions)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = TextOps.tfidfReport(docs, 5).orderBy("doc_id", "rk").collect().toSeq
    for (p <- Seq(1, 3, 32)) {
      val got = TextOps.tfidfReport(docs.repartition(p), 5)
        .orderBy("doc_id", "rk").collect().toSeq
      assert(got == base, s"tf-idf must not depend on input partitioning (p=$p)")
    }
  }
}

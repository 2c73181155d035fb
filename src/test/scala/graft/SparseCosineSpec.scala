package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q95 semantics beyond the value oracle: identical documents score
  * exactly 1.0, pairs only surface through shared PAIRABLE terms (df in
  * [2, cutoff] — ubiquitous terms are the dropped stop-term posting
  * lists, singleton terms cannot pair), and the report is
  * partitioning-invariant (decimal dot/norm sums).
  */
class SparseCosineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = {
    import spark.implicits._
    // "the" appears in every doc → df=6 > cutoff 3 → never pairs
    Seq(
      (0L, "the apple banana cherry"),
      (1L, "the apple banana cherry"), // identical to 0 modulo stop term
      (2L, "the dog egg fig"),
      (3L, "the dog egg hay"),
      (4L, "the fig hay qqq"), // keeps fig/hay pairable (df=2); qqq df=1
      (5L, "the rrr single")
    ).toDF("doc_id", "text")
  }

  test("identical documents score 1.0; stop/singleton terms never pair") {
    val r = TextOps.sparseCosineReport(docs, dfCutoff = 3, minCos = 0.0)
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> row).toMap
    assert(r.keySet == Set((0L, 1L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"pairs must surface exactly through shared df-in-[2,3] terms, got ${r.keySet}")
    assert(r((0L, 1L)).getAs[Double]("cos_sim") == 1.0)
    assert(r((0L, 1L)).getAs[Long]("n_shared") == 3)
    // d2={dog,egg,fig}, d3={dog,egg,hay}: two shared + one distinct each
    val de = r((2L, 3L))
    assert(de.getAs[Long]("n_shared") == 2)
    val c = de.getAs[Double]("cos_sim")
    assert(c > 0.0 && c < 1.0, s"partial overlap must score in (0,1), got $c")
    assert(r((2L, 4L)).getAs[Long]("n_shared") == 1)
  }

  test("the report is partition-count invariant") {
    def run(parts: Int) =
      TextOps.sparseCosineReport(docs.repartition(parts), dfCutoff = 3, minCos = 0.0)
        .orderBy("doc_a", "doc_b").collect().toSeq
    val base = run(1)
    assert(base.nonEmpty)
    Seq(3, 32).foreach(p => assert(run(p) == base, s"parts=$p"))
  }
}

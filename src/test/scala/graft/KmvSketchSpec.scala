package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q85 KMV-sketch properties the DuckDB oracle can't express: partition-
  * count invariance of the two-phase distributed top-k (the claim that
  * phase 1's per-input-partition candidate cut never loses a global
  * sketch member), the below-k exact fallback, and estimator accuracy on
  * a corpus two orders of magnitude above the sketch size.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("two-phase sketch is partition-count invariant (1/3/32 partitions)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = TextOps.kmvSketchReport(docs, 64).orderBy("source").collect().toSeq
    assert(base.nonEmpty)
    for (p <- Seq(1, 3, 32)) {
      val got = TextOps.kmvSketchReport(docs.repartition(p), 64)
        .orderBy("source").collect().toSeq
      assert(got == base, s"sketch must not depend on input partitioning (p=$p)")
    }
  }

  test("below-k groups fall back to the exact count with a null h_k") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d", "tiny"), (1L, "a b e", "tiny"))
      .toDF("doc_id", "text", "source")
    val r = TextOps.kmvSketchReport(docs, 64).collect().head
    // distinct bigrams: "a b", "b c", "c d", "b e"
    assert(r.getAs[Long]("sketch_size") == 4L)
    assert(r.isNullAt(r.fieldIndex("h_k")), "h_k must be null when the sketch is exact")
    assert(r.getAs[Double]("est_distinct") == 4.0)
    assert(r.getAs[Double]("rel_err") == 0.0)
  }

  test("estimate lands within the statistical band on ~6k distinct bigrams") {
    import spark.implicits._
    // t0 t1 ... t6000 → exactly 6000 distinct bigrams, 94× the sketch size
    val n = 6000
    val text = (0 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, text, "synthetic")).toDF("doc_id", "text", "source")
    val r = TextOps.kmvSketchReport(docs, 64).collect().head
    assert(r.getAs[Long]("exact_distinct") == n.toLong)
    assert(r.getAs[Long]("sketch_size") == 64L)
    // KMV std error ≈ 1/√k = 12.5%; assert a 5σ band so the test is
    // deterministic-in-practice while still catching estimator bugs
    assert(r.getAs[Double]("rel_err") < 0.625,
      s"rel_err ${r.getAs[Double]("rel_err")} outside 5σ of the 1/√64 band")
  }
}

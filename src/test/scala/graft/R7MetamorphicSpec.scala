package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PipelineOps, TextOps}

/** Partitioning-invariance metamorphics for the round-7 operators: the
  * same input under different physical layouts (one partition, many
  * partitions, shuffled row order) must produce IDENTICAL results —
  * the multi-chunk invariance contract the reference tests for its
  * engine (multi-chunk.test.ts), applied to the r7 text operators whose
  * kernels involve window counts and joins that could silently depend
  * on physical layout.
  */
class R7MetamorphicSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def layouts(df: org.apache.spark.sql.DataFrame) = Seq(
    "as-is" -> df,
    "coalesce(1)" -> df.coalesce(1),
    "repartition(7)" -> df.repartition(7),
    "repartition(13, doc_id)" -> df.repartition(13, col("doc_id")))

  test("q82 pairs are identical under any input partitioning") {
    val docs = Tables.documents(spark, sf)
    val want = TextOps.simhashPairReport(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.nonEmpty)
    layouts(docs).foreach { case (name, d) =>
      val got = TextOps.simhashPairReport(d, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"q82 layout $name diverged")
    }
  }

  test("q84 removal report (cleaned-text hashes included) is identical under any input partitioning") {
    val docs = Tables.documents(spark, sf)
    val want = PipelineOps.dedupSpanRemovalReport(docs, 10)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    layouts(docs).foreach { case (name, d) =>
      val got = PipelineOps.dedupSpanRemovalReport(d, 10)
        .collect().map(_.toSeq).toSet
      assert(got == want, s"q84 layout $name diverged")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps

/** The fused BPE token-count kernel (q80's per-word hot loop) must equal
  * the declarative bracket → literal-replace → split chain word-for-word
  * — the counts are exact integers, so equality is exact, including on
  * adversarial words (parentheses inside words, regex metacharacters,
  * `")("` already present, merge-run overlaps like `aaa`, supplementary-
  * plane unicode).
  */
class BpeKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def both(words: Seq[String], merges: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val got = df.select(col("id"),
        PipelineOps.bpeTokenCount(col("w"), merges).as("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val want = df.select(col("id"),
        PipelineOps.bpeTokenCount(col("w"), merges, exprKernel = false).as("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    (got zip want).foreach { case ((i, g), (_, e)) =>
      assert(g == e, s"word '${words(i.toInt)}': kernel=$g declarative=$e")
    }
  }

  test("kernel == declarative chain on adversarial words") {
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "a"), ("(", ")"))
    val words = Seq(
      "the", "theater", "breathe",           // chained merges
      "aaa", "aaaa", "aaaaa",                // non-overlapping runs
      "a", "x", "th",                        // short words
      "a(b", "x)y", ")(", "()", "(()", "a)(b", // parens inside words break the bracketed form
      "$1", "\\d+", "a$b\\c",                // replacement/regex metacharacters must stay literal
      "naïve", "héllo",                      // multi-byte UTF-8
      "a😀b", "😀"       // supplementary plane (4-byte code points)
    )
    both(words, merges)
  }

  test("kernel == declarative chain on every word of the sf0.001 corpus") {
    val docs = Tables.documents(spark, dir)
    val merges = PipelineOps.bpeMergeTable(docs, iters = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .select(
        PipelineOps.bpeTokenCount(col("w"), merges).as("kernel"),
        PipelineOps.bpeTokenCount(col("w"), merges, exprKernel = false).as("decl"))
    val diff = words.where(col("kernel") =!= col("decl")).count()
    assert(diff == 0, s"$diff corpus words disagree")
  }

  test("empty word counts 1 token (the SQL oracle's range() semantics)") {
    // Spark's sequence(1, 0) DESCENDS, so the declarative chain is not
    // the spec on empty input; the kernel mirrors the oracle (DuckDB
    // range(1,1) is empty → '' → one empty token). q80's corpus words
    // come from a single-space split of space-joined fixtures, so the
    // hot path never sees this — pinned here so the contract is explicit.
    import spark.implicits._
    val got = Seq((1L, "")).toDF("id", "w")
      .select(PipelineOps.bpeTokenCount(col("w"), Seq(("a", "b"))).as("n"))
      .collect().head.getInt(0)
    assert(got == 1)
  }

  test("the kernel projection stays inside whole-stage codegen") {
    // must run over a real scan: a local Seq collapses to a LocalRelation
    // at optimization time (ConvertToLocalRelation) and never plans a
    // runtime projection at all
    val df = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .select(PipelineOps.bpeTokenCount(col("w"), Seq(("t", "h"))).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val wscg = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
    }
    assert(wscg.exists(_.toLowerCase.contains("bpetokencount")),
      s"bpetokencount not inside any WholeStageCodegen span:\n${wscg.mkString("\n---\n")}")
  }
}

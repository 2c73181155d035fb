package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Whole-stage-codegen span extraction for plan-shape assertions.
  *
  * The executed plan of an AQE query is an [[AdaptiveSparkPlanExec]] whose
  * `collect` does NOT descend into the finalized plan — unwrap it AFTER
  * executing the query, and recurse into materialized [[QueryStageExec]]
  * stages (each holds its own plan subtree).
  */
object PlanSpans {
  def wholeStageSpans(df: DataFrame): Seq[String] = {
    def spans(p: SparkPlan): Seq[String] = {
      val own = p.collect { case w: WholeStageCodegenExec => w.toString }
      val nested = p.collect { case s: QueryStageExec => s.plan }.flatMap(spans)
      own ++ nested
    }
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    spans(finalPlan)
  }

  /** True iff `exprName` (lowercase) appears inside some codegen span of
    * the EXECUTED plan — callers must run an action on `df` first so the
    * adaptive plan is finalized.
    */
  def inWholeStageCodegen(df: DataFrame, exprName: String): Boolean =
    wholeStageSpans(df).exists(_.toLowerCase.contains(exprName.toLowerCase))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable key (drives `SparkEntry.queries` / CORRECTNESS_r{N})
  * @param run    Spark implementation; `dir` is the scale-factor data dir
  * @param oracle equivalent DuckDB SQL over the same parquet tables, when the
  *               operation is SQL-expressible (None → driver does a weaker
  *               rows-only check)
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, desampled(run), Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, desampled(run), None)

  /** Every declared query ends in a presentation `orderBy` over a
    * driver-bounded report. A global sort costs a RangePartitioner sampling
    * job that re-executes the child's final stage (for map-only plans, the
    * whole pipeline) before the real pass — rewrite that one root Sort to a
    * single-partition local sort with identical output (see
    * [[org.apache.spark.sql.graftbridge.PlanBridge.desampleFinalSort]]).
    */
  private def desampled(
      run: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    if (sys.env.contains("GRAFT_NO_DESAMPLE")) run
    else (spark, dir) =>
      org.apache.spark.sql.graftbridge.PlanBridge.desampleFinalSort(run(spark, dir))
}

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

  /** Opt-out constructor for a query whose ordered RESULT is corpus-sized
    * (none today — largest declared result is 15k rows): the final sort
    * stays a range sort so the output never funnels through one task. The
    * single-partition rewrite's driver-bounded-result invariant is enforced
    * at runtime by [[desampleOverflow]] (checked by Bench and Verify).
    */
  def sqlLargeResult(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))

  /** `GRAFT_NO_DESAMPLE=1` disables the final-sort rewrite (any other value,
    * including `0`, leaves it ON — value-checked, not presence-checked). */
  private[graft] def desampleDisabled: Boolean =
    sys.env.get("GRAFT_NO_DESAMPLE").contains("1")

  /** Row ceiling the single-partition rewrite relies on: every declared
    * result is a driver-bounded report. Bench/Verify check each executed
    * result against this and report loudly past it — a future corpus-sized
    * ordered result surfaces at declaration time instead of silently
    * serializing through one task toward the 2 GB partition limits. */
  private[graft] val DesampleMaxRows: Long =
    sys.env.get("GRAFT_DESAMPLE_MAX_ROWS").map(_.toLong).getOrElse(10L * 1000 * 1000)

  /** Non-empty message when a desampled query's executed row count breaks
    * the driver-bounded-result invariant the rewrite relies on. */
  private[graft] def desampleOverflow(name: String, rows: Long): Option[String] =
    if (!desampleDisabled && rows > DesampleMaxRows)
      Some(s"$name: $rows result rows exceed GRAFT_DESAMPLE_MAX_ROWS=" +
        s"$DesampleMaxRows — a result this large should keep its range " +
        "sort (declare it via GraftQuery.sqlLargeResult)")
    else None

  /** Every declared query ends in a presentation `orderBy` over a
    * driver-bounded report. A global sort costs a RangePartitioner sampling
    * job that re-executes the child's final stage (for map-only plans, the
    * whole pipeline) before the real pass — rewrite that one root Sort to a
    * single-partition local sort with identical output (see
    * [[org.apache.spark.sql.graftbridge.PlanBridge.desampleFinalSort]]).
    */
  private def desampled(
      run: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    if (desampleDisabled) run
    else (spark, dir) =>
      org.apache.spark.sql.graftbridge.PlanBridge.desampleFinalSort(run(spark, dir))
}

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
    GraftQuery(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}

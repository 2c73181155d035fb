package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata layout: `<dir>/<name>.parquet`.
  *
  * All reads go through Spark's vectorized parquet reader; callers get plain
  * DataFrames so Catalyst can push filters/projections into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is parquet timestamp[us] without UTC adjustment, which Spark
    * reads as TIMESTAMP_NTZ. Expose `ts_us` (epoch micros of the naive wall
    * clock, computed with `timestampdiff` from the NTZ epoch so the value is
    * independent of `spark.sql.session.timeZone` — matching DuckDB's
    * `epoch_us(ts)`, which also treats the naive value as UTC) plus `ts_t`, a
    * plain TIMESTAMP (LTZ) column for event-time/watermark operators.
    *
    * (Earlier driver rounds shipped `ts` as TIMESTAMP(NANOS); the legacy
    * nanos-as-long read + `div 1000` lived here. Same contract: downstream
    * code only ever sees `ts_us`/`ts_t`.)
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    withEventTime(table(spark, dir, "events"))

  /** The ONE `ts` → (`ts_us`, `ts_t`) derivation, shared by the batch reader
    * above and the streaming file source (`StreamingOps.runFileStream`).
    * Works on any plan with the raw `ts` column — batch or streaming — so the
    * two readers cannot drift when the driver's testdata schema changes
    * (round 7 regression: the streaming copy kept the old TIMESTAMP(NANOS)
    * derivation after `ts` became timestamp[us] NTZ and broke q37).
    */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn(
        "ts_us",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
}

package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the co-located-join lever for tables that are
  * joined on the same key again and again (fact ↔ fact at 100 TB, where
  * neither side broadcasts).
  *
  * Writing both join sides bucketed by the key into the same bucket
  * count pins every key to a deterministic bucket file on both sides, so
  * a later sort-merge join reads matching buckets pairwise and the
  * shuffle DISAPPEARS from the plan — the exchange was paid once at
  * write time instead of once per query. `sortBy` additionally orders
  * rows inside each bucket file, letting single-file buckets skip the
  * per-task sort too. BucketingSpec asserts the join plan is
  * exchange-free and value-identical to the plain join.
  *
  * Bucketing metadata lives in the session catalog (`saveAsTable`) — the
  * path-based `parquet(path)` reader has no place to record the bucket
  * spec. At deployment scale the same call against a shared metastore
  * (or an Iceberg/Delta catalog with its bucket transform) is the
  * long-lived layout.
  */
object Bucketing {

  /** Write `df` as a bucketed parquet table in the session catalog. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sortBy: Seq[String] = Nil): Unit = {
    require(buckets >= 1, s"bucket count must be >= 1, got $buckets")
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val ws = if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata intact). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}

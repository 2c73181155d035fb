package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the de-facto interchange format of LLM
  * training corpora (one JSON object per line; WebText/Pile/RedPajama
  * dumps all ship this way). Thin, deliberate wrappers over Spark's
  * native JSON data source:
  *
  *  - write: one `.json` part file per partition, so a 100 TB export
  *    parallelizes like any other sink (compression via the standard
  *    `spark.sql.json.*` / codec options if wanted);
  *  - read: an EXPLICIT schema is required — schema inference scans the
  *    whole dataset once before the real job, which is exactly the kind
  *    of hidden second pass that hurts at scale, and silent type widening
  *    (int → string) would defeat the oracle's exactness.
  *
  * q72 proves the round-trip value-exact: write parquet-sourced documents
  * to JSONL, read them back, and hash-compare content checksums against
  * the oracle computed straight from the parquet.
  */
object Jsonl {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}

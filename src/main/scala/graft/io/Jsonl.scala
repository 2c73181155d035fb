package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines source/sink — the de-facto interchange format of LLM
  * training corpora (one JSON object per line; WebText/Pile/RedPajama
  * dumps all ship this way). Thin, deliberate wrappers over Spark's
  * native JSON data source:
  *
  *  - write: one `.json` part file per partition, so a 100 TB export
  *    parallelizes like any other sink; `compression` passes through to
  *    the standard codecs (gzip/zstd/...) — scraped-corpus interchange is
  *    normally shipped compressed;
  *  - read: an EXPLICIT schema is required — schema inference scans the
  *    whole dataset once before the real job, which is exactly the kind
  *    of hidden second pass that hurts at scale, and silent type widening
  *    (int → string) would defeat the oracle's exactness. Compressed
  *    inputs decode transparently from the file extension.
  *
  * Bad-line policy is EXPLICIT, because a 100 TB scrape always contains
  * some: the default PERMISSIVE mode lands each corrupt line's raw text in
  * a `_corrupt_record` column (null fields otherwise) so the pipeline can
  * count/quarantine/inspect them as ordinary rows, while FAILFAST turns
  * the first bad line into a hard job error for ingest paths that must
  * not silently degrade. JsonlSpec locks both modes and the compressed
  * round-trip; q72 proves the uncompressed round-trip value-exact against
  * the oracle.
  */
object Jsonl {

  /** Name of the PERMISSIVE-mode raw-text column for unparseable lines. */
  val CorruptColumn = "_corrupt_record"

  def write(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read with the given schema and bad-line policy (`PERMISSIVE` default,
    * or `FAILFAST`). In PERMISSIVE mode the returned frame carries the
    * [[CorruptColumn]] (string, null for clean rows) appended to `schema` —
    * Spark only populates it when the read schema contains it, so it is
    * added here rather than left to every caller to remember.
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    val withCorrupt =
      if (mode == "PERMISSIVE" && !schema.fieldNames.contains(CorruptColumn))
        schema.add(CorruptColumn, StringType, nullable = true)
      else schema
    spark.read
      .schema(withCorrupt)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)
  }
}

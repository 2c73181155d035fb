package graft

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Jsonl

/** Bad-line policy and compression contract of the JSONL source/sink — the
  * parts of 100 TB scraped-corpus ingest that q72's clean round-trip cannot
  * exercise: a corrupt line must land in `_corrupt_record` (PERMISSIVE) or
  * fail the job (FAILFAST), and compressed output must round-trip.
  */
class JsonlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    dir
  }

  private val mixed = Seq(
    """{"doc_id": 1, "text": "alpha"}""",
    """this line is not json at all""",
    """{"doc_id": 3, "text": "gamma"}""",
    """{"doc_id": "not-a-number", "text": "delta"}""")

  test("PERMISSIVE (default): corrupt lines become rows with the raw text in _corrupt_record") {
    val df = Jsonl.read(spark, writeLines(mixed), schema)
    assert(df.columns.toSeq == Seq("doc_id", "text", Jsonl.CorruptColumn))
    val rows = df.collect().sortBy(r => Option(r.getAs[String]("text")).getOrElse("~"))
    assert(rows.length == 4, "every input line must surface as a row")
    val clean = rows.filter(_.isNullAt(2))
    assert(clean.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val corrupt = rows.filterNot(_.isNullAt(2)).map(_.getString(2)).sorted
    // the raw line is preserved verbatim — countable, quarantinable,
    // inspectable downstream
    assert(corrupt.toSeq == Seq(
      """this line is not json at all""",
      """{"doc_id": "not-a-number", "text": "delta"}"""))
    // the type-mismatch line still yields its parseable field
    val mismatch = rows.find(r => !r.isNullAt(2) && !r.isNullAt(1)).get
    assert(mismatch.getString(1) == "delta" && mismatch.isNullAt(0))
  }

  test("a caller-supplied _corrupt_record field is not duplicated") {
    val withIt = schema.add(Jsonl.CorruptColumn,
      org.apache.spark.sql.types.StringType, nullable = true)
    val df = Jsonl.read(spark, writeLines(mixed), withIt)
    assert(df.columns.count(_ == Jsonl.CorruptColumn) == 1)
  }

  test("FAILFAST: the first corrupt line is a hard job error") {
    val df = Jsonl.read(spark, writeLines(mixed), schema, mode = "FAILFAST")
    assert(df.columns.toSeq == Seq("doc_id", "text"), "no corrupt column in FAILFAST")
    val e = intercept[Exception](df.collect())
    def mentions(t: Throwable): Boolean = t != null && (
      Option(t.getMessage).exists(m =>
        m.contains("FAILFAST") || m.toLowerCase.contains("malformed")) ||
        mentions(t.getCause))
    assert(mentions(e), s"unexpected failure: $e")
  }

  test("FAILFAST on clean input reads normally") {
    val clean = writeLines(mixed.filterNot(_.contains("not")))
    val df = Jsonl.read(spark, clean, schema, mode = "FAILFAST")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("compressed write round-trips value-exact and actually compresses the files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString
    val src = (0L until 200L).map(i => (i, s"document body $i " + ("x" * 50)))
      .toDF("doc_id", "text")
    Jsonl.write(src, dir, compression = Some("gzip"))
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty, "compression option must reach the sink (.json.gz parts)")
    val back = Jsonl.read(spark, dir, schema)
    // (filtering ONLY on _corrupt_record over a raw JSON scan is disallowed
    // by Spark — check corruption on the fully-collected rows instead)
    assert(back.collect().forall(_.isNullAt(2)), "no corrupt rows expected")
    val got = back.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val want = src.as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}

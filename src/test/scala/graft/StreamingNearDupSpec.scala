package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BucketHit, StreamDoc, StreamingOps}

/** Streaming near-dup detection: the stateful LSH-bucket operator must flag
  * a later near-duplicate against state built in an EARLIER micro-batch
  * (cross-batch memory is the whole point), and its batch-mode execution
  * must agree exactly with the declarative band-signature self-join.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(min: Int): Instant = Instant.ofEpochSecond(1704067200L + min * 60L)

  test("a later batch's duplicate is flagged against earlier-batch bucket state") {
    val input = MemoryStream[StreamDoc]
    val hits = StreamingOps.nearDupBucketHits(
      input.toDS().withWatermark("ts_t", "10 minutes"))
    val q = hits.writeStream
      .format("memory").queryName("neardup_hits")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val original = "the quick brown fox jumps over the lazy dog near the river bank"
      input.addData(
        StreamDoc(1L, original, t(0)),
        StreamDoc(2L, "completely different words about spark catalyst plans and shuffles", t(1)))
      q.processAllAvailable()
      input.addData(
        StreamDoc(3L, original, t(5)), // exact copy → every band collides
        StreamDoc(4L, "yet another unrelated document mentioning parquet footers and arrow", t(6)))
      q.processAllAvailable()

      val flags = StreamingOps.flagNearDups(
        spark.table("neardup_hits").as[BucketHit])
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
      assert(flags(3L) == (true, 1L), "cross-batch duplicate flagged with its original")
      assert(flags(1L)._1 == false && flags(2L)._1 == false && flags(4L)._1 == false)
    } finally q.stop()
  }

  test("out-of-order ids: arrival-order semantics, not id-order (documented contract)") {
    // q68's oracle assumes ascending-doc_id ingestion. When a SMALLER id
    // arrives after its near-duplicate, the operator's arrival-order
    // contract applies: the earlier larger-id doc stays unflagged, and the
    // later smaller-id doc is not flagged either (no EARLIER smaller id
    // existed when it arrived) — but it does lower the bucket minimum for
    // everything after it. This locks the divergence called out in the
    // q68 oracle comment as intended behavior.
    val input = MemoryStream[StreamDoc]
    val hits = StreamingOps.nearDupBucketHits(
      input.toDS().withWatermark("ts_t", "10 minutes"))
    val q = hits.writeStream
      .format("memory").queryName("neardup_ooo")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val text = "identical content repeated across documents in every single band here"
      input.addData(StreamDoc(10L, text, t(0)))
      q.processAllAvailable()
      input.addData(StreamDoc(5L, text, t(1)))  // smaller id, later arrival
      q.processAllAvailable()
      input.addData(StreamDoc(20L, text, t(2)))
      q.processAllAvailable()

      val flags = StreamingOps.flagNearDups(
        spark.table("neardup_ooo").as[BucketHit])
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
      assert(flags(10L) == (false, -1L), "earlier larger-id doc stays unflagged")
      assert(flags(5L) == (false, -1L), "late smaller-id doc saw no earlier smaller id")
      assert(flags(20L) == (true, 5L), "later doc flags against the lowered bucket minimum")
    } finally q.stop()
  }

  test("batch execution agrees exactly with the declarative band-signature join") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val streamShaped = docs
      .select(col("doc_id"), col("text"), lit(t(0)).as("ts_t")).as[StreamDoc]
    val got = StreamingOps.flagNearDups(StreamingOps.nearDupBucketHits(streamShaped))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap

    // expected: per doc, the smallest SMALLER doc sharing any band signature
    val sig = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 3)
      .select(col("doc_id"), posexplode(TextFunctions.minhashBandMins(col("tk"), 3, 4)))
      .select(col("doc_id"), col("pos"), col("col").as("mh"))
    val expected = sig.as("a")
      .join(sig.as("b"),
        col("a.pos") === col("b.pos") && col("a.mh") === col("b.mh") &&
          col("b.doc_id") < col("a.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("canonical_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    got.foreach { case (id, (isDup, canon)) =>
      expected.get(id) match {
        case Some(want) => assert(isDup && canon == want, s"doc $id: got $canon want $want")
        case None => assert(!isDup && canon == -1L, s"doc $id should not be flagged")
      }
    }
    assert(expected.nonEmpty, "fixture must contain near-dups for the test to bite")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, StreamingOps}

/** Continuous-trigger soak on the RATE source (VERDICT r8 #7): q36-q38/q68
  * exercise only the file source under Trigger.AvailableNow, where every
  * microbatch is planned up front — the rate source is the one built-in
  * that drives genuinely continuous ProcessingTime triggers, which is the
  * regime where event-time state EVICTION has to work or a production
  * stream leaks state forever.
  *
  * Shape: every rate row opens a session for a FRESH user (user_id =
  * value), with synthetic event time advancing 10 minutes per row —
  * decoupled from wall time, so 30-minute session timeouts fire within
  * seconds of wall clock. No user ever gets a second event, so the ONLY
  * way a session can close is the EventTimeTimeout branch of
  * flatMapGroupsWithState — exactly the path AvailableNow file tests
  * cannot isolate. Bounded and CI-safe: hard wall-clock deadline, query
  * stopped in finally, asserts need only a few hundred rows at 200 rows/s.
  */
class RateSoakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rate-source soak: event-time timeout evicts state across continuous triggers") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 200)
      .option("numPartitions", 2)
      .load()
    // event time advances 600 s per row; the 30-min gap spans 3 rows
    val events = rate.select(
      col("value").as("event_id"),
      col("value").as("user_id"),
      lit("view").as("event_type"),
      lit(1.0).as("value"),
      timestamp_seconds(lit(1700000000L) + col("value") * 600L).as("ts_t")
    ).as[Event]
    val sessions = StreamingOps.statefulSessionize(
      events.withWatermark("ts_t", "30 minutes"))
    val q = sessions.writeStream
      .format("memory").queryName("rate_soak")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      // soak until enough sessions have been CLOSED BY TIMEOUT to make the
      // eviction assertions meaningful (or the deadline trips the asserts)
      val deadline = System.currentTimeMillis() + 120000L
      def closed(): Long = spark.table("rate_soak").count()
      // the first rate batch is a catch-up burst that can close hundreds of
      // sessions at once — soak on BOTH closures and trigger count, so the
      // assertions below always see a genuinely continuous run
      def batchesSoFar(): Int = q.recentProgress.count(_.numInputRows > 0)
      while ((closed() < 200 || batchesSoFar() < 6) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(500)

      val progresses = q.recentProgress.toSeq
      val totalInput = progresses.map(_.numInputRows).sum
      val nonEmptyBatches = progresses.count(_.numInputRows > 0)
      val stateNow = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      val evicted = progresses
        .flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum

      // every closed session came through the hasTimedOut branch (each
      // user_id occurs once, so gap-closure is impossible by construction)
      assert(closed() >= 200, s"only ${closed()} sessions closed before deadline")
      // real continuous operation, not one big AvailableNow batch
      assert(nonEmptyBatches >= 5, s"only $nonEmptyBatches non-empty batches")
      // state is bounded by the watermark horizon (~a batch or two of open
      // sessions), NOT by the cumulative user count: without eviction the
      // state row count would equal total input (every user stays open)
      assert(totalInput >= 400L, s"only $totalInput rows ingested")
      assert(stateNow < totalInput / 2,
        s"state rows $stateNow not evicted (input $totalInput)")
      assert(evicted > 0L, "no state rows were ever removed by timeout")
    } finally q.stop()
  }
}

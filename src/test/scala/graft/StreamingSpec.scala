package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, SessionOut, StreamingOps}

/** Streaming semantics: the stateful (flatMapGroupsWithState) sessionizer
  * must agree with the typed batch sessionizer on the same events, and
  * watermark-driven timeouts must flush open sessions.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, uid: Long, minute: Long, value: Double): Event =
    Event(id, uid, "click", value,
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60))

  // user 1: two sessions (gap 45 min > 30); user 2: one session
  private val fixture = Seq(
    ev(0, 1, 0, 1.0), ev(1, 1, 10, 2.0), ev(2, 1, 20, 3.0),
    ev(3, 1, 65, 4.0), ev(4, 1, 70, 5.0),
    ev(5, 2, 5, 10.0))

  test("stateful streaming sessionize equals typed batch sessionize") {
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val sessions = StreamingOps.statefulSessionize(
      input.toDS().withWatermark("ts_t", "0 seconds"))
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // feed two event-time-ordered batches (an event older than the
      // watermark would be dropped as late data), then a far-future
      // sentinel to push the watermark past every open session's timeout
      input.addData(fixture.filter(_.ts_t.getEpochSecond <= 1704068400L)) // ≤ 00:20
      q.processAllAvailable()
      input.addData(fixture.filter(_.ts_t.getEpochSecond > 1704068400L))
      q.processAllAvailable()
      input.addData(ev(99, 999, 10000, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sessions_out").as[SessionOut].collect()
      .filter(_.user_id != 999).sortBy(s => (s.user_id, s.session_start.toString)).toSeq
    val batch = StreamingOps.typedSessionize(fixture.toDS()).collect()
      .sortBy(s => (s.user_id, s.session_start.toString)).toSeq
    assert(streamed == batch)
    assert(batch.map(s => (s.user_id, s.n_events, s.total_value)) ==
      Seq((1L, 3L, 6.0), (1L, 2L, 9.0), (2L, 1L, 10.0)))
  }

  test("session_window stats agree with typed sessionize on the fixture") {
    val df = fixture.toDS().toDF()
    val viaWindow = StreamingOps.sessionWindowStats(df)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    val viaTyped = StreamingOps.typedSessionize(fixture.toDS())
      .orderBy("user_id", "session_start")
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSeq
    assert(viaWindow == viaTyped)
  }

  test("streaming dedup drops within-watermark duplicates, keeps distinct keys") {
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val q = StreamingOps.dedupStream(
      input.toDS().toDF(), timeCol = "ts_t", delay = "1 hour", keyCols = Seq("event_type"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // three 'click' events + one 'view' within the same hour → 2 rows
      input.addData(Seq(
        ev(0, 1, 0, 1.0), ev(1, 2, 5, 2.0), ev(2, 3, 10, 3.0),
        Event(3, 4, "view", 4.0, Instant.parse("2024-01-01T00:12:00Z"))))
      q.processAllAvailable()
    } finally q.stop()

    val kinds = spark.table("dedup_out")
      .collect().map(_.getAs[String]("event_type")).sorted.toSeq
    assert(kinds == Seq("click", "view"))
  }

  test("streaming file source derives event time identically to the batch reader") {
    // the schema contract over the REAL testdata: any drift between
    // runFileStream's ts derivation and Tables.events breaks here — the
    // round-7 q37 regression class (the streaming copy kept a stale
    // TIMESTAMP(NANOS) path after the driver moved events.ts to
    // timestamp[us] NTZ; both now share Tables.withEventTime)
    import org.apache.spark.sql.{functions => F, DataFrame}
    val dir = "/root/testdata/sf0.001"
    val agg: DataFrame => DataFrame = df => df.agg(
      F.count(F.lit(1)).as("n"),
      F.min(F.col("ts_us")).as("lo"), F.max(F.col("ts_us")).as("hi"),
      F.min(F.col("ts_t")).as("lo_t"), F.max(F.col("ts_t")).as("hi_t"))
    val streamed = StreamingOps.runFileStream(spark, dir, agg).collect().toSeq
    val batch = agg(Tables.events(spark, dir)).collect().toSeq
    assert(streamed == batch)
    assert(streamed.head.getLong(0) > 0)
  }

  test("stream-stream interval join equals the batch binned interval join") {
    implicit val sqlCtx = spark.sqlContext

    // windows: 10 minutes after each user-1 event; points: every event
    val pointsIn = MemoryStream[Event]
    val windowsIn = MemoryStream[Event]
    val points = pointsIn.toDS().toDF()
      .withWatermark("ts_t", "0 seconds")
      .select(col("event_id").as("p_id"), col("ts_t").as("p_ts"))
    val windows = windowsIn.toDS().toDF()
      .withWatermark("ts_t", "0 seconds")
      .select(col("event_id").as("window_id"), col("ts_t").as("w_start"))
    val q = StreamingOps.intervalJoinStream(points, windows, "p_ts", "w_start", 600L)
      .writeStream.format("memory").queryName("ivjoin_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      pointsIn.addData(fixture)
      windowsIn.addData(fixture.filter(_.user_id == 1))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ivjoin_out")
      .select("p_id", "window_id").as[(Long, Long)].collect().toSet

    // batch twin through the binned operator on the same rows (micros)
    val us: Instant => Long = t => t.getEpochSecond * 1000000L + t.getNano / 1000L
    val pB = fixture.map(e => (e.event_id, us(e.ts_t))).toDF("p_id", "t")
    val wB = fixture.filter(_.user_id == 1)
      .map(e => (e.event_id, us(e.ts_t), us(e.ts_t) + 600000000L))
      .toDF("window_id", "s", "e")
    val batch = graft.operators.RangeJoin.intervalJoin(pB, wB, "t", "s", "e", 600000000L)
      .select("p_id", "window_id").as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("windowed streaming aggregation equals batch aggregation") {
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val q = StreamingOps.hourlyEventStats(input.toDS().toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Complete)
      .start()
    try {
      input.addData(fixture)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hourly_out")
      .orderBy("hour_start", "event_type").collect().toSeq
    val batch = StreamingOps.hourlyEventStats(fixture.toDS().toDF())
      .orderBy("hour_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}

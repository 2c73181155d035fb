package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.streaming.{Event, StreamDoc, StreamingOps}

/** Streaming surface for the driver contract.
  *
  * The same transforms run over streaming and batch frames (Catalyst plans
  * both); q37 actually executes through the streaming engine — file source →
  * Trigger.AvailableNow → memory sink — so incremental planning, state
  * store, and sink commit paths are all exercised and still oracle-checked.
  */
object Streaming {

  def all: Seq[GraftQuery] = Seq(sessionWindow, streamingHourly, typedSessions, streamingNearDup)

  /** Gap-based per-user sessions (strict-gap boundary = Spark
    * session_window semantics: a new session starts when the gap is ≥ 30
    * minutes).
    */
  private val sessionOracle =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(value AS DECIMAL(12,2)) AS v, ts
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, us, event_id, v, ts,
      |    CASE WHEN LAG(us) OVER w IS NULL
      |           OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), sess AS (
      |  SELECT user_id, v, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, MIN(ts) AS session_start,
      |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Native session_window sessionization (declarative; streaming-capable). */
  val sessionWindow: GraftQuery = GraftQuery.sql(
    "q36_session_window", sessionOracle) { (spark, dir) =>
    StreamingOps.sessionWindowStats(Tables.events(spark, dir))
      .orderBy("user_id", "session_start")
  }

  /** Hourly tumbling-window stats, executed as a REAL stream end-to-end. */
  val streamingHourly: GraftQuery = GraftQuery.sql(
    "q37_streaming_hourly",
    """SELECT
      |  make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000) AS hour_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    StreamingOps.runFileStream(spark, dir, StreamingOps.hourlyEventStats)
      .orderBy("hour_start", "event_type")
  }

  /** Streaming near-dup dedup (StreamingOps.nearDupBucketHits +
    * flagNearDups) executed through the SAME code path on a batch frame —
    * the stateful cross-micro-batch behavior is locked by
    * StreamingNearDupSpec; this oracle proves the SEMANTICS: every doc is
    * flagged against the smallest earlier doc sharing any MinHash band.
    *
    * Ordering contract: the streaming path flags against the bucket
    * minimum in ARRIVAL order, so Spark/oracle agreement is guaranteed
    * only when ingestion order is ascending doc_id — the batch path here
    * and the case StreamingNearDupSpec exercises. A stream delivering a
    * smaller doc_id after its near-duplicate keeps the earlier
    * (larger-id) doc unflagged; that arrival-order semantics is the
    * intended streaming behavior, not a defect this oracle can see.
    */
  val streamingNearDup: GraftQuery = GraftQuery.sql(
    "q68_streaming_neardup",
    "WITH " + TextOps.bandSigCtes + ",\n" +
      """e AS (
        |  SELECT a.doc_id AS doc_id, MIN(b.doc_id) AS canonical_id
        |  FROM sig a JOIN sig b ON a.band = b.band AND a.mh = b.mh
        |    AND b.doc_id < a.doc_id
        |  GROUP BY a.doc_id
        |)
        |SELECT d.doc_id,
        |  e.canonical_id IS NOT NULL AS is_dup,
        |  COALESCE(e.canonical_id, -1) AS canonical_id
        |FROM documents d LEFT JOIN e USING (doc_id)
        |WHERE len(string_split(d.text, ' ')) >= 3
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        lit(java.time.Instant.ofEpochSecond(1704067200L)).as("ts_t")).as[StreamDoc]
    StreamingOps.flagNearDups(StreamingOps.nearDupBucketHits(docs))
      .orderBy("doc_id")
  }

  /** Typed KeyValueGroupedDataset sessionization — same oracle as q36 (the
    * custom-state logic must agree with the declarative path exactly).
    */
  val typedSessions: GraftQuery = GraftQuery.sql(
    "q38_typed_sessionize", sessionOracle) { (spark, dir) =>
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts_t"))
      .as[Event]
    StreamingOps.typedSessionize(events)
      .toDF()
      .orderBy("user_id", "session_start")
  }
}

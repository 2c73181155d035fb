package graft.streaming

import java.time.Instant

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Typed event-stream record (the `events` table shape with a proper
  * micros timestamp).
  */
final case class Event(
    event_id: Long,
    user_id: Long,
    event_type: String,
    value: Double,
    ts_t: Instant)

/** One closed user session: gap-based (30 min), start = first event time.
  * Boundary semantics match Spark's session_window exactly: an event extends
  * the session iff its gap to the previous event is STRICTLY less than the
  * session gap — so the declarative and stateful paths share one oracle.
  */
final case class SessionOut(
    user_id: Long,
    session_start: Instant,
    n_events: Long,
    total_value: Double)

/** Accumulating state for one user's open session. */
final case class SessionState(
    start: Long, // epoch micros of first event
    last: Long, // epoch micros of latest event
    n: Long,
    totalCents: Long) // value summed in cents — exact, order-independent

/** One timestamped document flowing through streaming ingest. */
final case class StreamDoc(doc_id: Long, text: String, ts_t: Instant)

/** One LSH-bucket observation for a document: `earliest_id` is the smallest
  * earlier doc seen in the same (band, min-hash) bucket, or -1 if this doc
  * is the bucket's first.
  */
final case class BucketHit(doc_id: Long, band: Long, earliest_id: Long)

/** Per-bucket dedup state: smallest doc id seen + latest event time. */
final case class BucketState(minId: Long, lastUs: Long)

/** Structured-Streaming surface (SURVEY §2.7: the reference has no streaming
  * concept; Spark's native primitives fill the gap).
  *
  * Every transform here is source-agnostic: pass a streaming frame
  * (`readStream`) and it plans incrementally with watermark-based state
  * eviction; pass a batch frame and Catalyst runs the identical logical
  * plan — which is exactly how the DuckDB oracle checks it.
  */
object StreamingOps {

  val SessionGap = "30 minutes"
  private val SessionGapUs = 1800L * 1000000L

  /** Tumbling-window counts/sums per event type. On a streaming frame with
    * `withWatermark`, state for windows older than the watermark is evicted —
    * the unbounded-runtime requirement at 100 TB/day event volumes.
    */
  def hourlyEventStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      .select(
        col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Declarative gap-based sessionization — Spark's native session_window
    * (works identically over batch and streaming input).
    */
  def sessionWindowStats(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_t"), SessionGap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      .select(
        col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Typed batch sessionization — the same semantics as
    * [[statefulSessionize]], without streaming state. One shuffle on
    * user_id + a Tungsten partition sort, then a single streaming pass per
    * partition (no per-group materialization or Scala-side sort — the sort
    * happens in codegen'd SortExec, which is what scales past memory via
    * spill). For heavily skewed users prefer [[sessionWindowStats]].
    */
  def typedSessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_t"), col("event_id"))
      .mapPartitions { it =>
        var cur: Option[(Long, SessionState)] = None
        val closedThenOpen = it.flatMap { e =>
          val us = micros(e.ts_t)
          cur match {
            case Some((uid, s)) if uid == e.user_id && us - s.last < SessionGapUs =>
              cur = Some((uid, s.copy(last = us, n = s.n + 1,
                totalCents = s.totalCents + math.round(e.value * 100))))
              Iterator.empty
            case prev =>
              cur = Some((e.user_id, SessionState(us, us, 1, math.round(e.value * 100))))
              prev.iterator.map { case (uid, s) => closeSession(uid, s) }
          }
        }
        // `++` is by-name: the final flush reads `cur` only after the
        // partition iterator is exhausted
        closedThenOpen ++ cur.iterator.map { case (uid, s) => closeSession(uid, s) }
      }
  }

  private def micros(t: Instant): Long =
    t.getEpochSecond * 1000000L + t.getNano / 1000L

  private def closeSession(uid: Long, s: SessionState): SessionOut =
    SessionOut(uid,
      Instant.ofEpochSecond(s.start / 1000000L, (s.start % 1000000L) * 1000L),
      s.n, s.totalCents / 100.0)

  /** Custom stateful sessionization for streams: one GroupState per user,
    * closed either by a new event beyond the gap or by event-time timeout
    * once the watermark passes last+gap. State is O(open sessions), not
    * O(events) — the mapGroupsWithState pattern for arbitrary session
    * aggregates that session_window can't express.
    *
    * Requires `events.withWatermark("ts_t", ...)` upstream and
    * OutputMode.Append.
    */
  def statefulSessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          if (sys.env.contains("GRAFT_DEBUG_SESSIONS"))
            // scalastyle:off println
            println(s"[fMGWS] uid=$uid timedOut=${state.hasTimedOut} state=${state.getOption} wm=${state.getCurrentWatermarkMs()}")
          if (state.hasTimedOut) {
            state.getOption.foreach(s => out += closeSession(uid, s))
            state.remove()
          } else {
            val sorted = it.toArray.sortBy(e => (micros(e.ts_t), e.event_id))
            var st = state.getOption
            sorted.foreach { e =>
              val us = micros(e.ts_t)
              st match {
                case Some(s) if us - s.last < SessionGapUs =>
                  st = Some(s.copy(last = us, n = s.n + 1,
                    totalCents = s.totalCents + math.round(e.value * 100)))
                case cur =>
                  cur.foreach(s => out += closeSession(uid, s))
                  st = Some(SessionState(us, us, 1, math.round(e.value * 100)))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + SessionGapUs) / 1000L)
            }
          }
          out.iterator
      }
  }

  /** Streaming deduplication on `keyCols` only, with state bounded by the
    * watermark (`dropDuplicatesWithinWatermark`): a duplicate arriving
    * within `delay` of the original is dropped; state for older keys is
    * evicted — the bounded-state contract that keeps streaming ingest
    * dedup running forever. This is the streaming shape of the exact-dedup
    * operator (q24): fingerprint upstream, dedup on the fingerprint here.
    */
  def dedupStream(df: DataFrame, timeCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join — the streaming twin of
    * `RangeJoin.intervalJoin` (q101): every point event paired with every
    * window row whose half-open `[start, start + windowDurSeconds)`
    * contains its event time, via Spark's NATIVE stream-stream join.
    *
    * The batch operator's bin construction is not an optimization here —
    * it is what makes the query LEGAL: Spark rejects stream-stream joins
    * without an equality predicate (there is no way to hash-partition
    * matching rows together otherwise), and the bin id over event-time
    * micros (bin width = the window span, so a window covers ≤ 2 bins)
    * is that equi-key. The event-time RANGE residual on the two
    * watermarked columns is equally load-bearing: it is what the engine
    * uses to derive each side's state watermark, bounding buffered rows
    * to watermark + span and evicting behind it — the unbounded-runtime
    * requirement. Both inputs must carry `withWatermark` upstream.
    */
  def intervalJoinStream(
      points: DataFrame,
      windows: DataFrame,
      pointTime: String,
      windowStart: String,
      windowDurSeconds: Long): DataFrame = {
    require(windowDurSeconds > 0, s"window span must be positive, got $windowDurSeconds")
    val binUs = windowDurSeconds * 1000000L
    val p = points.withColumn("_rj_bin",
      expr(s"unix_micros(`$pointTime`) div ${binUs}L"))
    val w = windows.withColumn("_rj_bin", explode(sequence(
      expr(s"unix_micros(`$windowStart`) div ${binUs}L"),
      expr(s"(unix_micros(`$windowStart`) + ${binUs - 1}L) div ${binUs}L"))))
    p.join(w, Seq("_rj_bin"))
      .where(col(pointTime) >= col(windowStart) &&
        col(pointTime) < col(windowStart) + expr(s"INTERVAL $windowDurSeconds SECONDS"))
      .drop("_rj_bin")
  }

  /** Streaming NEAR-dup detection — the stateful shape of the q35 LSH
    * pipeline: each incoming document's MinHash band signatures (the fused
    * `ShingleBandMins` kernel, identical to the batch path) are checked
    * against per-(band, min-hash)-bucket state holding the smallest doc id
    * seen so far; a bucket collision with an earlier doc flags the row.
    * State is ONE (long, long) per live bucket — O(distinct buckets), not
    * O(docs) — and buckets idle past the watermark are evicted by
    * event-time timeout, so the dedup horizon equals the watermark delay
    * (the same contract as `dropDuplicatesWithinWatermark`, extended from
    * exact keys to similarity buckets).
    *
    * Emits one [[BucketHit]] per (doc, band); a document is a near-dup of
    * an earlier one iff ANY of its bands hit (`earliest_id != -1`) — that
    * final per-doc fold is a plain aggregation ([[flagNearDups]]), kept
    * OUT of this operator because chaining an aggregation after
    * flatMapGroupsWithState in one streaming query is unsupported; run it
    * downstream (foreachBatch, a second query, or batch).
    *
    * Requires `docs.withWatermark("ts_t", ...)` upstream for streaming
    * input; on a batch Dataset the identical code runs without timeouts —
    * which is how the spec cross-checks it against the batch LSH pairs.
    */
  def nearDupBucketHits(docs: Dataset[StreamDoc], bands: Int = 4,
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[BucketHit] = {
    import docs.sparkSession.implicits._
    import graft.functions.TextFunctions
    val exploded = docs.toDF()
      .select(col("doc_id"), col("ts_t"),
        TextFunctions.tokens(col("text")).as("_tk"))
      .where(size(col("_tk")) >= 3)
      .select(col("doc_id"), col("ts_t"),
        posexplode(TextFunctions.minhashBandMins(col("_tk"), 3, bands)))
      .select(col("doc_id"), col("ts_t"),
        col("pos").cast("long").as("band"), col("col").as("mh"))
      .as[(Long, Instant, Long, String)]
    exploded
      .groupByKey { case (_, _, band, mh) => (band, mh) }
      .flatMapGroupsWithState[BucketState, BucketHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), it: Iterator[(Long, Instant, Long, String)],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // ascending doc_id = arrival order within the batch: each doc
            // sees the bucket minimum over state + earlier batch rows only
            val rows = it.toArray.sortBy(_._1)
            var minId = state.getOption.map(_.minId).getOrElse(Long.MaxValue)
            var lastUs = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
            val out = rows.map { case (docId, ts, band, _) =>
              val hit = BucketHit(docId, band,
                if (minId < docId) minId else -1L)
              minId = math.min(minId, docId)
              lastUs = math.max(lastUs, micros(ts))
              hit
            }
            state.update(BucketState(minId, lastUs))
            // evict idle buckets once the watermark passes last + TTL;
            // getCurrentWatermarkMs throws when the query has no watermark
            // (batch mode) — there timeouts never fire anyway
            if (scala.util.Try(state.getCurrentWatermarkMs()).toOption.exists(_ >= 0))
              state.setTimeoutTimestamp(lastUs / 1000L + stateTtl.toMillis)
            out.iterator
          }
      }
  }

  /** Per-doc fold of [[nearDupBucketHits]]: `is_dup` iff any band hit an
    * earlier doc; `canonical_id` = the smallest such earlier doc (-1 for
    * originals). Plain aggregation — batch, foreachBatch, or a second
    * streaming query.
    */
  def flagNearDups(hits: Dataset[BucketHit]): DataFrame =
    hits.toDF()
      .groupBy(col("doc_id"))
      .agg(
        max(col("earliest_id") =!= -1L).as("is_dup"),
        min(when(col("earliest_id") =!= -1L, col("earliest_id"))).as("_canon"))
      .select(col("doc_id"), col("is_dup"),
        coalesce(col("_canon"), lit(-1L)).as("canonical_id"))

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Execute `transform` over the events parquet as a REAL stream — file
    * source, Trigger.AvailableNow, memory sink — and return the final
    * result table. Complete mode: with finite input, append mode would
    * withhold windows the closing watermark never passes.
    */
  def runFileStream(
      spark: SparkSession,
      dir: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the streaming file source needs a directory or glob, not a plain file
    // path; the testdata layout is one file per table, so glob the file
    val raw = Tables.withEventTime(
      spark.readStream.schema(schema).parquet(s"$dir/events.*"))
    val name = s"graft_stream_${runCounter.incrementAndGet()}"
    // Spark 4.1 writes + verifies a checksum SIDECAR for every checkpoint
    // file (spark.sql.streaming.checkpoint.fileChecksum.enabled, default
    // on) — corruption detection for long-lived checkpoints. This runner
    // always uses an EPHEMERAL temp checkpoint (memory sink, AvailableNow,
    // discarded at termination), where the sidecars are pure small-file
    // I/O: measured 2.9-3.1 s → 2.2-2.5 s warm per run (and an 18 s cold
    // outlier gone) with checksums off. Scoped to this runner and restored
    // after — a production job passing a DURABLE checkpointLocation keeps
    // the default protection.
    val ckKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prev = spark.conf.getOption(ckKey)
    spark.conf.set(ckKey, "false")
    try {
      val q = transform(raw).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Complete)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set(ckKey, v)
      case None => spark.conf.unset(ckKey)
    }
    spark.table(name)
  }
}

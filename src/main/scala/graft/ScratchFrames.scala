package graft

import org.apache.spark.sql.DataFrame

/** Session-global registry for PER-INVOCATION localCheckpoint scratch.
  *
  * `localCheckpoint()` is eager and its blocks live in the block manager
  * until the driver GCs the RDD handle — across bench reps (3 × 109 queries)
  * and a full Verify pass that is an unbounded leak (r16 advice): each
  * query-fn invocation re-checkpoints its shared frames and the previous
  * invocation's blocks linger. Query paths register their scratch here via
  * [[checkpoint]]; the harness (Bench after every rep, Verify after every
  * query write) calls [[release]] once the consuming action finished.
  *
  * ONLY for frames whose lifetime ends with the invocation's action.
  * Session-memoized frames (the q60 component cache, warmed ANN indexes,
  * BPE vocab memos) must keep a plain `localCheckpoint()`: releasing a
  * truncated-lineage frame that is read again later is data loss, not a
  * cleanup ('checkpoint block not found').
  *
  * Releasing is safe-by-timing, not safe-by-tracking: a frame registered
  * here must not be re-read after the action that consumed it. The
  * memoized-build paths that CREATE scratch during their first invocation
  * (q60's pair frames) satisfy this because their retained result is itself
  * checkpointed — its lineage no longer reaches the scratch.
  */
object ScratchFrames {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Callers that never [[release]] (test suites drive the operators
    * directly) must not have the queue PIN frames forever — past this many
    * entries the oldest references are simply dropped (not unpersisted:
    * only the harness can prove a frame dead), restoring the GC +
    * ContextCleaner cleanup those callers had before the registry existed.
    * Bench/Verify drain per rep/query and never approach the cap. */
  private val MaxPinned = 512

  private def add(df: DataFrame): DataFrame = {
    live.add(df)
    while (live.size > MaxPinned) { live.poll(): Unit }
    df
  }

  /** Eagerly localCheckpoint `df` and register the result for release. */
  def checkpoint(df: DataFrame): DataFrame = add(df.localCheckpoint())

  /** Register an already-`persist`ed frame whose cache dies with this
    * invocation (e.g. q83's per-rep reloaded index levels — loadIndex
    * persists them for serving, but the roundtrip query reads them once
    * and the next rep reloads fresh). Released by the same [[release]]. */
  def trackPersisted(df: DataFrame): DataFrame = add(df)

  /** Unpersist every registered scratch frame (non-blocking). Harness-side
    * hook — called after the action that consumed the frames. Goes through
    * [[org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks]]:
    * `Dataset.unpersist` alone is a no-op on checkpointed frames. */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) {
      try {
        // frees checkpointed frames (LogicalRDD blocks) ...
        org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(d)
        // ... and CacheManager-persisted ones (no-op for the other kind)
        d.unpersist()
      } catch { case scala.util.control.NonFatal(_) => () }
      d = live.poll()
    }
  }
}

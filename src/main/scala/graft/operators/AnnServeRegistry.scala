package graft.operators

import org.apache.spark.sql.SparkSession

/** JVM-wide serving handles behind the `graft_ann_serve` SQL function
  * (r13 verdict #5): one codes-resident snapshot ([[AnnLocalCodes]]) per
  * index path, opened on first use, answering per-row evals with pure
  * in-process arithmetic + mmap rerank reads. Freshness is re-checked
  * against the index save fingerprint at most every `freshnessMs` —
  * per-ROW FS listings would dominate the ms-scale searches SQL rows
  * make, so the SQL tier trades the Scala serve()'s per-call check for
  * a bounded staleness window (a re-save is picked up within seconds).
  *
  * Every gate fails LOUDLY with the remedy named: no silently-degraded
  * SQL answers (the discipline serve() pins with metTarget/covers()).
  */
object AnnServeRegistry {

  private final case class Entry(
      fingerprint: String,
      checkedAt: Long,
      cal: Option[AnnCalibration],
      ix: Option[AnnLocalIndex])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** How long an opened snapshot may serve before re-checking the index
    * save fingerprint (driver FS listing). Package-visible for specs.
    */
  private[graft] var freshnessMs: Long = 5000L

  /** Corpus cap for the SQL tier's codes snapshot — same meaning as
    * serve()'s `codesServeCap`.
    */
  private[graft] var codesServeCap: Long = 20000000L

  private def session: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "graft_ann_serve needs a SparkSession in the evaluating JVM to " +
          "open the serving snapshot (local mode, driver-side evaluation, " +
          "or an executor sharing the driver JVM). On a multi-JVM cluster " +
          "use the Scala AnnIvfPq.serve API instead."))

  private def open(path: String, fp: String, now: Long): Entry = {
    val spark = session
    val cal = AnnIvfPq.loadCalibration(spark, path)
    val ix =
      if (!AnnVecStore.exists(spark, path)) None
      else {
        val (coded, centroids, codebooks) = AnnIvfPq.loadIndex(spark, path)
        AnnLocalCodes.open(spark, path, coded, centroids, codebooks,
          maxRows = codesServeCap,
          residual = AnnIvfPq.isResidual(spark, path))
      }
    Entry(fp, now, cal, ix)
  }

  /** Driver-side open/refresh of the serving handle for `path` — called
    * at ANALYSIS time by the `graft_ann_serve` builder (the path must be
    * a literal/foldable argument for exactly this reason): opening reads
    * parquet (a Spark job), which is illegal from inside a task, so the
    * snapshot must exist before the first row evaluates. Refreshes when
    * the save fingerprint changed and at most every `freshnessMs` —
    * within one query the snapshot is fixed (a consistent read), across
    * queries a re-save is picked up at the next analysis past the window.
    */
  def warm(path: String): Unit = {
    val now = System.currentTimeMillis()
    val cached = cache.get(path)
    if (cached != null && now - cached.checkedAt < freshnessMs) return
    val fp = AnnIvfPq.serveFingerprint(session, path)
    if (cached != null && cached.fingerprint == fp)
      cache.put(path, cached.copy(checkedAt = now))
    else
      cache.put(path, open(path, fp, now))
    ()
  }

  /** One query against the WARMED snapshot for `path` at the persisted
    * calibration's knobs — pure in-process arithmetic + mmap reads, safe
    * on task threads. Throws (with the remedy) when the serving tier
    * cannot vouch: not warmed (non-literal path), no covering
    * calibration, no vecstore sidecar, or an over-cap corpus.
    */
  def search(
      path: String,
      queryId: Long,
      vec: Array[Double],
      targetRecall: Double,
      topK: Int): Array[AnnHit] = {
    val entry = Option(cache.get(path)).getOrElse(
      throw new IllegalStateException(
        s"graft_ann_serve: no warmed serving handle for $path — the path " +
          "argument must be a literal (the snapshot opens driver-side at " +
          "plan time; opening from a task would nest Spark jobs). Pass the " +
          "path as a string literal, or call AnnServeRegistry.warm first."))
    val cal = entry.cal.filter(_.covers(targetRecall, topK)).getOrElse(
      throw new IllegalStateException(
        s"graft_ann_serve: no stored calibration at $path covers " +
          s"targetRecall=$targetRecall topK=$topK — run " +
          "AnnIvfPq.calibrateEndToEnd + saveCalibration against this save"))
    val ix = entry.ix.getOrElse(
      throw new IllegalStateException(
        s"graft_ann_serve: no serving snapshot at $path — the SQL tier " +
          "reranks from the vecstore sidecar (AnnIvfPq.saveVectorStore) " +
          s"and caps the corpus at $codesServeCap rows; save the sidecar " +
          "or use the Scala AnnIvfPq.serve API"))
    ix.search(vec, nprobe = cal.nprobe, topK = topK,
      refine = if (cal.refine > 0) cal.refine else 200, queryId = queryId)
  }

  /** Drop all cached handles (spec hygiene between saves). */
  private[graft] def reset(): Unit = cache.clear()
}

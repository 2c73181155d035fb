package graft.operators

import org.apache.hadoop.conf.Configuration
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
  * SESSION-FREE since r15 (r14 verdict #2): when the index path carries
  * a committed [[AnnServePack]] (flat-file serving artifact written at
  * build time), the open reads plain files — NO SparkSession — so the
  * registry works in ANY JVM that can reach the artifact directory:
  * executor task threads on a multi-JVM cluster, or a standalone
  * serving process. Only a path WITHOUT a pack falls back to the
  * Spark-reading open (driver/local-mode JVMs), whose failure names
  * `AnnServePack.save` as the remedy.
  *
  * Every gate fails LOUDLY with the remedy named: no silently-degraded
  * SQL answers (the discipline serve() pins with metTarget/covers()).
  */
object AnnServeRegistry {

  private final case class Entry(
      fingerprint: String,
      checkedAt: Long,
      cal: Option[AnnCalibration],
      ix: Option[AnnLocalIndex],
      gen: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** The generation a re-save's warm() RETIRED, kept so a query that
    * pinned it at analysis time finishes against the snapshot it started
    * with (the consistent-read contract — r14 advice: per-row cache
    * lookups let a concurrent warm() swap the Entry mid-query). One
    * retired generation per path: a query spanning TWO re-saves of the
    * same index is outside the freshness window by construction and
    * fails loudly instead of silently mixing saves.
    */
  private val retired =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Entry]()

  /** Pinned-generation aliases. Generation counters are PER-JVM: a pin
    * minted on the driver means nothing to an executor's counter, so
    * the first search carrying an unknown pin in this JVM warms the
    * path and records `(path, foreignGen) -> localGen`; every later row
    * of that query (in this JVM) resolves through the alias — the
    * consistent read holds per JVM. In the MINTING JVM, [[pin]] records
    * the identity alias, so an unknown-gen lookup there is never
    * mistaken for a foreign pin.
    */
  private val pinAlias =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  private val genCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** How long an opened snapshot may serve before re-checking the index
    * save fingerprint (driver FS listing). Package-visible for specs.
    */
  private[graft] var freshnessMs: Long = 5000L

  /** Corpus cap for the SQL tier's codes snapshot — same meaning as
    * serve()'s `codesServeCap`.
    */
  private[graft] var codesServeCap: Long = 20000000L

  private def sessionOpt: Option[SparkSession] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)

  private def hadoopConf: Configuration =
    sessionOpt.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def open(path: String, fp: String, now: Long): Entry = {
    val gen = genCounter.incrementAndGet()
    // session-free first: a committed serve pack is the whole snapshot
    // as flat files (plus the vecstore mmaps) — works on any JVM
    AnnServePack.open(path, hadoopConf) match {
      case Some((ix, cal)) =>
        // a MAPPED pack open is admitted at ANY size (r15 verdict #1):
        // its ids/codes live in page cache, not on this JVM's heap, so
        // the codesServeCap — a HEAP budget — does not apply; only the
        // Spark-read fallback below (heap codes tier) still meters it
        Entry(fp, now, cal, Some(ix), gen)
      case None =>
        // a lazy open from a TASK thread must not fall back to the
        // parquet read — that nests a Spark job inside a task; only the
        // session-free pack path is legal here
        if (org.apache.spark.TaskContext.get() != null)
          throw new IllegalStateException(
            s"graft_ann_serve: no serve pack at $path and this eval runs " +
              "on a task thread, where opening the snapshot from parquet " +
              "would nest a Spark job. Write the session-free artifact at " +
              "build time (AnnIvfPq.saveVectorStore + AnnServePack.save), " +
              "or pass the path as a literal so the driver warms it at " +
              "plan time.")
        val spark = sessionOpt.getOrElse(throw new IllegalStateException(
          s"graft_ann_serve: no serve pack at $path and no SparkSession in " +
            "this JVM to open the snapshot from parquet. Write the " +
            "session-free artifact at build time (AnnIvfPq.saveVectorStore " +
            "+ AnnServePack.save) — it serves from any JVM that can reach " +
            "the path — or evaluate where a session exists (local mode / " +
            "driver-side)."))
        val cal = AnnIvfPq.loadCalibration(spark, path)
        val ix =
          if (!AnnVecStore.exists(spark, path)) None
          else {
            val (coded, centroids, codebooks) = AnnIvfPq.loadIndex(spark, path)
            AnnLocalCodes.open(spark, path, coded, centroids, codebooks,
              maxRows = codesServeCap,
              residual = AnnIvfPq.isResidual(spark, path))
          }
        Entry(fp, now, cal, ix, gen)
    }
  }

  /** Open/refresh the serving handle for `path` — called at ANALYSIS
    * time by the `graft_ann_serve` builder on the driver, and lazily by
    * [[search]] on any OTHER JVM (where the serve pack makes the open
    * session-free). Refreshes when the save fingerprint changed and at
    * most every `freshnessMs` — within one query the snapshot is fixed
    * (the pinned generation), across queries a re-save is picked up at
    * the next analysis past the window.
    */
  def warm(path: String): Unit = {
    val now = System.currentTimeMillis()
    val cached = cache.get(path)
    if (cached != null && now - cached.checkedAt < freshnessMs) return
    val fp = AnnIvfPq.serveFingerprint(hadoopConf, path)
    if (cached != null && cached.fingerprint == fp)
      cache.put(path, cached.copy(checkedAt = now))
    else {
      // retire the superseded generation so an in-flight query that
      // pinned it at analysis time finishes against ITS snapshot — keep
      // exactly one retired generation per path (see `retired`); drop
      // aliases that no longer resolve
      if (cached != null) {
        retired.keySet.removeIf(_._1 == path)
        retired.put((path, cached.gen), cached)
        // FOREIGN aliases (key gen != value, minted in another JVM) that
        // no longer resolve are MARKED superseded (value = -retiringGen-2)
        // instead of dropped (r15 advice): a dropped alias made the next
        // row of that query fall into the unknown-pin branch and silently
        // re-alias to the CURRENT generation — one query's rows mixing
        // two saves — where the same-JVM case fails loudly. The mark
        // makes the foreign case equally loud.
        val marks = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val mit = pinAlias.entrySet().iterator()
        while (mit.hasNext) {
          val e = mit.next()
          if (e.getKey._1 == path) {
            val v = e.getValue.longValue()
            if (v >= 0L && e.getKey._2 != v && v != cached.gen) marks += e.getKey
          }
        }
        marks.foreach(k => pinAlias.put(k, java.lang.Long.valueOf(-cached.gen - 2L)))
        // prune what's left outside the recency window — recent IDENTITY
        // markers (key gen == value, written by pin()) record "this JVM
        // minted the pin"; recent superseded marks keep the loud failure
        // alive for in-flight queries. The 64-generation window bounds
        // the map for long-lived serving processes.
        pinAlias.entrySet.removeIf { e =>
          e.getKey._1 == path && {
            val v = e.getValue.longValue()
            if (v >= 0L) v != cached.gen && !(e.getKey._2 == v && v > cached.gen - 64L)
            else (-v - 2L) <= cached.gen - 64L
          }
        }
        ()
      }
      cache.put(path, open(path, fp, now))
    }
    ()
  }

  /** The current serving generation for `path` — captured by the
    * `graft_ann_serve` builder at ANALYSIS time (right after [[warm]])
    * and passed to every [[search]] of that query, so ONE query's rows
    * all answer from ONE index save even when a concurrent query's
    * warm() refreshes the handle mid-flight. -1 when nothing is warmed
    * (non-literal path — eval falls back to the unpinned lookup).
    */
  def pin(path: String): Long = {
    val g = Option(cache.get(path)).map(_.gen).getOrElse(-1L)
    if (g >= 0L) pinAlias.put((path, g), java.lang.Long.valueOf(g))
    g
  }

  private def notWarmed(path: String): Nothing =
    throw new IllegalStateException(
      s"graft_ann_serve: no serving handle for $path could be opened in " +
        "this JVM — with a serve pack (AnnServePack.save) the open is " +
        "session-free; without one the path must be a literal so the " +
        "driver warms it at plan time, or call AnnServeRegistry.warm first.")

  /** One query against the snapshot for `path` at the persisted
    * calibration's knobs — pure in-process arithmetic + mmap reads, safe
    * on task threads (a serve pack opens here session-free on first
    * use). Throws (with the remedy) when the serving tier cannot vouch:
    * no way to open, no covering calibration, no vecstore sidecar, or
    * an over-cap corpus.
    */
  def search(
      path: String,
      queryId: Long,
      vec: Array[Double],
      targetRecall: Double,
      topK: Int,
      pinnedGen: Long = -1L): Array[AnnHit] = {
    def lookup(g: Long): Option[Entry] =
      Option(cache.get(path)).filter(_.gen == g)
        .orElse(Option(retired.get((path, g))))
    val entry: Entry =
      if (pinnedGen < 0L)
        Option(cache.get(path)).getOrElse {
          warm(path) // session-free when a pack exists; throws otherwise
          Option(cache.get(path)).getOrElse(notWarmed(path))
        }
      else Option(pinAlias.get((path, pinnedGen))) match {
        case Some(localGen) if localGen.longValue() < 0L =>
          // a FOREIGN pin whose local alias was superseded by a later
          // re-save mid-query (the mark warm() writes): same loud
          // failure as the same-JVM case — never silently mix two saves
          throw new IllegalStateException(
            s"graft_ann_serve: the index save this query pinned at " +
              s"analysis time (foreign gen $pinnedGen at $path) was " +
              "superseded by re-saves while the query ran in this JVM — " +
              "a consistent read is no longer possible; re-run the query.")
        case Some(localGen) =>
          // this JVM has seen the pin (it minted it, or aliased it):
          // a failed lookup means the pinned save was superseded by
          // more than one re-save mid-query — no consistent read left
          lookup(localGen.longValue()).getOrElse(
            throw new IllegalStateException(
              s"graft_ann_serve: the index save this query pinned at " +
                s"analysis time (gen $pinnedGen at $path) was superseded " +
                "by more than one re-save while the query ran — a " +
                "consistent read is no longer possible; re-run the query."))
        case None =>
          // a FOREIGN pin (minted in another JVM): warm locally and alias
          // it so every later row of this query resolves to this snapshot
          if (cache.get(path) == null) warm(path)
          val e = Option(cache.get(path)).getOrElse(notWarmed(path))
          pinAlias.put((path, pinnedGen), java.lang.Long.valueOf(e.gen))
          e
      }
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
          "(and ideally AnnServePack.save for session-free opens) or use " +
          "the Scala AnnIvfPq.serve API"))
    ix.search(vec, nprobe = cal.nprobe, topK = topK,
      refine = if (cal.refine > 0) cal.refine else 200, queryId = queryId)
  }

  /** Drop all cached handles (spec hygiene between saves). */
  private[graft] def reset(): Unit = {
    cache.clear(); retired.clear(); pinAlias.clear()
  }
}

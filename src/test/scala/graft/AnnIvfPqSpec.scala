package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.{AnnIvf, AnnIvfPq, AnnPq}

/** IVF+PQ composition: at nprobe = k (every list probed) the composed
  * search must DEGENERATE to the plain PQ full-code scan — same ADC
  * table, same candidates, same shortlist, same exact re-rank — and at
  * real probe counts the fast production kernel must keep recall vs
  * exact brute force above a locked floor while scanning only the
  * probed lists.
  */
class AnnIvfPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val built = {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    val cb = AnnPq.train(emb, exactMeans = false)
    val coded = AnnIvfPq.index(indexed, AnnPq.encode(emb, cb)).cache()
    (coded, centroids, cb)
  }

  test("nprobe = k degenerates to the full PQ scan, result-identical") {
    val (coded, centroids, cb) = built
    val queries = emb.where(col("vec_id") < 30)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val composed = rows(AnnIvfPq.search(
      queries, coded, centroids, cb, emb, nprobe = 16, topK = 3, refine = 10))
    val full = rows(AnnPq.search(queries, coded.select("vec_id", "codes"), cb, emb,
      topK = 3, refine = 10))
    assert(composed == full,
      s"nprobe=k must equal the full PQ scan (${composed.size} vs ${full.size} rows)")
  }

  test("save → load → search is identical to the in-session index") {
    val (coded, centroids, cb) = built
    val queries = emb.where(col("vec_id") < 30)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_roundtrip_spec"
    AnnIvfPq.saveIndex(coded, centroids, cb, path)
    val (coded2, centroids2, cb2) = AnnIvfPq.loadIndex(spark, path)
    assert(cb2.length == cb.length &&
      cb2.zip(cb).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x.sameElements(y) } },
      "codebooks must roundtrip bit-exactly")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val inSession = rows(AnnIvfPq.search(
      queries, coded, centroids, cb, emb, nprobe = 6, topK = 3, refine = 10))
    val reloaded = rows(AnnIvfPq.search(
      queries, coded2, centroids2, cb2, emb, nprobe = 6, topK = 3, refine = 10))
    assert(inSession == reloaded, "reloaded index must search identically")
  }

  test("persisted calibration: load → searchAuto runs ZERO calibration jobs, searches bit-identically (r10 verdict #3)") {
    val (coded, centroids, cb) = built
    val queries = emb.where(col("vec_id") < 30)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_cal_spec"
    AnnIvfPq.saveIndex(coded, centroids, cb, path)
    // the persistable calibration is the END-TO-END one (r12 advice: a
    // probe-only PQ calibration carries metTarget=false and can never
    // vouch for covers() reuse — tested in the gating case below)
    val cal = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb)
    assert(cal.nprobe >= 1 && cal.refine >= 200 && cal.epoch.isEmpty)
    assert(cal.metTarget, "sf0.01 end-to-end calibration must reach its target")
    assert(cal.corpusSize == emb.count())
    val stamped = AnnIvfPq.saveCalibration(spark, path, cal)
    assert(stamped.epoch.nonEmpty)
    val loaded = AnnIvfPq.loadCalibration(spark, path)
    assert(loaded.contains(stamped), s"roundtrip mismatch: $loaded vs $stamped")

    val (coded2, cents2, cb2) = AnnIvfPq.loadIndex(spark, path)
    // job-count proof via a job group (suites share the session and run in
    // parallel, so a global listener would cross-count): any calibration
    // work fires eagerly — and therefore in THIS thread's group — during
    // searchAuto construction; plan construction itself fires nothing.
    val sc = spark.sparkContext
    def groupJobs(grp: String)(f: => Unit): Int = {
      sc.setJobGroup(grp, "calibration job probe")
      try f finally sc.clearJobGroup()
      // the status store is fed asynchronously — settle briefly
      var ids = sc.statusTracker.getJobIdsForGroup(grp)
      val deadline = System.nanoTime() + 5000000000L
      while (ids.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(200)
        ids = sc.statusTracker.getJobIdsForGroup(grp)
      }
      ids.length
    }
    var dfCal: org.apache.spark.sql.DataFrame = null
    val calJobs = groupJobs("ivfpq-cal-reuse") {
      dfCal = AnnIvfPq.searchAuto(queries, coded2, cents2, cb2, emb,
        calibration = loaded)
    }
    // ≤ 2: search()'s query-side broadcast guard (r12 verdict #5) fires
    // one bounded limit-count at construction — O(threshold) regardless
    // of corpus size, NOT a calibration scan. Zero calibration jobs
    // means: nothing beyond that guard.
    assert(calJobs <= 2,
      s"calibrated searchAuto construction fired $calJobs jobs — more than " +
        "the bounded broadcast-guard probe means calibration ran")
    // sanity arm: the same construction WITHOUT the stored calibration
    // does fire the sample-scan jobs (guards the probe itself)
    val uncalJobs = groupJobs("ivfpq-cal-fresh") {
      AnnIvfPq.searchAuto(queries, coded2, cents2, cb2, emb): Unit
    }
    assert(uncalJobs > calJobs,
      "probe sanity: uncalibrated searchAuto must fire the sample-scan jobs")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val got = rows(dfCal)
    assert(got == rows(AnnIvfPq.search(queries, coded2, cents2, cb2, emb,
      nprobe = stamped.nprobe, topK = 3, refine = stamped.refine)),
      "calibrated searchAuto must equal explicit search at the stored knobs")
    assert(got == rows(AnnIvfPq.searchAuto(queries, coded, centroids, cb, emb)),
      "calibrated reload must search bit-identically to the in-session auto path")

    // a calibration run for a LOWER target cannot vouch for a higher one
    val low = stamped.copy(targetRecall = 0.5)
    val recal = groupJobs("ivfpq-cal-low") {
      AnnIvfPq.searchAuto(queries, coded2, cents2, cb2, emb,
        targetRecall = 0.9, calibration = Some(low)): Unit
    }
    assert(recal > 0, "a lower-target calibration must trigger recalibration")

    // epoch staleness: a re-saved index invalidates the stored calibration
    AnnIvfPq.saveIndex(coded, centroids, cb, path)
    assert(AnnIvfPq.loadCalibration(spark, path).isEmpty,
      "calibration from a previous index save must not load")
  }

  test("every candidate honors the probe restriction (recall floor at nprobe=6)") {
    val (coded, centroids, cb) = built
    val queries = emb.where(col("vec_id") < 50)
    val got = AnnIvfPq.search(queries, coded, centroids, cb, emb,
      nprobe = 6, topK = 3, refine = 100)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("qv").cast("array<double>"), col("nv").cast("array<double>"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v).as("dist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (got intersect exact).size.toDouble / exact.size
    info(f"recall@3 = $recall%.3f (got=${got.size}, exact=${exact.size})")
    // IVF probe restriction caps recall by construction on the
    // near-uniform fixture (the q47 curve: nprobe 6/16 ≈ 0.7); the
    // composition must not degrade below the IVF envelope
    assert(recall >= 0.5, f"recall too low: $recall%.3f")

    // structural: a returned neighbor must live in one of its query's
    // probed lists — the whole point of the composition
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      .join(broadcast(centroids))
      .withColumn("_sim", nanvl(VectorFunctions.cosineApprox(col("_qv"), col("_cv"),
        VectorFunctions.dotApprox(col("_qv"), col("_qv")),
        VectorFunctions.dotApprox(col("_cv"), col("_cv"))), lit(-2.0)))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("_sim"), col("_c"))))
      .where(col("_rk") <= 6)
      .select(col("query_id"), col("_c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val assignment = coded.select(col("vec_id"), col("_centroid").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    got.foreach { case (qid, nid) =>
      assert(probes.contains((qid, assignment(nid))),
        s"neighbor $nid of query $qid came from an unprobed list")
    }
  }

  test("calibrateEndToEnd tunes the refine shortlist against end-to-end sample recall (r11)") {
    val (coded, centroids, cb) = built
    // starting shortlist of 1: topK·1 = 3 ADC-ranked candidates go to the
    // exact re-rank — the PQ quantization loss is fully exposed, so the
    // tuner must escalate (the 10M-hard regime reproduced at spec scale)
    val tuned = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb,
      refine = 1, maxRefine = 256)
    info(s"tuned: nprobe=${tuned.nprobe} refine=${tuned.refine} " +
      f"recall=${tuned.measuredRecall}%.3f")
    // contract: either the margin-adjusted target was cleared, or the
    // tuner hit maxRefine and reports the measured ceiling honestly
    val margin = math.sqrt(0.9 * 0.1 / (tuned.corpusSize.min(32) * 3).toDouble)
    assert(tuned.measuredRecall >= math.min(1.0, 0.9 + margin) ||
      tuned.refine == 256,
      s"stopped at refine=${tuned.refine} recall=${tuned.measuredRecall} " +
        "without clearing the target or the bound")
    // the escalation is real on this fixture: a shortlist pinned at the
    // start value measures strictly lower end-to-end sample recall
    val capped = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb,
      refine = 1, maxRefine = 1)
    info(f"capped at rf=1: recall=${capped.measuredRecall}%.3f")
    assert(capped.refine == 1, "maxRefine must bound the escalation")
    assert(capped.measuredRecall < tuned.measuredRecall,
      f"rf=1 (${capped.measuredRecall}%.3f) should trail the tuned " +
        f"shortlist (${tuned.measuredRecall}%.3f) on the PQ path")
    // a persisted tuned calibration serves at ITS refine, not the default:
    // searchAuto(calibration = tuned') must equal explicit search at the
    // tuned knobs (the reuse path carries BOTH knobs)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_e2e_cal_spec"
    AnnIvfPq.saveIndex(coded, centroids, cb, path)
    val stamped = AnnIvfPq.saveCalibration(spark, path, tuned)
    val queries = emb.where(col("vec_id") < 30)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    assert(rows(AnnIvfPq.searchAuto(queries, coded, centroids, cb, emb,
      calibration = Some(stamped))) ==
      rows(AnnIvfPq.search(queries, coded, centroids, cb, emb,
        nprobe = stamped.nprobe, topK = 3, refine = stamped.refine)),
      "reused calibration must serve at the tuned (nprobe, refine)")
  }

  test("residual encode: kernel path is bit-identical to the declarative chain (r12 verdict #1)") {
    val (_, centroids, _) = built
    val (indexed, _) = AnnIvf.buildIndex(emb)
    val rcb = AnnIvfPq.trainResidual(indexed, centroids, exactMeans = false)
    def codes(exprKernel: Boolean): Map[Long, Seq[Int]] =
      AnnIvfPq.encodeResidual(indexed, centroids, rcb, exprKernel = exprKernel)
        .select(col("vec_id").cast("long"), col("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val kernel = codes(exprKernel = true)
    val decl = codes(exprKernel = false)
    assert(kernel.size == decl.size && kernel.size == emb.count())
    assert(kernel == decl, "residual PqCodes kernel diverged from the declarative argmin")
  }

  test("residual IVF+PQ: recall at equal knobs, roundtrip with variant flag (r12 verdict #1)") {
    val (_, centroids, _) = built
    val (indexed, _) = AnnIvf.buildIndex(emb)
    val rcb = AnnIvfPq.trainResidual(indexed, centroids, exactMeans = false)
    val rcoded = AnnIvfPq.encodeResidual(indexed, centroids, rcb).cache()
    val queries = emb.where(col("vec_id") < 50)
    def got(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact L2 truth
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))
    val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("qv").cast("array<double>"), col("nv").cast("array<double>"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v).as("dist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]): Double = (s intersect exact).size.toDouble / exact.size
    // raw vs residual at IDENTICAL knobs — the r11 10M-hard gap this path
    // exists for; on the spec fixture residual must at least hold the line
    val (codedRaw, _, cbRaw) = built
    val rRaw = recall(got(AnnIvfPq.search(queries, codedRaw, centroids, cbRaw, emb,
      nprobe = 6, topK = 3, refine = 10)))
    val rRes = recall(got(AnnIvfPq.search(queries, rcoded, centroids, rcb, emb,
      nprobe = 6, topK = 3, refine = 10, residual = true)))
    info(f"recall@3 at nprobe=6/rf=10: raw=$rRaw%.3f residual=$rRes%.3f")
    assert(rRes >= rRaw - 0.02,
      f"residual encoding regressed recall: $rRes%.3f vs raw $rRaw%.3f")
    // roundtrip: the variant marker makes a reloaded residual index serve
    // bit-identically through searchAuto(residual = isResidual(path))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_residual_spec"
    AnnIvfPq.saveIndex(rcoded, centroids, rcb, path, residual = true)
    assert(AnnIvfPq.isResidual(spark, path), "variant marker must say residual")
    val cal = AnnIvfPq.saveCalibration(spark, path,
      AnnIvfPq.calibrateEndToEnd(rcoded, centroids, rcb, emb, residual = true))
    val (c2, ct2, cb2) = AnnIvfPq.loadIndex(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    assert(rows(AnnIvfPq.searchAuto(queries, c2, ct2, cb2, emb,
      calibration = Some(cal), residual = AnnIvfPq.isResidual(spark, path))) ==
      rows(AnnIvfPq.search(queries, rcoded, centroids, rcb, emb,
        nprobe = cal.nprobe, topK = 3, refine = cal.refine, residual = true)),
      "reloaded residual index must search bit-identically")
    // a raw save stays raw (marker correctness both ways)
    val rawPath = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_raw_spec"
    AnnIvfPq.saveIndex(codedRaw, centroids, cbRaw, rawPath)
    assert(!AnnIvfPq.isResidual(spark, rawPath))
    // the one-call serve path composes marker + calibration + index:
    // identical rows to the explicit residual search at the stored knobs
    assert(rows(AnnIvfPq.serve(spark, path, queries, emb)) ==
      rows(AnnIvfPq.search(queries, rcoded, centroids, rcb, emb,
        nprobe = cal.nprobe, topK = 3, refine = cal.refine, residual = true)),
      "serve(path) must equal explicit residual search at the stored knobs")
    rcoded.unpersist()
  }

  test("calibration reuse is gated on topK and metTarget (r12: r11 advice + verdict #5)") {
    val (coded, centroids, cb) = built
    val queries = emb.where(col("vec_id") < 30)
    val sc = spark.sparkContext
    def groupJobs(grp: String)(f: => Unit): Int = {
      sc.setJobGroup(grp, "calibration reuse probe")
      try f finally sc.clearJobGroup()
      var ids = sc.statusTracker.getJobIdsForGroup(grp)
      val deadline = System.nanoTime() + 5000000000L
      while (ids.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(200)
        ids = sc.statusTracker.getJobIdsForGroup(grp)
      }
      ids.length
    }
    // a shortlist capped below target reports metTarget=false — the caller
    // detects the unmet target from the calibration itself (verdict #5)
    val capped = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb,
      refine = 1, maxRefine = 1)
    assert(capped.topK == 3)
    assert(capped.metTarget == (capped.measuredRecall >= capped.targetRecall))
    if (!capped.metTarget) {
      // …and searchAuto refuses to serve it as if it vouched: reuse is
      // skipped, the sample calibration fires
      val jobs = groupJobs("ivfpq-gate-unmet") {
        AnnIvfPq.searchAuto(queries, coded, centroids, cb, emb,
          calibration = Some(capped)): Unit
      }
      assert(jobs > 0, "an unmet-target calibration must not be reused")
    }
    // a probe-only PQ calibration can NEVER vouch (r12 advice): its
    // sample recall only upper-bounds end-to-end recall, so it ships
    // metTarget=false regardless of the measurement
    val met = AnnIvfPq.calibrate(coded, centroids, emb)
    assert(met.topK == 3 && !met.metTarget,
      "probe-only PQ calibration must not claim to have met the target")
    assert(!met.covers(0.9, 3))
    // a calibration measured at topK=3 cannot vouch for topK=10 — tested
    // with a MET end-to-end calibration so topK is the only refusal
    val metE2e = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb)
    assert(metE2e.metTarget)
    val jobsTopK = groupJobs("ivfpq-gate-topk") {
      AnnIvfPq.searchAuto(queries, coded, centroids, cb, emb,
        topK = 10, calibration = Some(metE2e)): Unit
    }
    assert(jobsTopK > 0, "a topK=3 calibration must not be reused for topK=10")
    // tuneRefine=false keeps the cheaper probe-only calibration: same
    // nprobe choice as calibrate(), refine stays the caller's knob
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    assert(rows(AnnIvfPq.searchAuto(queries, coded, centroids, cb, emb,
      tuneRefine = false)) ==
      rows(AnnIvfPq.search(queries, coded, centroids, cb, emb,
        nprobe = met.nprobe, topK = 3, refine = 200)),
      "tuneRefine=false must search at the probe-only calibrated depth")
  }

  test("searchAuto reaches the 0.9 recall target on BOTH corpus regimes") {
    // the r9 gap: the composed path's fixed nprobe=4 default measured
    // recall@3 0.70 on the near-uniform fixture — the worst default on
    // the ladder. searchAuto must calibrate probe depth per corpus (L2
    // truth — what the exact re-rank returns by) and the SEARCHED recall
    // must clear the target in both regimes (0.85 asserted: the
    // calibration is a 32-query sample estimate, same slack as
    // AnnIvfSpec's).
    def measuredRecall(corpus: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val (indexed, centroids) = AnnIvf.buildIndex(corpus)
      val cb = AnnPq.train(corpus, exactMeans = false)
      val coded = AnnIvfPq.index(indexed, AnnPq.encode(corpus, cb)).cache()
      val queries = corpus.where(col("vec_id") < 50)
      val got = AnnIvfPq.searchAuto(queries, coded, centroids, cb, corpus)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      coded.unpersist()
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))
      val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          aggregate(zip_with(col("qv").cast("array<double>"), col("nv").cast("array<double>"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v).as("dist"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got.size.toLong, (got intersect exact).size.toDouble / exact.size)
    }

    // the testdata embeddings: the regime where the fixed nprobe=4
    // default under-recalled (0.70 on sf0.1) — auto must probe deeper
    // AND actually clear the target
    val (nEmb, recEmb) = measuredRecall(emb)
    info(f"testdata fixture: recall@3=$recEmb%.3f ($nEmb rows)")
    assert(recEmb >= 0.85, f"testdata recall $recEmb%.3f < 0.85")

    // a second, independently-shaped corpus: seeded i.i.d. vectors (the
    // same fixture shape AnnIvfSpec calibrates against)
    val rnd = new scala.util.Random(1234)
    import spark.implicits._
    val iid = (0L until 2000L).map { i =>
      (i, Array.fill(16)(rnd.nextDouble() * 2.0 - 1.0))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .cache()
    val (nIid, recIid) = measuredRecall(iid)
    info(f"iid fixture: recall@3=$recIid%.3f ($nIid rows)")
    assert(recIid >= 0.85, f"iid recall $recIid%.3f < 0.85")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIvf, AnnIvfPq, AnnPq, AnnServePack, AnnVecStore}

/** r15 surface: the segmented vecstore (distributed save, O(batch)
  * appends, legacy v1 reads), incremental ANN maintenance
  * ([[AnnIvfPq.appendVectors]] ≡ rebuild-with-frozen-structures), and
  * the session-free serve pack ([[AnnServePack]]) with delta appends.
  */
class AnnAppendSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val base = emb.where(col("vec_id") % 8 =!= 0)
  private lazy val batch = emb.where(col("vec_id") % 8 === 0)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
      col("rk").cast("long"), col("dist").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .sorted.toIndexedSeq

  // ---------------------------------------------------------------- vecstore

  test("segmented vecstore: distributed save (multi-segment) reads bit-identical to the single-writer layout; appends are new segments; duplicates refused") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_vs_seg").toString
    // tiny target → many segments (dim 16 → 128 B/row; 600-ish rows)
    AnnVecStore.save(emb, d1, targetSegmentBytes = 4096L)
    val st = AnnVecStore.open(spark, d1).getOrElse(fail("store must open"))
    val all = emb.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(st.size == all.length.toLong)
    val q = all.head._2
    all.take(100).foreach { case (id, v) =>
      var dd = 0.0
      var i = 0
      while (i < v.length) { val x = q(i) - v(i); dd += x * x; i += 1 }
      assert(java.lang.Double.doubleToLongBits(st.dist(id, q)) ==
        java.lang.Double.doubleToLongBits(dd), s"segmented dist diverged at id $id")
      assert(st.vector(id).toSeq == v.toSeq)
    }
    intercept[IllegalStateException] { st.dist(-5L, q) }

    // append path: base-only store + a batch segment == full-corpus reads
    val d2 = java.nio.file.Files.createTempDirectory("graft_vs_app").toString
    AnnVecStore.save(base, d2)
    val appended = AnnVecStore.appendSegment(spark, d2, batch)
    assert(appended == batch.count())
    val st2 = AnnVecStore.open(spark, d2).getOrElse(fail("appended store must open"))
    assert(st2.size == all.length.toLong)
    all.take(50).foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(st2.dist(id, q)) ==
        java.lang.Double.doubleToLongBits(st.dist(id, q)))
      assert(st2.contains(id))
    }
    // duplicate ids are refused loudly
    intercept[IllegalArgumentException] {
      AnnVecStore.appendSegment(spark, d2, batch)
    }
  }

  test("legacy GRAFTVS1 single-pair layout still opens (one-segment store)") {
    val d = java.nio.file.Files.createTempDirectory("graft_vs_v1").toString
    val vs = new java.io.File(d, "vecstore")
    vs.mkdirs()
    val sample = emb.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>"))
      .orderBy("vec_id").limit(10).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dim = sample.head._2.length
    val ids = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(vs, "ids.bin")))
    val vecs = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(vs, "vectors.bin")))
    sample.foreach { case (id, v) => ids.writeLong(id); v.foreach(vecs.writeDouble) }
    ids.close(); vecs.close()
    val meta = new java.io.FileOutputStream(new java.io.File(vs, "meta.txt"))
    meta.write(s"GRAFTVS1 ${sample.length} $dim\n".getBytes("UTF-8")); meta.close()
    val st = AnnVecStore.open(spark, d).getOrElse(fail("v1 store must open"))
    assert(st.size == sample.length.toLong)
    val q = sample.head._2
    sample.foreach { case (id, v) =>
      var dd = 0.0
      var i = 0
      while (i < dim) { val x = q(i) - v(i); dd += x * x; i += 1 }
      assert(java.lang.Double.doubleToLongBits(st.dist(id, q)) ==
        java.lang.Double.doubleToLongBits(dd))
    }
  }

  test("vecstore commit discipline: stray uncommitted files are invisible; a corrupt meta is loud, and the previous meta survives a torn append") {
    val d = java.nio.file.Files.createTempDirectory("graft_vs_commit").toString
    AnnVecStore.save(base, d)
    val st0 = AnnVecStore.open(spark, d).getOrElse(fail("store must open"))
    val n0 = st0.size
    // a crashed append leaves segment files but no meta swap: invisible
    val vs = new java.io.File(d, "vecstore")
    val strayIds = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(vs, "seg-stray.ids.bin")))
    strayIds.writeLong(999999999L); strayIds.close()
    val strayVec = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(vs, "seg-stray.vec.bin")))
    (0 until 16).foreach(_ => strayVec.writeDouble(0.0)); strayVec.close()
    val st1 = AnnVecStore.open(spark, d).getOrElse(fail("store must reopen"))
    assert(st1.size == n0, "uncommitted segment files must be invisible")
    assert(!st1.contains(999999999L))
    // a corrupt meta fails loudly, never a silent partial read
    val meta = new java.io.File(vs, "meta.txt")
    val good = java.nio.file.Files.readAllBytes(meta.toPath)
    java.nio.file.Files.write(meta.toPath, "GARBAGE 1 2\n".getBytes("UTF-8"))
    intercept[Exception] { AnnVecStore.open(spark, d) }
    java.nio.file.Files.write(meta.toPath, good)
    assert(AnnVecStore.open(spark, d).exists(_.size == n0))
  }

  // ------------------------------------------------------------ appendVectors

  /** append ≡ rebuild-with-frozen-structures, both encodings. */
  private def appendVsRebuild(residual: Boolean): Unit = {
    val (indexedB, centroidsB) = AnnIvf.buildIndex(base)
    val cb =
      if (residual) AnnIvfPq.trainResidual(indexedB, centroidsB, exactMeans = false)
      else AnnPq.train(base, exactMeans = false)
    val codedB =
      if (residual) AnnIvfPq.encodeResidual(indexedB, centroidsB, cb)
      else AnnIvfPq.index(indexedB, AnnPq.encode(base, cb))
    val d = java.nio.file.Files.createTempDirectory(
      s"graft_append_$residual").toString
    AnnIvfPq.saveIndex(codedB, centroidsB, cb, d, residual = residual)
    AnnIvfPq.saveVectorStore(base, d)
    val stats = AnnIvfPq.appendVectors(spark, d, batch)
    assert(stats.appended == batch.count())
    // drift: the batch is the SAME distribution as the base (an id-mod
    // split), so the frozen codebooks quantize it comparably
    assert(stats.baseQuantMse > 0.0 && stats.batchQuantMse > 0.0)
    assert(stats.driftRatio > 0.25 && stats.driftRatio < 4.0,
      s"same-distribution batch read driftRatio=${stats.driftRatio}")
    // the sidecar followed the append
    val st = AnnVecStore.open(spark, d).getOrElse(fail("sidecar must open"))
    assert(st.size == emb.count())

    // rebuild-with-frozen-structures: same frozen centroids/codebooks,
    // assignment + encode evaluated over the full corpus
    val assignedAll = AnnIvf.assignFrozen(emb, centroidsB)
    val codedAll =
      if (residual) AnnIvfPq.encodeResidual(assignedAll, centroidsB, cb)
      else AnnIvfPq.index(assignedAll, AnnPq.encode(emb, cb))
    val queries = emb.where(col("vec_id") < 20)
    val (codedApp, centsApp, cbApp) = AnnIvfPq.loadIndex(spark, d)
    val viaAppend = AnnIvfPq.search(queries, codedApp, centsApp, cbApp, emb,
      nprobe = 4, topK = 3, refine = 20, residual = residual)
    val viaRebuild = AnnIvfPq.search(queries, codedAll, centroidsB, cb, emb,
      nprobe = 4, topK = 3, refine = 20, residual = residual)
    assert(rows(viaAppend) == rows(viaRebuild),
      s"append != rebuild-with-frozen (residual=$residual)")
  }

  test("appendVectors ≡ rebuild-with-frozen-structures (raw encoding)") {
    appendVsRebuild(residual = false)
  }

  test("appendVectors ≡ rebuild-with-frozen-structures (residual encoding)") {
    appendVsRebuild(residual = true)
  }

  test("appendVectors refreshes serve(): appended rows are reachable, calibration stays valid") {
    val (indexedB, centroidsB) = AnnIvf.buildIndex(base)
    val cb = AnnPq.train(base, exactMeans = false)
    val codedB = AnnIvfPq.index(indexedB, AnnPq.encode(base, cb))
    val d = java.nio.file.Files.createTempDirectory("graft_append_serve").toString
    AnnIvfPq.saveIndex(codedB, centroidsB, cb, d)
    AnnIvfPq.saveVectorStore(base, d)
    val cal = AnnIvfPq.calibrateEndToEnd(codedB, centroidsB, cb, base)
    AnnIvfPq.saveCalibration(spark, d, cal)
    assume(cal.metTarget, "sf0.001 calibration must meet its target")
    val queries = emb.where(col("vec_id") < 20)
    val before = AnnIvfPq.serve(spark, d, queries, base)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    AnnIvfPq.appendVectors(spark, d, batch): Unit
    // calibration survives the append (frozen-structure property)
    assert(AnnIvfPq.loadCalibration(spark, d).exists(_.covers(cal.targetRecall, 3)))
    val after = AnnIvfPq.serve(spark, d, queries, emb)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the appended corpus answers from the post-append snapshot and must
    // agree with a direct search over the appended index at the same knobs
    val (c2, ce2, cb2) = AnnIvfPq.loadIndex(spark, d)
    val direct = AnnIvfPq.search(queries, c2, ce2, cb2, emb,
      nprobe = cal.nprobe, topK = 3, refine = cal.refine)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == direct, "post-append serve() diverged from a direct search")
    // the appended rows actually participate: some answer must involve a
    // batch id (vec_id % 8 == 0) as a neighbor, or the before/after sets
    // must differ (the batch adds 1/8 of the corpus next to every query)
    assert(after != before || after.exists(_._2 % 8 == 0),
      "append had no observable effect on serving")
  }

  // -------------------------------------------------------------- serve pack

  test("serve pack: session-free open answers row-identical to serve(); survives without the parquet index; deltas fold appends in") {
    val (indexedB, centroidsB) = AnnIvf.buildIndex(base)
    val cb = AnnPq.train(base, exactMeans = false)
    val codedB = AnnIvfPq.index(indexedB, AnnPq.encode(base, cb))
    val d = java.nio.file.Files.createTempDirectory("graft_servepack").toString
    AnnIvfPq.saveIndex(codedB, centroidsB, cb, d)
    AnnIvfPq.saveVectorStore(base, d)
    val cal = AnnIvfPq.calibrateEndToEnd(codedB, centroidsB, cb, base)
    AnnIvfPq.saveCalibration(spark, d, cal)
    assume(cal.metTarget, "sf0.001 calibration must meet its target")
    assert(AnnServePack.save(spark, d) == base.count())

    // session-free open: plain files only (the conf is never a session's)
    val (ix, packCal) = AnnServePack.open(d).getOrElse(fail("pack must open"))
    assert(packCal.exists(_.covers(cal.targetRecall, 3)))
    val qs = base.where(col("vec_id") < 20)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val served = AnnIvfPq.serveVectors(spark, d, qs.toSeq.map(q => (q._1, q._2)), base)
      .getOrElse(fail("local tier must serve"))
    qs.foreach { case (qid, qv) =>
      val hits = ix.search(qv, nprobe = cal.nprobe, topK = 3,
        refine = cal.refine, queryId = qid).toSeq
      val expected = served.find(_._1 == qid).get._2
      assert(hits == expected, s"pack-served rows diverged for query $qid")
    }

    // SQL tier through the pack with the parquet coded table MOVED AWAY:
    // the open can only have come from the session-free artifact
    val codedDir = new java.io.File(d, "coded")
    val hidden = new java.io.File(d, "coded_hidden")
    assert(codedDir.renameTo(hidden))
    try {
      GraftExtensions.register(spark)
      graft.operators.AnnServeRegistry.reset()
      qs.take(3).foreach { case (qid, qv) =>
        val df = spark.sql(
          s"SELECT explode(graft_ann_serve('$d', $qid, " +
            s"array(${qv.mkString(",")}))) AS h")
          .select(col("h.neighbor_id"))
        val got = df.collect().map(_.getLong(0)).toSeq
        val expected = served.find(_._1 == qid).get._2.map(_.neighborId)
        assert(got == expected, s"SQL pack serving diverged for query $qid")
      }
    } finally { assert(hidden.renameTo(codedDir)); () }

    // NON-LITERAL path: the builder cannot warm at analysis time, so the
    // FIRST row's eval on a task thread performs the session-free pack
    // open — the executor-JVM shape. The registry's task-thread guard
    // forbids the parquet fallback, so this passing PROVES the open came
    // from the pack, not a nested Spark read.
    graft.operators.AnnServeRegistry.reset()
    import spark.implicits._
    qs.take(3).toSeq.map { case (qid, _) => (d, qid) }
      .toDF("p", "qid").createOrReplaceTempView("pack_lazy_probe")
    base.createOrReplaceTempView("pack_lazy_emb")
    val lazyRows = spark.sql(
      """SELECT qid AS query_id, h.neighbor_id AS neighbor_id
        |FROM (
        |  SELECT t.qid, explode(graft_ann_serve(t.p, t.qid, e.embedding)) AS h
        |  FROM pack_lazy_probe t JOIN pack_lazy_emb e ON e.vec_id = t.qid)
        |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expectedLazy = qs.take(3).toSeq.flatMap { case (qid, _) =>
      served.find(_._1 == qid).get._2.map(h => (qid, h.neighborId))
    }.sorted
    assert(lazyRows == expectedLazy,
      "non-literal-path (task-thread lazy open) serving diverged")

    // delta append: appendVectors folds the batch into the pack; the
    // session-free open now answers over the appended corpus
    graft.operators.AnnServeRegistry.reset()
    AnnIvfPq.appendVectors(spark, d, batch): Unit
    val (ix2, _) = AnnServePack.open(d).getOrElse(fail("pack+delta must open"))
    assert(ix2.size == emb.count())
    val (c2, ce2, cb2) = AnnIvfPq.loadIndex(spark, d)
    val direct = AnnIvfPq.search(emb.where(col("vec_id") < 20), c2, ce2, cb2, emb,
      nprobe = cal.nprobe, topK = 3, refine = cal.refine)
    val directRows = direct
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val packRows = qs.flatMap { case (qid, qv) =>
      ix2.search(qv, nprobe = cal.nprobe, topK = 3,
        refine = cal.refine, queryId = qid).map(h => (qid, h.neighborId))
    }.sorted.toSeq
    val directForQs = directRows.filter(p => qs.exists(_._1 == p._1))
    assert(packRows == directForQs,
      "pack+delta serving diverged from the distributed search on the appended index")

    // compaction: re-saves the sidecar + pack at their fresh-save shape
    // (no delta lines, fresh segments, markers cleared) with identical
    // serving rows
    AnnIvfPq.compactServingArtifacts(spark, d, emb)
    def metaLines(sub: String): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, sub, "meta.txt")), "UTF-8")
        .split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    assert(!metaLines("servepack").exists(_.startsWith("delta ")),
      "compaction must fold pack deltas into the base arrays")
    assert(!new java.io.File(d, "appends").exists(),
      "compaction must clear the append markers")
    val (ix3, _) = AnnServePack.open(d).getOrElse(fail("compacted pack must open"))
    assert(ix3.size == emb.count())
    val compactRows = qs.flatMap { case (qid, qv) =>
      ix3.search(qv, nprobe = cal.nprobe, topK = 3,
        refine = cal.refine, queryId = qid).map(h => (qid, h.neighborId))
    }.sorted.toSeq
    assert(compactRows == packRows, "compaction changed serving answers")
  }
}

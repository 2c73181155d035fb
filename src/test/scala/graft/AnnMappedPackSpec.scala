package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIvf, AnnIvfPq, AnnLocalCodes, AnnPq, AnnServePack,
  AnnServeRegistry, AnnVecStore, MmapIo}

/** r15 verdict items on the ANN family:
  *  - #1 mapped codes tier: [[AnnServePack.open]] serves from mmap'd
  *    segments, row-identical to the heap tier on both encodings, under
  *    multi-segment saves and multi-window maps (the >2 GB mechanics
  *    forced at kilobyte scale via the MmapIo window override).
  *  - #2 deletes: [[AnnIvfPq.deleteVectors]] tombstones are excluded by
  *    every tier; appends cannot resurrect them; compaction folds them
  *    away physically and re-opens identically; a post-compaction
  *    re-add of the freed id succeeds.
  *  - #3 drift consumer: [[AnnIvfPq.retrain]] invalidates the stored
  *    calibration by epoch and restores a fresh-build-shaped index.
  *  - advice: the artifact writer fence fails loudly on a held lock;
  *    a pruned FOREIGN pin alias fails loudly instead of silently
  *    re-aliasing to the current generation.
  */
class AnnMappedPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  /** Build + save + sidecar + calibration + pack at `d`; returns the
    * calibration. residual picks the encoding.
    */
  private def deploy(d: String, residual: Boolean): graft.operators.AnnCalibration = {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    val (cb, coded) =
      if (residual) {
        val c = AnnIvfPq.trainResidual(indexed, centroids, exactMeans = false)
        (c, AnnIvfPq.encodeResidual(indexed, centroids, c))
      } else {
        val c = AnnPq.train(emb, exactMeans = false)
        (c, AnnIvfPq.index(indexed, AnnPq.encode(emb, c)))
      }
    AnnIvfPq.saveIndex(coded, centroids, cb, d, residual = residual)
    AnnIvfPq.saveVectorStore(emb, d)
    val cal = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb, residual = residual)
    AnnIvfPq.saveCalibration(spark, d, cal)
    assert(AnnServePack.save(spark, d) == emb.count())
    cal
  }

  private lazy val qs: Seq[(Long, Array[Double])] = emb.where(col("vec_id") < 20)
    .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  private def packRows(d: String, cal: graft.operators.AnnCalibration)
      : Seq[(Long, Long, Double, Long)] = {
    val (ix, _) = AnnServePack.open(d).getOrElse(fail(s"pack at $d must open"))
    qs.flatMap { case (qid, qv) =>
      ix.search(qv, nprobe = cal.nprobe, topK = 3, refine = cal.refine,
        queryId = qid).map(h => (qid, h.neighborId, h.dist, h.rk))
    }.sorted
  }

  private def heapRows(d: String, cal: graft.operators.AnnCalibration)
      : Seq[(Long, Long, Double, Long)] = {
    val (coded, centroids, cb) = AnnIvfPq.loadIndex(spark, d)
    val ix = AnnLocalCodes.open(spark, d, coded, centroids, cb,
      residual = AnnIvfPq.isResidual(spark, d))
      .getOrElse(fail("heap codes tier must open"))
    qs.flatMap { case (qid, qv) =>
      ix.search(qv, nprobe = cal.nprobe, topK = 3, refine = cal.refine,
        queryId = qid).map(h => (qid, h.neighborId, h.dist, h.rk))
    }.sorted
  }

  test("mapped pack == heap codes tier row-for-row, raw AND residual; multi-segment + multi-window maps identical (r15 verdict #1)") {
    Seq(false, true).foreach { residual =>
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_mapped_$residual").toString
      val cal = deploy(d, residual)
      val viaHeap = heapRows(d, cal)
      assert(viaHeap.nonEmpty)
      assert(packRows(d, cal) == viaHeap,
        s"mapped pack diverged from the heap tier (residual=$residual)")
      // multi-segment save: tiny target forces one segment per partition
      // range, lists spanning segment boundaries — identical rows
      assert(AnnServePack.save(spark, d, targetSegmentBytes = 4096L) ==
        emb.count())
      val metaTxt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, "servepack", "meta.txt")), "UTF-8")
      assert(metaTxt.linesIterator.count(_.startsWith("seg ")) > 1,
        "tiny targetSegmentBytes must produce a multi-segment pack")
      assert(packRows(d, cal) == viaHeap,
        s"multi-segment mapped pack diverged (residual=$residual)")
      // multi-WINDOW maps: force kilobyte map windows so runs split at
      // window boundaries — the exact mechanics a >2 GB segment needs
      MmapIo.chunkBytes = 1024L
      try assert(packRows(d, cal) == viaHeap,
        s"window-split mapped pack diverged (residual=$residual)")
      finally MmapIo.chunkBytes = 1L << 30
    }
  }

  test("deletes: tombstones excluded by pack, serve(), and distributed search; resurrect rejected; unknown/double deletes loud (r15 verdict #2)") {
    val d = java.nio.file.Files.createTempDirectory("graft_del").toString
    val cal = deploy(d, residual = true)
    val doomed = emb.where(col("vec_id") % 7 === 3)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
    assert(AnnIvfPq.deleteVectors(spark, d, doomed) == doomed.length.toLong)

    // every tier excludes them, and all tiers agree
    val pk = packRows(d, cal)
    assert(pk.nonEmpty)
    assert(!pk.exists(r => r._2 % 7 == 3), "pack served a tombstoned neighbor")
    val hp = heapRows(d, cal)
    assert(pk == hp, "post-delete pack diverged from the heap tier")
    val (coded, centroids, cb) = AnnIvfPq.loadIndex(spark, d)
    val dist = AnnIvfPq.search(emb.where(col("vec_id") < 20), coded, centroids,
      cb, emb, nprobe = cal.nprobe, topK = 3, refine = cal.refine,
      residual = true)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("dist"), col("rk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toSeq
    assert(pk == dist, "post-delete pack diverged from the distributed search")

    // guards: double delete, unknown id, resurrection
    intercept[IllegalArgumentException] {
      AnnIvfPq.deleteVectors(spark, d, Seq(doomed.head))
    }
    intercept[IllegalArgumentException] {
      AnnIvfPq.deleteVectors(spark, d, Seq(987654321L))
    }
    val resurrect = emb.where(col("vec_id") === doomed.head)
    intercept[IllegalArgumentException] {
      AnnIvfPq.appendVectors(spark, d, resurrect)
    }

    // interleave: a legitimate append lands next to the tombstones and
    // serves; the tombstoned ids stay excluded
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    import spark.implicits._
    val freshBatch = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + maxId + 1L).as("vec_id"), col("embedding"))
    AnnIvfPq.appendVectors(spark, d, freshBatch): Unit
    val freshBatch2 = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + maxId + 6L).as("vec_id"), col("embedding"))
    AnnIvfPq.appendVectors(spark, d, freshBatch2): Unit
    val pk2 = packRows(d, cal)
    assert(!pk2.exists(r => r._2 % 7 == 3 && r._2 <= maxId),
      "append re-exposed a tombstoned neighbor")

    // compaction folds tombstones physically: no tomb/delta meta lines,
    // the coded table's per-append small files fold away, the rows
    // shrink to the survivors, answers unchanged
    def codedParquetFiles(): Int = new java.io.File(d, "coded")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val filesBefore = codedParquetFiles()
    val preCompact = pk2
    AnnIvfPq.compactServingArtifacts(spark, d)
    assert(codedParquetFiles() < filesBefore,
      s"compaction must fold the per-append coded files ($filesBefore before)")
    val metaTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "servepack", "meta.txt")), "UTF-8")
    assert(!metaTxt.linesIterator.exists(l =>
      l.startsWith("tomb ") || l.startsWith("delta ")),
      "compaction must fold tombstones and deltas away")
    assert(!new java.io.File(d, "tombstones").exists())
    val codedN = spark.read.parquet(s"$d/coded").count()
    assert(codedN == emb.count() + 10 - doomed.length,
      "compacted coded table must hold exactly the survivors")
    assert(packRows(d, cal) == preCompact, "compaction changed serving answers")

    // post-compaction, the freed id is legitimately re-addable
    val readd = emb.where(col("vec_id") === doomed.head)
    AnnIvfPq.appendVectors(spark, d, readd): Unit
    assert(AnnServePack.open(d).get._1.size == emb.count() + 10 - doomed.length + 1)
  }

  test("retrain: epoch-invalidates the calibration, clears tombstones/markers, serves a fresh-build-shaped index (r15 verdict #4)") {
    val d = java.nio.file.Files.createTempDirectory("graft_retrain").toString
    deploy(d, residual = true)
    assert(AnnIvfPq.loadCalibration(spark, d).isDefined)
    val doomed = emb.where(col("vec_id") % 11 === 5)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
    AnnIvfPq.deleteVectors(spark, d, doomed): Unit
    // retrain from the sidecar's own corpus (emb defaulted)
    val n = AnnIvfPq.retrain(spark, d)
    assert(n == emb.count() - doomed.length,
      "retrain must train on the surviving corpus read back from the sidecar")
    assert(AnnIvfPq.loadCalibration(spark, d).isEmpty,
      "retrain must invalidate the stored calibration (fresh epoch)")
    assert(!new java.io.File(d, "tombstones").exists())
    // the retrained index serves end-to-end (fresh calibration cycle)
    val cal2 = {
      val (coded, centroids, cb) = AnnIvfPq.loadIndex(spark, d)
      val c = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb,
        residual = true)
      AnnIvfPq.saveCalibration(spark, d, c)
    }
    AnnServePack.save(spark, d): Unit
    val rows = packRows(d, cal2)
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r._2 % 11 == 5),
      "retrained index must not contain the deleted ids")
  }

  test("writer fence: a held commit.lock fails loudly with the remedy named") {
    val d = java.nio.file.Files.createTempDirectory("graft_lock").toString
    deploy(d, residual = false): Unit
    val lock = java.nio.file.Paths.get(d, "vecstore", "commit.lock")
    java.nio.file.Files.write(lock, "stale".getBytes)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val batch = emb.where(col("vec_id") < 3)
      .select((col("vec_id") + maxId + 1L).as("vec_id"), col("embedding"))
    val e = intercept[IllegalStateException] {
      AnnVecStore.appendSegment(spark, d, batch)
    }
    assert(e.getMessage.contains("commit.lock"))
    java.nio.file.Files.delete(lock)
    assert(AnnVecStore.appendSegment(spark, d, batch) == 3L)
  }

  test("foreign-pin alias pruned by later re-saves fails loudly instead of silently re-aliasing (r15 advice)") {
    val d = java.nio.file.Files.createTempDirectory("graft_fpin").toString
    val cal = deploy(d, residual = false)
    assume(cal.metTarget)
    AnnServeRegistry.reset()
    val old = AnnServeRegistry.freshnessMs
    AnnServeRegistry.freshnessMs = 0L
    try {
      val (qid, qv) = qs.head
      val foreignGen = 777777L // a pin minted by "another JVM"
      // first row of the foreign query: warms + aliases to the local gen
      val first = AnnServeRegistry.search(d, qid, qv, cal.targetRecall, 3,
        pinnedGen = foreignGen)
      assert(first.nonEmpty)
      // ONE re-save: the alias still resolves (retired generation)
      AnnIvfPq.saveCalibration(spark, d, cal): Unit
      AnnServeRegistry.warm(d)
      assert(AnnServeRegistry.search(d, qid, qv, cal.targetRecall, 3,
        pinnedGen = foreignGen).nonEmpty)
      // TWO more re-saves: the aliased generation is gone — the old code
      // silently re-aliased to the CURRENT gen (rows of one query mixing
      // two saves); now it throws like the same-JVM case
      AnnIvfPq.saveCalibration(spark, d, cal): Unit
      AnnServeRegistry.warm(d)
      AnnIvfPq.saveCalibration(spark, d, cal): Unit
      AnnServeRegistry.warm(d)
      val e = intercept[IllegalStateException] {
        AnnServeRegistry.search(d, qid, qv, cal.targetRecall, 3,
          pinnedGen = foreignGen)
      }
      assert(e.getMessage.contains("superseded"))
    } finally {
      AnnServeRegistry.freshnessMs = old
      AnnServeRegistry.reset()
    }
  }
}

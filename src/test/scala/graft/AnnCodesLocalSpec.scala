package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIvf, AnnIvfPq, AnnLocalCodes, AnnPq, AnnVecStore}

/** The codes-resident local serving tier (r13 verdict #3): PQ codes +
  * centroids in driver memory, exact-rerank vectors memory-mapped from
  * the [[AnnVecStore]] sidecar — so interactive serving survives corpora
  * whose full vectors exceed the heap-tier cap.
  *
  *  - vecstore roundtrip: mmap'd rerank distances are bit-identical to
  *    the heap fold on the same doubles; an id outside the store throws.
  *  - tier parity: serve() forced onto the codes tier (heap cap below
  *    the corpus) answers row-for-row equal to the heap tier AND the
  *    forced-distributed path, on both encodings.
  *  - memo honesty (r13 advice): a small-cap refusal does not disable
  *    the local path for a later larger-cap caller.
  *  - batch parallelism (r13 verdict #2): localThreads=1 ≡ all-cores.
  */
class AnnCodesLocalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val built = {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    val cb = AnnPq.train(emb, exactMeans = false)
    val coded = AnnIvfPq.index(indexed, AnnPq.encode(emb, cb)).cache()
    coded.count()
    (coded, centroids, cb)
  }
  /** Saved + calibrated + vecstore'd — the codes-tier deployment shape. */
  private lazy val (dir, cal) = {
    val (coded, centroids, cb) = built
    val d = java.nio.file.Files.createTempDirectory("graft_codes_tier").toString
    AnnIvfPq.saveIndex(coded, centroids, cb, d)
    AnnIvfPq.saveVectorStore(emb, d)
    val c = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb)
    AnnIvfPq.saveCalibration(spark, d, c)
    (d, c)
  }
  private lazy val queries = emb.where(col("vec_id") < 20)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
      col("dist"), col("rk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toIndexedSeq

  test("vecstore: mmap'd rerank distances are bit-identical to the in-heap fold; a foreign id throws") {
    assert(AnnVecStore.exists(spark, dir))
    val store = AnnVecStore.open(spark, dir)
      .getOrElse(fail("committed vecstore must open"))
    val sample = emb
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .orderBy(col("vec_id")).limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(store.size == emb.count())
    val q = sample.head._2
    sample.foreach { case (id, v) =>
      var d = 0.0
      var i = 0
      while (i < v.length) { val x = q(i) - v(i); d += x * x; i += 1 }
      assert(java.lang.Double.doubleToLongBits(store.dist(id, q)) ==
        java.lang.Double.doubleToLongBits(d),
        s"mmap'd distance for id $id diverged from the heap fold")
    }
    intercept[IllegalStateException] { store.dist(-987654321L, q) }
  }

  test("serve(): codes tier (heap cap below corpus) == forced-distributed == explicit search, row-for-row") {
    assert(cal.metTarget, "precondition: the sf0.01 calibration must meet its target")
    // codes tier FIRST (before any heap-tier serve memoizes a snapshot
    // for this path): heap cap of 1 forces the refusal, vecstore + codes
    // cap admit the mmap-backed snapshot
    val codes = rows(AnnIvfPq.serve(spark, dir, queries, emb, localServeCap = 1))
    assert(AnnIvfPq.localSnapshotCached(dir),
      "codes-tier serve must have memoized the snapshot")
    // forced distributed: both caps off
    val dist = rows(AnnIvfPq.serve(spark, dir, queries, emb,
      localServeCap = 0, codesServeCap = 0))
    val (coded, centroids, cb) = built
    val explicit = rows(AnnIvfPq.search(queries, coded, centroids, cb, emb,
      nprobe = cal.nprobe, topK = 3, refine = cal.refine))
    assert(codes == explicit, "codes tier diverged from the explicit search")
    assert(dist == explicit, "distributed serve diverged from the explicit search")
  }

  test("serve(): residual index on the codes tier, identical to distributed") {
    val (coded, centroids, _) = built
    val indexed = emb.join(coded.select(col("vec_id"), col("_centroid")), Seq("vec_id"))
    val rcb = AnnIvfPq.trainResidual(indexed, centroids, exactMeans = false)
    val rcoded = AnnIvfPq.encodeResidual(indexed, centroids, rcb)
    val d = java.nio.file.Files.createTempDirectory("graft_codes_res").toString
    AnnIvfPq.saveIndex(rcoded, centroids, rcb, d, residual = true)
    AnnIvfPq.saveVectorStore(emb, d)
    val rcal = AnnIvfPq.calibrateEndToEnd(rcoded, centroids, rcb, emb, residual = true)
    AnnIvfPq.saveCalibration(spark, d, rcal)
    assert(rcal.metTarget, "precondition: residual calibration must meet its target")
    val codes = rows(AnnIvfPq.serve(spark, d, queries, emb, localServeCap = 1))
    assert(AnnIvfPq.localSnapshotCached(d))
    val dist = rows(AnnIvfPq.serve(spark, d, queries, emb,
      localServeCap = 0, codesServeCap = 0))
    assert(codes == dist)
  }

  test("AnnLocalCodes.open: refuses over-cap corpora and missing vecstores") {
    val (coded, centroids, cb) = built
    assert(AnnLocalCodes.open(spark, dir, coded, centroids, cb, maxRows = 1).isEmpty)
    val bare = java.nio.file.Files.createTempDirectory("graft_codes_bare").toString
    AnnIvfPq.saveIndex(coded, centroids, cb, bare) // no vecstore
    assert(AnnLocalCodes.open(spark, bare, coded, centroids, cb).isEmpty)
  }

  test("memo honesty (r13 advice): a small-cap refusal does not disable the local path for a larger-cap caller") {
    val (coded, centroids, cb) = built
    val d = java.nio.file.Files.createTempDirectory("graft_codes_memo").toString
    AnnIvfPq.saveIndex(coded, centroids, cb, d)
    val c = AnnIvfPq.calibrateEndToEnd(coded, centroids, cb, emb)
    AnnIvfPq.saveCalibration(spark, d, c)
    assert(c.metTarget)
    // both caps too small (no vecstore either): serve refuses the local
    // path and memoizes the refusal
    val small = rows(AnnIvfPq.serve(spark, d, queries, emb,
      localServeCap = 1, codesServeCap = 1))
    assert(!AnnIvfPq.localSnapshotCached(d),
      "sub-corpus caps must refuse the local snapshot")
    // a later caller with the default (covering) cap must re-open, not
    // inherit the refusal (the r13 advice defect: Some(None) was final)
    val large = rows(AnnIvfPq.serve(spark, d, queries, emb))
    assert(AnnIvfPq.localSnapshotCached(d),
      "a larger-cap caller must re-open the local snapshot")
    assert(small == large)
  }

  test("serve()/serveVectors: parallel batch (all cores) ≡ sequential (localThreads=1), both tiers") {
    val seqRows = rows(AnnIvfPq.serve(spark, dir, queries, emb, localThreads = 1))
    val parRows = rows(AnnIvfPq.serve(spark, dir, queries, emb))
    assert(seqRows == parRows)
    val qvecs = queries
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    def flat(r: Option[Seq[(Long, Seq[graft.operators.AnnHit])]]) =
      r.getOrElse(fail("local path must vouch"))
        .flatMap { case (q, hs) => hs.map(h => (q, h.neighborId, h.dist, h.rk)) }
        .sorted
    val vSeq = flat(AnnIvfPq.serveVectors(spark, dir, qvecs, emb, localThreads = 1))
    val vPar = flat(AnnIvfPq.serveVectors(spark, dir, qvecs, emb))
    assert(vSeq == vPar)
    assert(vSeq == seqRows)
  }
}

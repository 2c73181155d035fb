package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIvf, AnnIvfPq, AnnLocal, AnnPq}

/** Driver-local ANN serve (r11 verdict #4): under the row cap the local
  * index must answer ROW-FOR-ROW identically to the distributed
  * [[AnnIvfPq.search]] fast path at the same knobs — ids, exact distances
  * (bit-for-bit), and ranks — on BOTH encodings (raw and residual); above
  * the cap open() must refuse (the distributed path is the fallback).
  */
class AnnLocalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val parts = {
    val (indexed, centroids) = AnnIvf.buildIndex(emb)
    (indexed.cache(), centroids)
  }

  private def distRows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[(Long, Double, Long)]] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
      col("dist"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq
      }

  private lazy val queryVecs: Array[(Long, Array[Double])] =
    emb.where(col("vec_id") < 20)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  test("local serve is row-for-row identical to distributed search (raw codes)") {
    val (indexed, centroids) = parts
    val cb = AnnPq.train(emb, exactMeans = false)
    val coded = AnnIvfPq.index(indexed, AnnPq.encode(emb, cb))
    val lix = AnnLocal.open(coded, centroids, cb, emb)
      .getOrElse(fail("sf0.01 must fit the default cap"))
    assert(lix.size == emb.count())
    val queries = emb.where(col("vec_id") < 20)
    // two knob settings — the tiny shortlist exposes ADC-order sensitivity,
    // the wide one the re-rank path
    Seq((6, 10), (4, 100)).foreach { case (np, rf) =>
      val dist = distRows(AnnIvfPq.search(queries, coded, centroids, cb, emb,
        nprobe = np, topK = 3, refine = rf))
      queryVecs.foreach { case (qid, qv) =>
        val local = lix.search(qv, nprobe = np, topK = 3, refine = rf, queryId = qid)
          .map(h => (h.neighborId, h.dist, h.rk)).toSeq
        assert(local == dist.getOrElse(qid, Seq.empty),
          s"query $qid diverged at nprobe=$np refine=$rf:\n  local=$local\n  dist=${dist.get(qid)}")
      }
    }
  }

  test("local serve is row-for-row identical on RESIDUAL codes") {
    val (indexed, centroids) = parts
    val rcb = AnnIvfPq.trainResidual(indexed, centroids, exactMeans = false)
    val rcoded = AnnIvfPq.encodeResidual(indexed, centroids, rcb)
    val lix = AnnLocal.open(rcoded, centroids, rcb, emb, residual = true)
      .getOrElse(fail("sf0.01 must fit the default cap"))
    assert(lix.residual)
    val queries = emb.where(col("vec_id") < 20)
    val dist = distRows(AnnIvfPq.search(queries, rcoded, centroids, rcb, emb,
      nprobe = 6, topK = 3, refine = 10, residual = true))
    queryVecs.foreach { case (qid, qv) =>
      val local = lix.search(qv, nprobe = 6, topK = 3, refine = 10, queryId = qid)
        .map(h => (h.neighborId, h.dist, h.rk)).toSeq
      assert(local == dist.getOrElse(qid, Seq.empty),
        s"residual query $qid diverged:\n  local=$local\n  dist=${dist.get(qid)}")
    }
  }

  test("degenerate inputs: empty index answers empty; unknown query id is a plain query") {
    val (indexed, centroids) = parts
    val cb = AnnPq.train(emb, exactMeans = false)
    val coded = AnnIvfPq.index(indexed, AnnPq.encode(emb, cb))
    val empty = coded.where(col("vec_id") < 0)
    val lix0 = AnnLocal.open(empty, centroids, cb, emb.where(col("vec_id") < 0))
      .getOrElse(fail("empty corpus is under any cap"))
    assert(lix0.size == 0)
    assert(lix0.search(new Array[Double](queryVecs.head._2.length), nprobe = 6).isEmpty,
      "empty index must answer with zero hits, not throw")
    // an external query vector (id not in the corpus) excludes nothing —
    // same rows as the distributed path for a foreign query
    val lix = AnnLocal.open(coded, centroids, cb, emb).get
    val qv = queryVecs.head._2
    val foreign = lix.search(qv, nprobe = 6, topK = 3, refine = 10)
    assert(foreign.length == 3)
    // with the real id, the self row drops out of candidates
    val self = lix.search(qv, nprobe = 6, topK = 3, refine = 10,
      queryId = queryVecs.head._1)
    assert(!self.map(_.neighborId).contains(queryVecs.head._1))
  }

  test("row cap: open() refuses an over-cap corpus (distributed fallback)") {
    val (indexed, centroids) = parts
    val cb = AnnPq.train(emb, exactMeans = false)
    val coded = AnnIvfPq.index(indexed, AnnPq.encode(emb, cb))
    assert(AnnLocal.open(coded, centroids, cb, emb, maxRows = 10).isEmpty,
      "a 2000-row corpus must not snapshot under a 10-row cap")
  }
}

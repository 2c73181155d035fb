package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SyntheticVectors
import graft.operators.AnnIvf

/** The ANN rung fixtures must replay bit-identically (they are the
  * cross-round comparability contract of bench_ann_*.json), and the HARD
  * fixture must actually be hard — recall below 1.0 at shallow probes —
  * or the scale rungs measure latency only (the r10 verdict's gap).
  */
class SyntheticVectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("generators replay bit-identically across partitionings") {
    def sig(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Float])] =
      df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val a = sig(SyntheticVectors.clustered(spark, 2000))
    val b = sig(SyntheticVectors.clustered(spark, 2000).repartition(7))
    assert(a == b)
    val ha = sig(SyntheticVectors.hardClustered(spark, 2000))
    val hb = sig(SyntheticVectors.hardClustered(spark, 2000).repartition(13))
    assert(ha == hb)
    assert(a != ha, "the two fixtures must differ")
  }

  test("hard fixture: planted pair mates are the unambiguous nearest neighbors") {
    // the property that keeps exact top-k meaningful (not PQ-noise ties):
    // each vector's L2-nearest neighbor is its pair mate, by a wide margin
    val gen = SyntheticVectors.hardClustered(spark, 20000).cache()
    val probes = gen.where(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
    val top1 = gen.select(col("vec_id").as("neighbor_id"), col("embedding").as("_nv"))
      .join(broadcast(probes))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("_d", aggregate(zip_with(
        col("_qv").cast("array<double>"), col("_nv").cast("array<double>"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("_d"), col("neighbor_id"))))
      .where(col("_rk") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    gen.unpersist()
    assert(top1.nonEmpty)
    top1.foreach { case (q, n) =>
      assert(n == (q ^ 1L), s"nearest of $q must be its pair mate, got $n")
    }
  }

  test("hard fixture bends the IVF recall curve (shallow probes miss; full scan = 1.0)") {
    val gen = SyntheticVectors.hardClustered(spark, 20000).cache()
    val (ix0, cents) = AnnIvf.buildIndex(gen)
    val ix = ix0.cache()
    val probes = gen.where(col("vec_id") < 16)
    // exact cosine top-3 = the truth AnnIvf.search ranks by
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions
    val q = probes.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("_s"), col("neighbor_id"))
    val truth = gen.select(col("vec_id").as("neighbor_id"), col("embedding").as("_nv"))
      .join(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("_s", nanvl(VectorFunctions.dotApprox(col("_qv"), col("_nv")) /
        (sqrt(VectorFunctions.dotApprox(col("_qv"), col("_qv"))) *
          sqrt(VectorFunctions.dotApprox(col("_nv"), col("_nv")))), lit(-2.0)))
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= 3)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    def recallAt(np: Int): Double = {
      val got = AnnIvf.search(probes, ix, cents, nprobe = np, topK = 3)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      val rs = truth.map { case (qid, t) =>
        got.get(qid).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val shallow = recallAt(1)
    val full = recallAt(16)
    ix.unpersist(); gen.unpersist()
    assert(full == 1.0, s"nprobe = k is exhaustive, recall must be 1.0 (got $full)")
    assert(shallow < 0.95,
      s"hard fixture must make shallow probes miss (recall@np1 = $shallow)")
  }
}

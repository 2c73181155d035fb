package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIvf, AnnPq}

/** Ad-hoc ANN parameter exploration (not part of the driver contract):
  * recall@3 and search seconds across (k, nprobe) and PQ refine depths on
  * the real sf fixture.
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, dir)
    println(s"[anntune] n=${emb.count()}")
    val probes = emb.where(col("vec_id") < 20)

    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions
    def exactTop3(byCosine: Boolean): Map[Long, Set[Long]] = {
      val q = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      val score =
        if (byCosine)
          nanvl(VectorFunctions.dotApprox(col("_qv"), col("_nv")) /
            (sqrt(VectorFunctions.dotApprox(col("_qv"), col("_qv"))) *
              sqrt(VectorFunctions.dotApprox(col("_nv"), col("_nv")))), lit(-2.0))
        else -aggregate(zip_with(
          col("_qv").cast("array<double>"), col("_nv").cast("array<double>"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, v) => a + v)
      val w = Window.partitionBy(col("query_id")).orderBy(desc("_s"), col("neighbor_id"))
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("_nv"))
        .join(broadcast(q))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("_s", score)
        .withColumn("_rk", row_number().over(w))
        .where(col("_rk") <= 3)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    }
    def recallVs(truth: Map[Long, Set[Long]], got: Array[(Long, Long)]): Double = {
      val byQ = got.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).toSet }
      val rs = truth.map { case (q, t) =>
        byQ.get(q).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
      }
      if (rs.isEmpty) 0.0 else rs.sum / rs.size
    }
    val truthCos = exactTop3(byCosine = true)
    val truthL2 = exactTop3(byCosine = false)

    for (k <- Seq(32, 64)) {
      val (ix0, cents) = AnnIvf.buildIndex(emb, k = k)
      val ix = ix0.persist(); ix.count()
      for (np <- Seq(4, 8, 16, 24)) {
        val t0 = System.nanoTime()
        val res = AnnIvf.search(probes, ix, cents, nprobe = np, topK = 3)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[anntune] ivf k=$k np=$np recall=${recallVs(truthCos, res)}%.3f t=$t%.2f")
      }
      ix.unpersist(): Unit
    }
    val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2, exactMeans = false)
    val enc = AnnPq.encode(emb, cb).persist(); enc.count()
    for (rf <- Seq(50, 100, 200)) {
      val t0 = System.nanoTime()
      val res = AnnPq.search(probes, enc, cb, emb, topK = 3, refine = rf)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[anntune] pq m=8 k=16 rf=$rf recall=${recallVs(truthL2, res)}%.3f t=$t%.2f")
    }
    enc.unpersist()
    spark.stop()
  }
}

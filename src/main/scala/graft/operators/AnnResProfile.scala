package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Focused profiler for the r12 verdict #6 question: at 10M and matched
  * knobs, the residual [[AnnIvfPq.search]] reads ~15% over raw
  * (bench_ann_10m_hard: res rf200 16.9 s vs raw 14.7 s) — attribute the
  * overhead before deciding whether to close it or document it as
  * inherent.
  *
  * Method: rebuild the 10M hard fixture, then time the CANDIDATE SCAN in
  * isolation (probe join + ADC fold + shortlist columns, no rescore) for
  * three plans at two probe depths, median of 3 after a warmup:
  *
  *  - `raw`   — the raw branch verbatim (per-query table via a second
  *              broadcast join)
  *  - `res`   — the residual branch verbatim (per-(query,list) table
  *              riding the probe row)
  *  - `resRawShape` — residual CODES pushed through the RAW plan shape
  *              (a per-query table, deliberately wrong values): the cost
  *              isolator — if it matches `raw`, the overhead is the
  *              table-rides-the-probe-row join shape, not the codes; if
  *              it matches `res`, the shape is innocent.
  *
  * nprobe 8 vs 2 separates per-candidate cost (scales with probed
  * volume) from fixed per-query/per-plan cost. Emits one JSON line
  * (bench artifact discipline) and exits.
  */
object AnnResProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_RES_PROFILE_N", "10000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gen = graft.io.SyntheticVectors.hardClustered(spark, n).persist()
    gen.count()
    val probes = gen.where(col("vec_id") < 20)
    val (ix0, cents) = AnnIvf.buildIndex(gen)
    val ix = ix0.persist(); ix.count()

    def timedSec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = {
      f // warmup: codegen + broadcast build
      val runs = (1 to 3).map(_ => timedSec(f)).sorted
      runs(1)
    }

    /** The candidate-scan stage of [[AnnIvfPq.search]], verbatim up to the
      * shortlist columns (no window, no rescore — the scan is the O(n)
      * part the branches differ in).
      */
    def scan(coded: DataFrame, cb: Array[Array[Array[Double]]],
        nprobe: Int, shape: String): DataFrame = {
      val m = cb.length
      val dsub = cb(0)(0).length
      val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
      val pw = Window.partitionBy(col("query_id")).orderBy(desc("_sim"), col("_c"))
      val probesRaw = probes
        .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
        .join(broadcast(cents))
        .withColumn("_sim", AnnIvf.scoreCosine(col("_qv"), col("_cv"), exact = false))
        .withColumn("_rk", row_number().over(pw))
        .where(col("_rk") <= nprobe)
      def tableOf(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(element_at(cbLit, j + 1), c =>
            AnnPq.sqDist(AnnPq.subvec(v, j, dsub), c)))
      val cand = shape match {
        case "res" =>
          val probesTab = probesRaw
            .withColumn("_rqv", zip_with(col("_qv").cast("array<double>"),
              col("_cv").cast("array<double>"), (x, y) => x - y))
            .select(col("query_id"), col("_c").as("_centroid"),
              tableOf(col("_rqv")).as("_tab"))
          coded
            .select(col("vec_id").as("neighbor_id"), col("_centroid"), col("codes"))
            .join(broadcast(probesTab), Seq("_centroid"))
            .where(col("query_id") =!= col("neighbor_id"))
            .withColumn("approx_dist",
              AnnPq.adcDistCol(col("codes").cast("array<int>"), col("_tab")))
        case _ => // "raw" plan shape (tables per QUERY via the second join)
          val probesKeys = probesRaw.select(col("query_id"), col("_c").as("_centroid"))
          val qtab = probes.select(col("vec_id").as("query_id"),
            tableOf(col("embedding").cast("array<double>")).as("_tab"))
          coded
            .select(col("vec_id").as("neighbor_id"), col("_centroid"), col("codes"))
            .join(broadcast(probesKeys), Seq("_centroid"))
            .where(col("query_id") =!= col("neighbor_id"))
            .join(broadcast(qtab), Seq("query_id"))
            .withColumn("approx_dist",
              AnnPq.adcDistCol(col("codes").cast("array<int>"), col("_tab")))
      }
      cand.select(col("query_id"), col("neighbor_id"), col("approx_dist"))
    }
    def forceScan(df: DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    // executed-plan dump for offline attribution (AQE final plan — run
    // the action first so query stages have materialized)
    def dumpPlan(tag: String, df: DataFrame): Unit = try {
      df.queryExecution.toRdd.count(): Unit
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/res_profile_plan_$tag.txt"),
        df.queryExecution.executedPlan.toString.getBytes("UTF-8")): Unit
    } catch { case NonFatal(_) => () }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    try {
      // RAW arm
      val cbRaw = AnnPq.train(gen, m = 8, k = 16, iters = 2, exactMeans = false)
      val codedRaw = AnnIvfPq.index(ix, AnnPq.encode(gen, cbRaw)).persist()
      codedRaw.count()
      Seq(2, 8).foreach { np =>
        out(s"raw_scan_np$np") = median3(forceScan(scan(codedRaw, cbRaw, np, "raw")))
      }
      out("raw_full_rf200") = median3 {
        AnnIvfPq.search(probes, codedRaw, cents, cbRaw, gen,
          nprobe = 8, topK = 3, refine = 200).queryExecution.toRdd.count(): Unit
      }
      dumpPlan("raw", AnnIvfPq.search(probes, codedRaw, cents, cbRaw, gen,
        nprobe = 8, topK = 3, refine = 200))
      codedRaw.unpersist()
      // RESIDUAL arm
      val cbRes = AnnIvfPq.trainResidual(ix, cents, exactMeans = false)
      val codedRes = AnnIvfPq.encodeResidual(ix, cents, cbRes).persist()
      codedRes.count()
      Seq(2, 8).foreach { np =>
        out(s"res_scan_np$np") = median3(forceScan(scan(codedRes, cbRes, np, "res")))
        // residual codes through the RAW plan shape (wrong values, same
        // volume): the join-shape cost isolator
        out(s"res_rawshape_scan_np$np") =
          median3(forceScan(scan(codedRes, cbRes, np, "rawshape")))
      }
      out("res_full_rf200") = median3 {
        AnnIvfPq.search(probes, codedRes, cents, cbRes, gen,
          nprobe = 8, topK = 3, refine = 200, residual = true)
          .queryExecution.toRdd.count(): Unit
      }
      dumpPlan("res", AnnIvfPq.search(probes, codedRes, cents, cbRes, gen,
        nprobe = 8, topK = 3, refine = 200, residual = true))
      codedRes.unpersist()
    } catch { case NonFatal(e) => out("error") = -1.0; System.err.println(e) }
    ix.unpersist(); gen.unpersist()
    val json = out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(s"""{"n":$n,""", ",", "}")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_res_profile.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    catch { case NonFatal(_) => () }
    spark.stop()
    println(json)
  }
}

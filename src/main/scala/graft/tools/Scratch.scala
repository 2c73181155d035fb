package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // full-walk profile on the distributed build (GRAFT_WALK_DEBUG=1 prints
    // per-level frontier sizes + times from inside ClusterEngine)
    val pts = graft.operators.Spatial.pointsDf(spark, dir)
    val idx = time("loadDistributed") {
      graft.cluster.ClusterEngine.loadDistributed(
        pts, graft.cluster.ClusterOptions(), idCol = "event_id")
    }
    val tot = idx.numPoints
    import org.apache.spark.sql.functions._
    val target = idx.level(3).toDF()
      .where(col("is_cluster") && col("id") >= tot && ((col("id") - tot) % 32) === 4)
      .orderBy(desc("point_count"), col("id"))
      .limit(1).collect()(0).getLong(3)
    time("first getLeaves (pays fullWalk)") {
      idx.getLeaves(target, limit = 25, offset = 5).collect()
    }
    time("second getLeaves (filter only)") {
      idx.getLeaves(target, limit = 25, offset = 5).collect()
    }
    time("navigationSummary 5 roots (filter + collect)") {
      val tops = idx.level(2).toDF()
        .where(col("is_cluster") && col("id") >= tot && ((col("id") - tot) % 32) === 3)
        .orderBy(desc("point_count"), col("id"))
        .limit(5).collect().map(_.getLong(3)).toSeq
      idx.navigationSummary(tops)
    }
    spark.stop()
  }
}

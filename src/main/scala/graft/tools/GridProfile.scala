package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.cluster.{ClusterEngine, ClusterOptions, MortonHierarchy}
import graft.io.SyntheticPoints

/** Dev-only stage decomposition of the MortonHierarchy build — where do the
  * grid_build_ladder seconds go at 1M points? Not part of any bench artifact.
  */
object GridProfile {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(1000000L)
    val n = sizes.last
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val pts = SyntheticPoints.uniform(spark, n)
    t("warm: count points")(pts.count())
    sizes.foreach { s =>
      t(s"loadDistributed $s") {
        val idx = ClusterEngine.loadDistributed(
          SyntheticPoints.uniform(spark, s), ClusterOptions(radius = 75), idCol = "row_id")
        idx.unpersist()
      }
    }
    // second run of the largest to see warm numbers
    t("full loadDistributed (warm)") {
      val idx = ClusterEngine.loadDistributed(pts, ClusterOptions(radius = 75), idCol = "row_id")
      idx.unpersist()
    }
    // stage decomposition: replicate build's internals
    val opts = ClusterOptions(radius = 75)
    val levels = t("MortonHierarchy.build") {
      MortonHierarchy.build(pts, opts, "lng", "lat", "row_id")
    }
    t("rows per zoom (cached)") {
      levels.groupBy(col("zoom")).count().orderBy(col("zoom")).collect()
        .foreach(r => println(s"  zoom ${r.getInt(0)}: ${r.getLong(1)}"))
    }
    levels.unpersist()
    spark.stop()
  }
}

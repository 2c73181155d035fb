package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc navigation-fixture probe (not part of the driver contract). */
object NavProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    graft.SparkEntry.queries("q19_hierarchy_levels")(spark, dir)
      .collect().foreach(r => println(s"[nav] $r"))
    val pts = graft.operators.Spatial.pointsDf(spark, dir)
    println(s"[nav] points=${pts.count()} distinct=${pts.select("lng", "lat").distinct().count()}")
    pts.orderBy("event_id").limit(3).collect().foreach(r => println(s"[nav] pt $r"))
    spark.stop()
  }
}

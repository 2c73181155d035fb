package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan printer (not part of the driver contract). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = if (args.length > 1) args(1) else "q81_bigram_perplexity"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

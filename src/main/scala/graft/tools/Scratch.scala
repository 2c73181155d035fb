package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local smoke-probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val joined = spark.read.parquet(s"$dir/region.parquet")
      .join(spark.read.parquet(s"$dir/nation.parquet"), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")
    def attempt(label: String)(f: => Unit): Unit = {
      println(s"-- $label --")
      try f
      catch { case e: Throwable => println("ERR: " + e.getMessage.take(120)) }
    }
    attempt("toDF rename") {
      joined.toDF("r_name", "n_name").rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n")).show(2)
    }
    attempt("fresh alias select") {
      joined.select(col("r_name").as("r_name"), col("n_name").as("n_name"))
        .rollup("r_name", "n_name").agg(count(lit(1)).as("n")).show(2)
    }
    attempt("conf off") {
      spark.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      joined.rollup("r_name", "n_name").agg(count(lit(1)).as("n")).show(2)
      spark.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "true")
    }
    spark.stop()
  }
}

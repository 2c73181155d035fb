package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev entry point: phase timing of the q92 column profile (one-agg scan
  * vs the per-column distinct jobs, sequential vs concurrent submission).
  */
object ProfileQ92 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = graft.Tables.lineitem(spark, sfDir)
      .withColumn("shipdate_ms", expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 1000"))
    src.count() // warm footer/scan

    val numCols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "shipdate_ms")
    val strCols = Seq("l_returnflag", "l_linestatus")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      t("one-agg (nulls/min/max)") {
        val aggExprs = (numCols ++ strCols).map { c =>
          count(when(col(c).isNull, 1)).as(s"${c}__nulls")
        } ++ (numCols ++ strCols).flatMap { c =>
          Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))
        }
        src.agg(aggExprs.head, aggExprs.tail: _*).localCheckpoint(): Unit
      }
      t("distincts sequential") {
        (numCols ++ strCols).foreach { c =>
          src.select(col(c)).where(col(c).isNotNull).distinct().count(): Unit
        }
      }
      t("distincts concurrent") {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.traverse((numCols ++ strCols).toList) { c =>
          Future(src.select(col(c)).where(col(c).isNotNull).distinct().count())
        }, Duration.Inf): Unit
      }
      t("full query fn (bench shape)") {
        graft.SparkEntry.queries("q92_column_profile")(spark, sfDir)
          .queryExecution.toRdd.count(): Unit
      }
      t("report build only") {
        graft.operators.Profiling
          .columnProfileReport(src, numCols, strCols): Unit
      }
      t("report exec after build") {
        val df = graft.operators.Profiling
          .columnProfileReport(src, numCols, strCols)
        df.queryExecution.toRdd.count(): Unit
      }
    }
    spark.stop()
  }
}

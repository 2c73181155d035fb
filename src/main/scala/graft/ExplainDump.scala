package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for declared queries to
  * `<outDir>/<name>.txt` (the r16 plan evidence under `plans/r16/`).
  * Optional comma-separated name-prefix filter via GRAFT_EXPLAIN_ONLY.
  * GRAFT_NO_DESAMPLE=1 additionally disables the final-sort rewrite, which
  * is how the committed `_before` plans were produced from the same build.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("GRAFT_EXPLAIN_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt): Unit
        } catch {
          case e: Throwable =>
            Files.writeString(Paths.get(s"$outDir/$name.ERROR"),
              s"${e.getClass.getName}: ${e.getMessage}\n"): Unit
        }
      }
    spark.stop()
  }
}

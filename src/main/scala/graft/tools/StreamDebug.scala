package graft.tools

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, StreamingOps}

object StreamDebug {
  def ev(id: Long, uid: Long, minute: Long, value: Double): Event =
    Event(id, uid, "click", value,
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val fixture = Seq(
      ev(0, 1, 0, 1.0), ev(1, 1, 10, 2.0), ev(2, 1, 20, 3.0),
      ev(3, 1, 65, 4.0), ev(4, 1, 70, 5.0),
      ev(5, 2, 5, 10.0))

    val input = MemoryStream[Event]
    val sessions = StreamingOps.statefulSessionize(
      input.toDS().withWatermark("ts_t", "0 seconds"))
    val q = sessions.writeStream
      .format("memory").queryName("dbg_out")
      .outputMode(OutputMode.Append)
      .start()
    def dump(tag: String): Unit = {
      println(s"=== $tag ===")
      spark.table("dbg_out").collect().foreach(r => println(s"  $r"))
      println(s"  progress watermark: ${Option(q.lastProgress).map(_.eventTime)}")
    }
    input.addData(fixture.take(3)); q.processAllAvailable(); dump("b1")
    input.addData(fixture.drop(3)); q.processAllAvailable(); dump("b2")
    input.addData(ev(99, 999, 10000, 0.0)); q.processAllAvailable(); dump("b3")
    Thread.sleep(2000); q.processAllAvailable(); dump("after sleep")
    q.stop()
    spark.stop()
  }
}

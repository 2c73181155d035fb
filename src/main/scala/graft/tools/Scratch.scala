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

    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    locally {
      import spark.implicits._
      val ev = graft.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts_t"))
      time("events count")(ev.count())
      val typed = ev.as[graft.streaming.Event]
      time("decode only")(typed.mapPartitions(it => Iterator.single(it.length)).collect())
      time("q38 full")(graft.operators.Streaming.typedSessions.run(spark, dir).count())
      time("q36 session_window")(graft.operators.Streaming.sessionWindow.run(spark, dir).count())
    }
    val docs = graft.Tables.documents(spark, dir)
    time("docs count")(docs.count())
    time("tokens only")(docs.select(size(split(col("text"), " "))).agg(sum(col("size(split(text,  , -1))"))).collect())
    val sh = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), shingles(col("tk"), 3).as("sh"))
    time("shingles")(sh.select(sum(size(col("sh")))).collect())
    val hs = sh.where(size(col("sh")) > 0).select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
    time("shingle md5")(hs.select(sum(size(col("hs")))).collect())
    val bands = (0 until 4).map(b =>
      struct(lit(b.toLong).as("band"), minhashBand(col("hs"), b).as("mh")))
    val sig = hs.select(col("doc_id"), explode(array(bands: _*)).as("bm"))
      .select(col("doc_id"), col("bm.band"), col("bm.mh"))
    time("signatures")(sig.count())
    val cand = sig.select(col("doc_id").as("id_a"), col("band"), col("mh"))
      .join(sig.select(col("doc_id").as("id_b"), col("band"), col("mh")), Seq("band", "mh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    println(s"[scratch] cand pairs: ${time("cand")(cand.count())}")
    val q = graft.operators.TextOps.minhashLshPairs
    val df = q.run(spark, dir)
    time("q35 full")(df.count())
    spark.stop()
  }
}

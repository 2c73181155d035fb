package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Range joins: the binned equi-join plans must be row-identical to the
  * naive inequality joins they replace — for any bin width — and must
  * never plan a nested-loop/cartesian product on the real queries.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** deterministic LCG — points (incl. negative times) and overlapping,
    * nested, empty, and many-bin-spanning intervals */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private lazy val points: DataFrame = {
    val ts = lcg(42).map(v => (v >>> 12) % 2000L - 1000L).take(300).toSeq
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
  }

  private lazy val intervals: DataFrame = {
    val rs = lcg(7).map(v => (v >>> 12) % 2000L - 1000L).take(80).toSeq
    val lens = lcg(13).map(v => (v >>> 12) % 400L - 10L).take(80).toSeq // some empty (len <= 0)
    val rows = rs.zip(lens).zipWithIndex.map { case ((s, len), i) =>
      (i.toLong, s, s + len)
    } :+ (900L, -950L, 950L) // one interval spanning many bins
    rows.toDF("iid", "s", "e")
  }

  private def naiveInterval: Set[(Long, Long)] =
    points.join(intervals, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("intervalJoin equals the naive inequality join for several bin widths") {
    val want = naiveInterval
    assert(want.nonEmpty)
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.intervalJoin(points, intervals, "t", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"binWidth=$w: ${got.size} vs ${want.size} pairs")
    }
  }

  test("intervalJoin boundary semantics: start closed, end open, empty dropped") {
    val p = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "t")
    val iv = Seq((1L, 10L, 20L), (2L, 15L, 15L)).toDF("iid", "s", "e")
    val got = RangeJoin.intervalJoin(p, iv, "t", "s", "e", 8L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L))) // t=20 excluded, empty iv 2 gone
  }

  private lazy val boxPoints: DataFrame = {
    val xs = lcg(3).map(v => ((v >>> 12) % 7200L) / 10.0 - 360.0).take(400).toSeq
    val ys = lcg(5).map(v => ((v >>> 12) % 3400L) / 10.0 - 170.0).take(400).toSeq
    xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("pid", "lng", "lat")
  }

  private lazy val boxes: DataFrame = {
    val xs = lcg(11).map(v => ((v >>> 12) % 6000L) / 10.0 - 330.0).take(60).toSeq
    val ys = lcg(17).map(v => ((v >>> 12) % 2800L) / 10.0 - 150.0).take(60).toSeq
    val rows = xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, x, y, x + 30.0, y + 15.0)
    } :+ (900L, -15.0, -10.0, 15.0, 10.0) // edges exactly on 5-degree cell boundaries
    rows.toDF("bid", "x0", "y0", "x1", "y1")
  }

  test("bboxJoin equals the naive containment join for several cell sizes") {
    val want = boxPoints
      .join(boxes, $"lng" >= $"x0" && $"lng" < $"x1" && $"lat" >= $"y0" && $"lat" < $"y1")
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    for (cell <- Seq(5.0, 12.5, 100.0)) {
      val got = RangeJoin.bboxJoin(boxPoints, boxes,
          "lng", "lat", "x0", "y0", "x1", "y1", cell)
        .select("pid", "bid").as[(Long, Long)].collect().toSet
      assert(got == want, s"cellDeg=$cell: ${got.size} vs ${want.size} pairs")
    }
  }

  test("q101/q102 plans are bin equi-joins — no nested loop, no cartesian") {
    for (name <- Seq("q101_interval_join", "q102_bbox_join")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$name must join on the bin key:\n$plan")
    }
  }

  test("q101 returns one row per error event at sf0.001") {
    val df = SparkEntry.queries("q101_interval_join")(spark, "/root/testdata/sf0.001")
    val nErr = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "error").count()
    // every window contains at least its own trigger event
    assert(df.count() == nErr)
    assert(df.where(col("n_events") < 1).count() == 0)
  }
}

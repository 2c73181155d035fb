package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics: strictly-before matching, equal-timestamp
  * exclusion, deterministic tie-break, left rows always preserved.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("backward-strict asof join picks latest strictly-prior right row") {
    val left = Seq(
      (1L, 1L, 100L), // before any right row → null
      (2L, 1L, 200L), // matches r10 (t=150)
      (3L, 1L, 300L), // t == r20's t → strict: still r10... r20 at 300 excluded
      (4L, 1L, 400L), // matches r20 (t=300)
      (5L, 2L, 500L)) // other key, no right rows → null
      .toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, 1L, 150L),
      (20L, 1L, 300L))
      .toDF("rid", "user_id", "t")

    val out = AsOfJoin.asofBackwardStrict(
      left, right, keys = Seq("user_id"), leftTime = "t", rightTime = "t",
      payload = Seq("rid", "t"), tiebreak = "rid")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq

    assert(out == Seq(
      (1L, None), (2L, Some(10L)), (3L, Some(10L)), (4L, Some(20L)), (5L, None)))
  }

  test("ties on (key, time) resolve to the largest tiebreak value") {
    val left = Seq((1L, 1L, 500L)).toDF("event_id", "user_id", "t")
    val right = Seq((7L, 1L, 400L), (9L, 1L, 400L), (8L, 1L, 400L))
      .toDF("rid", "user_id", "t")
    val out = AsOfJoin.asofBackwardStrict(
      left, right, Seq("user_id"), "t", "t", Seq("rid"), tiebreak = "rid")
      .collect()
    assert(out.length == 1 && out(0).getLong(3) == 9L)
  }

  test("partition-count invariance") {
    val left = spark.range(100).select(
      col("id").as("event_id"), (col("id") % 5).as("user_id"), (col("id") * 10).as("t"))
    val right = spark.range(30).select(
      col("id").as("rid"), (col("id") % 5).as("user_id"), (col("id") * 31 % 900).as("t"))
    def run(lp: Int, rp: Int) = AsOfJoin.asofBackwardStrict(
      left.repartition(lp), right.repartition(rp),
      Seq("user_id"), "t", "t", Seq("rid"), tiebreak = "rid")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(run(1, 1) == run(7, 3))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Skew toolkit: the salted two-phase plans must be value-identical to
  * their single-phase equivalents for any salt count — on a deliberately
  * hot-keyed frame — and the q90 shape must hold on the real table.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** one viral key (90% of rows) + a tail of cold keys, unique row ids */
  private def skewed = {
    import spark.implicits._
    val rows = (0 until 9000).map(i => (i.toLong, "hot", (i % 97).toDouble)) ++
      (0 until 1000).map(i => (9000L + i, s"cold_${i % 20}", (i % 31).toDouble))
    rows.toDF("row_id", "key", "score")
  }

  private def directTopK(k: Int) = {
    val w = Window.partitionBy(col("key")).orderBy(desc("score"), col("row_id"))
    skewed.withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= k)
  }

  test("skewTopK equals the single-window top-k for any salt count") {
    val want = directTopK(5).orderBy("key", "rk").collect().toSeq
    for (salts <- Seq(1, 8, 32)) {
      val got = Skew.skewTopK(skewed, col("key"), col("row_id"),
        Seq(desc("score"), col("row_id")), k = 5, salts = salts)
        .orderBy("key", "rk").collect().toSeq
      assert(got == want, s"salted top-k must be exact (salts=$salts)")
    }
  }

  test("skewTopK ranks are contiguous and bounded per key") {
    val rows = Skew.skewTopK(skewed, col("key"), col("row_id"),
      Seq(desc("score"), col("row_id")), k = 3, salts = 8).collect()
    rows.groupBy(_.getAs[String]("key")).foreach { case (k, rs) =>
      val ranks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(ranks.size <= 3 && ranks == (1L to ranks.size).toSeq,
        s"key $k ranks must be contiguous 1..n<=3: $ranks")
    }
  }

  test("saltedJoin equals the plain inner join, duplicates included") {
    import spark.implicits._
    val big = skewed.select(col("row_id"), col("key"), col("score"))
    // small side with DUPLICATE keys — each big row must meet both copies
    val small = Seq(("hot", 1), ("hot", 2), ("cold_3", 30), ("absent", 99))
      .toDF("key", "tag")
    val plain = big.join(small, Seq("key"))
    val want = plain.collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    for (salts <- Seq(1, 4, 16)) {
      val salted = Skew.saltedJoin(big, small, "key", col("row_id"), salts)
      assert(salted.columns.toSeq == plain.columns.toSeq,
        "salted join must expose the plain join's schema")
      val got = salted.collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"salted join must be multiset-equal to the plain join (salts=$salts)")
    }
  }

  test("q90 salted plan matches the plain window on sf0.001 events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
    val w = Window.partitionBy(col("event_type")).orderBy(desc("value"), col("event_id"))
    val want = ev.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5).orderBy("event_type", "rk").collect().toSeq
    val got = Skew.skewTopKEvents
      .run(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(got == want)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Bucketing

/** Bucketed-layout co-located join: writing both sides bucketed by the
  * join key must (a) keep the join value-identical to the path-based
  * plain join and (b) remove every shuffle exchange from the join plan —
  * the layout IS the exchange, paid once at write time.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("bucketed join is exchange-free and value-identical (sort-merge path)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_linenumber")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4, sortBy = Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "b_orders", "o_orderkey", 4, sortBy = Seq("o_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force the sort-merge path: broadcast would hide the exchange question
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = Bucketing.readBucketed(spark, "b_lineitem")
        .join(Bucketing.readBucketed(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))

      val bucketedPlan = executedPlan(bucketed)
      val plainPlan = executedPlan(plain)
      assert(!bucketedPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$bucketedPlan")
      assert(plainPlan.contains("Exchange hashpartitioning"),
        "the path-based control join should shuffle (else this test proves nothing)")

      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"))
      val want = plain.collect().map(r => key(r) -> r.toSeq).toMap
      val got = bucketed.collect().map(r => key(r) -> r.toSeq).toMap
      assert(got == want, "bucketed join must be value-identical to the plain join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}

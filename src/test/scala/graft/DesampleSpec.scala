package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the r16 final-sort desample rewrite
  * ([[org.apache.spark.sql.graftbridge.PlanBridge.desampleFinalSort]], wired
  * into every declared query by [[GraftQuery]]): the rewrite must fire ONLY
  * on a root global Sort, preserve rows AND total order bit-for-bit, and
  * remove the range exchange (whose RangePartitioner sampling job is the
  * cost the rewrite exists to delete).
  */
class DesampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def base = {
    import spark.implicits._
    (0L until 1000L).map(i => (i % 7, i)).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
  }

  test("root global sort: identical rows in identical order, one output partition, no range exchange") {
    val sorted = base.orderBy(desc("n"), col("k"))
    val re = PlanBridge.desampleFinalSort(sorted)
    val want = sorted.collect().toSeq
    val got = re.collect().toSeq
    assert(got == want, "desampled output must equal orderBy output row-for-row")
    assert(re.rdd.getNumPartitions == 1)
    val plan = re.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "the range exchange (and its sampling pass) must be gone:\n" + plan)
  }

  test("orderBy+limit root (TakeOrdered) is returned unchanged") {
    val limited = base.orderBy(desc("n"), col("k")).limit(3)
    val re = PlanBridge.desampleFinalSort(limited)
    assert(re eq limited, "non-Sort root must pass through untouched")
  }

  test("non-sort root is returned unchanged") {
    val agg = base
    assert(PlanBridge.desampleFinalSort(agg) eq agg)
  }

  test("GraftQuery wiring: a declared query's executed plan carries no range exchange at its root") {
    val df = SparkEntry.queries("q13_hourly_events")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.split("== Initial Plan ==").head.contains("rangepartitioning"), plan)
  }
}

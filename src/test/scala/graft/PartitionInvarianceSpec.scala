package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide distributed-correctness guarantee: EVERY SparkEntry query
  * returns identical rows regardless of the shuffle-partition count.
  *
  * The engine's numerics discipline (decimal-exact or rounded-at-12
  * aggregates, strict left-to-right IEEE folds over fixed element orders,
  * content-hash determinism for sampling) exists precisely so results
  * cannot depend on how work is partitioned — this spec closes the loop by
  * executing the WHOLE registry under two different parallelism regimes
  * (the shared 4-partition test session vs a 7-partition sibling session)
  * and diffing every query's full result set. A single partition-sensitive
  * aggregation, windowless rank tie, or order-dependent double sum
  * anywhere in the 100-query surface fails here before it can flake in a
  * cluster.
  *
  * The sibling session shares the SparkContext but carries its own SQLConf
  * (newSession) — the per-(session, dir) index/build caches key on the
  * session object, so the 7-partition pass rebuilds its own indexes rather
  * than reading 4-partition artifacts.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("ALL registry queries return identical rows at 4 vs 7 shuffle partitions") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")

    def rows(s: org.apache.spark.sql.SparkSession, name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(s, sf)
      val cols = df.columns.sorted.toIndexedSeq
      df.selectExpr(cols.map(c => s"`$c`"): _*)
        .collect()
        .map(_.toSeq.map(v => String.valueOf(v)).mkString(""))
        .sorted.toIndexedSeq
    }

    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val base = rows(spark, name)
      val other = rows(alt, name)
      if (base == other) None
      else Some(s"$name: ${base.size} vs ${other.size} rows, first diff: " +
        base.zipAll(other, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
          .map { case (a, b) => s"[$a] vs [$b]" }.getOrElse("size-only"))
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

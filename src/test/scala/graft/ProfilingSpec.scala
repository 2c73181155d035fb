package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** q91/q92/q93 properties beyond the value oracles: PSI is zero under an
  * identical distribution and large under a disjoint shift, profile
  * stats count nulls/distincts exactly, histogram quantiles sit within
  * one bin width of the exact percentile, and all three reports are
  * partitioning-invariant.
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("PSI: identical hours score 0 (stable), a disjoint shift scores major") {
    import spark.implicits._
    // hour 0 and hour 1: identical bin profiles; hour 2: all mass moved
    val rows =
      (0 until 100).map(i => (0L, i % 5)) ++
        (0 until 100).map(i => (1L, i % 5)) ++
        (0 until 100).map(i => (2L, 9))
    val r = Profiling.psiReport(rows.toDF("h", "bin")).orderBy("hour_bucket").collect()
    assert(r.length == 2, "hours 1 and 2 have a predecessor; hour 0 does not")
    val h1 = r(0); val h2 = r(1)
    assert(h1.getAs[Long]("hour_bucket") == 1L)
    assert(h1.getAs[Double]("psi") == 0.0, "identical distributions must score exactly 0")
    assert(h1.getAs[String]("drift_band") == "stable")
    assert(h2.getAs[Double]("psi") > 0.25, s"disjoint shift must be major, got $h2")
    assert(h2.getAs[String]("drift_band") == "major")
  }

  test("column profile counts nulls and distincts exactly") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some("a")), (Some(2.0), Some("a")), (Some(2.0), None),
      (None, Some("b")), (None, Some("c"))
    ).toDF("x", "s")
    val r = Profiling.columnProfileReport(df, Seq("x"), Seq("s"))
      .collect().map(row => row.getAs[String]("col_name") -> row).toMap
    val x = r("x"); val s = r("s")
    assert(x.getAs[Long]("n_nulls") == 2 && x.getAs[Long]("n_distinct") == 2)
    assert(x.getAs[Double]("min_num") == 1.0 && x.getAs[Double]("max_num") == 2.0)
    assert(x.isNullAt(x.fieldIndex("min_str")))
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("n_distinct") == 3)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "c")
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("histogram quantile sits within one bin width of the exact percentile") {
    val xs = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_extendedprice").as("x"))
    val n = xs.count()
    val exact = xs.orderBy("x").collect().map(_.getDouble(0))
    val binWidth = (exact.last - exact.head) / 1000
    val got = Profiling.histogramQuantileReport(xs, Seq(0.5, 0.95, 0.99), 1000)
      .collect().map(r => r.getAs[Double]("quantile") -> r).toMap
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val need = math.ceil(q * n).toLong
      val exactVal = exact((need - 1).toInt)
      val edge = got(q).getAs[Double]("lower_edge")
      assert(edge <= exactVal && exactVal <= edge + binWidth + 1e-9,
        s"q=$q: exact $exactVal must fall in [$edge, ${edge + binWidth}]")
      assert(got(q).getAs[Long]("need") == need)
    }
  }

  test("correlation matrix: exact on linear fixtures, null on constant, invariant") {
    import spark.implicits._
    // y = 2x+1 → corr exactly 1; z = -x → corr exactly -1; c constant → null
    val df = (1 to 200).map(i => (i.toDouble, 2.0 * i + 1.0, -i.toDouble, 7.0))
      .toDF("x", "y", "z", "c")
    val r = Profiling.corrReport(df, Seq("x", "y", "z", "c"))
      .collect()
      .map(row => (row.getString(0), row.getString(1)) -> row).toMap
    assert(r(("x", "y")).getAs[Double]("corr") == 1.0)
    assert(r(("x", "z")).getAs[Double]("corr") == -1.0)
    assert(r(("y", "z")).getAs[Double]("corr") == -1.0)
    Seq(("x", "c"), ("y", "c"), ("z", "c")).foreach { p =>
      assert(r(p).isNullAt(r(p).fieldIndex("corr")), s"constant column pair $p")
    }
    assert(r(("x", "y")).getAs[Long]("n") == 200)
    // partition invariance: decimal sufficient statistics are exact
    val base = Profiling.corrReport(df, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y").collect().toSeq
    for (p <- Seq(1, 3, 32)) {
      assert(Profiling.corrReport(df.repartition(p), Seq("x", "y", "z"))
        .orderBy("col_x", "col_y").collect().toSeq == base, s"corr p=$p")
    }
  }

  test("all three reports are partition-count invariant (1/3/32 partitions)") {
    import spark.implicits._
    val binned = (0 until 2000).map(i => ((i % 7).toLong, (i * 13) % 10)).toDF("h", "bin")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("shipdate_ms", expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 1000"))
    val xs = li.select(col("l_extendedprice").as("x"))
    val basePsi = Profiling.psiReport(binned).orderBy("hour_bucket").collect().toSeq
    val baseProf = Profiling.columnProfileReport(li, Seq("l_quantity", "shipdate_ms"),
      Seq("l_returnflag")).orderBy("col_name").collect().toSeq
    val baseHist = Profiling.histogramQuantileReport(xs, Seq(0.5, 0.99), 500)
      .orderBy("quantile").collect().toSeq
    for (p <- Seq(1, 3, 32)) {
      assert(Profiling.psiReport(binned.repartition(p))
        .orderBy("hour_bucket").collect().toSeq == basePsi, s"psi p=$p")
      assert(Profiling.columnProfileReport(li.repartition(p), Seq("l_quantity", "shipdate_ms"),
        Seq("l_returnflag")).orderBy("col_name").collect().toSeq == baseProf, s"profile p=$p")
      assert(Profiling.histogramQuantileReport(xs.repartition(p), Seq(0.5, 0.99), 500)
        .orderBy("quantile").collect().toSeq == baseHist, s"hist p=$p")
    }
  }
}

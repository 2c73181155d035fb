package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{GraftQuery, Tables}

/** Relational operator surface over the TPC-H-ish testdata tables.
  *
  * These exercise the built-in Spark operators the reference engine lacks
  * (SURVEY.md §2.7): multi-way joins (broadcast + shuffle), semi/anti joins,
  * window functions, rollup, scalar subqueries, distinct aggregates, and
  * event sessionization.
  *
  * Oracle-parity discipline: every float aggregate is computed over exact
  * DECIMAL casts and only converted to DOUBLE at the output boundary, so
  * Spark and DuckDB produce bit-identical doubles regardless of
  * accumulation order. Counts stay BIGINT on both sides (DuckDB integer
  * SUMs are explicitly cast down from HUGEINT).
  */
object Relational {
  // Exact decimal views of the double-typed money/rate columns.
  private val MONEY = DecimalType(12, 2)
  private val RATE  = DecimalType(4, 2)
  private def money(c: Column): Column = c.cast(MONEY)
  private def rate(c: Column): Column  = c.cast(RATE)
  private def ts(s: String): Column    = to_timestamp(lit(s))

  def all: Seq[GraftQuery] = Seq(
    pricingSummary, revenueByNation, shippingPriority, orderPriority,
    forecastRevenue, customersNoOrders, topCustomersPerSegment,
    runningOrderTotal, revenueRollup, partTypeStats, aboveAvgParts,
    sessionize, hourlyEvents, propsExtract, asofLastError, setOpsCohorts,
    cubeStats, topSupplier, largeOrders, pivotEvents, percentiles,
    windowSuite)

  /** TPC-H Q1-style pricing summary: single scan, map-side partial agg. */
  val pricingSummary: GraftQuery = GraftQuery.sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val discPrice = money(li("l_extendedprice")) * (lit(1) - rate(li("l_discount")))
    li.where(li("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(money(li("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(li("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(discPrice * (lit(1) + rate(li("l_tax")))).cast("double").as("sum_charge"),
        (sum(money(li("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(money(li("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q5-style 6-way join; dims broadcast, fact tables shuffle-join. */
  val revenueByNation: GraftQuery = GraftQuery.sql(
    "q02_revenue_by_nation",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    broadcast(Tables.region(spark, dir).where(col("r_name") === "EUROPE"))
      .join(broadcast(Tables.nation(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(o, col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q3-style: join + agg + deterministic top-k. */
  val shippingPriority: GraftQuery = GraftQuery.sql(
    "q03_shipping_priority",
    """SELECT o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-06-30'
      |  AND l_shipdate  > TIMESTAMP '1996-06-30'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir).where(col("o_orderdate") < ts("1996-06-30")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).where(col("l_shipdate") > ts("1996-06-30")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style EXISTS → left-semi join. */
  val orderPriority: GraftQuery = GraftQuery.sql(
    "q04_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val returned = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-style: highly selective scan-agg; filters push to parquet. */
  val forecastRevenue: GraftQuery = GraftQuery.sql(
    "q05_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(money(col("l_extendedprice")) * rate(col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** NOT EXISTS → left-anti join (with a pushed-down filter on the right). */
  val customersNoOrders: GraftQuery = GraftQuery.sql(
    "q06_customers_no_orders",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate < TIMESTAMP '1995-07-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_orderdate") < ts("1995-07-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Window top-N per group (row_number over exact-decimal spend). */
  val topCustomersPerSegment: GraftQuery = GraftQuery.sql(
    "q07_top_customers_per_segment",
    """SELECT c_mktsegment, c_custkey, spend, rk FROM (
      |  SELECT c_mktsegment, c_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY SUM(CAST(o_totalprice AS DECIMAL(12,2))) DESC, c_custkey) AS BIGINT) AS rk
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_mktsegment, c_custkey
      |) WHERE rk <= 3
      |ORDER BY c_mktsegment, rk""".stripMargin) { (spark, dir) =>
    val spend = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(sum(money(col("o_totalprice"))).as("spend_dec"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("spend_dec").desc, col("c_custkey"))
    spend
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"),
        col("spend_dec").cast("double").as("spend"), col("rk"))
      .orderBy("c_mktsegment", "rk")
  }

  /** Running total window (exact decimal accumulation). */
  val runningOrderTotal: GraftQuery = GraftQuery.sql(
    "q08_running_order_total",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(money(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP over the region→nation hierarchy. */
  val revenueRollup: GraftQuery = GraftQuery.sql(
    "q09_revenue_rollup",
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (spark, dir) =>
    // Dataset.rollup after a join trips Spark 4.1's ambiguous-self-join
    // detector even though nothing is self-joined (the Expand node duplicates
    // the grouping attributes); the detection is advisory, so disable it.
    spark.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
    val joined = broadcast(Tables.region(spark, dir))
      .join(broadcast(Tables.nation(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"))
      .select("r_name", "n_name", "o_totalprice")
    val rolled = joined
      .rollup("r_name", "n_name")
      .agg(sum(money(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
    rolled.orderBy(rolled("r_name").asc_nulls_first, rolled("n_name").asc_nulls_first)
  }

  /** Distinct aggregates + min/max per group. */
  val partTypeStats: GraftQuery = GraftQuery.sql(
    "q10_part_type_stats",
    """SELECT p_brand,
      |  COUNT(*) AS n_parts,
      |  COUNT(DISTINCT p_type) AS n_types,
      |  MIN(p_size) AS min_size, MAX(p_size) AS max_size,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_retail
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
    Tables.part(spark, dir)
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"),
        sum(money(col("p_retailprice"))).cast("double").as("total_retail"))
      .orderBy("p_brand")
  }

  /** Scalar subquery (global mean) → broadcast join against a 1-row agg. */
  val aboveAvgParts: GraftQuery = GraftQuery.sql(
    "q11_above_avg_parts",
    """SELECT p_partkey, p_name, p_retailprice
      |FROM part
      |WHERE p_retailprice > (
      |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 1.03 FROM part)
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    val thr = p.agg((sum(money(col("p_retailprice"))).cast("double") / count(lit(1)) * 1.03)
      .as("thr"))
    p.join(broadcast(thr), col("p_retailprice") > col("thr"))
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** Gap-based sessionization (30 min) via lag + cumulative-sum windows. */
  val sessionize: GraftQuery = GraftQuery.sql(
    "q12_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
      |), flagged AS (
      |  SELECT user_id, ts_us, event_id,
      |    CASE WHEN LAG(ts_us) OVER w IS NULL
      |           OR ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), sess AS (
      |  SELECT user_id,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged
      |), per_sess AS (
      |  SELECT user_id, session_id, COUNT(*) AS sess_events FROM sess GROUP BY 1, 2
      |)
      |SELECT user_id,
      |  COUNT(*) AS n_sessions,
      |  CAST(MAX(sess_events) AS BIGINT) AS max_session_events,
      |  CAST(SUM(sess_events) AS BIGINT) AS n_events
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("ts_us"), 1).over(byUser)
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("new_s",
        when(prev.isNull || (col("ts_us") - prev) > lit(1800000000L), 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("sess_events"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("sess_events")).as("max_session_events"),
        sum(col("sess_events")).cast("long").as("n_events"))
      .orderBy("user_id")
  }

  /** Tumbling 1h window aggregation over the event stream (batch view). */
  val hourlyEvents: GraftQuery = GraftQuery.sql(
    "q13_hourly_events",
    """SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_bucket, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(expr("ts_us div 3600000000").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("total_value"))
      .orderBy("hour_bucket", "event_type")
  }

  /** Semi-structured props column: regex field extraction + aggregation. */
  val propsExtract: GraftQuery = GraftQuery.sql(
    "q14_props_extract",
    """SELECT event_type,
      |  COUNT(DISTINCT TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INTEGER)) AS n_k,
      |  CAST(SUM(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(SUM(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    // try_cast on BOTH engines: a no-digit extract ('') or a digit run past
    // int/long range becomes NULL instead of an ANSI cast error
    val kInt = expr("try_cast(nullif(regexp_extract(props, '[0-9]+', 0), '') AS INT)")
    val kLong = expr("try_cast(nullif(regexp_extract(props, '[0-9]+', 0), '') AS BIGINT)")
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(kInt).as("n_k"),
        sum(kLong).cast("long").as("sum_k"),
        (sum(kLong).cast("double") / count(lit(1))).as("avg_k"))
      .orderBy("event_type")
  }

  /** INTERSECT / EXCEPT set operations over customer-year cohorts. */
  val setOpsCohorts: GraftQuery = GraftQuery.sql(
    "q45_set_ops",
    """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
      |            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |     y97 AS (SELECT DISTINCT o_custkey FROM orders
      |            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n
      |FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
      |UNION ALL
      |SELECT 'only_1996', CAST(COUNT(*) AS BIGINT)
      |FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
      |UNION ALL
      |SELECT 'only_1997', CAST(COUNT(*) AS BIGINT)
      |FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
      |ORDER BY cohort""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    def cohort(from: String, to: String) = orders
      .where(col("o_orderdate") >= ts(from) && col("o_orderdate") < ts(to))
      .select("o_custkey").distinct()
    val y96 = cohort("1996-01-01", "1997-01-01")
    val y97 = cohort("1997-01-01", "1998-01-01")
    Seq(
      ("both", y96.intersect(y97).count()),
      ("only_1996", y96.except(y97).count()),
      ("only_1997", y97.except(y96).count()))
      .toDF("cohort", "n")
      .orderBy("cohort")
  }

  /** CUBE over (p_brand, p_size bucket): all grouping-set combinations in
    * one pass (partial-agg friendly — each combination is a map-side
    * expansion, one shuffle total).
    */
  val cubeStats: GraftQuery = GraftQuery.sql(
    "q46_cube",
    """SELECT p_brand, p_size % 10 AS size_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM part
      |GROUP BY CUBE (p_brand, p_size % 10)
      |ORDER BY p_brand NULLS FIRST, size_bucket NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.part(spark, dir)
      .cube(col("p_brand"), (col("p_size") % 10).as("size_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("p_retailprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("total_price"))
      .orderBy(asc_nulls_first("p_brand"), asc_nulls_first("size_bucket"))
  }

  /** TPC-H Q15 pattern: per-supplier revenue, suppliers achieving the
    * global maximum (scalar-subquery against an aggregate).
    */
  val topSupplier: GraftQuery = GraftQuery.sql(
    "q48_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total = (SELECT MAX(total) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    val dec = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    val revenue = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(dec).as("total"))
    val maxRev = revenue.agg(max(col("total")).as("mx"))
    Tables.supplier(spark, dir)
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q18 pattern: orders whose total quantity exceeds a threshold
    * (HAVING on the child agg, semi-joined back to the parent rows).
    */
  val largeOrders: GraftQuery = GraftQuery.sql(
    "q49_large_orders",
    """WITH big AS (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
      |)
      |SELECT o_orderkey, o_custkey, o_orderdate,
      |  CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem
      |        WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    // one aggregation, ONE join: the filtered aggregate is unique per
    // l_orderkey, so the inner join alone is the semi-join + lookup fused
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(money(col("l_quantity"))).as("qsum"))
      .where(col("qsum") > 300)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("qsum").cast("double").as("total_qty"))
      .orderBy("o_orderkey")
  }

  /** Pivot: per-user event counts spread into one column per event type
    * (Spark `pivot` with explicit values — one shuffle, no second pass to
    * discover the column set).
    */
  val pivotEvents: GraftQuery = GraftQuery.sql(
    "q50_pivot_events",
    """SELECT user_id,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  /** Interpolated percentiles (percentile_cont semantics) of order totals
    * per status — exact, not sketch-based, so it hash-matches DuckDB.
    */
  val percentiles: GraftQuery = GraftQuery.sql(
    "q51_percentiles",
    """SELECT o_orderstatus,
      |  percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
      |  percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
      |  percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .orderBy("o_orderstatus")
  }

  /** Window-function family sweep: ntile, cume_dist, first/last value with
    * explicit frames, lead — one shuffle on the partition key.
    */
  val windowSuite: GraftQuery = GraftQuery.sql(
    "q54_window_suite",
    """SELECT o_custkey, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(cume_dist() OVER w, 12) AS cd,
      |  first_value(o_orderkey) OVER w AS first_ok,
      |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
      |  lead(o_orderkey, 1) OVER w AS next_ok
      |FROM orders
      |WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .where(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(cume_dist().over(w), 12).as("cd"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(full).as("last_ok"),
        lead(col("o_orderkey"), 1).over(w).as("next_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** As-of join: every event attached to the user's most recent STRICTLY
    * prior 'error' event (point-in-time attribution). Spark has no asof
    * primitive — [[AsOfJoin]] implements it as union + running-last: one
    * shuffle, no range cross product. Oracle is DuckDB's native ASOF JOIN.
    */
  val asofLastError: GraftQuery = GraftQuery.sql(
    "q43_asof_last_error",
    """SELECT e.event_id, e.user_id,
      |  err.event_id AS asof_event_id,
      |  epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(err.ts AS TIMESTAMP)) AS us_since_error
      |FROM events e ASOF LEFT JOIN (
      |  SELECT * FROM events WHERE event_type = 'error') err
      |  ON e.user_id = err.user_id AND e.ts > err.ts
      |ORDER BY e.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    val errors = events.where(col("event_type") === "error")
    AsOfJoin.asofBackwardStrict(
      events.select("event_id", "user_id", "ts_us"),
      errors.select(col("user_id"), col("event_id"), col("ts_us")),
      keys = Seq("user_id"),
      leftTime = "ts_us", rightTime = "ts_us",
      payload = Seq("event_id", "ts_us"),
      tiebreak = "event_id")
      .select(
        col("event_id"), col("user_id"),
        col("asof_event_id"),
        (col("ts_us") - col("asof_ts_us")).as("us_since_error"))
      .orderBy("event_id")
  }
}

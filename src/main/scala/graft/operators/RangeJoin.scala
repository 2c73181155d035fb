package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{GraftQuery, Tables}

/** Range joins — interval (1-D) and bbox (2-D) containment joins, the
  * second operator family Spark lacks natively next to the as-of join
  * (SURVEY §2.7; `AsOfJoin` covers point-in-time, this covers
  * point-in-range).
  *
  * Naively, `points JOIN intervals ON t BETWEEN start AND end` has no
  * equi-key, so Catalyst can only plan a BroadcastNestedLoopJoin (small
  * side) or a cartesian product — O(|points|·|intervals|) comparisons,
  * dead at 100 TB on both sides. The standard scale shape (Spark's own
  * range-join hint on Databricks, Flink's interval join, and the
  * DE-9IM/grid binning every spatial engine uses) is BIN + EQUI-JOIN +
  * RESIDUAL:
  *
  *   1. pick a bin width `w`; a point belongs to exactly ONE bin
  *      (`t div w`), an interval overlaps `len/w + 1` consecutive bins
  *      and is exploded to one row per bin;
  *   2. equi-join on the bin id — a plain shuffled hash/sort-merge join,
  *      partitioned, AQE-skew-splittable, broadcastable when one side is
  *      small;
  *   3. re-check the exact predicate on the survivors (the residual).
  *
  * Each qualifying (point, interval) pair meets EXACTLY once — the
  * point's single bin is one of the interval's bins — so no distinct
  * pass is needed. Cost: the explode multiplies the interval side by
  * ~`avg_len/w + 1` rows; candidate pairs are bounded by co-binned rows
  * instead of the full cross product. Pick `w` near the typical interval
  * length so both factors stay ~2×. The same construction lifts to 2-D
  * for bbox containment with grid cells (the engine's own Q1 bbox query
  * over the zoom-cell layout is the indexed-side special case —
  * reference analogue `packages/arrow-supercluster/src/arrow-cluster-engine.ts:165-253`,
  * which answers bbox probes against pre-binned zoom cells).
  *
  * Bin ids use integer `div` (truncating division). Truncation makes
  * bucket 0 span `(-w, w)` — twice as wide — but the bucket function is
  * still monotone and identical on both sides, which is all steps 1–2
  * need; step 3 restores exactness regardless of binning.
  */
object RangeJoin {

  def all: Seq[GraftQuery] = Seq(errorWindowRollup, bboxContainment)

  private val MONEY = DecimalType(12, 2)

  /** 1-D interval join: every `points` row paired with every `intervals`
    * row whose half-open `[start, end)` contains its `tCol`. All three
    * range columns must be integral (epoch micros is the intended use).
    * Intervals with `end <= start` are empty and dropped, matching the
    * half-open predicate. Output = all points columns + all intervals
    * columns (names must not collide).
    *
    * @param binWidth bin size in the time column's unit; choose near the
    *                 typical interval length (explode factor is
    *                 `len/binWidth + 1` rows per interval)
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      tCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("_rj_bin", expr(s"`$tCol` div ${binWidth}L"))
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_rj_bin", explode(sequence(
        expr(s"`$startCol` div ${binWidth}L"),
        expr(s"(`$endCol` - 1L) div ${binWidth}L"))))
    p.join(iv, Seq("_rj_bin"))
      .where(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("_rj_bin")
  }

  /** 2-D bbox containment join: every `points` row paired with every
    * `boxes` row whose half-open `[x0,x1) × [y0,y1)` rectangle contains
    * its (lng, lat). Same bin + equi-join + residual construction with
    * square grid cells of `cellDeg` degrees; the equi-key is the (cx, cy)
    * cell pair. The cell range is computed with closed ends (a box whose
    * edge lands exactly on a cell boundary lists one spare cell row; the
    * residual discards it), so no floating-point edge case can LOSE a
    * pair — only add a discarded candidate.
    */
  def bboxJoin(
      points: DataFrame,
      boxes: DataFrame,
      lngCol: String,
      latCol: String,
      x0: String,
      y0: String,
      x1: String,
      y1: String,
      cellDeg: Double): DataFrame = {
    require(cellDeg > 0, s"cellDeg must be positive, got $cellDeg")
    val cell = (c: Column) => floor(c / cellDeg).cast("long")
    val p = points
      .withColumn("_rj_cx", cell(col(lngCol)))
      .withColumn("_rj_cy", cell(col(latCol)))
    val b = boxes
      .where(col(x1) > col(x0) && col(y1) > col(y0))
      .withColumn("_rj_cx", explode(sequence(cell(col(x0)), cell(col(x1)))))
      .withColumn("_rj_cy", explode(sequence(cell(col(y0)), cell(col(y1)))))
    p.join(b, Seq("_rj_cx", "_rj_cy"))
      .where(col(lngCol) >= col(x0) && col(lngCol) < col(x1) &&
        col(latCol) >= col(y0) && col(latCol) < col(y1))
      .drop("_rj_cx", "_rj_cy")
  }

  /** Incident-window rollup: for each `error` event, aggregate EVERY
    * event inside the 10 minutes that follow it (the trigger itself
    * included — its `ts` is the closed start). A keyless interval join —
    * windows overlap freely and a busy event matches many windows — that
    * the binned plan answers with one equi-join on the 10-minute bin id;
    * the oracle is DuckDB's native inequality join. Decimal value sums
    * per the q13 discipline keep the double output accumulation-order
    * independent.
    */
  val errorWindowRollup: GraftQuery = GraftQuery.sql(
    "q101_interval_join",
    """WITH ev AS (
      |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value, event_type
      |  FROM events
      |), iv AS (
      |  SELECT event_id AS window_id, t AS start_us, t + 600000000 AS end_us
      |  FROM ev WHERE event_type = 'error'
      |)
      |SELECT window_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM iv JOIN ev ON ev.t >= iv.start_us AND ev.t < iv.end_us
      |GROUP BY window_id
      |ORDER BY window_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts_us"), col("value"), col("event_type"))
    val windows = ev.where(col("event_type") === "error")
      .select(col("event_id").as("window_id"),
        col("ts_us").as("start_us"),
        (col("ts_us") + lit(600000000L)).as("end_us"))
    intervalJoin(ev.select("event_id", "ts_us", "value"), windows,
        "ts_us", "start_us", "end_us", binWidth = 600000000L)
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(MONEY)).cast("double").as("sum_value"))
      .orderBy("window_id")
  }

  /** Spatial containment rollup: 150 user-derived 20°×10° rectangles
    * against the shared synthetic point cloud (`Spatial.pointsDf`), via
    * the 2-D grid-cell join at 5° cells. Integer-only aggregates (count +
    * event-id sum) make the oracle hash trivially exact; the centesimal
    * fixture doubles are bit-identical cross-engine by construction.
    */
  val bboxContainment: GraftQuery = GraftQuery.sql(
    "q102_bbox_join",
    s"""WITH pts AS (${Spatial.pointsSql}),
       |boxes AS (
       |  SELECT DISTINCT user_id,
       |    (user_id * 7919 % 32000) / 100.0 - 170.0 AS x0,
       |    (user_id * 104729 % 14000) / 100.0 - 75.0 AS y0
       |  FROM events
       |)
       |SELECT user_id, COUNT(*) AS n_points,
       |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id
       |FROM boxes b JOIN pts p
       |  ON p.lng >= b.x0 AND p.lng < b.x0 + 20.0
       | AND p.lat >= b.y0 AND p.lat < b.y0 + 10.0
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val boxes = Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("x0", (col("user_id") * 7919 % 32000) / 100.0 - 170.0)
      .withColumn("y0", (col("user_id") * 104729 % 14000) / 100.0 - 75.0)
      .withColumn("x1", col("x0") + 20.0)
      .withColumn("y1", col("y0") + 10.0)
    bboxJoin(Spatial.pointsDf(spark, dir), boxes,
        "lng", "lat", "x0", "y0", "x1", "y1", cellDeg = 5.0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_points"),
        sum(col("event_id")).cast("long").as("sum_event_id"))
      .orderBy("user_id")
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic point generator (reference S7:
  * generate-geoparquet.ts:85-139 and tests/test-utils.ts:51-65 — Park-Miller
  * LCG, seed 42, lng = r·360−180, lat = r·170−85).
  *
  * The reference draws sequentially; here each row jumps straight to its
  * position in the LCG stream via modular exponentiation
  * (seedₖ = seed₀·16807ᵏ mod 2³¹−1), so generation is embarrassingly
  * parallel — `spark.range(n)` partitions generate independently and the
  * result is identical to the sequential draw at any partition count.
  */
object SyntheticPoints {
  private val M = 2147483647L // 2^31 − 1 (prime)
  private val A = 16807L

  private def mulmod(a: Long, b: Long): Long = a * b % M // fits: < 2^62

  private def powA(k: Long): Long = {
    var result = 1L
    var base = A
    var e = k
    while (e > 0) {
      if ((e & 1) == 1) result = mulmod(result, base)
      base = mulmod(base, base)
      e >>= 1
    }
    result
  }

  /** The k-th draw (1-based) of the Park-Miller stream from `seed`. */
  def draw(seed: Long, k: Long): Double = mulmod(seed % M, powA(k)).toDouble / M

  /** Row i (0-based) consumes draws 2i+1 (lng) and 2i+2 (lat). */
  def pointAt(seed: Long, i: Long): (Double, Double) =
    (draw(seed, 2 * i + 1) * 360.0 - 180.0, draw(seed, 2 * i + 2) * 170.0 - 85.0)

  /** Distributed uniform point table: (row_id, lng, lat). */
  def uniform(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val (lng, lat) = pointAt(seed, i)
      (i, lng, lat)
    }.toDF("row_id", "lng", "lat")
  }

  /** City centers of the reference demo datasets
    * (generate-geoparquet.ts:60-81).
    */
  val CityCenters: IndexedSeq[(Double, Double, String)] = IndexedSeq(
    (-122.42, 37.78, "San Francisco"), (-73.97, 40.76, "New York"),
    (-0.12, 51.51, "London"), (2.35, 48.86, "Paris"),
    (139.69, 35.69, "Tokyo"), (151.21, -33.87, "Sydney"),
    (-43.17, -22.91, "Rio de Janeiro"), (28.98, 41.01, "Istanbul"),
    (77.21, 28.61, "New Delhi"), (37.62, 55.75, "Moscow"),
    (-118.24, 34.05, "Los Angeles"), (13.41, 52.52, "Berlin"),
    (100.5, 13.76, "Bangkok"), (-46.63, -23.55, "São Paulo"),
    (31.24, 30.04, "Cairo"), (-87.63, 41.88, "Chicago"),
    (126.98, 37.57, "Seoul"), (116.4, 39.9, "Beijing"),
    (-3.7, 40.42, "Madrid"), (18.07, 59.33, "Stockholm"))

  /** One city-gaussian point (reference generate-geoparquet.ts:85-139):
    * draw 3i+1 picks the center, draws 3i+2/3i+3 feed Box-Muller, offset
    * ×1.5°, lat clamped to ±85. Exactly 3 draws per point — the
    * reference's `u1 === 0` rejection can never fire (the Park-Miller
    * cycle never emits 0) — so jump-ahead stays aligned.
    */
  def cityPointAt(seed: Long, i: Long): (Double, Double, String) = {
    val cityIdx = math.floor(draw(seed, 3 * i + 1) * CityCenters.length).toInt
    val (cLng, cLat, name) = CityCenters(cityIdx)
    val u1 = draw(seed, 3 * i + 2)
    val u2 = draw(seed, 3 * i + 3)
    val mag = math.sqrt(-2.0 * math.log(u1))
    val dx = mag * math.cos(2.0 * math.Pi * u2)
    val dy = mag * math.sin(2.0 * math.Pi * u2)
    (cLng + dx * 1.5, math.max(-85.0, math.min(85.0, cLat + dy * 1.5)), name)
  }

  /** Distributed demo-style point table: (row_id, lng, lat, city). */
  def cityGaussian(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val (lng, lat, city) = cityPointAt(seed, i)
      (i, lng, lat, city)
    }.toDF("row_id", "lng", "lat", "city")
  }
}

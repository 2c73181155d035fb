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
}

package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpus for the ANN scale rungs —
  * the [[SyntheticPoints]] discipline applied to vectors: generated
  * distributively from `spark.range` (no driver materialization, no
  * RNG state), every component a pure hash of (id, dim), so any rung
  * size replays bit-identically across sessions and partitionings.
  *
  * Shape: `nClusters` well-separated centers (components uniform in
  * [-1, 1], derived from murmur3 of (cluster, dim)), each vector = its
  * cluster's center + `spread`-scaled uniform noise — the regime real
  * embedding corpora approximate and IVF's coarse quantizer exploits.
  * `spread = 0` degenerates to pure centers; large `spread` approaches
  * the i.i.d. regime where calibration must probe deep.
  */
object SyntheticVectors {

  def clustered(
      spark: SparkSession,
      n: Long,
      dim: Int = 16,
      nClusters: Int = 64,
      spread: Double = 0.15): DataFrame = {
    // murmur3 → uniform double in [-1, 1]: hash to a 32-bit int, scale.
    // Column-only arithmetic — the whole corpus is one codegen'd project
    // over spark.range, partitioned like any other scan.
    def u(cols: org.apache.spark.sql.Column*) =
      hash(cols: _*).cast("double") / Int.MaxValue.toDouble
    val id = col("id")
    val cluster = pmod(id, lit(nClusters.toLong))
    val vec = transform(sequence(lit(0), lit(dim - 1)), j =>
      u(cluster, j, lit(0xC3A5)) + lit(spread) * u(id, j, lit(0x5EED)))
    spark.range(n).select(
      id.as("vec_id"),
      vec.cast("array<float>").as("embedding"))
  }
}

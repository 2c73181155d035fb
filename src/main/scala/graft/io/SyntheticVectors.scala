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

  /** murmur3 → uniform double in [-1, 1]: hash to a 32-bit int, scale.
    * Column-only arithmetic — the whole corpus is one codegen'd project
    * over spark.range, partitioned like any other scan.
    */
  private def u(cols: org.apache.spark.sql.Column*) =
    hash(cols: _*).cast("double") / Int.MaxValue.toDouble

  def clustered(
      spark: SparkSession,
      n: Long,
      dim: Int = 16,
      nClusters: Int = 64,
      spread: Double = 0.15): DataFrame = {
    val id = col("id")
    val cluster = pmod(id, lit(nClusters.toLong))
    val vec = transform(sequence(lit(0), lit(dim - 1)), j =>
      u(cluster, j, lit(0xC3A5)) + lit(spread) * u(id, j, lit(0x5EED)))
    spark.range(n).select(
      id.as("vec_id"),
      vec.cast("array<float>").as("embedding"))
  }

  /** The RECALL-MEANINGFUL fixture (r10 verdict #2): [[clustered]]'s
    * tight micro-clusters are so separable that every ANN rung reads
    * recall@3 = 1.0 at any probe depth — the latency curve is measured
    * but a recall regression is invisible. Here the structure makes the
    * index's decisions matter, the way the reference's differential
    * suite deliberately uses data where the algorithm's choices show
    * (`tests/engine.test.ts:10-23`):
    *
    *  - **Planted near-duplicate pairs** (ids 2p / 2p+1 share an anchor,
    *    jittered by `pairSpread`): each vector's TRUE top-1 is its pair
    *    mate at unambiguous distance — the exact top-k stays meaningful,
    *    never a PQ-quantization-noise tie.
    *  - **Overlapping, heavy-tailed superclusters**: pair anchors draw
    *    from `nSupers` broad clusters whose `superSpread` is comparable
    *    to their separation (the clouds overlap into one near-uniform
    *    mass), with a pow-2 skewed assignment so some coarse lists run
    *    hot. True neighbors #2/#3 are BACKGROUND points at near-tie
    *    distances that routinely sit across coarse-quantizer boundaries
    *    — low probe depths miss them, so recall bends with nprobe (and
    *    with the refine shortlist, since ADC error is comparable to the
    *    background near-tie gaps).
    *
    * Same determinism discipline as [[clustered]]: every component a
    * pure hash of ids, bit-identical across sessions and partitionings.
    */
  def hardClustered(
      spark: SparkSession,
      n: Long,
      dim: Int = 16,
      nSupers: Int = 256,
      superSpread: Double = 0.5,
      pairSpread: Double = 0.02): DataFrame = {
    val id = col("id")
    val pair = floor(id / 2).cast("long")
    // heavy tail: uniform [0,1) pushed through x² piles pairs onto the
    // low supercluster ids (density ~ 1/(2√x))
    val u01 = (u(pair, lit(0x7A11)) + lit(1.0)) / 2.0
    val superc = least(
      floor(pow(u01, 2.0) * nSupers).cast("long"), lit((nSupers - 1).toLong))
    val vec = transform(sequence(lit(0), lit(dim - 1)), j =>
      u(superc, j, lit(0xC3A5)) +
        lit(superSpread) * u(pair, j, lit(0xA7C4)) +
        lit(pairSpread) * u(id, j, lit(0x5EED)))
    spark.range(n).select(
      id.as("vec_id"),
      vec.cast("array<float>").as("embedding"))
  }
}

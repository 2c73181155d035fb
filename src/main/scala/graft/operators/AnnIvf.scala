package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbour — the index-structure
  * scale path for embedding search (complements the LSH sign-sketch in
  * [[Similarity]]).
  *
  * Build: `k` coarse centroids — deterministic seeds (every (n/k)-th vector
  * by id) refined with `iters` Lloyd steps, each ONE groupBy over
  * (assignment, dim) — then every vector is assigned to its nearest
  * centroid (broadcast of k·dim floats, argmin via the fast native dot).
  * Query: probe the `nprobe` nearest centroid lists only and rescore
  * exactly there — at 100 TB the scan shrinks k/nprobe-fold and the
  * centroid table stays broadcast-sized.
  *
  * Distances use IEEE-double cosine (the fast kernel): assignment and
  * probe selection are index-build concerns with no oracle; the final
  * rescore reuses the decimal-exact oracle-checked cosine.
  */
object AnnIvf {

  /** (vector table with `_centroid` column, centroid table).
    *
    * @param exactScores score assignment/probes with the decimal-exact
    *                    rounded cosine instead of the fast double kernel —
    *                    bit-reproducible across engines (the q47 oracle
    *                    mode); same plan shapes, ~dim× more scalar work
    */
  def buildIndex(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 16,
      iters: Int = 2,
      exactScores: Boolean = false): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    val n = emb.count()
    val stride = math.max(n / k, 1L)

    // deterministic seed centroids: every stride-th vector by id
    var centroids = emb
      .where(col(idCol) % stride === 0 && col(idCol) / stride < k)
      .select((col(idCol) / stride).cast("int").as("_c"),
        col(vecCol).cast("array<double>").as("_cv"))

    // embedding dimensionality (fixed per table) — lets the Lloyd step
    // aggregate per-dimension sums as `dim` scalar aggregates over the
    // ORIGINAL rows instead of a posexplode (which shuffles dim× rows and
    // needs a second groupBy to reassemble the array)
    val dim = emb.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

    var it = 0
    while (it < iters && dim > 0) {
      val assigned = assign(emb, centroids, idCol, vecCol, exactScores)
      // Lloyd step: ONE hash-shuffle of k×(dim+1) partial aggregates.
      // Per-dimension sums accumulate in DECIMAL: exact, therefore
      // independent of partition/merge order — the means (and every
      // downstream assignment) are bit-reproducible run to run, where a
      // double sum would wobble by ULPs with the shuffle schedule.
      val sums = (1 to dim).map(i =>
        sum(element_at(col(vecCol), i).cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(30, 15))).as(s"_s$i"))
      val aggs = count(lit(1)).as("_n") +: sums
      centroids = assigned
        .groupBy(col("_centroid").as("_c"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("_c"),
          array((1 to dim).map(i => col(s"_s$i").cast("double") / col("_n")): _*).as("_cv"))
      it += 1
    }
    (assign(emb, centroids, idCol, vecCol, exactScores), centroids)
  }

  /** Nearest-centroid assignment as a PURE MAP: the k centroids are tiny,
    * so they ship as literal arrays inside the projection — k fused native
    * dots per row, argmax via array_position, no join, no window, no
    * shuffle. At 100 TB this is a single scan; the windowed-join
    * formulation would shuffle the whole corpus per Lloyd step.
    * Ties pick the smallest centroid id (first max occurrence).
    */
  private def assign(
      emb: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      exactScores: Boolean = false): DataFrame = {
    val cents = centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    // Exact mode scores with the decimal cosine, but evaluating it for all
    // k centroids is ~dim× the whole build cost. The fast double kernel is
    // within ~1e-14 of the decimal value, so any centroid more than 1e-6
    // below the double maximum can never be the decimal argmax — gate the
    // decimal evaluation behind that prefilter and each row pays k fast
    // dots plus decimal dots only for the (almost always 1) finalist(s).
    // The selected winner is IDENTICAL to full decimal argmax.
    val sims =
      if (!exactScores)
        array(cents.toIndexedSeq.map { case (_, v) =>
          approxCosine(col(vecCol), typedLit(v))
        }: _*)
      else
        array(cents.toIndexedSeq.zipWithIndex.map { case ((_, v), j) =>
          when(element_at(col("_apx"), j + 1) >= col("_apxmax") - 1e-6,
            scoreCosine(col(vecCol), typedLit(v), exact = true))
            .otherwise(lit(-2.0))
        }: _*)
    val withApx =
      if (!exactScores) emb
      else emb.withColumn("_apx", array(cents.toIndexedSeq.map { case (_, v) =>
        approxCosine(col(vecCol), typedLit(v))
      }: _*)).withColumn("_apxmax", array_max(col("_apx")))
    // translate array position → centroid id (a centroid that loses all
    // members drops out, so position and id can diverge)
    val idArr = typedLit(cents.map(_._1).toSeq)
    withApx
      .withColumn("_sims", sims)
      .withColumn("_centroid",
        element_at(idArr, array_position(col("_sims"), array_max(col("_sims"))).cast("int")))
      .drop("_sims", "_apx", "_apxmax")
  }

  /** NaN-guarded: a zero-norm vector yields 0/0 = NaN for every centroid,
    * which would make `array_position(_, array_max(_))` return 0 and
    * `element_at(_, 0)` throw under ANSI mode — map it to -2.0 (below any
    * real cosine) so argmax always lands on a valid position.
    */
  private def approxCosine(a: Column, b: Column): Column =
    nanvl(VectorFunctions.dotApprox(a, b) /
      (sqrt(VectorFunctions.dotApprox(a, a)) * sqrt(VectorFunctions.dotApprox(b, b))),
      lit(-2.0))

  /** The fast double kernel, or (exact mode) the decimal-exact cosine
    * rounded to 12 decimals — the same scalar the q28/q30 oracles already
    * prove bit-identical to DuckDB, making the whole IVF build + probe
    * chain cross-engine reproducible. Both share the NaN→-2.0 guard.
    */
  private def scoreCosine(a: Column, b: Column, exact: Boolean): Column =
    if (exact) nanvl(VectorFunctions.cosine(a, b), lit(-2.0))
    else approxCosine(a, b)

  /** Top-`topK` neighbours for each query vector, probing `nprobe`
    * centroid lists; exact decimal-cosine rescore within the probed lists.
    *
    * RECALL ENVELOPE (r7 sweep, BENCH.md): IVF's recall/cost trade is a
    * property of how clustered the corpus is, and the sf0.1 synthetic
    * fixture is near-uniform — adversarial for ANY space-partitioning
    * index. Measured recall@3 there: nprobe 4/8/12/16 of k=16 lists →
    * 0.63 / 0.75 / 0.97 / 1.0; and RAISING k makes it worse at equal
    * probe counts (k=32: 0.85@np8; k=64: 0.57@np8) because finer
    * partitions split true neighborhoods more often — the signature of a
    * corpus with no cluster structure, where ≥0.9 recall inherently
    * costs a ≥50% scan. On naturally clustered embeddings (AnnIvfSpec's
    * fixture) nprobe ≤ 6 of 16 clears 0.9. Defaults stay (k=16,
    * nprobe=4) for the clustered regime ANN exists for; the bench
    * `ann_ivf_np*` keys publish the measured curve so a caller can place
    * their corpus on it.
    */
  def search(
      queries: DataFrame,
      indexed: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 4,
      topK: Int = 3,
      exactScores: Boolean = false): DataFrame = {
    // per query: the nprobe nearest centroids
    val pw = Window.partitionBy(col("query_id")).orderBy(desc("_sim"), col("_c"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .join(broadcast(centroids))
      .withColumn("_sim", scoreCosine(col("_qv"), col("_cv"), exactScores))
      .withColumn("_rk", row_number().over(pw))
      .where(col("_rk") <= nprobe)
      .select(col("query_id"), col("_qv"), col("_c").as("_centroid"))

    // scan only the probed lists; exact rescore
    val withNorm = (c: Column) => VectorFunctions.normSqExact(c).cast("double")
    val cands = probes.join(
      indexed.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nv"), col("_centroid")),
      Seq("_centroid"))
      .where(col("query_id") =!= col("neighbor_id"))
      // same NaN→-2.0 guard as assignment/probes: a zero-norm vector would
      // otherwise yield NaN, which Spark sorts FIRST under desc() while the
      // oracle's NULL sorts last — guarding both sides keeps the rescore
      // rank (and the output value) engine-independent
      .select(col("query_id"), col("neighbor_id"),
        nanvl(VectorFunctions.cosineFromNormSq(
          col("_qv"), col("_nv"), withNorm(col("_qv")), withNorm(col("_nv"))),
          lit(-2.0)).as("cos_sim"))
    val rw = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    cands.withColumn("rk", row_number().over(rw).cast("long"))
      .where(col("rk") <= topK)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compressed-index rung of the ANN ladder
  * (brute-force → LSH buckets → IVF lists → PQ codes): vectors are split
  * into `m` subspaces, each subvector replaced by the id of its nearest
  * per-subspace centroid, so a d-float vector stores as m small codes and
  * query time uses asymmetric distance computation (ADC): one m×k distance
  * TABLE per query, then each candidate costs m table lookups instead of a
  * d-dim dot product.
  *
  * Spark shape: training runs ALL subspaces in one shuffle per Lloyd step
  * (explode to (id, j, subvec), argmin against broadcast-literal codebooks,
  * per-dimension sums); codebooks are k·d floats total — driver/broadcast
  * data by construction, never scale-bound. Encode is a pure map; search
  * computes the ADC table once per query row, then joins candidates the
  * same bounded-probe way as the brute-force baseline. At 100 TB PQ codes
  * would sit inside IVF lists (compose with [[AnnIvf]]); the per-operator
  * plans here are already that shape.
  */
object AnnPq {

  /** Split `vec` into m subvectors of length dsub (1-based slice). */
  private[operators] def subvec(vec: Column, j: Column, dsub: Int): Column =
    slice(vec, j * dsub + 1, lit(dsub))

  private[operators] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Adds `out` = argmin code of `sv` against codebook array `cbJ` (ties
    * pick the smallest code). Plain double distances are already
    * cross-engine reproducible: both Spark's HOF fold and DuckDB's
    * list_aggregate('sum') are strict left-to-right IEEE folds over
    * identical element order, so the q63 oracle replays these argmins
    * bit-exactly with no decimal kernel needed.
    *
    * The distance array is materialized in its own projection first (the
    * `_sims` idiom from [[AnnIvf.assign]]): referencing the `transform`
    * twice inside one expression would duplicate the whole k-distance
    * computation per row — the known HOF re-evaluation trap.
    */
  /** The fused native encode kernel as a Column — see
    * [[graft.functions.PqCodes]] (bit-identical to the declarative
    * argmin chain; AnnPqSpec proves it differentially).
    */
  private[operators] def pqCodesCol(
      v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.PqCodes(
      ColumnBridge.expression(v), codebooks))
  }

  /** The fused ADC lookup-sum kernel — see
    * [[graft.functions.AdcDistance]] (same j-order fold, bit-identical).
    */
  private[operators] def adcDistCol(codes: Column, tab: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AdcDistance(
      ColumnBridge.expression(codes), ColumnBridge.expression(tab)))
  }

  private def withArgminCode(
      df: DataFrame, sv: Column, cbJ: Column, out: String): DataFrame = {
    val apxCol = s"_apx_$out"
    df.withColumn(apxCol, transform(cbJ, c => sqDist(sv, c)))
      .withColumn(out,
        (array_position(col(apxCol), array_min(col(apxCol))) - 1).cast("int"))
      .drop(apxCol)
  }

  /** Train per-subspace codebooks: deterministic seeds (the k lowest ids'
    * subvectors) + `iters` Lloyd steps. Returns codebooks(j)(c) = centroid
    * vector — m·k·dsub doubles, intentionally driver-side (broadcast as
    * literals by encode/search).
    *
    * @param exactMeans accumulate Lloyd per-dimension sums in DECIMAL —
    *                   partition-order independent and bit-reproducible
    *                   cross-engine (the q63 oracle mode). `false` uses the
    *                   plain double sum production callers want: same plan
    *                   shape, ~2× less scalar work per dimension, means may
    *                   wobble by ULPs with the shuffle schedule (harmless
    *                   for recall — AnnPqSpec locks it on this kernel too).
    */
  def train(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2,
      exactMeans: Boolean = true): Array[Array[Array[Double]]] = {
    val dim = emb.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m

    // rows (id, j, subvec): every subspace trains in the same jobs.
    // Persisted for the duration of training — the seed collect plus every
    // Lloyd iteration reads it, and without the cache the posexplode scan
    // re-executes once per consumer (≥ iters + 2 times).
    val sub = emb.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
      .select(col("_id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => subvec(col("_v"), j, dsub))))
      .select(col("_id"), col("pos").as("_j"), col("col").as("_sv"))
      .persist()
    try {
      // deterministic seeds: the k lowest ids' subvectors per subspace
      val seedIds = emb.select(col(idCol)).orderBy(col(idCol)).limit(k)
        .collect().map(_.getLong(0))
      require(seedIds.length == k, s"need at least k=$k vectors to seed PQ codebooks")
      var codebooks: Array[Array[Array[Double]]] =
        sub.where(col("_id").isInCollection(seedIds.toSeq))
          .collect()
          .groupBy(_.getInt(1))
          .toArray.sortBy(_._1)
          .map { case (_, rows) =>
            rows.sortBy(_.getLong(0)).map(_.getSeq[Double](2).toArray)
          }

      var it = 0
      while (it < iters) {
        val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
        // nearest centroid of this row's subspace (NaN-safe argmin via
        // array_position of the min)
        val assigned = withArgminCode(
          sub, col("_sv"), element_at(cbLit, col("_j") + 1), "_c")
        // per-dimension means, ONE shuffle for all (j, c) groups. Decimal
        // accumulation (like AnnIvf's Lloyd step): exact, so the means are
        // independent of partition/merge order and bit-reproducible.
        val sums = (1 to dsub).map { i =>
          val term = element_at(col("_sv"), i)
          val s =
            if (exactMeans)
              sum(term.cast(org.apache.spark.sql.types.DecimalType(30, 15)))
                .cast("double")
            else sum(term)
          s.as(s"_s$i")
        }
        val aggs = count(lit(1)).as("_n") +: sums
        val updated = assigned.groupBy(col("_j"), col("_c"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val n = r.getLong(2).toDouble
            (r.getInt(0), r.getInt(1),
              (1 to dsub).map(i => r.getDouble(2 + i) / n).toArray)
          }
        val next = codebooks.map(_.map(identity)) // keep empty centroids
        updated.foreach { case (j, c, v) => next(j)(c) = v }
        codebooks = next
        it += 1
      }
      codebooks
    } finally sub.unpersist(blocking = false)
  }

  /** Persist trained codebooks to `path` as plain parquet rows
    * (subspace j, code c, centroid vector) — reloadable by
    * [[loadCodebooks]] with [[encode]]/[[search]] working unchanged.
    * Codebooks are m·k·dsub doubles (driver-sized by construction), but
    * training reads the whole corpus (`iters`+2 scans), so persisting the
    * trained artifact is the 100 TB deployment shape: train once on the
    * big cluster, encode/search anywhere. Doubles roundtrip bit-exactly
    * through parquet, so a reloaded codebook encodes and ranks identically
    * (AnnPqSpec proves it).
    */
  def saveCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      codebooks: Array[Array[Array[Double]]],
      path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (v, c) => (j, c, v.toSeq) }
    }.toSeq.toDF("j", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload codebooks persisted by [[saveCodebooks]] into the in-memory
    * shape [[encode]]/[[search]] take.
    */
  def loadCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Double]]] =
    spark.read.parquet(path)
      .select(col("j").cast("int"), col("c").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }

  /** Encode every vector as m codes (pure map, no shuffle).
    * @param exprKernel encode through the fused native [[graft.functions
    *   .PqCodes]] expression (default). The declarative argmin chain
    *   (`false`) is kept as the executable semantics spec — m·k
    *   interpreted lambda frames per row measured 40 s of a 53 s encode
    *   at 1M vectors; the fused kernel computes bit-identical codes
    *   (AnnPqSpec differential) in one primitive pass.
    *
    *   KNOWN DIVERGENCE on undersized vectors (< m·dsub elements, a
    *   malformed input neither [[train]] nor any internal caller can
    *   produce): the kernel returns a NULL `codes` array, while the
    *   declarative chain pads with zip_with and yields an array
    *   CONTAINING null codes. Downstream both shapes null out the
    *   candidate ([[AdcDistance]] null-propagates a null code; a null
    *   array never joins), so search results agree — only the
    *   intermediate column differs.
    */
  def encode(
      emb: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      exprKernel: Boolean = true): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val v = col(vecCol).cast("array<double>")
    if (exprKernel)
      emb.select(col(idCol).as("vec_id"), pqCodesCol(v, codebooks).as("codes"))
    else {
      val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      // per-subspace argmin unrolled over j (m is small and fixed) — a pure
      // map, one hoisted distance array per subspace
      var df = emb.select(col(idCol).as("vec_id"), v.as("_v"))
      (0 until m).foreach { j =>
        df = withArgminCode(
          df, subvec(col("_v"), lit(j), dsub), element_at(cbLit, j + 1), s"_code$j")
      }
      df.select(col("vec_id"),
        array((0 until m).map(j => col(s"_code$j")): _*).as("codes"))
    }
  }

  /** ADC + exact re-rank: per query build the m×k distance table ONCE, rank
    * every candidate by m lookups + adds (the PQ scan), keep a
    * `topK × refine` shortlist, then re-rank the shortlist with exact L2
    * against the original vectors (the standard PQ refine step — the
    * shortlist is tiny, so the exact pass is a bounded join, and recall
    * comes back even on high-entropy embeddings where quantization noise
    * swamps raw ADC ranking). Returns (query_id, neighbor_id, dist, rk).
    *
    * `refine` defaults to 100 from the r7 recall-vs-cost sweep on the
    * sf0.1 fixture (BENCH.md): with the m=8/k=16 codebook, refine=10 read
    * recall@3 = 0.60, refine=100 = 0.917, refine=200 = 0.967 — at NO
    * measured search-time cost, because the shortlist (topK×refine exact
    * rescores per query) is a constant-size bounded join that the
    * broadcast ADC scan dwarfs at any corpus size. Callers chasing the
    * last recall points raise it further; q63's ORACLE pins refine=10
    * explicitly so its DuckDB replay is untouched by the default.
    */
  def search(
      queries: DataFrame,
      encoded: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      topK: Int = 3,
      refine: Int = 100): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val qv = col(vecCol).cast("array<double>")
    val table = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(element_at(cbLit, j + 1), c => sqDist(subvec(qv, j, dsub), c)))
    val q = queries.select(col(idCol).as("query_id"), table.as("_tab"))

    // the m lookups fold left-to-right in j order — the q63 oracle mirrors
    // this with an ORDER BY _j list fold, keeping approx_dist bit-identical
    // (fused native kernel: same fold, no interpreted lambda per candidate)
    val cand = encoded.select(col("vec_id").as("neighbor_id"), col("codes"))
      .join(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_dist",
        adcDistCol(col("codes").cast("array<int>"), col("_tab")))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist"), col("neighbor_id"))
    val shortlist = cand
      .select(col("query_id"), col("neighbor_id"), col("approx_dist"))
      .withColumn("_ark", row_number().over(wa))
      .where(col("_ark") <= topK * refine)

    // exact re-rank of the bounded shortlist
    val qSide = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("_qv"))
    val nSide = emb.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("_nv"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    shortlist
      .join(broadcast(qSide), Seq("query_id"))
      .join(nSide, Seq("neighbor_id"))
      .withColumn("dist", sqDist(col("_qv"), col("_nv")))
      .select(col("query_id"), col("neighbor_id"), col("dist"))
      .withColumn("rk", row_number().over(we).cast("long"))
      .where(col("rk") <= topK)
  }
}

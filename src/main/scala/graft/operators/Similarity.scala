package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (array<float> vectors).
  *
  * Brute-force cosine top-k is the correctness baseline (exact, oracle-
  * checked); the sign-sketch LSH variant is the scale path — the cross
  * join becomes an equi-join on the bucket key, which shuffles instead of
  * broadcasting the full corpus. Dot products accumulate in DECIMAL so
  * scores are bit-identical across engines and partitionings.
  */
object Similarity {

  def all: Seq[GraftQuery] = Seq(
    knnBruteForce, embeddingNearDup, annLsh, annIvf, embeddingQuantize, annPq,
    semDedup, embeddingOutliers, hardNegatives, annIndexRoundtrip, annIvfPq,
    annIvfPqResidual, annAppend, annDelete)

  /** Embedding-space outlier pruning: distance of every vector to its
    * label centroid, flagging the top ceil(5%) per label — the
    * mislabeled/noise-document filter that complements SemDeDup (q76
    * removes redundancy near the centroids; this removes junk far from
    * them).
    *
    * Determinism: centroids are DECIMAL sums (order-independent) turned
    * into one double division per (label, dim); per-element deviations
    * are double subtract/multiply (correctly rounded, engine-identical),
    * re-summed in DECIMAL so dist² is partitioning-invariant; the 5%
    * threshold is pure integer arithmetic on the per-label rank — no
    * percentile-value float compare anywhere. The per-label windows are
    * partitioned (bounded per-key work); centroid join is a hash
    * equi-join on (label, dim), labels·dims rows — broadcastable.
    */
  val embeddingOutliers: GraftQuery = GraftQuery.sql(
    "q87_embedding_outliers",
    """WITH ex AS (
      |  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
      |), cent AS (
      |  SELECT label, i,
      |    SUM(CAST(x AS DECIMAL(25,15))) AS s, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM ex GROUP BY label, i
      |), c AS (
      |  SELECT label, i, CAST(s AS DOUBLE) / n AS c FROM cent
      |), d AS (
      |  SELECT vec_id, ex.label,
      |    SUM(CAST((x - c) * (x - c) AS DECIMAL(25,15))) AS s2
      |  FROM ex JOIN c USING (label, i) GROUP BY vec_id, ex.label
      |), r AS (
      |  SELECT vec_id, label, round(CAST(s2 AS DOUBLE), 9) AS dist2 FROM d
      |), w AS (
      |  SELECT vec_id, label, dist2,
      |    CAST(ROW_NUMBER() OVER (
      |      PARTITION BY label ORDER BY dist2 DESC, vec_id) AS BIGINT) AS rk,
      |    CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS n_label
      |  FROM r
      |)
      |SELECT vec_id, label, dist2, rk,
      |  rk <= (n_label + 19) // 20 AS is_outlier
      |FROM w ORDER BY label, rk""".stripMargin) { (spark, dir) =>
    embeddingOutlierReport(Tables.embeddings(spark, dir)).orderBy("label", "rk")
  }

  /** The q87 core on any (vec_id, label, embedding) frame: squared L2
    * distance to the label centroid, per-label rank, top-ceil(5%) flag.
    */
  def embeddingOutlierReport(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ex = emb
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i0", "xf")))
      .select(col("vec_id"), col("label"), (col("i0") + 1).as("i"),
        col("xf").cast("double").as("x"))
    val cent = ex.groupBy(col("label"), col("i"))
      .agg(sum(col("x").cast(DecimalType(25, 15))).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("i"), (col("s").cast("double") / col("n")).as("c"))
    val dist = ex.join(cent, Seq("label", "i"))
      .withColumn("dd", col("x") - col("c"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum((col("dd") * col("dd")).cast(DecimalType(25, 15))).as("s2"))
      .select(col("vec_id"), col("label"), round(col("s2").cast("double"), 9).as("dist2"))
    val w = Window.partitionBy(col("label"))
    dist
      .withColumn("rk",
        row_number().over(w.orderBy(desc("dist2"), col("vec_id"))).cast("long"))
      .withColumn("n_label", count(lit(1)).over(w).cast("long"))
      .select(col("vec_id"), col("label"), col("dist2"), col("rk"),
        (col("rk") <= expr("(n_label + 19) div 20")).as("is_outlier"))
  }

  /** Contrastive training-pair mining: for each anchor vector, the most
    * similar SAME-label vector (the positive) and the top-3 most similar
    * DIFFERENT-label vectors (the hard negatives, Karpukhin et al. 2020's
    * in-batch-negative upgrade), with the pos−neg margin — the pair
    * generator for embedding-model finetuning over a labeled corpus.
    *
    * Scale shape: the bounded anchor set broadcasts against one corpus
    * scan (same contract as q28/q29 — at 100 TB the candidate set comes
    * from the LSH/IVF index, then this exact decimal rescore runs on the
    * shortlist). Scores are decimal-exact cosines rounded at 12 decimals;
    * the margin is one IEEE subtract of two identically-rounded doubles,
    * so it hash-matches cross-engine. Both windows partition by anchor.
    * Anchors lacking any same-label or any different-label counterpart
    * drop via the inner joins — mirrored exactly in the oracle.
    */
  val hardNegatives: GraftQuery = GraftQuery.sql(
    "q88_hard_negatives",
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |a AS (
       |  SELECT vec_id AS anchor_id, label AS a_label, embedding AS av
       |  FROM e WHERE vec_id < 50
       |), scored AS (
       |  SELECT anchor_id, a_label, e.vec_id AS cand_id, e.label AS c_label,
       |    ${cosineSql("av", "embedding")} AS cos_sim
       |  FROM a, e WHERE anchor_id <> e.vec_id
       |), pos AS (
       |  SELECT anchor_id, cand_id AS pos_id, cos_sim AS pos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY anchor_id
       |      ORDER BY cos_sim DESC, cand_id) AS prk
       |  FROM scored WHERE c_label = a_label
       |), neg AS (
       |  SELECT anchor_id, a_label, cand_id AS neg_id, cos_sim AS neg_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
       |      ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS neg_rk
       |  FROM scored WHERE c_label <> a_label
       |)
       |SELECT n.anchor_id, n.a_label AS label, p.pos_id, p.pos_sim,
       |  n.neg_id, n.neg_sim, n.neg_rk,
       |  round(p.pos_sim - n.neg_sim, 12) AS margin
       |FROM neg n JOIN pos p ON n.anchor_id = p.anchor_id AND p.prk = 1
       |WHERE n.neg_rk <= 3
       |ORDER BY n.anchor_id, neg_rk""".stripMargin) { (spark, dir) =>
    hardNegativeReport(Tables.embeddings(spark, dir), anchorMax = 50, kNeg = 3)
      .orderBy("anchor_id", "neg_rk")
  }

  /** The q88 core on any (vec_id, label, embedding) frame.
    *
    * Two-phase like q29/q47: a cheap codegen'd double cosine ranks every
    * (anchor, candidate) pair, and the DECIMAL-exact rescore runs only on
    * a per-(anchor, same-label?) shortlist that provably contains the
    * exact top-max(kNeg, 1): a pair can miss the shortlist only if it is
    * below the group's approx 3rd-best minus 2e-6, in which case the
    * approx error bound (≪ 1e-6 per side) puts at least kNeg pairs
    * strictly above it exactly — it cannot be in the exact top-kNeg.
    * Exact ties (duplicate vectors) survive via the ε-band and resolve on
    * the cand_id tie-break, same as the all-decimal plan.
    */
  def hardNegativeReport(
      emb: org.apache.spark.sql.DataFrame,
      anchorMax: Long,
      kNeg: Int): org.apache.spark.sql.DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), col("embedding"),
      VectorFunctions.normSqExact(col("embedding")).cast("double").as("nsq"))
    val a = e.where(col("vec_id") < anchorMax)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("embedding").as("av"), col("nsq").as("an"))
    val c = e.select(col("vec_id").as("cand_id"), col("label").as("c_label"),
      col("embedding").as("cv"), col("nsq").as("cn"))
    // the window exchange below carries ONLY ids/labels/score (~50 B/row):
    // shuffling the embedding arrays through it moved every candidate
    // vector anchorMax times (guide §2.3 "project before the exchange" /
    // §8 "decide with small rows, move big rows once") — the shortlist
    // survivors re-attach their vectors afterwards via two broadcast joins
    // of the (tiny) embedding table, and the decimal rescore recomputes
    // from the SAME source columns, so scores are bit-identical.
    val approx = c.join(broadcast(a), col("anchor_id") =!= col("cand_id"))
      .select(col("anchor_id"), col("a_label"), col("cand_id"), col("c_label"),
        VectorFunctions.cosineApprox(col("av"), col("cv"), col("an"), col("cn"))
          .as("apx"))
    // both windows share the (anchor, same-label?) partition keys → ONE
    // exchange, one scan: rank by approx score, then surface the k-th
    // value group-wide to draw the ε-band (groups smaller than k have a
    // null bound and keep everything)
    val wGrp = Window.partitionBy(col("anchor_id"), col("c_label") === col("a_label"))
    val kKeep = math.max(kNeg, 1)
    val short = approx
      .withColumn("rk_apx",
        row_number().over(wGrp.orderBy(desc("apx"), col("cand_id"))))
      .withColumn("kth_apx",
        max(when(col("rk_apx") === kKeep, col("apx"))).over(wGrp))
      .where(col("rk_apx") <= kKeep ||
        col("kth_apx").isNull || col("apx") >= col("kth_apx") - 2e-6)
      .select(col("anchor_id"), col("a_label"), col("cand_id"), col("c_label"))
    // exact rescore of the shortlist only (vectors re-attached by key);
    // scored feeds BOTH the positive and negative rank windows, so pin it
    // (q81's lesson: an unpersisted shared frame re-runs its upstream once
    // per consumer)
    val eA = e.select(col("vec_id").as("anchor_id"),
      col("embedding").as("av"), col("nsq").as("an"))
    val eC = e.select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"), col("nsq").as("cn"))
    val scored = graft.ScratchFrames.checkpoint(short
      .join(broadcast(eA), Seq("anchor_id"))
      .join(broadcast(eC), Seq("cand_id"))
      .select(col("anchor_id"), col("a_label"), col("cand_id"), col("c_label"),
        VectorFunctions.cosineFromNormSq(col("av"), col("cv"), col("an"), col("cn"))
          .as("cos_sim")))
    val wA = Window.partitionBy(col("anchor_id"))
      .orderBy(desc("cos_sim"), col("cand_id"))
    val pos = scored.where(col("c_label") === col("a_label"))
      .withColumn("prk", row_number().over(wA))
      .where(col("prk") === 1)
      .select(col("anchor_id"), col("cand_id").as("pos_id"),
        col("cos_sim").as("pos_sim"))
    val neg = scored.where(col("c_label") =!= col("a_label"))
      .withColumn("neg_rk", row_number().over(wA).cast("long"))
      .where(col("neg_rk") <= kNeg)
      .select(col("anchor_id"), col("a_label").as("label"),
        col("cand_id").as("neg_id"), col("cos_sim").as("neg_sim"), col("neg_rk"))
    neg.join(pos, Seq("anchor_id"))
      .select(col("anchor_id"), col("label"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"), col("neg_rk"),
        round(col("pos_sim") - col("neg_sim"), 12).as("margin"))
  }

  /** Int8 scalar quantization of embeddings (per-vector min/max range) —
    * THE storage lever for 100 TB embedding tables (4×–8× smaller than
    * f32, reconstructable for rescoring). `floor(x + 0.5)` rounding is
    * engine-unambiguous; the reconstruction error is accumulated in exact
    * decimals so the MSE hash-matches.
    */
  val embeddingQuantize: GraftQuery = GraftQuery.sql(
    "q53_embedding_quantize",
    """WITH q AS (
      |  SELECT vec_id,
      |    list_aggregate(embedding, 'min') AS lo,
      |    list_aggregate(embedding, 'max') AS hi,
      |    embedding
      |  FROM embeddings
      |), s AS (
      |  SELECT vec_id, lo, hi,
      |    (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) / 255.0 AS scale,
      |    embedding
      |  FROM q
      |), r AS (
      |  SELECT vec_id, lo, hi, scale,
      |    list_transform(embedding, x ->
      |      FLOOR((CAST(x AS DOUBLE) - CAST(lo AS DOUBLE)) / scale + 0.5)) AS codes,
      |    embedding
      |  FROM s WHERE scale > 0
      |)
      |SELECT vec_id,
      |  CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
      |  CAST(list_aggregate(codes, 'min') AS BIGINT) AS code_min,
      |  CAST(list_aggregate(codes, 'max') AS BIGINT) AS code_max,
      |  CAST(list_aggregate(
      |    list_transform(range(1, len(embedding) + 1), i ->
      |      CAST(power(CAST(embedding[i] AS DOUBLE)
      |        - (codes[i] * scale + CAST(lo AS DOUBLE)), 2) AS DECIMAL(25,15))),
      |    'sum') AS DOUBLE) / len(embedding) AS mse
      |FROM r
      |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        array_min(col("embedding")).cast("double").as("lo"),
        array_max(col("embedding")).cast("double").as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / 255.0)
      .where(col("scale") > 0)
      .withColumn("codes",
        transform(col("embedding"), x =>
          floor((x.cast("double") - col("lo")) / col("scale") + 0.5)))
    emb.select(
      col("vec_id"), col("lo"), col("hi"),
      array_min(col("codes")).cast("long").as("code_min"),
      array_max(col("codes")).cast("long").as("code_max"),
      (aggregate(
        zip_with(col("embedding"), col("codes"), (x, c) =>
          pow(x.cast("double") - (c * col("scale") + col("lo")), 2).cast(DecimalType(25, 15))),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(35, 15)),
        (acc, v) => (acc + v).cast(DecimalType(35, 15))).cast("double")
        / size(col("embedding"))).as("mse"))
      .orderBy("vec_id")
  }

  /** IVF ANN: coarse-quantizer index + nprobe search (see [[AnnIvf]]).
    * Full oracle: the whole chain — seed centroids, two Lloyd steps,
    * assignment, probe selection, rescore — is deterministic arithmetic in
    * exact-scores mode (decimal sums/dots + rounded cosines), so the SQL
    * below replays it as chained CTEs (q44 proved deep CTE folds hold).
    * Production callers keep the fast double kernel (exactScores=false);
    * recall vs brute force is locked by AnnIvfSpec on both kernels' shared
    * plan.
    */
  val annIvf: GraftQuery = GraftQuery.sql(
    "q47_ann_ivf", annIvfOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val (indexed, centroids) = ivfExactIndex(spark, dir)
    AnnIvf.search(
      emb.where(col("vec_id") < 20), indexed, centroids, nprobe = 6, topK = 3,
      exactScores = true)
      .orderBy("query_id", "rk")
  }

  /** IVF index persistence roundtrip (the ANN analogue of q83): build the
    * exact-mode index (shared q47/q76 build), SAVE it to parquet, reload it
    * with no rebuild, and search the RELOADED structures — results must be
    * bit-identical to q47's in-session search, so the oracle is q47's SQL
    * verbatim (same discipline as q83 reusing q19's expected file: the
    * roundtrip must be invisible in results). A lost column, a
    * precision-lossy write, or a centroid-id remap fails the hash compare.
    * At 100 TB the Lloyd build is the expensive step; save/load is the
    * deployment shape — build once, serve anywhere (AnnIvfSpec proves the
    * fast-kernel path too).
    */
  val annIndexRoundtrip: GraftQuery = GraftQuery.sql(
    "q98_ann_index_roundtrip", annIvfOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val (indexed, centroids) = ivfExactIndex(spark, dir)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_roundtrip"
    AnnIvf.saveIndex(indexed, centroids, path)
    val (ix2, c2) = AnnIvf.loadIndex(spark, path)
    AnnIvf.search(emb.where(col("vec_id") < 20), ix2, c2, nprobe = 6,
      topK = 3, exactScores = true)
      .orderBy("query_id", "rk")
  }

  /** IVF+PQ composed search ([[AnnIvfPq]]) — probe the nprobe nearest
    * coarse lists, ADC-scan only the PQ codes INSIDE them, exact-rescore
    * the bounded shortlist. Reuses q47's memoized IVF build AND q63's
    * memoized PQ train+encode verbatim (one equi-join stores codes with
    * their list assignment, memoized per session like both parents), so
    * the oracle below replays the two already-proven chains and composes
    * them with three new deterministic steps (probe restriction, list-
    * scoped ADC, the same shortlist re-rank). nprobe=6 matches q47's
    * oracle; refine=10/topK=3 match q63's.
    */
  val annIvfPq: GraftQuery = GraftQuery.sql(
    "q100_ann_ivfpq", annIvfPqOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val (_, centroids) = ivfExactIndex(spark, dir)
    val (cb, _) = pqExactIndex(spark, dir)
    AnnIvfPq.search(
      emb.where(col("vec_id") < 20), ivfPqCodedIndex(spark, dir), centroids,
      cb, emb, nprobe = 6, topK = 3, refine = 10, exactScores = true)
      .orderBy("query_id", "rk")
  }

  /** Residual IVF+PQ ([[AnnIvfPq.trainResidual]]/[[AnnIvfPq
    * .encodeResidual]]): PQ codebooks train on and codes quantize each
    * vector's RESIDUAL to its coarse centroid — the standard billion-scale
    * IVF-PQ formulation, where the same m·k code bits spend on a much
    * smaller-variance field and the ADC ranking sharpens (the r11 10M-hard
    * evidence: raw encoding caps recall@3 at 0.833 under a 200-deep
    * shortlist). Same knobs as q100 (nprobe=6, topK=3, refine=10, decimal
    * probe scores) so the two hashes differ ONLY by the encoding; the
    * oracle replays the full residual chain — q47's coarse build, residual
    * subtraction, q63's PQ Lloyd on residual subvectors, per-probed-list
    * ADC tables — in DuckDB.
    */
  val annIvfPqResidual: GraftQuery = GraftQuery.sql(
    "q107_ann_ivfpq_residual", annIvfPqResidualOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val (_, centroids) = ivfExactIndex(spark, dir)
    val (cb, coded) = residualExactIndex(spark, dir)
    AnnIvfPq.search(
      emb.where(col("vec_id") < 20), coded, centroids, cb, emb,
      nprobe = 6, topK = 3, refine = 10, exactScores = true, residual = true)
      .orderBy("query_id", "rk")
  }

  /** Incremental ANN maintenance ([[AnnIvfPq.appendVectors]], r14 verdict
    * #3): build the residual IVF+PQ index on a BASE corpus (7/8 of the
    * vectors), APPEND the remaining 1/8 under the FROZEN structures —
    * frozen coarse assignment, frozen codebooks, codes appended to the
    * saved index — and search the appended index. The oracle replays the
    * equivalent REBUILD-WITH-FROZEN-STRUCTURES in DuckDB: coarse Lloyd +
    * PQ Lloyd trained on the base only, assignment and encoding evaluated
    * over the FULL corpus (frozen maps are pure per-row functions, so
    * union-then-map ≡ map-then-union — the identity that makes appends
    * exact, not approximate). Same knobs as q107, so any divergence is
    * the append path itself. At 100 TB this is the operator that turns
    * "every embedding-ingest window re-encodes the corpus" into an
    * O(batch) fold, exactly as [[graft.cluster.IndexStore.mergeInto]]
    * does for the clustering index.
    */
  val annAppend: GraftQuery = GraftQuery.sql(
    "q108_ann_append", annIvfPqAppendOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val path = appendExactIndex(spark, dir)
    val (coded2, cents2, cb2) = AnnIvfPq.loadIndex(spark, path)
    AnnIvfPq.search(
      emb.where(col("vec_id") < 20), coded2, cents2, cb2, emb,
      nprobe = 6, topK = 3, refine = 10, exactScores = true, residual = true)
      .orderBy("query_id", "rk")
  }

  /** ANN deletes ([[AnnIvfPq.deleteVectors]], r15 verdict #2 — the other
    * half of live index maintenance): build the residual IVF+PQ index on
    * the FULL corpus, TOMBSTONE every `vec_id % 7 = 3` row (an O(batch)
    * meta append — no rebuild, no re-encode), and search through
    * [[AnnIvfPq.loadIndex]], which serves the surviving corpus. The
    * oracle replays the REBUILD-ON-THE-SURVIVORS equivalent in DuckDB:
    * q107's full residual chain (training and frozen maps identical —
    * structures are per-row-frozen, so dropping rows changes no other
    * row's assignment or codes) with deleted ids excluded as CANDIDATES
    * only. Same knobs as q107, so any divergence is the tombstone path
    * itself. At 100 TB this is what turns takedowns / dedup verdicts /
    * quality re-scoring from "full rebuild" into a metadata write.
    */
  val annDelete: GraftQuery = GraftQuery.sql(
    "q109_ann_delete", annIvfPqDeleteOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val path = deleteExactIndex(spark, dir)
    val (coded2, cents2, cb2) = AnnIvfPq.loadIndex(spark, path)
    AnnIvfPq.search(
      emb.where(col("vec_id") < 20), coded2, cents2, cb2, emb,
      nprobe = 6, topK = 3, refine = 10, exactScores = true, residual = true)
      .orderBy("query_id", "rk")
  }

  /** q109's build→save→delete chain, memoized per (session, dir) like
    * [[appendExactIndex]] — one save + one tombstone batch per session;
    * the suite number measures the recurring search-on-deleted cost.
    */
  private val deleteExactCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), String]
  private def deleteExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      deleteExactCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      deleteExactCache.getOrElseUpdate((spark, dir), {
        val emb = Tables.embeddings(spark, dir)
        val (_, centroids) = ivfExactIndex(spark, dir)
        val (cb, coded) = residualExactIndex(spark, dir)
        val path = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_ann_delete_q109_${dir.hashCode.toHexString}"
        AnnIvfPq.saveIndex(coded, centroids, cb, path, residual = true)
        val doomed = emb.where(col("vec_id") % 7 === 3)
          .select(col("vec_id").cast("long"))
          .collect().map(_.getLong(0)).toSeq
        AnnIvfPq.deleteVectors(spark, path, doomed): Unit
        path
      })
    }

  /** Force the shared q109 chain — Bench times it as its own
    * `delete_exact_build` key.
    */
  def warmDeleteExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    deleteExactIndex(spark, dir): Unit
  }

  /** q108's build→save→append chain, memoized per (session, dir) like
    * [[residualExactIndex]] — one base build + one append per session,
    * so the suite number measures the recurring SEARCH cost and Bench
    * times the chain as its own `append_exact_build` key. The saved
    * path is per-dir (sf0.001 and sf0.01 must not share a store).
    */
  private val appendExactCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), String]
  private def appendExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      appendExactCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      appendExactCache.getOrElseUpdate((spark, dir), {
        val emb = Tables.embeddings(spark, dir)
        val base = emb.where(col("vec_id") % 8 =!= 0)
        val batch = emb.where(col("vec_id") % 8 === 0)
        val (indexedB, centroidsB) = AnnIvf.buildIndex(base, exactScores = true)
        val cb = AnnIvfPq.trainResidual(indexedB, centroidsB,
          m = 8, k = 16, iters = 2, exactMeans = true)
        val codedB = AnnIvfPq.encodeResidual(indexedB, centroidsB, cb)
        val path = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_ann_append_q108_${dir.hashCode.toHexString}"
        AnnIvfPq.saveIndex(codedB, centroidsB, cb, path, residual = true)
        AnnIvfPq.appendVectors(spark, path, batch, exactScores = true): Unit
        path
      })
    }

  /** Force the shared q108 chain — Bench times it as its own
    * `append_exact_build` key (see [[warmResidualExactIndex]]).
    */
  def warmAppendExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    appendExactIndex(spark, dir): Unit
  }

  /** q107's residual train + encode, memoized per (session, dir) like
    * [[pqExactIndex]] (decimal Lloyd, deterministic seeds — one build per
    * session, searches measure the recurring cost).
    */
  private val residualExactCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (Array[Array[Array[Double]]], org.apache.spark.sql.DataFrame)]
  private def residualExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String
  ): (Array[Array[Array[Double]]], org.apache.spark.sql.DataFrame) = synchronized {
    residualExactCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    residualExactCache.get((spark, dir)) match {
      case Some(v) => v
      case None =>
        val (indexed, centroids) = ivfExactIndex(spark, dir)
        val cb = AnnIvfPq.trainResidual(indexed, centroids,
          m = 8, k = 16, iters = 2, exactMeans = true)
        val v = (cb, AnnIvfPq.encodeResidual(indexed, centroids, cb).persist())
        residualExactCache.put((spark, dir), v): Unit
        v
    }
  }

  /** Force (and persist) the shared residual train+encode — Bench times
    * it as its own `residual_exact_build` key (see [[warmPqExactIndex]]).
    */
  def warmResidualExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val (_, coded) = residualExactIndex(spark, dir)
    coded.count(): Unit
  }

  /** q100's coded table — PQ codes joined onto their IVF list assignment
    * ([[AnnIvfPq.index]]), derived from the two memoized parent builds and
    * itself memoized+persisted per (session, dir): the join is paid once,
    * every search (and bench rep) after reads the co-located layout.
    */
  private val ivfPqCodedCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]
  private def ivfPqCodedIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    synchronized {
      ivfPqCodedCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      ivfPqCodedCache.getOrElseUpdate((spark, dir), {
        val (indexed, _) = ivfExactIndex(spark, dir)
        val (_, encoded) = pqExactIndex(spark, dir)
        AnnIvfPq.index(indexed, encoded).persist()
      })
    }

  /** Force (and persist) the shared exact-mode IVF build — the index
    * q47/q76/q98 all serve from. Bench calls this BEFORE the query loop
    * and times it as its own `ivf_exact_build` key, so the suite numbers
    * for q47/q76/q98 measure their search/dedup/roundtrip work, not a
    * build they happen to pay first (VERDICT r8 #2: the driver's q47
    * number conflated the two).
    */
  def warmIvfExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val (indexed, centroids) = ivfExactIndex(spark, dir)
    indexed.count(): Unit
    centroids.count(): Unit
  }

  /** q47 and q76 run the IDENTICAL exact-mode IVF build (same defaults,
    * same data) — memoize it per (session, dir) so one Lloyd training
    * serves both, with the assignment persisted so downstream actions
    * don't replay it. Same discipline as the spatial index caches:
    * synchronized, stopped sessions evicted. Eviction only drops the map
    * entry — the persisted blocks died with the stopped SparkContext, so
    * no unpersist() call is needed (if eviction is ever extended to LIVE
    * sessions, call indexed.unpersist() before dropping the entry); for a
    * live session the persisted assignment is intentionally held for the
    * session's lifetime, like the spatial snapshots.
    */
  private val ivfExactCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
  private def ivfExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String
  ): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = synchronized {
    ivfExactCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    ivfExactCache.get((spark, dir)) match {
      case Some(v) => v
      case None =>
        val emb = Tables.embeddings(spark, dir)
        val (indexed, centroids) = AnnIvf.buildIndex(emb, exactScores = true)
        // persist BOTH sides: the centroid frame is a full Lloyd aggregate
        // over the corpus — unpersisted, every consumer rep (q47/q98/q100/
        // q107 probes, q98's save) replayed that scan+agg per evaluation
        val v = (indexed.persist(), centroids.persist())
        ivfExactCache.put((spark, dir), v): Unit
        v
    }
  }

  /** decimal-exact cosine from a precomputed norm² pair (mirrors
    * VectorFunctions.cosineFromNormSq); the COALESCE guard mirrors Spark's
    * NaN→-2.0 because DuckDB yields NULL (not NaN) for 0/0
    */
  private def cosGuardedSql(a: String, b: String, na: String, nb: String): String =
    s"COALESCE(round(CAST(${dotSql(a, b)} AS DOUBLE) / (sqrt($na) * sqrt($nb)), 12), -2.0)"

  /** DuckDB replay of the IVF index build (q47 AND q76 share it verbatim —
    * both run [[AnnIvf.buildIndex]] with the same defaults): seed every
    * stride-th vector, two Lloyd iterations of decimal per-dimension means,
    * final nearest-centroid assignment. Ends with `asg2` (vec_id,
    * embedding, nsq, _c) and `c2n` (_c, cv, cnsq) in scope.
    */
  private def ivfChainSql: String = {
    // one Lloyd step: decimal per-dimension means of `asg`, then centroid
    // norms — mirrors AnnIvf.buildIndex's groupBy of decimal sums
    def lloyd(asg: String, m: String, c: String, cn: String): String =
      s"""$m AS (
         |  SELECT _c, i,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
         |      / COUNT(*) AS mv
         |  FROM $asg, UNNEST(range(1, len(embedding) + 1)) AS t(i)
         |  GROUP BY _c, i
         |), $c AS (
         |  SELECT _c, list(mv ORDER BY i) AS cv FROM $m GROUP BY _c
         |), $cn AS (
         |  SELECT _c, cv, CAST(${dotSql("cv", "cv")} AS DOUBLE) AS cnsq FROM $c
         |)""".stripMargin
    // nearest-centroid assignment of every vector against centroid set `cn`
    def assignStep(cn: String, a: String, asg: String): String =
      s"""$a AS (
         |  SELECT e.vec_id, e.embedding, e.nsq, s._c,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${cosGuardedSql("e.embedding", "s.cv", "e.nsq", "s.cnsq")} DESC, s._c) AS crk
         |  FROM e CROSS JOIN $cn s
         |), $asg AS (SELECT vec_id, embedding, nsq, _c FROM $a WHERE crk = 1)""".stripMargin
    s"""WITH p AS (SELECT GREATEST(COUNT(*) // 16, 1) AS stride FROM embeddings),
       |e AS (
       |  SELECT vec_id, embedding,
       |    CAST(${dotSql("embedding", "embedding")} AS DOUBLE) AS nsq
       |  FROM embeddings
       |),
       |seeds AS (
       |  SELECT CAST(vec_id // stride AS INT) AS _c,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
       |    nsq AS cnsq
       |  FROM e, p WHERE vec_id % stride = 0 AND vec_id // stride < 16
       |),
       |${assignStep("seeds", "a0", "asg0")},
       |${lloyd("asg0", "m0", "c1", "c1n")},
       |${assignStep("c1n", "a1", "asg1")},
       |${lloyd("asg1", "m1", "c2", "c2n")},
       |${assignStep("c2n", "a2", "asg2")}""".stripMargin
  }

  /** DuckDB replay of the q47 IVF probe/rescore on top of [[ivfChainSql]].
    * Norms are precomputed per vector / centroid (same values as the
    * per-pair recompute, ~3× less decimal work).
    */
  private def annIvfOracleSql: String = {
    def cosGuarded(a: String, b: String, na: String, nb: String): String =
      cosGuardedSql(a, b, na, nb)
    s"""$ivfChainSql,
       |pr AS (
       |  SELECT e.vec_id AS query_id, e.embedding AS qv, e.nsq AS qnsq, s._c,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      ${cosGuarded("e.embedding", "s.cv", "e.nsq", "s.cnsq")} DESC, s._c) AS prk
       |  FROM e CROSS JOIN c2n s WHERE e.vec_id < 20
       |),
       |probed AS (SELECT query_id, qv, qnsq, _c FROM pr WHERE prk <= 6),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${cosGuarded("p.qv", "a.embedding", "p.qnsq", "a.nsq")} AS cos_sim
       |  FROM probed p JOIN asg2 a USING (_c)
       |  WHERE p.query_id <> a.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM cand
       |)
       |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  }

  /** DuckDB replay of the q100 IVF+PQ composition: [[ivfChainSql]] (the
    * q47-proven coarse chain, ending with `asg2`/`c2n`/`e`) + the q63 PQ
    * chain with disjoint CTE names (pp, qa1..qv2 — the original uses
    * p/a1/a2 which collide with the IVF chain's) + three composition
    * steps: probe selection (q47's `pr` verbatim), candidate restriction
    * to the probed lists (`candp` — the equi-join the Spark side does),
    * and q63's list-scoped ADC → shortlist(30) → exact re-rank.
    */
  private def annIvfPqOracleSql: String = {
    def sq(a: String, b: String): String =
      s"""list_aggregate(list_transform(range(1, len($a) + 1),
         |    i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
         |       * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
         |  'sum')""".stripMargin
    def lloydPq(prev: String, a: String, g: String, u: String, v: String, next: String): String =
      s"""$a AS (
         |  SELECT s.id, s._j, s.sv, c._c,
         |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
         |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
         |  FROM sub s JOIN $prev c ON c._j = s._j
         |), $g AS (SELECT id, _j, sv, _c FROM $a WHERE rk = 1),
         |$u AS (
         |  SELECT _j, _c, i,
         |    CAST(SUM(CAST(sv[i] AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS mv
         |  FROM $g, pp, UNNEST(range(1, pp.dsub + 1)) AS t(i)
         |  GROUP BY _j, _c, i
         |), $v AS (SELECT _j, _c, list(mv ORDER BY i) AS cv FROM $u GROUP BY _j, _c),
         |$next AS (
         |  SELECT c._j, c._c, COALESCE(w.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN $v w ON w._j = c._j AND w._c = c._c
         |)""".stripMargin
    s"""$ivfChainSql,
       |pp AS (SELECT len(embedding) // 8 AS dsub FROM embeddings LIMIT 1),
       |sub AS (
       |  SELECT s0.vec_id AS id, CAST(j._j AS INT) AS _j,
       |    list_transform(range(1, pp.dsub + 1),
       |      i -> CAST(s0.embedding[CAST(j._j AS INT) * pp.dsub + i] AS DOUBLE)) AS sv
       |  FROM embeddings s0, pp, UNNEST(range(0, 8)) AS j(_j)
       |),
       |sid AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16),
       |cb0 AS (
       |  SELECT _j, CAST(ROW_NUMBER() OVER (PARTITION BY _j ORDER BY id) - 1 AS INT) AS _c,
       |    sv AS cv
       |  FROM sub WHERE id IN (SELECT vec_id FROM sid)
       |),
       |${lloydPq("cb0", "qa1", "qg1", "qu1", "qv1", "cb1")},
       |${lloydPq("cb1", "qa2", "qg2", "qu2", "qv2", "cb2")},
       |encr AS (
       |  SELECT s.id, s._j, c._c,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
       |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
       |  FROM sub s JOIN cb2 c ON c._j = s._j
       |), enc AS (SELECT id, _j, _c AS code FROM encr WHERE rk = 1),
       |pr AS (
       |  SELECT e.vec_id AS query_id, s._c,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      ${cosGuardedSql("e.embedding", "s.cv", "e.nsq", "s.cnsq")} DESC, s._c) AS prk
       |  FROM e CROSS JOIN c2n s WHERE e.vec_id < 20
       |),
       |probed AS (SELECT query_id, _c FROM pr WHERE prk <= 6),
       |candp AS (
       |  SELECT pb.query_id, a.vec_id AS neighbor_id
       |  FROM probed pb JOIN asg2 a ON a._c = pb._c
       |  WHERE pb.query_id <> a.vec_id
       |),
       |adc AS (
       |  SELECT cp.query_id, cp.neighbor_id,
       |    list_aggregate(list(${sq("q.sv", "c.cv")} ORDER BY q._j), 'sum') AS approx_dist
       |  FROM candp cp
       |  JOIN sub q ON q.id = cp.query_id
       |  JOIN enc n ON n.id = cp.neighbor_id AND n._j = q._j
       |  JOIN cb2 c ON c._j = n._j AND c._c = n.code
       |  GROUP BY cp.query_id, cp.neighbor_id
       |),
       |sl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY approx_dist, neighbor_id) AS ark
       |    FROM adc) WHERE ark <= 30
       |),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${sq("qe.embedding", "ne.embedding")} AS dist
       |  FROM sl s
       |  JOIN embeddings qe ON qe.vec_id = s.query_id
       |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
       |  FROM rr
       |)
       |SELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  }

  /** DuckDB replay of the q107 RESIDUAL IVF+PQ chain: [[ivfChainSql]]
    * (ending with `asg2`/`c2n`/`e`) → per-vector residual to its assigned
    * centroid (`res` — double subtraction, element-for-element the same
    * IEEE op as Spark's zip_with) → the q63 PQ Lloyd chain over RESIDUAL
    * subvectors → residual encode → probe selection (q47's `pr` verbatim)
    * → per-(query, probed list) ADC tables on the query's residual to
    * THAT list (`qsub` carries (query, list, j) residual subvectors; the
    * `adc` join keys the candidate's list so each candidate is scored
    * against its own list's table, mirroring AnnIvfPq.search's
    * residual=true branch) → shortlist(30) → exact re-rank on the raw
    * embeddings.
    */
  private def annIvfPqResidualOracleSql: String =
    annIvfPqResidualOracleSqlWhere("")

  /** q109: the identical residual chain, with tombstoned ids excluded as
    * CANDIDATES only — training and every frozen map stay corpus-wide,
    * exactly what search-over-tombstones serves.
    */
  private def annIvfPqDeleteOracleSql: String =
    annIvfPqResidualOracleSqlWhere(" AND a.vec_id % 7 <> 3")

  private def annIvfPqResidualOracleSqlWhere(neighborFilter: String): String = {
    def sq(a: String, b: String): String =
      s"""list_aggregate(list_transform(range(1, len($a) + 1),
         |    i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
         |       * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
         |  'sum')""".stripMargin
    def lloydPq(prev: String, a: String, g: String, u: String, v: String, next: String): String =
      s"""$a AS (
         |  SELECT s.id, s._j, s.sv, c._c,
         |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
         |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
         |  FROM sub s JOIN $prev c ON c._j = s._j
         |), $g AS (SELECT id, _j, sv, _c FROM $a WHERE rk = 1),
         |$u AS (
         |  SELECT _j, _c, i,
         |    CAST(SUM(CAST(sv[i] AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS mv
         |  FROM $g, pp, UNNEST(range(1, pp.dsub + 1)) AS t(i)
         |  GROUP BY _j, _c, i
         |), $v AS (SELECT _j, _c, list(mv ORDER BY i) AS cv FROM $u GROUP BY _j, _c),
         |$next AS (
         |  SELECT c._j, c._c, COALESCE(w.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN $v w ON w._j = c._j AND w._c = c._c
         |)""".stripMargin
    s"""$ivfChainSql,
       |pp AS (SELECT len(embedding) // 8 AS dsub FROM embeddings LIMIT 1),
       |res AS (
       |  SELECT a.vec_id AS id, a._c,
       |    list_transform(range(1, len(a.embedding) + 1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) - c.cv[i]) AS rv
       |  FROM asg2 a JOIN c2n c USING (_c)
       |),
       |sub AS (
       |  SELECT r.id, CAST(j._j AS INT) AS _j,
       |    list_transform(range(1, pp.dsub + 1),
       |      i -> r.rv[CAST(j._j AS INT) * pp.dsub + i]) AS sv
       |  FROM res r, pp, UNNEST(range(0, 8)) AS j(_j)
       |),
       |sid AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16),
       |cb0 AS (
       |  SELECT _j, CAST(ROW_NUMBER() OVER (PARTITION BY _j ORDER BY id) - 1 AS INT) AS _c,
       |    sv AS cv
       |  FROM sub WHERE id IN (SELECT vec_id FROM sid)
       |),
       |${lloydPq("cb0", "ra1", "rg1", "ru1", "rv1", "cb1")},
       |${lloydPq("cb1", "ra2", "rg2", "ru2", "rv2", "cb2")},
       |encr AS (
       |  SELECT s.id, s._j, c._c,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
       |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
       |  FROM sub s JOIN cb2 c ON c._j = s._j
       |), enc AS (SELECT id, _j, _c AS code FROM encr WHERE rk = 1),
       |pr AS (
       |  SELECT e.vec_id AS query_id, s._c,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      ${cosGuardedSql("e.embedding", "s.cv", "e.nsq", "s.cnsq")} DESC, s._c) AS prk
       |  FROM e CROSS JOIN c2n s WHERE e.vec_id < 20
       |),
       |probed AS (SELECT query_id, _c FROM pr WHERE prk <= 6),
       |qsub AS (
       |  SELECT p.query_id, p._c, CAST(j._j AS INT) AS _j,
       |    list_transform(range(1, pp.dsub + 1),
       |      i -> CAST(e.embedding[CAST(j._j AS INT) * pp.dsub + i] AS DOUBLE)
       |         - c.cv[CAST(j._j AS INT) * pp.dsub + i]) AS sv
       |  FROM probed p
       |  JOIN e ON e.vec_id = p.query_id
       |  JOIN c2n c ON c._c = p._c, pp, UNNEST(range(0, 8)) AS j(_j)
       |),
       |candp AS (
       |  SELECT pb.query_id, a.vec_id AS neighbor_id, pb._c
       |  FROM probed pb JOIN asg2 a ON a._c = pb._c
       |  WHERE pb.query_id <> a.vec_id$neighborFilter
       |),
       |adc AS (
       |  SELECT cp.query_id, cp.neighbor_id,
       |    list_aggregate(list(${sq("q.sv", "c.cv")} ORDER BY q._j), 'sum') AS approx_dist
       |  FROM candp cp
       |  JOIN qsub q ON q.query_id = cp.query_id AND q._c = cp._c
       |  JOIN enc n ON n.id = cp.neighbor_id AND n._j = q._j
       |  JOIN cb2 c ON c._j = n._j AND c._c = n.code
       |  GROUP BY cp.query_id, cp.neighbor_id
       |),
       |sl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY approx_dist, neighbor_id) AS ark
       |    FROM adc) WHERE ark <= 30
       |),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${sq("qe.embedding", "ne.embedding")} AS dist
       |  FROM sl s
       |  JOIN embeddings qe ON qe.vec_id = s.query_id
       |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
       |  FROM rr
       |)
       |SELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  }

  /** DuckDB replay of q108's REBUILD-WITH-FROZEN-STRUCTURES equivalent:
    * the residual IVF+PQ chain with every TRAINING step (coarse seeds,
    * coarse Lloyd, PQ seeds, PQ Lloyd) restricted to the BASE corpus
    * (vec_id % 8 <> 0) and every FROZEN-MAP step (final coarse
    * assignment, residual subtraction, PQ encode) evaluated over the
    * FULL corpus — exactly what appendVectors produces, because frozen
    * assignment/encode are pure per-row functions. Search CTEs are
    * q107's verbatim.
    */
  private def annIvfPqAppendOracleSql: String = {
    def sq(a: String, b: String): String =
      s"""list_aggregate(list_transform(range(1, len($a) + 1),
         |    i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
         |       * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
         |  'sum')""".stripMargin
    // coarse Lloyd step over a TRAINING assignment (same decimal means
    // as ivfChainSql's)
    def lloyd(asg: String, m: String, c: String, cn: String): String =
      s"""$m AS (
         |  SELECT _c, i,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
         |      / COUNT(*) AS mv
         |  FROM $asg, UNNEST(range(1, len(embedding) + 1)) AS t(i)
         |  GROUP BY _c, i
         |), $c AS (
         |  SELECT _c, list(mv ORDER BY i) AS cv FROM $m GROUP BY _c
         |), $cn AS (
         |  SELECT _c, cv, CAST(${dotSql("cv", "cv")} AS DOUBLE) AS cnsq FROM $c
         |)""".stripMargin
    // nearest-centroid assignment of SOURCE `src` against centroids `cn`
    def assignStep(src: String, cn: String, a: String, asg: String): String =
      s"""$a AS (
         |  SELECT e0.vec_id, e0.embedding, e0.nsq, s._c,
         |    ROW_NUMBER() OVER (PARTITION BY e0.vec_id ORDER BY
         |      ${cosGuardedSql("e0.embedding", "s.cv", "e0.nsq", "s.cnsq")} DESC, s._c) AS crk
         |  FROM $src e0 CROSS JOIN $cn s
         |), $asg AS (SELECT vec_id, embedding, nsq, _c FROM $a WHERE crk = 1)""".stripMargin
    // PQ Lloyd step over TRAINING subvectors `src`
    def lloydPq(src: String, prev: String, a: String, g: String, u: String,
        v: String, next: String): String =
      s"""$a AS (
         |  SELECT s.id, s._j, s.sv, c._c,
         |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
         |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
         |  FROM $src s JOIN $prev c ON c._j = s._j
         |), $g AS (SELECT id, _j, sv, _c FROM $a WHERE rk = 1),
         |$u AS (
         |  SELECT _j, _c, i,
         |    CAST(SUM(CAST(sv[i] AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS mv
         |  FROM $g, pp, UNNEST(range(1, pp.dsub + 1)) AS t(i)
         |  GROUP BY _j, _c, i
         |), $v AS (SELECT _j, _c, list(mv ORDER BY i) AS cv FROM $u GROUP BY _j, _c),
         |$next AS (
         |  SELECT c._j, c._c, COALESCE(w.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN $v w ON w._j = c._j AND w._c = c._c
         |)""".stripMargin
    s"""WITH p AS (SELECT GREATEST(COUNT(*) // 16, 1) AS stride
       |  FROM embeddings WHERE vec_id % 8 <> 0),
       |e AS (
       |  SELECT vec_id, embedding,
       |    CAST(${dotSql("embedding", "embedding")} AS DOUBLE) AS nsq
       |  FROM embeddings
       |),
       |eb AS (SELECT * FROM e WHERE vec_id % 8 <> 0),
       |seeds AS (
       |  SELECT CAST(vec_id // stride AS INT) AS _c,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
       |    nsq AS cnsq
       |  FROM eb, p WHERE vec_id % stride = 0 AND vec_id // stride < 16
       |),
       |${assignStep("eb", "seeds", "a0", "asg0")},
       |${lloyd("asg0", "m0", "c1", "c1n")},
       |${assignStep("eb", "c1n", "a1", "asg1")},
       |${lloyd("asg1", "m1", "c2", "c2n")},
       |${assignStep("e", "c2n", "a2", "asg2")},
       |pp AS (SELECT len(embedding) // 8 AS dsub FROM embeddings LIMIT 1),
       |res AS (
       |  SELECT a.vec_id AS id, a._c,
       |    list_transform(range(1, len(a.embedding) + 1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) - c.cv[i]) AS rv
       |  FROM asg2 a JOIN c2n c USING (_c)
       |),
       |sub AS (
       |  SELECT r.id, CAST(j._j AS INT) AS _j,
       |    list_transform(range(1, pp.dsub + 1),
       |      i -> r.rv[CAST(j._j AS INT) * pp.dsub + i]) AS sv
       |  FROM res r, pp, UNNEST(range(0, 8)) AS j(_j)
       |),
       |subb AS (SELECT * FROM sub WHERE id % 8 <> 0),
       |sid AS (SELECT vec_id FROM embeddings WHERE vec_id % 8 <> 0
       |  ORDER BY vec_id LIMIT 16),
       |cb0 AS (
       |  SELECT _j, CAST(ROW_NUMBER() OVER (PARTITION BY _j ORDER BY id) - 1 AS INT) AS _c,
       |    sv AS cv
       |  FROM subb WHERE id IN (SELECT vec_id FROM sid)
       |),
       |${lloydPq("subb", "cb0", "ra1", "rg1", "ru1", "rv1", "cb1")},
       |${lloydPq("subb", "cb1", "ra2", "rg2", "ru2", "rv2", "cb2")},
       |encr AS (
       |  SELECT s.id, s._j, c._c,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
       |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
       |  FROM sub s JOIN cb2 c ON c._j = s._j
       |), enc AS (SELECT id, _j, _c AS code FROM encr WHERE rk = 1),
       |pr AS (
       |  SELECT e.vec_id AS query_id, s._c,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      ${cosGuardedSql("e.embedding", "s.cv", "e.nsq", "s.cnsq")} DESC, s._c) AS prk
       |  FROM e CROSS JOIN c2n s WHERE e.vec_id < 20
       |),
       |probed AS (SELECT query_id, _c FROM pr WHERE prk <= 6),
       |qsub AS (
       |  SELECT p.query_id, p._c, CAST(j._j AS INT) AS _j,
       |    list_transform(range(1, pp.dsub + 1),
       |      i -> CAST(e.embedding[CAST(j._j AS INT) * pp.dsub + i] AS DOUBLE)
       |         - c.cv[CAST(j._j AS INT) * pp.dsub + i]) AS sv
       |  FROM probed p
       |  JOIN e ON e.vec_id = p.query_id
       |  JOIN c2n c ON c._c = p._c, pp, UNNEST(range(0, 8)) AS j(_j)
       |),
       |candp AS (
       |  SELECT pb.query_id, a.vec_id AS neighbor_id, pb._c
       |  FROM probed pb JOIN asg2 a ON a._c = pb._c
       |  WHERE pb.query_id <> a.vec_id
       |),
       |adc AS (
       |  SELECT cp.query_id, cp.neighbor_id,
       |    list_aggregate(list(${sq("q.sv", "c.cv")} ORDER BY q._j), 'sum') AS approx_dist
       |  FROM candp cp
       |  JOIN qsub q ON q.query_id = cp.query_id AND q._c = cp._c
       |  JOIN enc n ON n.id = cp.neighbor_id AND n._j = q._j
       |  JOIN cb2 c ON c._j = n._j AND c._c = n.code
       |  GROUP BY cp.query_id, cp.neighbor_id
       |),
       |sl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY approx_dist, neighbor_id) AS ark
       |    FROM adc) WHERE ark <= 30
       |),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${sq("qe.embedding", "ne.embedding")} AS dist
       |  FROM sl s
       |  JOIN embeddings qe ON qe.vec_id = s.query_id
       |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
       |  FROM rr
       |)
       |SELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then deduplicate WITHIN each cluster — pairs above a
    * cosine threshold are semantic duplicates and only the lowest-id member
    * of each chain is kept. Clustering makes the pair stage tractable: the
    * all-pairs comparison runs per cluster (k ≈ √n keeps clusters small),
    * never across the corpus. Reuses q47's deterministic IVF build
    * verbatim, so the oracle replays the identical chain; the pair scan is
    * q29's two-phase kernel (fast double prefilter, decimal-exact rescore
    * for survivors only).
    *
    * Output: one row per vector — its cluster, whether a lower-id semantic
    * duplicate exists (`is_dup`: these rows are the ones a curation
    * pipeline drops), which kept vector it duplicates, and the matching
    * cosine.
    */
  val semDedup: GraftQuery = GraftQuery.sql(
    "q76_semdedup", semDedupOracleSql) { (spark, dir) =>
    // shares q47's memoized exact IVF build — one Lloyd training per
    // (session, dir) serves both queries
    semDedupFromIndex(ivfExactIndex(spark, dir)._1, tau = 0.35).orderBy("vec_id")
  }

  /** The q76 core on any (vec_id, embedding) frame: one row per vector
    * with (cluster, best_cos, dup_of, is_dup). `is_dup` rows are the ones
    * a curation pipeline drops — a vector is a duplicate when some
    * LOWER-id vector in its cluster matches at ≥ tau (greedy keep-lowest,
    * deterministic under any partitioning).
    */
  def semDedupFrame(emb: org.apache.spark.sql.DataFrame, tau: Double,
      k: Int = 0): org.apache.spark.sql.DataFrame = {
    // k = 0 (default) picks the paper's regime k ≈ ⌈√n⌉ — the choice that
    // keeps the within-cluster pair stage subquadratic: balanced clusters
    // hold ~√n vectors, so per-cluster pair work is ~n and the corpus
    // total ~n^1.5, never n². Pass an explicit k only when the space has a
    // known coarser structure (q76's ORACLE pins k = 16 via the shared
    // ivfExactIndex so the DuckDB replay stays identical to q47's chain).
    // SemDedupScaleSpec guards the pair-count bound.
    val kk =
      if (k > 0) k
      else math.max(math.ceil(math.sqrt(emb.count().toDouble)).toInt, 1)
    semDedupFromIndex(AnnIvf.buildIndex(emb, k = kk, exactScores = true)._1, tau)
  }

  private def semDedupFromIndex(indexed: org.apache.spark.sql.DataFrame, tau: Double): org.apache.spark.sql.DataFrame = {
    val withN = indexed.select(col("vec_id"), col("embedding"), col("_centroid"),
      VectorFunctions.normSqExact(col("embedding")).cast("double").as("nsq"))
    val a = withN.select(col("_centroid"), col("vec_id").as("ia"),
      col("embedding").as("va"), col("nsq").as("na"))
    val b = withN.select(col("_centroid"), col("vec_id").as("ib"),
      col("embedding").as("vb"), col("nsq").as("nb"))
    val hits = a.join(b, Seq("_centroid"))
      .where(col("ia") < col("ib"))
      .where(VectorFunctions.cosineApprox(col("va"), col("vb"), col("na"), col("nb")) > tau - 1e-6)
      .select(col("ia"), col("ib"),
        VectorFunctions.cosineFromNormSq(col("va"), col("vb"), col("na"), col("nb")).as("cs"))
      .where(col("cs") >= tau)
    val bw = Window.partitionBy(col("ib")).orderBy(desc("cs"), col("ia"))
    val best = hits.withColumn("rk", row_number().over(bw))
      .where(col("rk") === 1).select(col("ib"), col("ia"), col("cs"))
    withN.select(col("vec_id"), col("_centroid").cast("long").as("cluster"))
      .join(best, col("vec_id") === col("ib"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("cs"), lit(-2.0)).as("best_cos"),
        coalesce(col("ia"), lit(-1L)).as("dup_of"),
        coalesce(col("cs") >= tau, lit(false)).as("is_dup"))
  }

  /** DuckDB replay of q76 on top of [[ivfChainSql]]: within-cluster pairs
    * above the threshold, best (highest-cosine, lowest-id) lower-id match
    * per vector, left-joined back so every vector reports.
    */
  private def semDedupOracleSql: String =
    s"""$ivfChainSql,
       |pairs AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    ${cosGuardedSql("a.embedding", "b.embedding", "a.nsq", "b.nsq")} AS cs
       |  FROM asg2 a JOIN asg2 b ON a._c = b._c AND a.vec_id < b.vec_id
       |),
       |hits AS (SELECT ia, ib, cs FROM pairs WHERE cs >= 0.35),
       |best AS (
       |  SELECT ib, ia, cs FROM (
       |    SELECT ib, ia, cs,
       |      ROW_NUMBER() OVER (PARTITION BY ib ORDER BY cs DESC, ia) AS rk
       |    FROM hits) WHERE rk = 1
       |)
       |SELECT v.vec_id,
       |  CAST(v._c AS BIGINT) AS cluster,
       |  COALESCE(b.cs, -2.0) AS best_cos,
       |  CAST(COALESCE(b.ia, -1) AS BIGINT) AS dup_of,
       |  COALESCE(b.cs >= 0.35, FALSE) AS is_dup
       |FROM asg2 v LEFT JOIN best b ON b.ib = v.vec_id
       |ORDER BY v.vec_id""".stripMargin

  /** Product-quantization ANN: m-subspace codebooks, ADC candidate scan,
    * exact shortlist re-rank ([[AnnPq]]; recall locked by AnnPqSpec). Full
    * oracle since round 4: every distance is a strict left-to-right IEEE
    * double fold over a fixed element order — which Spark's HOF aggregate
    * and DuckDB's list_aggregate('sum') both implement bit-identically —
    * and the Lloyd means accumulate in decimal (order-independent), so
    * the train → encode → ADC → shortlist → re-rank chain replays exactly
    * as chained DuckDB CTEs below.
    */
  val annPq: GraftQuery = GraftQuery.sql(
    "q63_ann_pq", annPqOracleSql) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val (cb, encoded) = pqExactIndex(spark, dir)
    AnnPq.search(emb.where(col("vec_id") < 20), encoded, cb, emb,
        topK = 3, refine = 10)
      .orderBy("query_id", "rk")
  }

  /** q63's exact-mode PQ train + encode, memoized per (session, dir) with
    * the encoded table persisted — the [[ivfExactIndex]] discipline for
    * the PQ rung: training is deterministic (decimal Lloyd means, fixed
    * seeds), so a session pays it once and every call (and bench rep)
    * after the first measures the recurring search. Bench times the build
    * separately as `pq_exact_build_sec` via [[warmPqExactIndex]].
    */
  private val pqExactCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (Array[Array[Array[Double]]], org.apache.spark.sql.DataFrame)]
  private def pqExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String
  ): (Array[Array[Array[Double]]], org.apache.spark.sql.DataFrame) = synchronized {
    pqExactCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    pqExactCache.get((spark, dir)) match {
      case Some(v) => v
      case None =>
        val emb = Tables.embeddings(spark, dir)
        val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2)
        val v = (cb, AnnPq.encode(emb, cb).persist())
        pqExactCache.put((spark, dir), v): Unit
        v
    }
  }

  /** Force (and persist) the shared exact-mode PQ build — see
    * [[warmIvfExactIndex]].
    */
  def warmPqExactIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val (_, encoded) = pqExactIndex(spark, dir)
    encoded.count(): Unit
  }

  /** DuckDB replay of the q63 PQ chain (m=8, k=16, 2 Lloyd iterations,
    * ADC over all codes, shortlist 30, top-3). Distances are plain double
    * left-fold sums (bit-identical to Spark's HOF folds — see q63's
    * Scaladoc); per-dimension Lloyd means use decimal sums like q47; empty
    * centroids keep their previous value (LEFT JOIN + COALESCE); ties on
    * (distance, code)/(distance, neighbor). The per-candidate ADC total
    * folds the m per-subspace terms in _j order via an ORDER BY list fold,
    * mirroring Spark's j-ordered aggregate.
    */
  private def annPqOracleSql: String = {
    // plain-double squared L2, strict left-to-right fold (mirrors
    // AnnPq.sqDist exactly — zip_with product terms, 0.0 seed)
    def sq(a: String, b: String): String =
      s"""list_aggregate(list_transform(range(1, len($a) + 1),
         |    i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
         |       * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
         |  'sum')""".stripMargin
    // one Lloyd iteration: assign to prev codebook, decimal means,
    // carry empty centroids forward
    def lloyd(prev: String, a: String, g: String, u: String, v: String, next: String): String =
      s"""$a AS (
         |  SELECT s.id, s._j, s.sv, c._c,
         |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
         |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
         |  FROM sub s JOIN $prev c ON c._j = s._j
         |), $g AS (SELECT id, _j, sv, _c FROM $a WHERE rk = 1),
         |$u AS (
         |  SELECT _j, _c, i,
         |    CAST(SUM(CAST(sv[i] AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*) AS mv
         |  FROM $g, p, UNNEST(range(1, p.dsub + 1)) AS t(i)
         |  GROUP BY _j, _c, i
         |), $v AS (SELECT _j, _c, list(mv ORDER BY i) AS cv FROM $u GROUP BY _j, _c),
         |$next AS (
         |  SELECT c._j, c._c, COALESCE(w.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN $v w ON w._j = c._j AND w._c = c._c
         |)""".stripMargin
    s"""WITH p AS (SELECT len(embedding) // 8 AS dsub FROM embeddings LIMIT 1),
       |sub AS (
       |  SELECT e.vec_id AS id, CAST(j._j AS INT) AS _j,
       |    list_transform(range(1, p.dsub + 1),
       |      i -> CAST(e.embedding[CAST(j._j AS INT) * p.dsub + i] AS DOUBLE)) AS sv
       |  FROM embeddings e, p, UNNEST(range(0, 8)) AS j(_j)
       |),
       |sid AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16),
       |cb0 AS (
       |  SELECT _j, CAST(ROW_NUMBER() OVER (PARTITION BY _j ORDER BY id) - 1 AS INT) AS _c,
       |    sv AS cv
       |  FROM sub WHERE id IN (SELECT vec_id FROM sid)
       |),
       |${lloyd("cb0", "a1", "g1", "u1", "v1", "cb1")},
       |${lloyd("cb1", "a2", "g2", "u2", "v2", "cb2")},
       |encr AS (
       |  SELECT s.id, s._j, c._c,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s._j
       |      ORDER BY ${sq("s.sv", "c.cv")}, c._c) AS rk
       |  FROM sub s JOIN cb2 c ON c._j = s._j
       |), enc AS (SELECT id, _j, _c AS code FROM encr WHERE rk = 1),
       |adc AS (
       |  SELECT q.id AS query_id, n.id AS neighbor_id,
       |    list_aggregate(list(${sq("q.sv", "c.cv")} ORDER BY q._j), 'sum') AS approx_dist
       |  FROM sub q
       |  JOIN enc n ON n._j = q._j AND n.id <> q.id
       |  JOIN cb2 c ON c._j = n._j AND c._c = n.code
       |  WHERE q.id < 20
       |  GROUP BY q.id, n.id
       |),
       |sl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY approx_dist, neighbor_id) AS ark
       |    FROM adc) WHERE ark <= 30
       |),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${sq("qe.embedding", "ne.embedding")} AS dist
       |  FROM sl s
       |  JOIN embeddings qe ON qe.vec_id = s.query_id
       |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY dist, neighbor_id) AS BIGINT) AS rk
       |  FROM rr
       |)
       |SELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  }

  /** DuckDB-side exact dot product of two list<float> columns. */
  private def dotSql(a: String, b: String): String =
    s"""list_aggregate(list_transform(range(1, len($a) + 1),
       |    i -> CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(30,15))),
       |  'sum')""".stripMargin

  /** Rounded to 12 decimals: the decimal dot products are exact, but the
    * final double sqrt/divide differs by ~1 ULP between engines; rounding
    * makes the score (and therefore rank order) engine-independent.
    */
  private def cosineSql(a: String, b: String): String =
    s"""round(CAST(${dotSql(a, b)} AS DOUBLE)
       |  / (sqrt(CAST(${dotSql(a, a)} AS DOUBLE)) * sqrt(CAST(${dotSql(b, b)} AS DOUBLE))), 12)""".stripMargin

  /** DuckDB mirror of [[graft.functions.TextFunctions.signSketch]]: the
    * same deterministic hyperplane components h_j[i] = ((i·p_j) mod
    * 1000)/1000 − 0.5 over 0-based element index i, summed left-to-right
    * in IEEE double. Only the projection's SIGN feeds the bucket, and the
    * synthetic projections sit far from zero, so summation-order ULP noise
    * cannot flip a bucket bit. DuckDB lists are 1-based, hence (i - 1).
    */
  private def signSketchSql(v: String, bits: Int): String =
    (0 until bits).map { j =>
      val p = 2654435761L + 40503L * j
      s"""CASE WHEN list_aggregate(list_transform(range(1, len($v) + 1),
         |    i -> CAST($v[i] AS DOUBLE) * (CAST(((i - 1) * $p) % 1000 AS DOUBLE) / 1000 - 0.5)),
         |  'sum') > 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString("(", "\n + ", ")")

  /** Exact k-NN: brute-force cosine top-5 for a fixed query set. */
  val knnBruteForce: GraftQuery = GraftQuery.sql(
    "q28_knn_bruteforce",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    ${cosineSql("qv", "nv")} AS cos_sim
       |  FROM q, c WHERE query_id <> neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored
       |)
       |SELECT * FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.normSqExact(col("embedding")).cast("double").as("nsq"))
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nsq").as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("nsq").as("nn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosineFromNormSq(col("qv"), col("nv"), col("qn"), col("nn")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5)
      .orderBy("query_id", "rk")
  }

  /** Embedding-cosine near-dup pairs above a 0.4 threshold (bounded probe set
    * on the left: at scale this becomes LSH-candidates → exact rescore).
    */
  val embeddingNearDup: GraftQuery = GraftQuery.sql(
    "q29_embedding_neardup",
    s"""WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings WHERE vec_id < 100),
       |b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
       |SELECT id_a, id_b, ${cosineSql("va", "vb")} AS cos_sim
       |FROM a, b
       |WHERE id_a < id_b
       |  AND ${cosineSql("va", "vb")} > 0.4
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.normSqExact(col("embedding")).cast("double").as("nsq"))
    val a = emb.where(col("vec_id") < 100)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nsq").as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nsq").as("nb"))
    // two-phase: cheap double-cosine prefilter (error ≪ 1e-6), exact
    // decimal rescore only for survivors — identical result, ~dim× cheaper
    // on the non-matching bulk
    b.join(broadcast(a), col("id_a") < col("id_b"))
      .where(VectorFunctions.cosineApprox(col("va"), col("vb"), col("na"), col("nb")) > 0.4 - 1e-6)
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineFromNormSq(col("va"), col("vb"), col("na"), col("nb")).as("cos_sim"))
      .where(col("cos_sim") > 0.4)
      .orderBy("id_a", "id_b")
  }

  /** ANN via sign-sketch LSH: bucket on 8 deterministic hyperplane signs,
    * equi-join buckets, exact rescore within bucket, top-3 per query. Full
    * oracle: [[signSketchSql]] reproduces the buckets and the rescore is
    * the same decimal-exact cosine as q28, so the whole candidate-set →
    * rank pipeline is value-checked cross-engine.
    */
  val annLsh: GraftQuery = GraftQuery.sql(
    "q30_ann_lsh",
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${signSketchSql("embedding", 8)} AS bucket
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id < 50
       |), c AS (
       |  SELECT vec_id AS neighbor_id, embedding AS nv, bucket FROM e
       |), scored AS (
       |  SELECT query_id, neighbor_id, ${cosineSql("qv", "nv")} AS cos_sim
       |  FROM q JOIN c USING (bucket)
       |  WHERE query_id <> neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.signSketch(col("embedding"), 8).as("bucket"),
        VectorFunctions.normSqExact(col("embedding")).cast("double").as("nsq"))
    val q = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"), col("nsq").as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("bucket"), col("nsq").as("nn"))
    val scored = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosineFromNormSq(col("qv"), col("nv"), col("qn"), col("nn")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .orderBy("query_id", "rk")
  }
}

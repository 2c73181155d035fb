package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._

/** Training-data curation operators beyond the reference surface — the
  * pipeline steps a 100 TB pretraining corpus actually runs between raw
  * scrape and tokenizer: deterministic splits, context-window packing,
  * benchmark decontamination, and per-source quota sampling. All are
  * single-scan or single-shuffle declarative plans, and every one is
  * oracle-checked end-to-end (the hashes/window folds are pure arithmetic
  * mirrored in DuckDB).
  */
object PipelineOps {

  /** Register a tmp directory for recursive deletion at JVM exit (idempotent
    * per path). `File.deleteOnExit` can't remove non-empty directories, so a
    * single shared shutdown hook walks the registered roots depth-first.
    */
  private val exitPaths = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    exitPaths.keySet.forEach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      try rm(new java.io.File(p)) catch { case _: Throwable => () }
    }))
  private def deleteOnExit(path: String): Unit = {
    exitHook
    exitPaths.put(path, java.lang.Boolean.TRUE): Unit
  }

  def all: Seq[GraftQuery] =
    Seq(trainSplit, sequencePacking, decontamination, sourceQuota,
      gopherRepetition, vocabulary, docChunking, jsonlRoundtrip, dupSpans,
      bpeMerges, mixtureSampling, bpeEncode, dupSpanRemoval, weightedSample,
      fuzzyDecontamination, dsirSelection)

  /** FUZZY benchmark decontamination — q66's graded upgrade: instead of a
    * boolean any-overlap flag, the per-(train, eval) CONTAINMENT score
    * |train ∩ eval| / |eval| over distinct 3-gram shingles — the fuzzy
    * n-gram-containment criterion production decontamination actually
    * applies (a train doc that contains most of an eval item is
    * contaminated even when no shingle run is verbatim-complete).
    * Flagged pairs carry the score and the specific eval item —
    * auditable, not just a drop list. Production thresholds sit at
    * 0.5–0.7 of n-grams; the synthetic fixture has no planted
    * contamination (its shingle overlap is incidental, max ≈ 0.054 at
    * sf0.01), so the QUERY pins the mechanism at 0.02 — the knob is the
    * `minContain` parameter of [[fuzzyContainmentReport]].
    *
    * Scale shape: the eval set is tiny by construction, so its exploded
    * distinct shingles broadcast; candidates surface through the shingle
    * equi-join (train corpus scanned once, never an all-pairs stage);
    * the (train, eval) aggregation is the only shuffle. The score is one
    * IEEE divide of exact integer counts — bit-identical cross-engine,
    * no rounding needed (the q69 discipline).
    */
  val fuzzyDecontamination: GraftQuery = {
    val minContain = 0.02
    GraftQuery.sql(
      "q97_fuzzy_decontamination",
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
         |      list_transform(range(1, len(string_split(text, ' ')) - 1),
         |        i -> concat_ws(' ', string_split(text, ' ')[i],
         |                       string_split(text, ' ')[i+1],
         |                       string_split(text, ' ')[i+2]))
         |    ELSE [] END AS sh
         |  FROM documents
         |), e AS (
         |  SELECT doc_id, unnest(list_distinct(sh)) AS g FROM s
         |), ev AS (
         |  SELECT doc_id AS eval_id, g FROM e WHERE doc_id % 97 = 0
         |), evn AS (
         |  SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS eval_n FROM ev GROUP BY eval_id
         |), hits AS (
         |  SELECT e.doc_id, ev.eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM e JOIN ev ON e.g = ev.g
         |  WHERE e.doc_id % 97 <> 0
         |  GROUP BY e.doc_id, ev.eval_id
         |)
         |SELECT h.doc_id, h.eval_id, h.n_shared, evn.eval_n,
         |  CAST(h.n_shared AS DOUBLE) / evn.eval_n AS containment
         |FROM hits h JOIN evn USING (eval_id)
         |WHERE CAST(h.n_shared AS DOUBLE) / evn.eval_n >= $minContain
         |ORDER BY doc_id, eval_id""".stripMargin) { (spark, dir) =>
      fuzzyContainmentReport(Tables.documents(spark, dir),
        col("doc_id") % 97 === 0, minContain).orderBy("doc_id", "eval_id")
    }
  }

  /** The q97 core on any (doc_id, text) frame: (train, eval) pairs whose
    * distinct-3-gram containment |train ∩ eval| / |eval| clears
    * `minContain`; `isEval` selects the held-out set.
    */
  def fuzzyContainmentReport(
      docs: org.apache.spark.sql.DataFrame,
      isEval: org.apache.spark.sql.Column,
      minContain: Double): org.apache.spark.sql.DataFrame = {
    val e = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"), isEval.as("_ev"))
      .select(col("doc_id"), col("_ev"),
        explode(array_distinct(shingles(col("tk"), 3))).as("g"))
    val ev = e.where(col("_ev")).select(col("doc_id").as("eval_id"), col("g"))
    val evn = ev.groupBy(col("eval_id")).agg(count(lit(1)).as("eval_n"))
    val hits = e.where(!col("_ev"))
      .join(broadcast(ev), "g")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
    hits.join(broadcast(evn), "eval_id")
      .select(col("doc_id"), col("eval_id"), col("n_shared"), col("eval_n"),
        (col("n_shared").cast("double") / col("eval_n")).as("containment"))
      .where(col("containment") >= minContain)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006):
    * select the k documents with the largest key u^(1/w) — here ranked by
    * the monotone-equivalent ln(u)/w, avoiding pow() — where w is the
    * document's token count and u is a uniform draw DERIVED FROM THE
    * CONTENT HASH (the q64/q79 discipline): u = (u16+1)/65537 ∈ (0,1)
    * from the first four md5 nibbles. Deterministic, so the sample is
    * stable under re-ingestion AND engine-reproducible; token-weighting
    * is the standard corpus-mixture primitive when "sample proportional
    * to content mass, not document count" is the goal.
    *
    * Scale shape: ONE scan computes (w, u, key); the k winners come from
    * a distributed TakeOrdered (never a global sort), and the rank window
    * runs over the ≤ k survivors (the q78/q89 pattern). Determinism: the
    * key is ln of an exact (integer+1)/65537 quotient divided by an
    * integer count — identical IEEE sequence both engines (ln matches
    * cross-engine on identical doubles; q81/q86 precedent), rounded at 12
    * with doc_id tie-break before ranking.
    */
  val weightedSample: GraftQuery = {
    val k = 50
    GraftQuery.sql(
      "q96_weighted_sample",
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
         |      + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
         |      + (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
         |      + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS u16
         |  FROM documents
         |), keyed AS (
         |  SELECT doc_id, source, ntok,
         |    round(ln((u16 + 1.0) / 65537.0) / ntok, 12) AS es_key
         |  FROM t
         |), ranked AS (
         |  SELECT doc_id, source, ntok, es_key,
         |    CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS rk
         |  FROM keyed
         |)
         |SELECT doc_id, source, ntok, es_key, rk FROM ranked
         |WHERE rk <= $k ORDER BY rk""".stripMargin) { (spark, dir) =>
      weightedSampleReport(Tables.documents(spark, dir), k).orderBy("rk")
    }
  }

  /** The q96 core on any (doc_id, source, text) frame: the k
    * Efraimidis-Spirakis winners under token-count weights.
    */
  def weightedSampleReport(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    def nib(i: Int) =
      expr(s"instr('0123456789abcdef', substring(md5(cast(text as binary)), $i, 1))") - 1
    val u16 = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
    val keyed = docs.select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("ntok"),
      u16.as("u16"))
      .select(col("doc_id"), col("source"), col("ntok"),
        round(log((col("u16") + 1.0) / 65537.0) / col("ntok"), 12).as("es_key"))
    keyed.orderBy(desc("es_key"), col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(desc("es_key"), col("doc_id"))).cast("long"))
  }

  /** BPE tokenizer APPLICATION — q77's other half: train the 4-merge
    * table, then encode every document with it and report per-doc token
    * counts and the compression the merges bought. Training collects only
    * the 4 merge rows; encoding is a PURE MAP over exploded words (the 4
    * merges apply as literal chained `replace`s — no join, no broadcast
    * table, codegen-friendly) followed by one per-doc aggregation. This
    * is the shape a 100 TB tokenization pass actually wants: merges are
    * driver-side constants, the corpus is touched once.
    */
  /** q80's 4-merge table, memoized per (session, dir) — the q47/q63
    * discipline: training is q77's measured work (q77 keeps re-training
    * each run), while q80 measures the ENCODE pass, the recurring cost of
    * a tokenization pipeline. Bench times this chain as its own
    * `bpe_merge_build` key before the query loop.
    */
  private val bpeMergeCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), Seq[(String, String)]]
  private def bpeMergesFor(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, String)] =
    synchronized {
      bpeMergeCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      bpeMergeCache.getOrElseUpdate((spark, dir), {
        bpeMergeTable(Tables.documents(spark, dir), iters = 4)
          .orderBy("merge_rank").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
      })
    }

  /** Force the shared q80 merge training — Bench's `bpe_merge_build` key. */
  def warmBpeMerges(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    bpeMergesFor(spark, dir): Unit
  }

  val bpeEncode: GraftQuery = GraftQuery.sql(
    "q80_bpe_encode",
    s"""${bpeChainSql(4)},
      |wrd AS (
      |  SELECT doc_id, array_to_string(list_transform(range(1, len(w) + 1),
      |    i -> '(' || w[i] || ')'), '') AS s0, len(w) AS wlen
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |), enc AS (
      |  SELECT doc_id, wlen,
      |    replace(replace(replace(replace(s0,
      |      '(' || b1.lhs || ')(' || b1.rhs || ')', '(' || b1.lhs || b1.rhs || ')'),
      |      '(' || b2.lhs || ')(' || b2.rhs || ')', '(' || b2.lhs || b2.rhs || ')'),
      |      '(' || b3.lhs || ')(' || b3.rhs || ')', '(' || b3.lhs || b3.rhs || ')'),
      |      '(' || b4.lhs || ')(' || b4.rhs || ')', '(' || b4.lhs || b4.rhs || ')') AS s
      |  FROM wrd CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3 CROSS JOIN b4
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(wlen) AS BIGINT) AS n_chars,
      |  CAST(SUM(len(string_split(s[2:len(s)-1], ')('))) AS BIGINT) AS n_tokens_bpe,
      |  CAST(SUM(wlen) AS DOUBLE)
      |    / SUM(len(string_split(s[2:len(s)-1], ')('))) AS compression
      |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val merges = bpeMergesFor(spark, dir)
    val w = col("w")
    val nTok = bpeTokenCount(w, merges)
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), length(w).cast("long").as("wlen"), nTok.cast("long").as("ntok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("wlen")).as("n_chars"),
        sum(col("ntok")).as("n_tokens_bpe"),
        (sum(col("wlen")).cast("double") / sum(col("ntok"))).as("compression"))
      .orderBy("doc_id")
  }

  /** Per-word BPE token count after applying `merges` in rank order —
    * q80's corpus-sized tokenization map. Default: the fused native
    * kernel ([[graft.functions.BpeTokenCount]] — one primitive pass,
    * codegen'd into the scan projection). `exprKernel = false` keeps the
    * declarative bracket → literal-replace → split chain — an interpreted
    * `transform` lambda per CHARACTER — as the executable semantics spec
    * the DuckDB oracle replays; BpeKernelSpec proves the two equal
    * word-for-word (the counts are exact integers, so equality is exact).
    */
  def bpeTokenCount(
      w: org.apache.spark.sql.Column,
      merges: Seq[(String, String)],
      exprKernel: Boolean = true): org.apache.spark.sql.Column =
    if (exprKernel) {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(graft.functions.BpeTokenCount(
        ColumnBridge.expression(w), merges))
    } else {
      val s0 = concat_ws("", transform(sequence(lit(1), length(w)),
        i => concat(lit("("), w.substr(i, lit(1)), lit(")"))))
      val encoded = merges.foldLeft(s0) { case (c, (l, r)) =>
        replace(c, lit(s"($l)($r)"), lit(s"($l$r)"))
      }
      size(split(encoded.substr(lit(2), length(encoded) - 2), "\\)\\("))
    }

  /** Deterministic corpus-mixture sampling: each source is kept at its
    * target rate (the Pile/LLaMA-style mixture weighting step) by
    * comparing a 16-bit content-hash uniform against an INTEGER threshold
    * — membership is a pure integer comparison on md5 nibbles (the q64
    * trick widened to 4 nibbles), so the sample is stable under
    * re-partitioning, re-ingestion, and engine choice, with zero float
    * risk. One scan, one tiny per-source aggregation.
    */
  val mixtureSampling: GraftQuery = {
    // src0 keeps everything; src1–4 half; src5–9 quarter; the long tail an eighth
    val rateSql =
      """CASE WHEN source = 'src0' THEN 65536
        |     WHEN source IN ('src1','src2','src3','src4') THEN 32768
        |     WHEN source IN ('src5','src6','src7','src8','src9') THEN 16384
        |     ELSE 8192 END""".stripMargin
    GraftQuery.sql(
      "q79_mixture_sampling",
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS ntok,
        |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS u16,
        |    $rateSql AS threshold
        |  FROM documents
        |)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN u16 < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN u16 < threshold THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  CAST(SUM(CASE WHEN u16 < threshold THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS keep_rate,
        |  CAST(SUM(CASE WHEN u16 < threshold THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
        |FROM t GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      def nib(i: Int) =
        expr(s"instr('0123456789abcdef', substring(md5(cast(text as binary)), $i, 1))") - 1
      val u16 = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
      val threshold = when(col("source") === "src0", 65536)
        .when(col("source").isin("src1", "src2", "src3", "src4"), 32768)
        .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 16384)
        .otherwise(8192)
      val kept = (col("u16") < col("threshold")).cast("long")
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("ntok"),
          u16.as("u16"), threshold.as("threshold"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(kept).as("n_kept"),
          sum(kept * col("ntok")).as("kept_tokens"),
          (sum(kept).cast("double") / count(lit(1))).as("keep_rate"),
          sum(kept * col("doc_id")).as("id_checksum"))
        .orderBy("source")
    }
  }

  /** Distributed BPE merge training (Sennrich et al. 2016) — the step that
    * consumes q70's vocabulary: represent each distinct word as a
    * bracketed symbol sequence `(c)(c)…`, count adjacent symbol pairs
    * weighted by corpus word frequency, merge the most frequent pair
    * (ties: lexicographic), repeat. Exactly how production tokenizer
    * trainers work off an aggregated word-count table; merges are
    * inherently sequential, so the driver loop IS the algorithm — each
    * iteration is one vocab-sized hash aggregation plus a distributed
    * top-1 (TakeOrderedAndProject), and the driver only ever holds the
    * merge rows themselves. Greedy left-to-right non-overlapping merge
    * application is exactly string `replace` on the bracketed form (both
    * engines scan left-to-right), which is why the representation exists.
    *
    * `pair_freq` counts adjacent pairs (overlapping, the BPE statistic);
    * `applied_freq` counts non-overlapping replacements actually made —
    * they differ on runs like `aaa`.
    */
  val bpeMerges: GraftQuery = GraftQuery.sql(
    "q77_bpe_merges", bpeOracleSql(4)) { (spark, dir) =>
    bpeMergeTable(Tables.documents(spark, dir), iters = 4).orderBy("merge_rank")
  }

  /** The q77 core on any (doc_id, text) frame: one row per merge, in
    * merge order.
    *
    * ENVELOPE: merges are inherently sequential, and each one costs two
    * Spark jobs over the vocab table plus a driver top-1 collect — so the
    * wall cost is `iters × (one vocab-sized aggregation)`, NOT corpus-
    * sized (the corpus is touched once, to build `vocab0`). That shape is
    * right for oracle/teaching scale and for modest production vocabs
    * (hundreds to a few thousand merges over an already-aggregated word
    * table); it is NOT a 32k-merge tokenizer trainer, which batches rank
    * updates instead of re-aggregating per merge. `iters` is capped at
    * [[MaxBpeMerges]] to make that contract explicit, and the working
    * table is re-rooted via localCheckpoint every [[BpeCheckpointEvery]]
    * merges so the plan lineage stays O(32) deep no matter how many
    * merges a caller requests (an un-checkpointed loop would stack one
    * `replace` projection per merge and eventually blow analysis/codegen).
    */
  val MaxBpeMerges = 4096
  val BpeCheckpointEvery = 32
  def bpeMergeTable(docs: org.apache.spark.sql.DataFrame, iters: Int): org.apache.spark.sql.DataFrame = {
    require(iters >= 0 && iters <= MaxBpeMerges,
      s"iters=$iters out of the supported envelope [0, $MaxBpeMerges] — " +
        "per-merge cost is a full vocab aggregation; see bpeMergeTable scaladoc")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat_ws("", transform(sequence(lit(1), length(col("w"))),
          i => concat(lit("("), col("w").substr(i, lit(1)), lit(")")))).as("s"),
        col("freq"))
      .persist()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long, Long)]
    var lastCkpt: Option[org.apache.spark.sql.DataFrame] = None
    try {
      vocab0.count(): Unit // materialize once; iterations re-read the cache
      var cur: org.apache.spark.sql.DataFrame = vocab0
      var t = 1
      var exhausted = false
      while (t <= iters && !exhausted) {
        val sym = split(col("s").substr(lit(2), length(col("s")) - 2), "\\)\\(")
        val pairs = cur.select(sym.as("sym"), col("freq"))
          .where(size(col("sym")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(1), size(col("sym")) - 1),
            i => struct(
              element_at(col("sym"), i).as("lhs"),
              element_at(col("sym"), i + 1).as("rhs")))).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum(col("freq")).as("cnt"))
        val best = pairs.orderBy(desc("cnt"), col("lhs"), col("rhs")).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          val ap = cur.select(col("freq"), col("s"),
            replace(col("s"), lit(s"($l)($r)"), lit(s"($l$r)")).as("sn"))
          val applied = ap
            .agg(sum(col("freq") *
              ((length(col("s")) - length(col("sn"))) / 2).cast("long")))
            .collect()(0).getLong(0)
          rows += ((t.toLong, l, r, l + r, cnt, applied))
          cur = ap.select(col("sn").as("s"), col("freq"))
          // re-root the lineage every BpeCheckpointEvery merges: the eager
          // localCheckpoint materializes the current vocab and frees the
          // previous checkpoint's blocks, so both lineage depth and cached
          // state stay O(1) in the merge count
          if (t % BpeCheckpointEvery == 0) {
            val ck = cur.localCheckpoint()
            // Dataset.unpersist is a no-op on checkpointed frames (it only
            // consults the CacheManager) — free the LogicalRDD blocks
            lastCkpt.foreach(
              org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(_))
            lastCkpt = Some(ck)
            cur = ck
          }
          t += 1
        }
      }
    } finally {
      vocab0.unpersist(): Unit
      lastCkpt.foreach(
        org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(_)): Unit
    }
    rows.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_freq", "applied_freq")
  }

  /** The q77 merge-training WITH-chain (shared by q77 and q80's oracles):
    * symbolize → count → argmax → replace, one CTE block per iteration.
    * Leaves `b1..b{iters}` (the merges) and `m1..m{iters}` (report rows)
    * in scope.
    */
  private def bpeChainSql(iters: Int): String = {
    def block(t: Int): String = {
      val prev = s"s${t - 1}"
      s"""p$t AS (
         |  SELECT sym[i] AS lhs, sym[i+1] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(s[2:len(s)-1], ')(') AS sym, freq FROM $prev),
         |       UNNEST(range(1, len(sym))) AS u(i)
         |  GROUP BY lhs, rhs
         |), b$t AS (
         |  -- total even when p$t is empty (merges exhausted): the sentinel
         |  -- ('','',-1) loses to every real pair (cnt >= 1) and its replace
         |  -- pattern '()()' can never occur (symbols are non-empty), so an
         |  -- exhausted chain passes strings through unchanged instead of
         |  -- collapsing the downstream CROSS JOINs to zero rows — mirroring
         |  -- the Spark side's foldLeft over however many merges exist
         |  SELECT lhs, rhs, cnt FROM (
         |    SELECT lhs, rhs, cnt FROM p$t
         |    UNION ALL SELECT '', '', CAST(-1 AS BIGINT))
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |a$t AS (
         |  SELECT s.freq, s.s AS so,
         |    replace(s.s, '(' || b.lhs || ')(' || b.rhs || ')',
         |            '(' || b.lhs || b.rhs || ')') AS sn
         |  FROM $prev s CROSS JOIN b$t b
         |),
         |s$t AS (SELECT sn AS s, freq FROM a$t),
         |m$t AS (
         |  SELECT CAST($t AS BIGINT) AS merge_rank, b.lhs, b.rhs,
         |    b.lhs || b.rhs AS merged, b.cnt AS pair_freq,
         |    (SELECT CAST(SUM(freq * ((len(so) - len(sn)) // 2)) AS BIGINT)
         |     FROM a$t) AS applied_freq
         |  FROM b$t b WHERE b.cnt >= 0
         |)""".stripMargin
    }
    s"""WITH v0 AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w
       |), s0 AS (
       |  SELECT array_to_string(list_transform(range(1, len(w) + 1),
       |    i -> '(' || w[i] || ')'), '') AS s, freq
       |  FROM v0
       |),
       |${(1 to iters).map(block).mkString(",\n")}""".stripMargin
  }

  /** DuckDB replay of q77 on top of [[bpeChainSql]]. */
  private def bpeOracleSql(iters: Int): String =
    s"""${bpeChainSql(iters)}
       |SELECT * FROM (${(1 to iters).map(t => s"SELECT * FROM m$t").mkString(" UNION ALL ")})
       |ORDER BY merge_rank""".stripMargin

  /** Exact duplicated-span detection (the substring-level dedup of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better",
    * with the suffix array replaced by fixed-width span hashing — the
    * standard distributed approximation): every 10-token window is hashed;
    * a window whose hash occurs ≥2 times anywhere in the corpus (within OR
    * across documents) is a duplicated span; per document, overlapping/
    * adjacent duplicated spans merge into maximal regions (gaps-and-islands
    * over a per-doc window) and the report gives span/region counts and the
    * duplicated-token fraction — the "how much of this doc is boilerplate"
    * signal that drives span-level removal.
    *
    * 100 TB shape: span hashing is a map + explode (no shuffle) that runs
    * ONCE — duplicate detection attaches corpus-wide occurrence counts
    * in-frame via an h-partitioned window count (one hash shuffle, the
    * same exchange a dup-aggregate + join-back would pay, minus the
    * second corpus-wide hash pass); the island merge is a window
    * partitioned by doc_id — per-document, never global. No all-pairs
    * stage anywhere.
    */
  val dupSpans: GraftQuery = {
    val N = 10 // span width in tokens (Lee et al. use 50 BPE tokens)
    GraftQuery.sql(
      "q75_dup_spans",
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id, ntok, CAST(i AS BIGINT) AS pos,
        |    md5(array_to_string(list_slice(tk, i, i + ${N - 1}), ' ')) AS h
        |  FROM t, UNNEST(range(1, CAST(ntok AS INT) - ${N - 2})) AS u(i)
        |), dup AS (
        |  SELECT h FROM sp GROUP BY h HAVING COUNT(*) >= 2
        |), hit AS (
        |  SELECT s.doc_id, s.ntok, s.pos, s.pos + ${N - 1} AS endp
        |  FROM sp s JOIN dup USING (h)
        |), isl AS (
        |  SELECT doc_id, ntok, pos, endp,
        |    SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM (
        |    SELECT doc_id, ntok, pos, endp,
        |      MAX(endp) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |    FROM hit)
        |), reg AS (
        |  SELECT doc_id, ntok, isl,
        |    MIN(pos) AS s, MAX(endp) AS e, COUNT(*) AS nsp
        |  FROM isl GROUP BY doc_id, ntok, isl
        |)
        |SELECT doc_id,
        |  ntok AS n_tokens,
        |  CAST(SUM(nsp) AS BIGINT) AS n_dup_spans,
        |  CAST(COUNT(*) AS BIGINT) AS n_regions,
        |  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
        |  CAST(SUM(e - s + 1) AS DOUBLE) / ntok AS dup_token_frac
        |FROM reg GROUP BY doc_id, ntok
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      dupSpanReport(Tables.documents(spark, dir), N).orderBy("doc_id")
    }
  }

  /** The q75 core on any (doc_id, text) frame: per document with at least
    * one duplicated `n`-token span, its span/region counts and duplicated-
    * token fraction (see [[dupSpans]] for the dataflow shape).
    */
  def dupSpanReport(docs: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    val spans = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("ntok", size(col("tk")).cast("long"))
      .where(col("ntok") >= n)
      .select(col("doc_id"), col("ntok"),
        explode(transform(
          sequence(lit(1), (col("ntok") - (n - 1)).cast("int")),
          i => struct(
            i.cast("long").as("pos"),
            md5(concat_ws(" ", slice(col("tk"), i, lit(n)))
              .cast("binary")).as("h")))).as("s"))
      .select(col("doc_id"), col("ntok"), col("s.pos"), col("s.h"))
    // corpus-wide occurrence counts attach IN-FRAME via an h-partitioned
    // window count: the span explode (each row an md5 over an n-token
    // window — the scan's dominant cost) runs ONCE, where the previous
    // dup-aggregate + self-join re-ran it over the whole corpus; the
    // window's hash shuffle on h is the same exchange the join paid.
    // Same restructure as q81's bigram frame; PlanShapeSpec locks the
    // single-Generate shape.
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val hits = spans
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("n_occ") >= 2)
      .select(col("doc_id"), col("ntok"), col("pos"),
        (col("pos") + (n - 1)).as("endp"))
      .withColumn("prev_end",
        max(col("endp")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isl",
        sum(when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L)
          .otherwise(0L))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    hits.groupBy(col("doc_id"), col("ntok"), col("isl"))
      .agg(min(col("pos")).as("s"), max(col("endp")).as("e"),
        count(lit(1)).as("nsp"))
      .groupBy(col("doc_id"), col("ntok"))
      .agg(
        sum(col("nsp")).as("n_dup_spans"),
        count(lit(1)).as("n_regions"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
      .select(col("doc_id"), col("ntok").as("n_tokens"),
        col("n_dup_spans"), col("n_regions"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("ntok")).as("dup_token_frac"))
  }

  /** Duplicated-span REMOVAL — the actionable half of Lee et al. 2021:
    * q75 reports where the duplicated spans are; this operator emits the
    * CLEANED corpus with every duplicated region's tokens removed. Policy
    * is SYMMETRIC removal (every occurrence of a duplicated window goes,
    * including the "original") — the conservative, order-free policy
    * that needs no canonical-occurrence choice and is therefore exactly
    * reproducible in SQL; keep-one-occurrence is a caller-side variant
    * (filter q75's regions to non-first occurrences before removing).
    * Output is per-document: token counts before/after and the md5 of
    * the cleaned text (tokens rejoined with single spaces, so the hash
    * is engine-portable), with fully-duplicated documents collapsing to
    * the empty-string hash.
    *
    * 100 TB shape: the span-hash stage is q75's (one explode, occurrence
    * counts in-frame via the h-window); removed positions explode each
    * duplicated window into its N covered positions (≤ N× the DUPLICATED
    * span count only, not the corpus); the kept-token pass is one
    * LEFT ANTI equi-join on (doc_id, pos) — never a range join — and the
    * rebuild is one per-doc aggregation. No all-pairs, no unpartitioned
    * windows.
    */
  val dupSpanRemoval: GraftQuery = {
    val N = 10 // span width, matches q75
    GraftQuery.sql(
      "q84_dedup_span_removal",
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    md5(array_to_string(list_slice(tk, i, i + ${N - 1}), ' ')) AS h
        |  FROM t, UNNEST(range(1, CAST(ntok AS INT) - ${N - 2})) AS u(i)
        |), occ AS (
        |  SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS n_occ FROM sp
        |), rem AS (
        |  SELECT DISTINCT doc_id, pos + i AS rpos
        |  FROM occ, UNNEST(range(0, $N)) AS u(i) WHERE n_occ >= 2
        |), tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS w
        |  FROM t, UNNEST(range(1, CAST(ntok AS INT) + 1)) AS u(i)
        |), kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.w FROM tok
        |  ANTI JOIN rem ON tok.doc_id = rem.doc_id AND tok.pos = rem.rpos
        |), agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
        |    md5(string_agg(w, ' ' ORDER BY pos)) AS cleaned_md5
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT t.doc_id, t.ntok AS n_tokens,
        |  COALESCE(a.kept_tokens, 0) AS kept_tokens,
        |  t.ntok - COALESCE(a.kept_tokens, 0) AS removed_tokens,
        |  COALESCE(a.cleaned_md5, md5('')) AS cleaned_md5
        |FROM t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin) { (spark, dir) =>
      dedupSpanRemovalReport(Tables.documents(spark, dir), N).orderBy("doc_id")
    }
  }

  /** The q84 core on any (doc_id, text) frame: one row per document with
    * (n_tokens, kept_tokens, removed_tokens, cleaned_md5) after symmetric
    * removal of every duplicated `n`-token window's positions.
    */
  def dedupSpanRemovalReport(docs: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    val withTk = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("ntok", size(col("tk")).cast("long"))
    val spans = withTk
      .where(col("ntok") >= n)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), (col("ntok") - (n - 1)).cast("int")),
          i => struct(
            i.cast("long").as("pos"),
            md5(concat_ws(" ", slice(col("tk"), i, lit(n)))
              .cast("binary")).as("h")))).as("s"))
      .select(col("doc_id"), col("s.pos"), col("s.h"))
    // duplicated-window START positions (corpus-wide h-window count, q75's
    // single-pass shape). A token at position q is removed iff some
    // duplicated window STARTS in [q-(n-1), q] — so instead of exploding
    // every start into its n covered positions, deduping them, and
    // equi-joining the token stream against the result (r16 before-shape:
    // explode ≤n× the dup mass + DISTINCT shuffle + a corpus-sized join,
    // 4 exchanges), ride the start markers INTO the token stream and
    // resolve coverage with ONE doc-partitioned RANGE window over pos
    // (guide §2.4: two operations keyed the same way share one exchange —
    // the window's doc_id hash partitioning is the same exchange the
    // final per-doc aggregation needs, so AQE plans 2 exchanges total).
    val dupStarts = spans
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("n_occ") >= 2)
      .select(col("doc_id"), col("pos"),
        lit(null).cast("string").as("w"), lit(1L).as("_start"))
    val toks = withTk
      .select(col("doc_id"), col("ntok"), posexplode(col("tk")).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("w"),
        lit(0L).as("_start"))
    // max(_start) over the trailing n-token range flags coverage; marker
    // rows (w IS NULL) drop after the window. Range frames include ALL
    // rows at equal pos, so a window starting exactly at q covers q's
    // token regardless of intra-partition row order.
    val wr = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rangeBetween(-(n - 1).toLong, 0L)
    val flagged = toks.unionByName(dupStarts)
      .withColumn("rm", max(col("_start")).over(wr) === 1L)
      .where(col("_start") === 0L)
      .select(col("doc_id"), col("pos"), col("w"), col("rm"))
    val keptArr = filter(
      array_sort(collect_list(struct(col("pos"), col("rm"), col("w")))),
      s => !s.getField("rm"))
    flagged.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(!col("rm"), 1L).otherwise(0L)).as("kept_tokens"),
        sum(when(col("rm"), 1L).otherwise(0L)).as("removed_tokens"),
        md5(concat_ws(" ", transform(keptArr, s => s.getField("w")))
          .cast("binary")).as("cleaned_md5"))
      .select(col("doc_id"), col("n_tokens"), col("kept_tokens"),
        col("removed_tokens"), col("cleaned_md5"))
  }

  /** Deterministic content-hash train/val/test split: the split key is the
    * last md5 nibble of the TEXT (not the row id), so membership is stable
    * under re-ingestion, re-partitioning, and id reassignment — the
    * property a reproducible corpus split actually needs. 13/2/1 nibble
    * buckets ≈ 81/12.5/6 %. One scan, one tiny aggregation.
    */
  val trainSplit: GraftQuery = GraftQuery.sql(
    "q64_train_split",
    """WITH t AS (
      |  SELECT doc_id,
      |    strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1 AS nib,
      |    len(string_split(text, ' ')) AS ntok
      |  FROM documents
      |)
      |SELECT CASE WHEN nib <= 12 THEN 'train' WHEN nib <= 14 THEN 'val'
      |            ELSE 'test' END AS split,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id
      |FROM t GROUP BY 1 ORDER BY split""".stripMargin) { (spark, dir) =>
    val nib = expr("instr('0123456789abcdef', substring(md5(cast(text as binary)), 32, 1))") - 1
    Tables.documents(spark, dir)
      .select(col("doc_id"), nib.as("nib"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .select(col("doc_id"), col("ntok"),
        when(col("nib") <= 12, "train").when(col("nib") <= 14, "val")
          .otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        sum(col("doc_id")).as("id_checksum"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("split")
  }

  /** Context-window sequence packing: documents are greedily packed into
    * `binSize`-token bins in deterministic id order WITHIN a shard — the
    * shard key is what makes this a map-side-parallel plan at 100 TB (one
    * window-function pass per shard partition, no global sort, no driver
    * state; `shards` is the parallelism knob, set ≈ cluster cores). A
    * document's bin is the window its starting offset falls in (the
    * standard streaming-packing approximation: a bin may overflow by at
    * most one document — PipelineOpsSpec proves the contract — never
    * underflow by more than a document).
    *
    * Oracle note: the DuckDB group key MUST be cast — a windowed
    * SUM(BIGINT) is HUGEINT there, and uncast HUGEINT arithmetic lands as
    * float64 driver-side while Spark's floor() emits int64, failing the
    * dtype-sensitive hash even when values agree.
    */
  def sequencePackingQuery(name: String, shards: Int, binSize: Int): GraftQuery =
    GraftQuery.sql(
      name,
      s"""WITH t AS (
        |  SELECT doc_id, doc_id % $shards AS shard,
        |    len(string_split(text, ' ')) AS ntok
        |  FROM documents
        |), c AS (
        |  SELECT shard, doc_id, ntok,
        |    SUM(ntok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST((cum - ntok) // $binSize AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS bin_tokens,
        |  CAST(SUM(ntok) AS DOUBLE) / $binSize AS fill_ratio,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(spark, dir)
        .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .groupBy(col("shard"),
          floor((col("cum") - col("ntok")) / binSize).as("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("bin_tokens"),
          (sum(col("ntok")).cast("double") / binSize).as("fill_ratio"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("shard", "bin")
    }

  val sequencePacking: GraftQuery =
    sequencePackingQuery("q65_sequence_packing", shards = 8, binSize = 4096)

  /** Benchmark decontamination: flag training documents sharing any 3-gram
    * shingle with the (held-out) benchmark set — the GPT-3/Pile-style
    * n-gram overlap check every serious pretraining corpus runs. The
    * benchmark side is tiny by construction, so the plan is a broadcast
    * semi-join of exploded distinct shingles: the corpus is scanned once
    * and shuffled only by the final per-doc aggregation. (At 100 TB the
    * shingle strings would be hashed first — q25's fused kernel — but the
    * join shape is identical.)
    */
  val decontamination: GraftQuery = GraftQuery.sql(
    "q66_decontamination",
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |      list_transform(range(1, len(string_split(text, ' ')) - 1),
      |        i -> concat_ws(' ', string_split(text, ' ')[i],
      |                       string_split(text, ' ')[i+1],
      |                       string_split(text, ' ')[i+2]))
      |    ELSE [] END AS sh
      |  FROM documents
      |), e AS (
      |  SELECT doc_id, unnest(list_distinct(sh)) AS g FROM s
      |), bench AS (
      |  SELECT DISTINCT g FROM e WHERE doc_id % 97 = 0
      |)
      |SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      |FROM e JOIN bench USING (g)
      |WHERE e.doc_id % 97 <> 0
      |GROUP BY e.doc_id
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val e = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("tk"), 3))).as("g"))
    val bench = e.where(col("doc_id") % 97 === 0).select(col("g")).distinct()
    e.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1's
    * repetition filters, the ones q21's length/stopword score doesn't
    * cover): mean word length, duplicate-token fraction, most-frequent
    * unigram fraction, and most-frequent bigram fraction per document.
    * One explode → per-doc hash aggregation (map-side combinable); the
    * top-gram picks are per-doc windows over already-aggregated gram
    * counts. All ratios are single double divisions of exact integers —
    * bit-identical cross-engine, no rounding needed.
    */
  val gopherRepetition: GraftQuery = GraftQuery.sql(
    "q69_gopher_repetition",
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |), per AS (
      |  SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT w) AS nd,
      |    SUM(len(w)) AS wlen
      |  FROM w GROUP BY doc_id
      |), top1 AS (
      |  SELECT doc_id, cnt FROM (
      |    SELECT doc_id, COUNT(*) AS cnt,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, w) AS rk
      |    FROM w GROUP BY doc_id, w) WHERE rk = 1
      |), bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(string_split(text, ' '))),
      |      i -> concat_ws(' ', string_split(text, ' ')[i],
      |                     string_split(text, ' ')[i+1]))) AS g
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2
      |), top2 AS (
      |  SELECT doc_id, cnt AS bcnt, nb FROM (
      |    SELECT doc_id, COUNT(*) AS cnt,
      |      SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS nb,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, g) AS rk
      |    FROM bg GROUP BY doc_id, g) WHERE rk = 1
      |)
      |SELECT p.doc_id,
      |  CAST(p.n AS BIGINT) AS n_tokens,
      |  CAST(p.nd AS BIGINT) AS n_distinct,
      |  CAST(p.wlen AS DOUBLE) / p.n AS mean_word_len,
      |  1.0 - CAST(p.nd AS DOUBLE) / p.n AS dup_token_frac,
      |  CAST(t1.cnt AS DOUBLE) / p.n AS top_unigram_frac,
      |  COALESCE(CAST(t2.bcnt AS DOUBLE) / t2.nb, 0.0) AS top_bigram_frac
      |FROM per p
      |JOIN top1 t1 USING (doc_id)
      |LEFT JOIN top2 t2 USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.functions.TextFunctions.{shingles, tokens}
    val docs = Tables.documents(spark, dir)
    // ONE (doc_id, w) aggregate carries everything the per-doc stats need:
    // n = Σcnt, nd = group count, wlen = Σ cnt·len(w) — all exact integer
    // identities of the old per-doc aggregate — so the corpus tokenize +
    // explode runs ONCE for unigrams (was twice: `per` + `top1`) and the
    // countDistinct Expand plan disappears; the per-doc sums ride the SAME
    // doc_id window exchange the top-unigram rank needs (guide §2.4: two
    // operations keyed the same way share one exchange).
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val w1 = wDoc.orderBy(desc("cnt"), col("w"))
    val top1 = w.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over(wDoc))
      .withColumn("nd", count(lit(1)).over(wDoc))
      .withColumn("wlen", sum(col("cnt") * length(col("w"))).over(wDoc))
      .withColumn("rk", row_number().over(w1)).where(col("rk") === 1)
      .select(col("doc_id"), col("n"), col("nd"), col("wlen"), col("cnt"))
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(shingles(col("tk"), 2)).as("g"))
    val w2 = Window.partitionBy(col("doc_id")).orderBy(desc("cnt"), col("g"))
    val top2 = bg.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .withColumn("nb", sum(col("cnt")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rk", row_number().over(w2)).where(col("rk") === 1)
      .select(col("doc_id"), col("cnt").as("bcnt"), col("nb"))
    top1
      .join(top2, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n").as("n_tokens"),
        col("nd").as("n_distinct"),
        (col("wlen").cast("double") / col("n")).as("mean_word_len"),
        (lit(1.0) - col("nd").cast("double") / col("n")).as("dup_token_frac"),
        (col("cnt").cast("double") / col("n")).as("top_unigram_frac"),
        coalesce(col("bcnt").cast("double") / col("nb"), lit(0.0)).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary with frequencies and document frequencies — the
    * tokenizer-training prerequisite (BPE/WordPiece vocab induction starts
    * from exactly this table). One explode → one hash aggregation; the
    * top-100 cut is a distributed TakeOrderedAndProject (per-partition
    * top-K, merged once) so no task ever sorts the whole vocabulary —
    * at 100 TB a vocab is easily 10⁷–10⁸ rows, and a global rank window
    * over it would funnel every row through one task. Only the 100
    * surviving rows see a (single-partition, bounded) rank window.
    */
  val vocabulary: GraftQuery = GraftQuery.sql(
    "q70_vocabulary",
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |)
      |SELECT w AS token,
      |  CAST(COUNT(*) AS BIGINT) AS freq,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
      |  CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS BIGINT) AS rk
      |FROM w GROUP BY w
      |ORDER BY rk LIMIT 100""".stripMargin) { (spark, dir) =>
    import graft.functions.TextFunctions.tokens
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val vocab = w.groupBy(col("w").as("token")).agg(
      count(lit(1)).as("freq"),
      countDistinct(col("doc_id")).as("doc_freq"))
    vocab
      .orderBy(desc("freq"), col("token")).limit(100)
      .withColumn("rk",
        row_number().over(Window.orderBy(desc("freq"), col("token"))).cast("long"))
      .orderBy("rk")
  }

  /** Sliding-window document chunking (context-window preparation for
    * RAG / long-doc training): 64-token windows at stride 48 (16-token
    * overlap), no degenerate tail — a document shorter than one window is
    * one chunk, else the last window starts at the final stride position
    * that still adds new tokens. Pure map + explode, no shuffle at all;
    * chunk identity is the md5 of the joined window so downstream exact
    * dedup works at chunk granularity. The chunk count formula and slice
    * bounds are shared integer arithmetic, mirrored 1:1 in the oracle.
    */
  val docChunking: GraftQuery = GraftQuery.sql(
    "q71_doc_chunking",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk,
      |    len(string_split(text, ' ')) AS ntok
      |  FROM documents
      |), n AS (
      |  SELECT doc_id, tk, ntok,
      |    CASE WHEN ntok <= 64 THEN 1 ELSE (ntok - 17) // 48 + 1 END AS nch
      |  FROM t
      |)
      |SELECT doc_id,
      |  CAST(i AS BIGINT) AS chunk_idx,
      |  CAST(i * 48 AS BIGINT) AS start_tok,
      |  CAST(LEAST(ntok, i * 48 + 64) - i * 48 AS BIGINT) AS chunk_len,
      |  md5(array_to_string(list_slice(tk, i * 48 + 1, LEAST(ntok, i * 48 + 64)), ' ')) AS chunk_hash
      |FROM n, UNNEST(range(0, nch)) AS u(i)
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
    import graft.functions.TextFunctions.tokens
    val W = 64; val S = 48
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("ntok", size(col("tk")))
      .withColumn("nch",
        when(col("ntok") <= W, lit(1L))
          .otherwise(floor((col("ntok") - lit(W - S + 1)) / lit(S)) + 1))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("nch") - 1)))
      .withColumn("start_tok", col("chunk_idx") * S)
      .withColumn("chunk_len",
        (least(col("ntok"), col("start_tok") + W) - col("start_tok")).cast("long"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"), col("chunk_len"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("start_tok") + 1).cast("int"), col("chunk_len").cast("int")))
          .cast("binary")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** JSONL round-trip ([[graft.io.Jsonl]]): documents → JSON-Lines →
    * re-read with an explicit schema → content checksums. The oracle
    * computes the same checksums straight from the parquet, so any loss in
    * the serialize/parse cycle (dropped rows, mangled escapes, widened
    * types) fails the hash — the q59 Arrow-IPC pattern applied to the LLM
    * world's interchange format.
    */
  val jsonlRoundtrip: GraftQuery = GraftQuery.sql(
    "q72_jsonl_roundtrip",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_id,
      |  CAST(SUM(len(text)) AS BIGINT) AS total_chars,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_md5,
      |  MIN(md5(text)) AS min_md5,
      |  MAX(md5(text)) AS max_md5
      |FROM documents""".stripMargin) { (spark, dir) =>
    // per-session unique tmp path: concurrent runs over the same sf dir
    // (e.g. bench + correctness in parallel JVMs) must not overwrite each
    // other's round-trip files. The read-back is lazy — the caller
    // evaluates the returned frame later — so deletion is deferred to JVM
    // exit rather than "after the query".
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_rt_" +
      s"${spark.sparkContext.applicationId}_${math.abs(dir.hashCode)}"
    deleteOnExit(out)
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    graft.io.Jsonl.write(src, out)
    val back = graft.io.Jsonl.read(spark, out,
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING"))
    back.agg(
      count(lit(1)).as("n_docs"),
      sum(col("doc_id")).as("sum_id"),
      sum(length(col("text"))).as("total_chars"),
      countDistinct(md5(col("text").cast("binary"))).as("distinct_md5"),
      min(md5(col("text").cast("binary"))).as("min_md5"),
      max(md5(col("text").cast("binary"))).as("max_md5"))
  }

  /** Per-source quota sampling: cap every source (domain) at its 5 longest
    * documents, ties broken by id — the "don't let one domain dominate the
    * corpus" step. One window pass over a single hash shuffle on the
    * source key; no global ordering anywhere.
    */
  val sourceQuota: GraftQuery = GraftQuery.sql(
    "q67_source_quota",
    """WITH t AS (
      |  SELECT doc_id, doc_id % 50 AS source,
      |    len(string_split(text, ' ')) AS ntok
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, source, ntok,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY ntok DESC, doc_id) AS rk
      |  FROM t
      |)
      |SELECT doc_id, source, CAST(ntok AS BIGINT) AS n_tokens,
      |  CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 5
      |ORDER BY source, rk""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("source"))
      .orderBy(desc("ntok"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 50).as("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5)
      .select(col("doc_id"), col("source"), col("ntok").as("n_tokens"), col("rk"))
      .orderBy("source", "rk")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): score every raw document by how much it looks like a TARGET
    * domain, in a hashed n-gram feature space, as the log importance
    * ratio log p_target(x)/p_raw(x) under bag-of-hashed-grams models.
    * This is the selection method production pretraining pipelines run
    * to up-weight wiki/book-like text from a web crawl.
    *
    * Shape, built for 100 TB: unigrams + bigrams hash into 256 buckets
    * (first two md5 nibbles — the q64 determinism discipline: identical
    * bytes → identical bucket in ANY engine, re-ingestion-stable). The
    * ONLY corpus-sized shuffle is the per-(doc, bucket) count
    * aggregation; both model distributions (target = src0-src2 here, raw
    * = everything) are vocab-bounded 256-row aggregates OF that frame,
    * and scoring joins the 256-row log-ratio table back broadcast. The
    * per-bucket log ratio takes ONE ln of an integer-derived double
    * (Laplace-smoothed count products — exact below 2^53), per-doc sums
    * are DECIMAL(25,15) (partitioning-independent), and the published
    * avg ratio rounds at 12 dp — the q81 cross-engine determinism
    * recipe. Output is the scale-free per-gram average (band thresholds
    * don't drift with corpus size); the actual resample step is exactly
    * [[weightedSample]] (q96) run on `exp(avg_log_ratio)` weights, so
    * the two operators compose into the paper's full pipeline.
    */
  val dsirSelection: GraftQuery = GraftQuery.sql(
    "q105_dsir_selection",
    """WITH docs AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
      |), grams AS (
      |  SELECT doc_id, source, g FROM (
      |    SELECT doc_id, source, unnest(tk) AS g FROM docs)
      |  UNION ALL
      |  SELECT doc_id, source, tk[i] || ' ' || tk[i+1] AS g
      |  FROM docs, UNNEST(range(1, len(tk))) AS u(i)
      |), fb AS (
      |  SELECT doc_id, source,
      |    (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) AS b
      |  FROM grams
      |), db AS (
      |  SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM fb GROUP BY doc_id, source, b
      |), tgt AS (
      |  SELECT b, SUM(n) AS ct FROM db
      |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY b
      |), raw AS (
      |  SELECT b, SUM(n) AS cr FROM db GROUP BY b
      |), tot AS (
      |  SELECT (SELECT SUM(ct) FROM tgt) AS t_total,
      |         (SELECT SUM(cr) FROM raw) AS r_total
      |), lr AS (
      |  SELECT raw.b,
      |    ln(((COALESCE(tgt.ct, 0) + 1) * (tot.r_total + 256))
      |       / ((raw.cr + 1) * (tot.t_total + 256))) AS lr
      |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
      |), scored AS (
      |  SELECT db.doc_id, SUM(n) AS n_grams,
      |    CAST(SUM(CAST(n * lr.lr AS DECIMAL(25,15))) AS DOUBLE) AS lp
      |  FROM db JOIN lr USING (b) GROUP BY db.doc_id
      |)
      |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
      |  round(lp / n_grams, 12) AS avg_log_ratio,
      |  CASE WHEN round(lp / n_grams, 12) >= 0.0 THEN 'target'
      |       WHEN round(lp / n_grams, 12) >= -0.03 THEN 'neutral'
      |       ELSE 'off_target' END AS dsir_band
      |FROM scored ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.DecimalType
    def nib(i: Int) =
      expr(s"instr('0123456789abcdef', substring(md5(cast(g as binary)), $i, 1))") - 1
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("tk"))
    // one Generate over the concatenated (unigrams ++ bigrams) array — the
    // previous union of two explodes scanned + tokenized the corpus twice
    // (shingles() yields [] below 2 tokens, so the concat is exactly the
    // union's row multiset; pre-aggregation row order is immaterial)
    val grams = docs.select(col("doc_id"), col("source"),
      explode(concat(col("tk"), shingles(col("tk"), 2))).as("g"))
    // the one corpus-sized shuffle; checkpointed because it feeds the two
    // 256-row model aggregates AND the scoring join (q60's lifecycle)
    val db = graft.ScratchFrames.checkpoint(grams
      .select(col("doc_id"), col("source"), (nib(1) * 16 + nib(2)).cast("int").as("b"))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("n")))
    val tgt = db.where(col("source").isin("src0", "src1", "src2"))
      .groupBy(col("b")).agg(sum(col("n")).as("ct"))
    val raw = db.groupBy(col("b")).agg(sum(col("n")).as("cr"))
    val tot = tgt.agg(sum(col("ct")).as("t_total"))
      .join(raw.agg(sum(col("cr")).as("r_total")))
    val lr = raw.join(tgt, Seq("b"), "left").join(tot)
      .select(col("b"),
        log(((coalesce(col("ct"), lit(0L)) + 1) * (col("r_total") + 256))
          / ((col("cr") + 1) * (col("t_total") + 256))).as("lr"))
    val scored = db.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_grams"),
        sum((col("n") * col("lr")).cast(DecimalType(25, 15)))
          .cast("double").as("lp"))
    val alr = round(col("lp") / col("n_grams"), 12)
    scored.select(col("doc_id"), col("n_grams"),
      alr.as("avg_log_ratio"),
      when(alr >= 0.0, "target").when(alr >= -0.03, "neutral")
        .otherwise("off_target").as("dsir_band"))
      .orderBy("doc_id")
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._

/** Text-analysis + deduplication surface over the `documents` table —
  * the LLM-data-pipeline operators (token stats, quality scoring,
  * language ID, fingerprinting, exact/bag-of-words dedup, MinHash bands,
  * n-gram Jaccard, SimHash).
  *
  * All operators are single-scan groupBy/higher-order-function pipelines:
  * no UDFs, no driver-side loops — at 100 TB each is one map stage plus at
  * most one shuffle on a hash key. md5 is the cross-engine hash, which
  * makes even MinHash/SimHash oracle-checkable in DuckDB.
  */
object TextOps {

  def all: Seq[GraftQuery] = Seq(
    tokenStats, qualityScores, langId, fingerprints, exactDedup,
    minhashSignatures, ngramJaccardPairs, simhash, minhashLshPairs,
    bpeAndRollingHash, nearDupComponents, curationPipeline, bm25,
    bigramPerplexity, simhashHammingPairs, kmvDistinct, tfidfTopTerms,
    pmiCollocations, sparseCosinePairs, cmsHeavyHitters)

  /** Per-document perplexity under a bigram LM trained on the corpus
    * itself — the CCNet-style LM quality filter, self-contained so the
    * whole train+score chain is oracle-checkable (no external model).
    * Add-0.5 smoothing over the corpus vocabulary. Corpus uni/bigram
    * counts are vocab-bounded aggregations; bigram counts attach to the
    * exploded bigram stream in-frame ((w1,w2)-partitioned window count —
    * one explode, one shuffle), unigram counts join on the word key (hash
    * equi-join, broadcastable when the vocab is small), and scoring sums
    * log-probabilities in
    * DECIMAL — order-independent, so the score is identical under any
    * partitioning; the average log-prob rounds at 12 decimals. (No exp()
    * in the output: IEEE only guarantees correct rounding for the basic
    * arithmetic ops and sqrt, so engines' exp implementations differ by
    * 1 ULP on identical inputs and a perplexity column would flip
    * round-12 hashes; perplexity is monotone in avg_logprob, so the
    * filter quality band is computed from the rounded log-prob directly.)
    */
  val bigramPerplexity: GraftQuery = {
    import org.apache.spark.sql.expressions.Window
    GraftQuery.sql(
    "q81_bigram_perplexity",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |), uni AS (
      |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
      |    SELECT unnest(tk) AS w1 FROM w) GROUP BY w1
      |), v AS (SELECT COUNT(*) AS vsize FROM uni),
      |bi AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
      |    SELECT tk[i] AS w1, tk[i+1] AS w2
      |    FROM w, UNNEST(range(1, len(tk))) AS u(i)) GROUP BY w1, w2
      |), db AS (
      |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
      |  FROM w, UNNEST(range(1, len(tk))) AS u(i)
      |), scored AS (
      |  SELECT db.doc_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(CAST(ln((bi.c2 + 0.5) / (uni.c1 + 0.5 * v.vsize))
      |      AS DECIMAL(25,15))) AS DOUBLE) AS lp
      |  FROM db JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
      |  GROUP BY db.doc_id
      |)
      |SELECT doc_id, n_bigrams,
      |  round(lp / n_bigrams, 12) AS avg_logprob,
      |  CASE WHEN round(lp / n_bigrams, 12) >= -5.0 THEN 'keep'
      |       WHEN round(lp / n_bigrams, 12) >= -6.0 THEN 'review'
      |       ELSE 'drop' END AS ppl_band
      |FROM scored ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    // vocab-bounded unigram counts, localCheckpointed (same lifecycle as
    // q60's frames) so the corpus token explode runs ONCE even though the
    // frame feeds both the vocabulary size and the scoring join
    val uniW = graft.ScratchFrames.checkpoint(
      w.select(explode(col("tk")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1")))
    val v = uniW.agg(count(lit(1)).as("vsize"))
    val db = w.where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(shingles(col("tk"), 2)).as("g"))
      .select(col("doc_id"),
        substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    // corpus bigram counts attach IN-FRAME via a (w1,w2)-partitioned window
    // count: the shingle explode is consumed exactly once (the previous
    // bi-aggregate + self-join re-ran the explode over the whole corpus),
    // and the window's hash shuffle on (w1,w2) is the same exchange the
    // join already paid. PlanShapeSpec locks the single-Generate shape.
    val withC2 = db.withColumn("c2",
      count(lit(1)).over(Window.partitionBy(col("w1"), col("w2"))))
    val scored = withC2
      .join(uniW, Seq("w1"))
      .join(v)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(log((col("c2") + 0.5) / (col("c1") + lit(0.5) * col("vsize")))
          .cast(DecimalType(25, 15))).cast("double").as("lp"))
    val alp = round(col("lp") / col("n_bigrams"), 12)
    scored.select(col("doc_id"), col("n_bigrams"),
      alp.as("avg_logprob"),
      when(alp >= -5.0, "keep").when(alp >= -6.0, "review")
        .otherwise("drop").as("ppl_band"))
      .orderBy("doc_id")
  }
  }

  /** BM25 retrieval scoring (Robertson/Spärck Jones; k1 = 1.2, b = 0.75)
    * for a fixed 3-term query — the ranking function every RAG / search
    * stack runs over a corpus. Corpus statistics (document frequency per
    * term, average document length) come from one scan; they are tiny and
    * broadcast back, so scoring is a second single scan with no shuffle
    * wider than the per-doc term-frequency aggregation. Scores round at
    * 12 decimals before ranking, the same cross-engine determinism lever
    * as the cosine kernels (ln/divide ULPs differ between engines).
    */
  val bm25: GraftQuery = {
    val terms = Seq("table", "spark", "merge")
    val termsSql = terms.map(t => s"'$t'").mkString(", ")
    GraftQuery.sql(
      "q78_bm25",
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents
        |), n AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
        |tf AS (
        |  SELECT doc_id, w AS term, COUNT(*) AS tf, MIN(dl) AS dl
        |  FROM (SELECT doc_id, dl, unnest(tk) AS w FROM d)
        |  WHERE w IN ($termsSql)
        |  GROUP BY doc_id, w
        |), df AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id,
        |    SUM(
        |      ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / n.avgdl))
        |    ) AS score,
        |    CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |  GROUP BY tf.doc_id
        |)
        |SELECT doc_id, round(score, 12) AS score, n_terms_hit,
        |  CAST(ROW_NUMBER() OVER (ORDER BY round(score, 12) DESC, doc_id)
        |    AS BIGINT) AS rk
        |FROM scored
        |ORDER BY rk LIMIT 20""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .withColumn("dl", size(col("tk")).cast("long"))
      val stats = d.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val tf = d
        .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
        .where(col("term").isin(terms: _*))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), "term")
        .join(broadcast(stats))
        .groupBy(col("doc_id"))
        .agg(
          sum(
            log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
              * (col("tf") * 2.2)
              / (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
          ).as("score"),
          count(lit(1)).as("n_terms_hit"))
      scored
        .select(col("doc_id"), round(col("score"), 12).as("score"), col("n_terms_hit"))
        .orderBy(desc("score"), col("doc_id")).limit(20)
        .withColumn("rk",
          row_number().over(Window.orderBy(desc("score"), col("doc_id"))).cast("long"))
        .orderBy("rk")
    }
  }

  private val Stop = DefaultStopwords.map(s => s"'$s'").mkString(", ")

  val tokenStats: GraftQuery = GraftQuery.sql(
    "q20_token_stats",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS ttr,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      distinctTokenCount(col("text")).cast("long").as("n_distinct"),
      typeTokenRatio(col("text")).as("ttr"),
      charCountNoSpace(col("text")).cast("long").as("n_chars_nospace"))
      .orderBy("doc_id")
  }

  val qualityScores: GraftQuery = GraftQuery.sql(
    "q21_quality_scores",
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk,
       |    length(replace(text, ' ', '')) AS nchar
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(tk) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(tk, x -> x IN ($Stop))) AS DOUBLE) / len(tk) AS stop_ratio,
       |  CAST(nchar AS DOUBLE) / len(tk) AS avg_token_len,
       |  $qualitySql AS quality
       |FROM t
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      stopwordRatio(col("text"), DefaultStopwords).as("stop_ratio"),
      avgTokenLength(col("text")).as("avg_token_len"),
      qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  // lang-ID SQL building blocks (shared by q22 and the q62 pipeline)
  private val langHitsSql = LangMarkers.map { case (lang, m) =>
    s"len(list_filter(tk, x -> x IN (${m.map(w => s"'$w'").mkString(", ")}))) AS h_$lang"
  }.mkString(",\n    ")
  private val langCaseSql = {
    val langs = LangMarkers.map(_._1)
    langs.zipWithIndex.map { case (lang, i) =>
      val later = langs.drop(i + 1).map(l => s"h_$lang >= h_$l")
      val cond = (s"h_$lang > 0" +: later).mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString("\n    ")
  }
  // quality formula over CTE t(doc_id, tk, nchar) (shared by q21 and q62)
  private def qualitySql =
    s"""LEAST(len(tk) / 50.0, 1.0)
       |    * (1.0 - CAST(len(list_filter(tk, x -> x IN ($Stop))) AS DOUBLE) / len(tk))
       |    * (0.5 + CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) * 0.5)""".stripMargin

  val langId: GraftQuery = GraftQuery.sql(
    "q22_lang_id",
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
       |h AS (SELECT doc_id, lang,
       |    $langHitsSql
       |  FROM t)
       |SELECT doc_id, lang,
       |  CASE
       |    $langCaseSql
       |    ELSE 'und' END AS lang_pred
       |FROM h
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      languageId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  val fingerprints: GraftQuery = GraftQuery.sql(
    "q23_fingerprints",
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp_exact,
      |  md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp_bow
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp_exact"),
      bagOfWordsSignature(col("text")).as("fp_bow"))
      .orderBy("doc_id")
  }

  /** Exact dedup: hash-groupBy on the bag-of-words signature; the survivor
    * is the smallest doc_id per group (one shuffle on the signature).
    */
  val exactDedup: GraftQuery = GraftQuery.sql(
    "q24_exact_dedup",
    """SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS sig,
      |  COUNT(*) AS n_docs,
      |  MIN(doc_id) AS canonical_id
      |FROM documents
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(bagOfWordsSignature(col("text")).as("sig"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy("sig")
  }

  /** MinHash+LSH: 4 bands over 3-gram word shingles; equal (band, min_hash)
    * across documents = LSH bucket collision → near-dup candidate. The
    * band/bucket layout is exactly the shuffle key a banded LSH join uses
    * at scale. Shingles are md5'd once; band hashes are hex rotations of
    * that one hash (md5 dominates the cost — 1 hash pass, not 4).
    */
  val minhashSignatures: GraftQuery = GraftQuery.sql(
    "q25_minhash_signatures",
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |      list_transform(range(1, len(string_split(text, ' ')) - 1),
      |        i -> concat_ws(' ', string_split(text, ' ')[i],
      |                       string_split(text, ' ')[i+1],
      |                       string_split(text, ' ')[i+2]))
      |    ELSE [] END AS sh
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, list_transform(sh, x -> md5(x)) AS hs FROM s
      |)
      |SELECT doc_id, band,
      |  list_aggregate(
      |    list_transform(hs, x -> substr(x, CAST(band * 8 + 1 AS INT), CAST(32 - band * 8 AS INT))
      |                            || substr(x, 1, CAST(band * 8 AS INT))),
      |    'min') AS min_hash
      |FROM h, range(0, 4) t(band)
      |ORDER BY doc_id, band""".stripMargin) { (spark, dir) =>
    val withHashes = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), minhashBandMins(col("tk"), 3, 4).as("bm"))
    val bands = (0 until 4).map(b =>
      struct(lit(b.toLong).as("band"), element_at(col("bm"), b + 1).as("min_hash")))
    withHashes
      .select(col("doc_id"), explode(array(bands: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.min_hash"))
      .orderBy("doc_id", "band")
  }

  /** n-gram (token-set) Jaccard similarity: top-20 most similar pairs in a
    * fixed id window. The all-pairs form is the correctness baseline; at
    * scale the same score runs over LSH candidates instead of the cross
    * join.
    */
  val ngramJaccardPairs: GraftQuery = GraftQuery.sql(
    "q26_ngram_jaccard",
    """WITH d AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      |  FROM documents WHERE doc_id < 60
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.tk, b.tk))) AS jaccard
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |ORDER BY jaccard DESC, id_a, id_b
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir).where(col("doc_id") < 60)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("tk"))
    val a = d.select(col("doc_id").as("id_a"), col("tk").as("ta"))
    val b = d.select(col("doc_id").as("id_b"), col("tk").as("tb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("ta"), col("tb")).as("jaccard"))
      .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
      .limit(20)
  }

  /** End-to-end MinHash+LSH near-dup detection as a shared CTE chain:
    * band signatures → equi-join on (band, min_hash) → distinct candidate
    * pairs → exact Jaccard rescore. This is the 100 TB dedup shape: the
    * only shuffles are the bucket equi-join and the final pair dedup — no
    * cross join anywhere. Reused by the pair listing (q35) and the
    * component clustering (q60).
    */
  /** 3-gram shingles → md5 → 4 hex-rotation band signatures — the shared
    * front half of every LSH oracle (q25, q35, q60, q62, and the streaming
    * near-dup check q68).
    */
  private[operators] val bandSigCtes =
    """s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |      list_transform(range(1, len(string_split(text, ' ')) - 1),
      |        i -> concat_ws(' ', string_split(text, ' ')[i],
      |                       string_split(text, ' ')[i+1],
      |                       string_split(text, ' ')[i+2]))
      |    ELSE [] END AS sh
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, list_transform(sh, x -> md5(x)) AS hs FROM s WHERE len(sh) > 0
      |), sig AS (
      |  SELECT doc_id, band,
      |    list_aggregate(
      |      list_transform(hs, x -> substr(x, CAST(band * 8 + 1 AS INT), CAST(32 - band * 8 AS INT))
      |                              || substr(x, 1, CAST(band * 8 AS INT))),
      |      'min') AS mh
      |  FROM h, range(0, 4) t(band)
      |)""".stripMargin

  private val lshPairCtes = bandSigCtes + ",\n" +
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sig a JOIN sig b ON a.band = b.band AND a.mh = b.mh
      |    AND a.doc_id < b.doc_id
      |), d AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk FROM documents
      |), pairs AS (
      |  SELECT id_a, id_b,
      |    CAST(len(list_intersect(da.tk, db.tk)) AS DOUBLE)
      |      / len(list_distinct(list_concat(da.tk, db.tk))) AS jaccard
      |  FROM cand
      |  JOIN d da ON da.doc_id = id_a
      |  JOIN d db ON db.doc_id = id_b
      |)""".stripMargin

  /** The q35 pair pipeline as a DataFrame (no final ordering) — shared by
    * the pair listing (q35) and the component clustering (q60).
    */
  private def lshPairsDf(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(spark, dir)
    // localCheckpoint both shared frames: the band-mins frame feeds BOTH
    // sides of the bucket self-join and the token-set frame both sides of
    // the rescore join — unchkpt'd, Catalyst plans each side as its own
    // subtree and the md5-per-shingle MinHash pass (the scan's dominant
    // cost) executes twice, plus the tokenization twice again for the
    // rescore (plan evidence: 8 documents scans in the r16 before-plan,
    // 2 after). The frames are tiny (one row per doc); the checkpoint is
    // the same lifecycle q60/q62's component cache already uses.
    val withMins = graft.ScratchFrames.checkpoint(docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), minhashBandMins(col("tk"), 3, 4).as("bm"))
      .where(col("bm").isNotNull))
    val bands = (0 until 4).map(b =>
      struct(lit(b.toLong).as("band"), element_at(col("bm"), b + 1).as("mh")))
    val sig = withMins
      .select(col("doc_id"), explode(array(bands: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.mh"))
    val cand = sig.select(col("doc_id").as("id_a"), col("band"), col("mh"))
      .join(sig.select(col("doc_id").as("id_b"), col("band"), col("mh")), Seq("band", "mh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val d = graft.ScratchFrames.checkpoint(
      docs.select(col("doc_id"), array_distinct(tokens(col("text"))).as("tk")))
    cand
      .join(d.select(col("doc_id").as("id_a"), col("tk").as("ta")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("tk").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("ta"), col("tb")).as("jaccard"))
  }

  val minhashLshPairs: GraftQuery = GraftQuery.sql(
    "q35_minhash_lsh_pairs",
    s"WITH $lshPairCtes\nSELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b") {
    (spark, dir) => lshPairsDf(spark, dir).orderBy("id_a", "id_b")
  }

  /** Near-dup CLUSTERING: the step that turns pair detection into dedup —
    * connected components over the jaccard >= 0.5 pair graph via iterative
    * min-label propagation (each round: one join + one min-agg, eagerly
    * checkpointed; converges in diameter rounds — near-dup components are
    * tight, so a handful), then a canonical representative per component
    * (longest text, ties by id). The oracle computes the same components
    * with a recursive-CTE transitive closure. At extreme scale the rounds
    * would switch to large-star/small-star; the per-round plan (edge join +
    * hash agg, no driver data) is already that shape.
    */
  /** Component CTEs over the pair graph (jaccard >= 0.5): recursive-CTE
    * transitive closure + per-component representative. Appended after
    * [[lshPairCtes]] (requires the WITH to be RECURSIVE).
    */
  private val componentCtes =
    """p AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.5),
      |und AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
      |reach(u, v) AS (
      |  SELECT u, v FROM und
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
      |),
      |comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
      |rep AS (
      |  SELECT c.doc_id AS doc_id, c.component AS component,
      |    (ROW_NUMBER() OVER (PARTITION BY c.component
      |                        ORDER BY length(doc.text) DESC, c.doc_id) = 1) AS is_representative
      |  FROM comp c JOIN documents doc ON doc.doc_id = c.doc_id
      |)""".stripMargin

  /** (doc_id, component, is_representative) for every doc in a jaccard>=0.5
    * near-dup component — iterative min-label propagation: each round is one
    * edge join + one min-aggregation, eagerly checkpointed (converges in
    * component-diameter rounds; near-dup components are tight). At extreme
    * scale the rounds would switch to large-star/small-star; the per-round
    * plan (join + hash agg, no driver data) is already that shape.
    */
  /** Session-validated per-dir cache: the propagation result is built over
    * localCheckpointed rdds, valid for the session's lifetime — q60 and q62
    * share one build.
    */
  private val componentsCache = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.sql.SparkSession, org.apache.spark.sql.DataFrame)]

  private def nearDupComponentsDf(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    componentsCache.synchronized {
      componentsCache.get(dir) match {
        case Some((s, df)) if (s eq spark) && !s.sparkContext.isStopped => df
        case _ =>
          val df = nearDupComponentsUncached(spark, dir)
          componentsCache.put(dir, (spark, df))
          df
      }
    }

  /** Connected components of an undirected pair graph by min-label
    * propagation WITH pointer jumping: each round hooks every node to the
    * minimum of its neighbors' labels AND jumps to its label's label
    * (path compression). Hooking alone converges in O(diameter) rounds —
    * a 30-link near-dup chain would exhaust a fixed round cap and
    * silently mislabel; the jump makes convergence O(log diameter), so
    * the 25-round cap covers diameters up to 2^25 and a non-converged
    * exit is a hard error instead of a wrong answer. One join + min-agg
    * (hook) and one self-join (jump) per round, everything checkpointed,
    * no driver data.
    */
  private[graft] def connectedComponents(pairs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val nParts = math.max(1,
      pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val und = pairs
      .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .toDF("u", "v").coalesce(nParts).localCheckpoint()
    var labels = und.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      val nbr = und.join(labels.select(col("id").as("v"), col("comp").as("vcomp")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("vcomp")).as("nmin"))
      // jump: comp's own label (comp ids are node ids, so every comp is a key)
      val jump = labels.select(col("id").as("_jid"), col("comp").as("jcomp"))
      val upd = labels.join(nbr, Seq("id"), "left")
        .join(jump, col("comp") === col("_jid"), "left")
        .select(col("id"), col("comp").as("_old"),
          least(col("comp"),
            coalesce(col("nmin"), col("comp")),
            coalesce(col("jcomp"), col("comp"))).as("comp"))
        .coalesce(nParts)
        .localCheckpoint()
      changed = upd.where(col("comp") =!= col("_old")).count()
      // the previous round's labels are superseded the moment `upd` is
      // materialized (localCheckpoint is eager) — free their blocks, or
      // every round of every components build lingers for the session
      // (through PlanBridge: Dataset.unpersist no-ops on checkpoints)
      org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(labels)
      labels = upd.drop("_old")
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge in $iter rounds — diameter beyond 2^$iter")
    // und fed its last join; only the returned labels frame stays live
    org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(und)
    labels
  }

  private def nearDupComponentsUncached(
      spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import org.apache.spark.sql.expressions.Window
    val pairs = lshPairsDf(spark, dir).where(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val labels = connectedComponents(pairs)
    // labels is checkpointed (its lineage no longer reaches pairs) — the
    // pair frame is scratch from here on
    org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(pairs)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("_len"))
    labels.select(col("id").as("doc_id"), col("comp").as("component"))
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("component"),
        (row_number().over(Window.partitionBy(col("component"))
          .orderBy(desc("_len"), col("doc_id"))) === 1).as("is_representative"))
  }

  /** Near-dup CLUSTERING: the step that turns pair detection into dedup —
    * see [[nearDupComponentsDf]]; oracle = recursive-CTE transitive closure.
    */
  val nearDupComponents: GraftQuery = GraftQuery.sql(
    "q60_neardup_components",
    // assembled by concatenation: an outer stripMargin would re-strip the
    // interpolated CTE block and corrupt its literal `||` operators
    s"WITH RECURSIVE $lshPairCtes,\n$componentCtes\n" +
      "SELECT doc_id, component, is_representative FROM rep ORDER BY doc_id") {
    (spark, dir) => nearDupComponentsDf(spark, dir).orderBy("doc_id")
  }

  /** The end-to-end CURATION pipeline a training-data user actually runs,
    * composed from the building blocks in ONE declarative plan: language-ID
    * gate (en) → quality-score gate (>= 0.45) → near-dup removal (keep only
    * component representatives). Catalyst fuses the per-doc scoring into a
    * single scan; the only joins are the LSH machinery and one left join of
    * the (small) component table. Thresholds pick identical sets on both
    * engines because q21/q22 already prove the scores bit-identical.
    */
  val curationPipeline: GraftQuery = GraftQuery.sql(
    "q62_curation_pipeline",
    s"WITH RECURSIVE $lshPairCtes,\n$componentCtes,\n" +
      s"""t AS (SELECT doc_id, string_split(text, ' ') AS tk,
         |    length(replace(text, ' ', '')) AS nchar
         |  FROM documents),
         |q AS (SELECT doc_id, $qualitySql AS quality FROM t),
         |lh AS (SELECT doc_id, $langHitsSql FROM t),
         |l AS (SELECT doc_id, CASE $langCaseSql ELSE 'und' END AS lang_pred FROM lh)
         |SELECT d.doc_id AS doc_id, l.lang_pred AS lang_pred, q.quality AS quality,
         |  rep.component AS component
         |FROM documents d
         |JOIN q ON q.doc_id = d.doc_id
         |JOIN l ON l.doc_id = d.doc_id
         |LEFT JOIN rep ON rep.doc_id = d.doc_id
         |WHERE l.lang_pred = 'en' AND q.quality >= 0.45
         |  AND COALESCE(rep.is_representative, TRUE)
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"),
      languageId(col("text")).as("lang_pred"),
      qualityScore(col("text")).as("quality"))
    scored
      .join(nearDupComponentsDf(spark, dir), Seq("doc_id"), "left")
      .where(col("lang_pred") === "en" && col("quality") >= 0.45 &&
        coalesce(col("is_representative"), lit(true)))
      .select(col("doc_id"), col("lang_pred"), col("quality"), col("component"))
      .orderBy("doc_id")
  }

  /** BPE-ish regex token counts + Rabin-Karp rolling-hash fingerprint
    * (order-sensitive, unlike the bag-of-words signature of q23). The
    * RE2-safe token pattern and the mod-1e9+7 integer fold run identically
    * in any engine.
    */
  val bpeAndRollingHash: GraftQuery = GraftQuery.sql(
    "q52_bpe_rolling_hash",
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${BpePattern}')) AS BIGINT) AS n_bpe_tokens,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |  CASE WHEN length(text) = 0 THEN 0 ELSE
       |    list_reduce(
       |      list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS BIGINT)),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) END AS rolling_hash
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), charCodepoints(col("text")).as("cps"))
      .select(
        col("doc_id"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        rollingHash(col("cps")).as("rolling_hash"))
      .orderBy("doc_id")
  }

  /** 16-bit SimHash per document from token hashes — explode + one
    * map-side-combinable aggregation (two-stage hash agg at scale).
    */
  val simhash: GraftQuery = GraftQuery.sql(
    "q27_simhash", {
      val sums = (0 until 16).map(b =>
        s"SUM(CASE WHEN substr(h, ${b + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS bit$b")
        .mkString(",\n    ")
      val hash = (0 until 16).map(b =>
        s"CASE WHEN bit$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, md5(UNNEST(string_split(text, ' '))) AS h FROM documents
         |), bits AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM tok GROUP BY doc_id
         |)
         |SELECT doc_id, CAST($hash AS BIGINT) AS simhash
         |FROM bits
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h"))
    tok.groupBy(col("doc_id"))
      .agg(simhashBitSums(col("h")).head, simhashBitSums(col("h")).tail: _*)
      .select(col("doc_id"), simhashFromBitSums().as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash Hamming-distance near-dup PAIRS (Charikar 2002; the
    * Manku/Jain/Das Sarma 2007 "Detecting Near-Duplicates for Web
    * Crawling" table scheme): 60-bit per-doc signature (one scan + one
    * map-side-combinable aggregation), split into 4 bands of 15 bits;
    * candidate pairs come from a BAND EQUI-JOIN (never all-pairs) and are
    * verified by popcount of the signature XOR. By pigeonhole, any pair
    * within Hamming distance 3 agrees on at least one of the 4 bands, so
    * the band join is COMPLETE for the hd ≤ 3 report — the exact
    * guarantee the 2007 paper's table scheme is built on.
    *
    * 100 TB shape: signature build is one scan; the band join shuffles on
    * (band, 15-bit value) — ~2^15 buckets per band, so candidates stay
    * ~n²/2^15 per band under dispersion, and a boilerplate-heavy bucket
    * (many IDENTICAL signatures) degrades toward that bucket's own pair
    * count, which is exactly the duplicate mass the operator exists to
    * report. No cross join anywhere (plan-guarded).
    */
  val simhashHammingPairs: GraftQuery = GraftQuery.sql(
    "q82_simhash_hamming_pairs", {
      val sums = (0 until 60).map { b =>
        s"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1) // ${1 << (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS wbit$b"
      }.mkString(",\n    ")
      val hash = (0 until 60).map(b =>
        s"CASE WHEN wbit$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, md5(UNNEST(string_split(text, ' '))) AS h FROM documents
         |), bits AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM tok GROUP BY doc_id
         |), sig AS (
         |  SELECT doc_id, CAST($hash AS BIGINT) AS sig FROM bits
         |), bands AS (
         |  SELECT doc_id, sig, k AS band,
         |    (sig // (CAST(1 AS BIGINT) << (15 * CAST(k AS INT)))) % 32768 AS bval
         |  FROM sig, UNNEST(range(0, 4)) AS t(k)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.sig AS sa, b.sig AS sb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (spark, dir) =>
    simhashPairReport(Tables.documents(spark, dir), maxHamming = 3)
      .orderBy("doc_a", "doc_b")
  }

  /** KMV (k-minimum-values) distinct-BIGRAM sketch per source — the
    * MERGEABLE cardinality estimator a 100 TB corpus profile needs: each
    * group's state is its k smallest distinct bigram hashes (bounded at k
    * longs, union-mergeable across partitions/shards/days), and the
    * estimate is (k−1)·2^32 / h_k (Bar-Yossef et al. 2002). Bigrams, not
    * unigrams, because the fixture's unigram vocabulary (~31/source) is
    * below k — bigram cardinality (~700/source) actually exercises the
    * estimation branch at every SF while the < k exact fallback still
    * covers tiny groups. Fully deterministic: the hash is the first 8 md5
    * nibbles (an exact 32-bit integer), the estimate is one
    * integer-valued double division (correctly rounded per IEEE in every
    * engine) — no transcendentals, no float accumulation.
    *
    * The Spark plan is the two-phase distributed top-k: per
    * (source, input-partition) k smallest DISTINCT hashes first
    * (dense_rank over a partition-local window — no skew, no full sort),
    * then the global k over the ≤ k·partitions candidates. The global
    * k-smallest-distinct set is contained in the union of partition-local
    * k-smallest-distinct sets, so the result is partition-count invariant
    * (KmvSketchSpec proves it); the DuckDB oracle states the one-phase
    * semantics directly. Exact distinct counts ride along to report the
    * realized relative error. When a source has fewer than k distinct
    * hashes the sketch IS the exact count.
    */
  val kmvDistinct: GraftQuery = {
    val k = 64
    val hexToInt = (1 to 8).map(j =>
      s"(strpos('0123456789abcdef', substr(md5(token), $j, 1)) - 1) * ${1L << (4 * (8 - j))}")
      .mkString("\n      + ")
    GraftQuery.sql(
      "q85_kmv_distinct",
      s"""WITH w AS (
         |  SELECT source, string_split(text, ' ') AS tk FROM documents
         |), tok AS (
         |  SELECT source, tk[i] || ' ' || tk[i+1] AS token
         |  FROM w, UNNEST(range(1, len(tk))) AS u(i)
         |), h AS (
         |  SELECT DISTINCT source,
         |      $hexToInt AS h
         |  FROM tok
         |), ranked AS (
         |  SELECT source, h,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
         |  FROM h
         |), sk AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS sketch_size,
         |    MAX(CASE WHEN rk = $k THEN h END) AS h_k
         |  FROM ranked WHERE rk <= $k GROUP BY source
         |), ex AS (
         |  SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_distinct
         |  FROM tok GROUP BY source
         |), est AS (
         |  SELECT source, sketch_size, h_k,
         |    round(CASE WHEN sketch_size < $k THEN CAST(sketch_size AS DOUBLE)
         |          ELSE ${(k - 1).toDouble * 4294967296.0} / h_k END, 6) AS est_distinct,
         |    exact_distinct
         |  FROM sk JOIN ex USING (source)
         |)
         |SELECT source, sketch_size, h_k, est_distinct, exact_distinct,
         |  round(abs(est_distinct - exact_distinct) / exact_distinct, 6) AS rel_err
         |FROM est ORDER BY source""".stripMargin) { (spark, dir) =>
      kmvSketchReport(Tables.documents(spark, dir), k).orderBy("source")
    }
  }

  /** The q85 core on any (source, text) frame: per-source KMV
    * distinct-bigram sketch + exact count + realized error. Partition-
    * count invariant (KmvSketchSpec): the global k smallest distinct
    * hashes are contained in the union of per-input-partition k smallest
    * distinct hashes, so phase 1 never loses a sketch member.
    */
  def kmvSketchReport(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2 (the estimate is (k-1)*2^32/h_k)")
    // tok feeds BOTH the sketch pipeline and the exact-count aggregate —
    // checkpoint so the tokenize+shingle explode runs once (q60's
    // lifecycle). The sketch is partition-invariant by construction
    // (class doc), so re-rooting the frame cannot change the result.
    val tok = graft.ScratchFrames.checkpoint(docs
      .select(col("source"), tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("source"), explode(shingles(col("tk"), 2)).as("token")))
    val hashed = tok.select(col("source"),
      conv(substring(md5(col("token").cast("binary")), 1, 8), 16, 10)
        .cast("long").as("h"))
    // phase 1: k smallest distinct hashes per (source, input partition) —
    // bounded candidates, no global sort, skew-free
    val candidates = hashed
      .withColumn("pid", spark_partition_id())
      .withColumn("rk",
        dense_rank().over(Window.partitionBy(col("source"), col("pid")).orderBy(col("h"))))
      .where(col("rk") <= k)
      .select(col("source"), col("h")).distinct()
    // phase 2: the true global k smallest distinct
    val ranked = candidates
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("h"))))
      .where(col("rk") <= k)
    val sketch = ranked.groupBy(col("source")).agg(
      count(lit(1)).as("sketch_size"),
      max(when(col("rk") === k, col("h"))).as("h_k"))
    val exact = tok.groupBy(col("source"))
      .agg(countDistinct(col("token")).as("exact_distinct"))
    sketch.join(exact, "source")
      .withColumn("est_distinct",
        round(when(col("sketch_size") < k, col("sketch_size").cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) / col("h_k")), 6))
      .withColumn("rel_err",
        round(abs(col("est_distinct") - col("exact_distinct"))
          / col("exact_distinct"), 6))
      .select("source", "sketch_size", "h_k", "est_distinct", "exact_distinct", "rel_err")
  }

  /** TF-IDF keyword extraction: the top 5 terms per document by
    * tf · ln(N/df) — the classic curation/diversity signal (and BM25's
    * (q78) untuned cousin: q78 scores documents against a fixed query,
    * this extracts each document's own most characteristic terms).
    *
    * Plan: one explode → (doc,term) count → vocab-sized df aggregation
    * joined back on the term key (hash equi-join; broadcastable when the
    * vocab is small), corpus size as a 1-row broadcast. The per-doc top-5
    * is a window partitioned BY DOCUMENT — bounded work per key at any
    * corpus size, never a global sort. Ranking happens on the ROUNDED
    * score (6 dp) with a term tie-break, so the selected rows are
    * engine-stable (the q81 precedent: ln on identical doubles plus
    * coarse rounding before any comparison).
    */
  val tfidfTopTerms: GraftQuery = {
    val topN = 5
    GraftQuery.sql(
      "q86_tfidf_topterms",
      s"""WITH tok AS (
         |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY doc_id, term
         |), df AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
         |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n
         |), ranked AS (
         |  SELECT doc_id, term, tf, df, score,
         |    CAST(ROW_NUMBER() OVER (
         |      PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk
         |  FROM scored
         |)
         |SELECT doc_id, term, tf, df, score, rk
         |FROM ranked WHERE rk <= $topN ORDER BY doc_id, rk""".stripMargin) { (spark, dir) =>
      tfidfReport(Tables.documents(spark, dir), topN).orderBy("doc_id", "rk")
    }
  }

  /** Collocation extraction by pointwise mutual information (Church &
    * Hanks 1990): adjacent word pairs whose co-occurrence beats the
    * independence assumption, min corpus count 5, top 25 — the phrase
    * miner feeding tokenizer vocab curation and n-gram decontamination.
    *
    * Determinism without ln: PMI is monotone in the association RATIO
    * n·c(w1,w2) / (c(w1)·c(w2)), so the report ranks the ratio itself —
    * all inputs are exact BIGINT counts below 2^53, the product and
    * quotient are single correctly-rounded IEEE ops, and round-9 pins the
    * hash cross-engine (no transcendental anywhere, one less ULP risk
    * than q86's ln).
    *
    * Scale shape: two vocab-bounded hash aggregations off one token
    * explode; unigram counts broadcast back onto the bigram table (vocab
    * ≪ corpus); the global top-25 is a distributed TakeOrdered on the
    * rounded ratio, never a full sort, and the rank window runs on ≤ 25
    * rows (the q78 pattern).
    */
  val pmiCollocations: GraftQuery = {
    val minCount = 5
    val topK = 25
    GraftQuery.sql(
      "q89_pmi_collocations",
      s"""WITH w AS (
         |  SELECT string_split(text, ' ') AS tk FROM documents
         |), uni AS (
         |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c FROM (
         |    SELECT unnest(tk) AS w1 FROM w) GROUP BY w1
         |), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
         |bi AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM (
         |    SELECT tk[i] AS w1, tk[i+1] AS w2
         |    FROM w, UNNEST(range(1, len(tk))) AS u(i)) GROUP BY w1, w2
         |), scored AS (
         |  SELECT b.w1, b.w2, b.c12,
         |    round(CAST(b.c12 AS DOUBLE) * t.n / (u1.c * u2.c), 9) AS pmi_ratio
         |  FROM bi b
         |  JOIN uni u1 ON b.w1 = u1.w1
         |  JOIN uni u2 ON b.w2 = u2.w1
         |  CROSS JOIN tot t
         |  WHERE b.c12 >= $minCount
         |), ranked AS (
         |  SELECT w1, w2, c12, pmi_ratio,
         |    CAST(ROW_NUMBER() OVER (
         |      ORDER BY pmi_ratio DESC, w1, w2) AS BIGINT) AS rk
         |  FROM scored
         |)
         |SELECT w1, w2, c12, pmi_ratio, rk
         |FROM ranked WHERE rk <= $topK ORDER BY rk""".stripMargin) { (spark, dir) =>
      pmiReport(Tables.documents(spark, dir), minCount, topK).orderBy("rk")
    }
  }

  /** Document-pair LEXICAL cosine similarity over tf-idf weights — the
    * sparse-vector similarity join (the classic prefix/df-filtered
    * SSJoin), complementing the dense-embedding cosine paths (q29/q76):
    * pairs surface through an inverted-index EQUI-JOIN on shared terms,
    * never a cross join.
    *
    * Scale shape: terms with df=1 cannot pair and terms with
    * df > dfCutoff are dropped (the stop-term lever — exactly the
    * posting lists that would quadratically blow up, and exactly the
    * terms that carry no discriminative weight; ln(n/df) already ≈ 0
    * there). Each surviving term contributes ≤ C(dfCutoff,2) candidate
    * pairs, so total candidates are vocab-bounded × a constant — linear
    * in vocabulary, independent of corpus skew. The dot product is one
    * groupBy over candidate rows; norms attach by broadcastable hash
    * join on doc_id.
    *
    * Determinism: weights round at 6 (the q86 ln discipline), the dot
    * and norm sums accumulate w·w products in DECIMAL(25,12)
    * (order-independent), and the final cosine is a fixed IEEE sequence
    * rounded at 9. Cosine semantics are over the df-bounded term space
    * (documented contract — the filter is part of the operator, and the
    * oracle applies the identical filter).
    */
  val sparseCosinePairs: GraftQuery = {
    val dfCutoff = 50
    val minCos = 0.2
    GraftQuery.sql(
      "q95_sparse_cosine_pairs",
      s"""WITH tok AS (
         |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY doc_id, term
         |), df AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
         |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |wt AS (
         |  SELECT tf.doc_id, tf.term,
         |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS w
         |  FROM tf JOIN df USING (term) CROSS JOIN n
         |  WHERE df.df BETWEEN 2 AND $dfCutoff
         |), nrm AS (
         |  SELECT doc_id, SUM(CAST(w * w AS DECIMAL(25,12))) AS n2
         |  FROM wt GROUP BY doc_id
         |), dot AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared,
         |    SUM(CAST(a.w * b.w AS DECIMAL(25,12))) AS d
         |  FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |), scored AS (
         |  SELECT doc_a, doc_b, n_shared,
         |    round(CAST(d.d AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 9)
         |      AS cos_sim
         |  FROM dot d
         |  JOIN nrm na ON na.doc_id = d.doc_a
         |  JOIN nrm nb ON nb.doc_id = d.doc_b
         |)
         |SELECT doc_a, doc_b, n_shared, cos_sim
         |FROM scored WHERE cos_sim >= $minCos
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      sparseCosineReport(Tables.documents(spark, dir), dfCutoff, minCos)
        .orderBy("doc_a", "doc_b")
    }
  }

  /** The q95 core on any (doc_id, text) frame: all document pairs with
    * df-bounded tf-idf cosine ≥ `minCos`.
    */
  def sparseCosineReport(
      docs: org.apache.spark.sql.DataFrame,
      dfCutoff: Int,
      minCos: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(25, 12)
    // localCheckpoint: tf feeds the df aggregate AND the inverted index on
    // different keys — unchkpt'd the tokenize+explode+agg runs twice
    val tf = graft.ScratchFrames.checkpoint(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df").between(2, dfCutoff))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // df is filtered to the pairable vocabulary; one shuffle on term
    // attaches it (broadcastable when the vocab fits), then the corpus
    // explode never flows on — wt is the inverted index
    val wt = graft.ScratchFrames.checkpoint(tf.join(df, "term")
      .join(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("w")))
    val nrm = wt.groupBy(col("doc_id"))
      .agg(sum((col("w") * col("w")).cast(dec)).as("n2"))
    val a = wt.select(col("term"), col("doc_id").as("doc_a"), col("w").as("wa"))
    val b = wt.select(col("term"), col("doc_id").as("doc_b"), col("w").as("wb"))
    val dot = a.join(b, Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum((col("wa") * col("wb")).cast(dec)).as("d"))
    dot
      .join(nrm.select(col("doc_id").as("doc_a"), col("n2").as("na")), Seq("doc_a"))
      .join(nrm.select(col("doc_id").as("doc_b"), col("n2").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("d").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 9)
          .as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }

  /** The q89 core on any (doc_id, text) frame: top `topK` adjacent-pair
    * collocations by the PMI ratio, pairs below `minCount` dropped.
    */
  def pmiReport(docs: org.apache.spark.sql.DataFrame, minCount: Int, topK: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = docs.select(tokens(col("text")).as("tk"))
    // vocab-bounded unigram counts; feeds the total, and both sides of the
    // bigram attach — localCheckpoint so the corpus explode runs once
    val uni = graft.ScratchFrames.checkpoint(
      w.select(explode(col("tk")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c")))
    val tot = uni.agg(sum(col("c")).cast("long").as("n"))
    val bi = w.where(size(col("tk")) >= 2)
      .select(explode(shingles(col("tk"), 2)).as("g"))
      .select(
        substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
    val scored = bi
      .join(broadcast(uni.select(col("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w1").as("w2"), col("c").as("c2"))), Seq("w2"))
      .join(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"),
        round(col("c12").cast("double") * col("n") / (col("c1") * col("c2")), 9)
          .as("pmi_ratio"))
    scored.orderBy(desc("pmi_ratio"), col("w1"), col("w2")).limit(topK)
      .withColumn("rk",
        row_number().over(Window.orderBy(desc("pmi_ratio"), col("w1"), col("w2")))
          .cast("long"))
  }

  /** The q86 core on any (doc_id, text) frame: top `topN` terms per doc
    * by tf·ln(N/df), ranked on the 6-dp-rounded score with a term
    * tie-break (engine- and partitioning-stable selection).
    */
  def tfidfReport(docs: org.apache.spark.sql.DataFrame, topN: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint: tf feeds the df aggregate and the scoring join on
    // DIFFERENT keys (term vs doc_id), so neither exchange is reusable and
    // the tokenize+explode+agg would otherwise run twice
    val tf = graft.ScratchFrames.checkpoint(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .join(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("term")))
          .cast("long"))
      .where(col("rk") <= topN)
      .select("doc_id", "term", "tf", "df", "score", "rk")
  }

  /** The q82 core on any (doc_id, text) frame: all pairs within
    * `maxHamming` of each other on the 60-bit signature. COMPLETE for
    * maxHamming ≤ 3 (4 bands, pigeonhole); a larger radius needs more
    * bands to keep the guarantee.
    */
  def simhashPairReport(docs: org.apache.spark.sql.DataFrame, maxHamming: Int): org.apache.spark.sql.DataFrame = {
    require(maxHamming <= 3,
      "4×15-bit bands guarantee completeness only to Hamming distance 3 — " +
        "raise the band count before the radius")
    // localCheckpoint: the signature frame feeds both sides of the band
    // self-join — unchkpt'd, the explode+md5+60-bit-sum aggregation (the
    // operator's dominant cost) executes once per side (r16 before-plan:
    // the whole pipeline appears twice under the join)
    val sig = graft.ScratchFrames.checkpoint(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h"))
      .groupBy(col("doc_id"))
      .agg(simhashWideBitSums(col("h")).head, simhashWideBitSums(col("h")).tail: _*)
      .select(col("doc_id"), simhashWideFromBitSums().as("sig")))
    val bands = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"),
          shiftright(col("sig"), 15 * k).bitwiseAND(lit(32767L)).as("bval"))): _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bval").as("bval"))
    val a = bands.select(col("band"), col("bval"), col("doc_id").as("doc_a"), col("sig").as("sa"))
    val b = bands.select(col("band"), col("bval"), col("doc_id").as("doc_b"), col("sig").as("sb"))
    a.join(b, Seq("band", "bval"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over corpus bigrams
    * — the third mergeable sketch beside q85's KMV (distinct) and q93's
    * histogram (quantiles): FREQUENCY estimation in O(d·w) state that
    * merges by cell-wise ADDITION, the distributed/streaming counting
    * primitive (a per-partition or per-micro-batch sketch sums into the
    * global one losslessly — CmsSketchSpec proves merge-of-splits ≡
    * whole). d = 4 rows × w = 512 cells; row j buckets by md5 nibbles
    * 3j+1..3j+3 (non-overlapping ranges — independent-enough rows, and
    * the q64 determinism discipline: any engine re-derives the same
    * sketch from the same bytes). Estimate = min over rows; one-sided by
    * construction (never under-counts; err ≤ e/w·N w.p. 1−e^−d). The
    * query sketches ~916 distinct bigrams into 512 cells and reports the
    * exact top-40 WITH their sketch estimates and realized overestimate
    * — the honest-error display, same contract as q85/q93.
    */
  val cmsHeavyHitters: GraftQuery = GraftQuery.sql(
    "q106_cms_heavy_hitters",
    """WITH docs AS (
      |  SELECT string_split(text, ' ') AS tk FROM documents
      |), tk AS (
      |  SELECT tk[i] || ' ' || tk[i+1] AS tok
      |  FROM docs, UNNEST(range(1, len(tk))) AS u(i)
      |), tc AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY tok
      |), rows_ AS (SELECT unnest(range(0, 4)) AS j),
      |buck AS (
      |  SELECT tc.tok, tc.c, r.j,
      |    ((strpos('0123456789abcdef', substr(md5(tc.tok), 3*r.j+1, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(md5(tc.tok), 3*r.j+2, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(tc.tok), 3*r.j+3, 1)) - 1)) % 512 AS b
      |  FROM tc CROSS JOIN rows_ r
      |), cms AS (
      |  SELECT j, b, SUM(c) AS cell FROM buck GROUP BY j, b
      |), top AS (
      |  SELECT tok, c FROM tc ORDER BY c DESC, tok LIMIT 40
      |), est AS (
      |  SELECT top.tok, top.c, MIN(cms.cell) AS cms_c
      |  FROM top JOIN buck USING (tok)
      |  JOIN cms ON cms.j = buck.j AND cms.b = buck.b
      |  GROUP BY top.tok, top.c
      |)
      |SELECT tok AS token, c AS true_count, CAST(cms_c AS BIGINT) AS cms_count,
      |  CAST(cms_c - c AS BIGINT) AS overestimate
      |FROM est ORDER BY true_count DESC, token""".stripMargin) { (spark, dir) =>
    val tc = graft.ScratchFrames.checkpoint(Tables.documents(spark, dir)
      .select(tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(shingles(col("tk"), 2)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c")))
      // ^ vocab-bounded; feeds sketch, top-k, and verify
    val buck = cmsBuckets(tc, "tok")
    val cms = buck.groupBy(col("j"), col("b")).agg(sum(col("c")).as("cell"))
    val top = tc.orderBy(desc("c"), col("tok")).limit(40)
    top.join(buck.select(col("tok"), col("j"), col("b")), Seq("tok"))
      .join(broadcast(cms), Seq("j", "b"))
      .groupBy(col("tok"), col("c"))
      .agg(min(col("cell")).as("cms_c"))
      .select(col("tok").as("token"), col("c").as("true_count"),
        col("cms_c").as("cms_count"),
        (col("cms_c") - col("c")).as("overestimate"))
      .orderBy(desc("true_count"), col("token"))
  }

  /** The q106 hashing core on any (token, count) frame: the d×w bucket
    * rows each token contributes to. A CMS is `cmsBuckets(...).groupBy(j,
    * b).sum(c)` — and BECAUSE that is a plain sum, sketches of disjoint
    * corpus slices merge by unioning the frames before (or summing the
    * cells after) the aggregation, which is the whole scale story.
    */
  def cmsBuckets(
      tokenCounts: org.apache.spark.sql.DataFrame,
      tokCol: String,
      d: Int = 4,
      w: Int = 512): org.apache.spark.sql.DataFrame = {
    require(d >= 1 && d <= 10 && w >= 2 && w <= 4096, "CMS shape out of range")
    def nib(i: Int) =
      expr(s"instr('0123456789abcdef', substring(md5(cast($tokCol as binary)), $i, 1))") - 1
    val rows = (0 until d).map { j =>
      struct(lit(j).as("j"),
        ((nib(3 * j + 1) * 256 + nib(3 * j + 2) * 16 + nib(3 * j + 3)) % w)
          .cast("int").as("b"))
    }
    tokenCounts.select(col(tokCol), col("c"), explode(array(rows: _*)).as("jb"))
      .select(col(tokCol), col("c"), col("jb.j").as("j"), col("jb.b").as("b"))
  }
}

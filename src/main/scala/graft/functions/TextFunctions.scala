package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis / dedup column library for large-scale document pipelines.
  *
  * Everything here is a pure Catalyst expression tree (built-in functions +
  * higher-order lambdas) — no UDFs, so the whole pipeline stays inside
  * whole-stage codegen and scales linearly with executors. Hashes are md5
  * (standard, engine-independent) so results are reproducible anywhere.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Type-token ratio — a cheap lexical-diversity quality signal. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text)

  /** Characters excluding separators. */
  def charCountNoSpace(text: Column): Column = length(regexp_replace(text, " ", ""))

  def avgTokenLength(text: Column): Column =
    charCountNoSpace(text).cast("double") / tokenCount(text)

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: enough tokens, not stopword soup,
    * plausible token lengths. Pure arithmetic — deterministic everywhere.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val stopPenalty = lit(1.0) - stopwordRatio(text, stopwords)
    val diversity = typeTokenRatio(text)
    lenScore * stopPenalty * (lit(0.5) + diversity * 0.5)
  }

  val DefaultStopwords: Seq[String] = Seq("a", "the", "of", "to", "and", "in", "is")

  /** Marker-token language ID (n-gram-style heuristic): count hits per
    * language profile, argmax with a fixed priority tie-break, 'und' when
    * nothing matches.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "les", "des", "est", "et"))

  def langHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  def languageId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, m) => lang -> langHits(text, m) }
    val cascade = hits.zipWithIndex.foldRight(lit("und")) {
      case (((lang, h), i), elseCol) =>
        val laterHits = hits.drop(i + 1).map(_._2)
        val isMax = laterHits.foldLeft(h > 0)((acc, other) => acc && h >= other)
        when(isMax, lit(lang)).otherwise(elseCol)
    }
    cascade
  }

  /** BPE-ish regex tokens (GPT-2-style segmentation simplified to an
    * RE2-safe pattern — no lookarounds, so the same regex runs in any
    * engine): leading-space word / number / punctuation runs.
    */
  val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Rabin-Karp rolling hash over codepoints: h₀ = c₀, h = (h·31 + c)
    * mod 1e9+7 — order-sensitive (permutations hash differently, unlike
    * the bag-of-words signature), cheap integer math, engine-independent.
    * Pass a MATERIALIZED char-codepoint array attribute (HOF lambda
    * re-evaluation, see [[shingles]]).
    */
  def charCodepoints(text: Column): Column =
    transform(filter(split(text, ""), c => length(c) > 0), c => ascii(c).cast("long"))

  def rollingHash(cps: Column): Column =
    when(size(cps) === 0, lit(0L)).otherwise(
      aggregate(
        slice(cps, lit(2), greatest(size(cps) - 1, lit(0))),
        element_at(cps, 1),
        (acc, c) => (acc * 31L + c) % 1000000007L))

  /** Canonical text form for exact dedup: lowercase, collapsed whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), " +", " ")

  /** Exact-dedup fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Order-insensitive bag-of-words signature — catches token permutations. */
  def bagOfWordsSignature(text: Column): Column =
    md5(array_join(array_sort(tokens(text)), " ").cast("binary"))

  /** Word n-gram shingles (contiguous, space-joined) from a token-array
    * column. IMPORTANT: pass a MATERIALIZED attribute (project `tokens(...)`
    * in a prior select), not the `split` expression itself — higher-order
    * lambdas evaluate interpreted, so an inline expression would be
    * re-evaluated once per element per offset (~3·len splits per row).
    */
  def shingles(t: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, "shingle size out of range")
    val idx = sequence(lit(1), size(t) - (n - 1))
    val make = transform(idx, i =>
      concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))
    when(size(t) >= n, make).otherwise(array())
  }

  /** md5 per shingle — computed ONCE per document; every MinHash band
    * derives from this array (md5 dominates signature cost, so one hash
    * pass instead of one per band).
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => md5(s.cast("binary")))

  /** Band `band`'s hash of a shingle = its md5 hex rotated by 8·band chars.
    * Rotation is a bijection on the hash space, so each band ranks shingles
    * under a different permutation — the MinHash independence requirement —
    * at the cost of a substring shuffle instead of another md5.
    */
  def rotateHex(h: Column, band: Int): Column = {
    require(band >= 0 && band < 4, "rotation defined for 4 bands over 32 hex chars")
    if (band == 0) h
    else concat(substring(h, band * 8 + 1, 32 - band * 8), substring(h, 1, band * 8))
  }

  /** One MinHash band value from precomputed [[shingleHashes]]. Equal band
    * values across documents ⇒ LSH bucket collision candidates.
    */
  def minhashBand(hashesCol: Column, band: Int): Column =
    array_min(transform(hashesCol, h => rotateHex(h, band)))

  /** All band minima in one fused native kernel (see [[ShingleBandMins]]) —
    * value-identical to `minhashBand(shingleHashes(shingles(tk, n)), b)`
    * for b < bands, null array when the document has < n tokens.
    */
  def minhashBandMins(tokensCol: Column, n: Int = 3, bands: Int = 4): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleBandMins(ColumnBridge.expression(tokensCol), n, bands))
  }

  /** 16-bit SimHash from token md5s: bit b is the sign of the sum over
    * tokens of ±1 according to hex digit b of the token hash. Call on an
    * exploded (doc_id, token-hash) frame via [[simhashBitSums]] +
    * [[simhashFromBitSums]], which keeps the aggregation map-side
    * combinable.
    */
  def tokenHash(token: Column): Column = md5(token.cast("binary"))

  private val HighHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  def simhashBitSums(h: Column): Seq[Column] =
    (0 until 16).map { b =>
      sum(when(substring(h, b + 1, 1).isInCollection(HighHex), 1).otherwise(-1))
        .as(s"bit$b")
    }

  def simhashFromBitSums(prefix: String = "bit"): Column =
    (0 until 16).map { b =>
      when(col(s"$prefix$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** 60-bit SimHash bit sums (q82's banded near-dup signature): bit
    * b = bit (b%4) of md5 hex nibble (b/4) — the first 15 nibbles give 60
    * usable bits, wide enough that 15-bit bands prune candidates ~2^15×
    * (the 16-bit q27 signature is an oracle-friendly teaching hash; its
    * 4-bit bands would only prune 16×, an n²/16 shape). Sign bit 63 is
    * never used, so the signature is a non-negative BIGINT in every
    * engine. Same map-side-combinable aggregation discipline as
    * [[simhashBitSums]].
    */
  def simhashWideBitSums(h: Column): Seq[Column] =
    (0 until 60).map { b =>
      val nibVal = conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int")
      sum(when(shiftright(nibVal, b % 4).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"wbit$b")
    }

  def simhashWideFromBitSums(prefix: String = "wbit"): Column =
    (0 until 60).map { b =>
      when(col(s"$prefix$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Token-set Jaccard similarity (distinct tokens), exact integer ratio. */
  def jaccard(tokensA: Column, tokensB: Column): Column =
    size(array_intersect(tokensA, tokensB)).cast("double") /
      size(array_union(tokensA, tokensB))
}

/** Vector similarity column library (embeddings as array<float>).
  *
  * Dot products accumulate in DECIMAL so results are independent of
  * accumulation order — bit-identical across engines and partitionings;
  * the final cosine is plain IEEE math on those exact sums.
  */
object VectorFunctions {
  // Operand precisions chosen so `acc + x` is (15 + max(20,10) + 1, 15) =
  // (36,15) — under Spark's 38 cap, so the scale survives and every addition
  // is exact; the cast back to AccDec only narrows precision (same scale →
  // no rounding). 10 integer digits bounds per-element products, 20 the sum.
  private val Dec = DecimalType(25, 15)
  private val AccDec = DecimalType(35, 15)

  /** Single fused native expression (see [[ExactDotProduct]]) — same value
    * as the declarative `aggregate(zip_with(...))` tree, ~10× faster in
    * pairwise joins.
    */
  def dotExact(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ExactDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Fast IEEE-double dot (native fused loop) — prefilter only, see
    * [[DoubleDotProduct]].
    */
  def dotApprox(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DoubleDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Approximate cosine from precomputed norm² — within ~1e-12 of
    * [[cosineFromNormSq]]; use to prune pairwise candidates before the
    * exact rescore.
    */
  def cosineApprox(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    dotApprox(a, b) / (sqrt(normSqA) * sqrt(normSqB))

  def normSqExact(a: Column): Column = dotExact(a, a)

  /** Rounded to 12 decimals: the dot products are exact decimals, but the
    * final sqrt/divide is IEEE double and differs by ~1 ULP across engines;
    * rounding makes scores (and top-k rank order) engine-independent.
    */
  def cosine(a: Column, b: Column): Column =
    cosineFromNormSq(a, b, normSqExact(a).cast("double"), normSqExact(b).cast("double"))

  /** Same score, with norm² precomputed per side (compute it once per
    * vector BEFORE a pairwise join — 3× fewer decimal reductions per pair).
    */
  def cosineFromNormSq(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    round(dotExact(a, b).cast("double") / (sqrt(normSqA) * sqrt(normSqB)), 12)

  /** Sign-sketch LSH bucket: `bits` hyperplanes with deterministic
    * pseudo-random components h_j[i] = ((i·p_j) mod 1000)/1000 − 0.5.
    * Documents whose embeddings land in the same bucket are ANN candidates —
    * the shuffle key for the scale path (bucket join instead of cross join).
    * Plain double arithmetic: the projection is evaluated once per row in a
    * fixed element order, so the sign (and hence the bucket) is
    * deterministic; no cross-engine oracle consumes it.
    */
  def signSketch(a: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 30)
    val planes = (0 until bits).map { j =>
      val p = 2654435761L + 40503L * j
      val proj = aggregate(
        zip_with(a, sequence(lit(0), size(a) - 1), (x, i) =>
          x.cast("double") * (((i * p) % 1000).cast("double") / 1000.0 - 0.5)),
        lit(0.0d),
        (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }
}

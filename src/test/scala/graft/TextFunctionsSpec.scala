package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Native kernels must be value-identical to their declarative reference
  * chains (the chains are what the DuckDB oracles mirror).
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q78 BM25: every hit contains a query term; ranks dense; scores positive, non-increasing") {
    val r = SparkEntry.queries("q78_bm25")(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty && r.length <= 20)
    assert(r.map(_.getLong(3)).toSeq == (1L to r.length))
    val scores = r.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(r.forall { x => val h = x.getLong(2); h >= 1 && h <= 3 })
    val terms = Set("table", "spark", "merge")
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    r.foreach { x =>
      val id = x.getLong(0)
      assert(texts(id).split(" ").exists(terms), s"doc $id lacks all query terms")
    }
  }

  test("q81 perplexity: one row per doc, logprobs negative, bands match thresholds") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q81_bigram_perplexity")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.length == nDocs, "every (multi-token) document scores")
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.foreach { x =>
      val (id, nb, alp, band) = (x.getLong(0), x.getLong(1), x.getDouble(2), x.getString(3))
      assert(nb == ntok(id) - 1, s"doc $id bigram count")
      assert(alp < 0.0, s"doc $id smoothed logprob must be negative")
      val expected = if (alp >= -5.0) "keep" else if (alp >= -6.0) "review" else "drop"
      assert(band == expected, s"doc $id band")
    }
  }

  test("ShingleBandMins equals the declarative shingle→md5→rotate→min chain") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a b"), // < 3 tokens → null mins
      (2L, "x y z"),
      (3L, "repeat repeat repeat repeat repeat"),
      (4L, "Ünïcode tökens with ünïcode bytes and more tökens here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("tk"))

    val native = docs
      .select(col("doc_id"), minhashBandMins(col("tk"), 3, 4).as("bm"))
      .select(col("doc_id") +: (0 until 4).map(b =>
        element_at(col("bm"), b + 1).as(s"m$b")): _*)

    val declarative = docs
      .select(col("doc_id"), shingles(col("tk"), 3).as("sh"))
      .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id") +: (0 until 4).map(b =>
        minhashBand(col("hs"), b).as(s"m$b")): _*)

    val n = native.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val d = declarative.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(n == d)
    assert(n(1).drop(1).forall(_ == null)) // < 3 tokens
  }

  test("kernel codegen placement: shingle/double-dot fused, exact-dot deliberately NOT (r10 verdict #4)") {
    // ShingleBandMins and DoubleDotProduct are per-row/per-pair hot loops:
    // a CodegenFallback would break their projections out of
    // WholeStageCodegen exactly where the 100 TB row count is. Plan-shape
    // tests read from parquet — a local Seq collapses to LocalRelation at
    // optimization time.
    val sf = "/root/testdata/sf0.001"
    val sig = Tables.documents(spark, sf)
      .select(minhashBandMins(tokens(col("text")), 3, 4).as("bm"))
    sig.collect()
    assert(PlanSpans.inWholeStageCodegen(sig, "shinglebandmins"),
      "ShingleBandMins not inside any WholeStageCodegen span")

    // separate queries: a CodegenFallback expression anywhere in a
    // projection breaks the WHOLE projection out of codegen, so pairing
    // the two dots in one select would mask DoubleDotProduct's placement
    val emb = Tables.embeddings(spark, sf)
    val approx = emb.select(
      VectorFunctions.dotApprox(col("embedding"), col("embedding")).as("y"))
    approx.collect()
    assert(PlanSpans.inWholeStageCodegen(approx, "doubledotproduct"),
      "DoubleDotProduct not inside any WholeStageCodegen span")
    val dots = emb.select(
      VectorFunctions.dotExact(col("embedding"), col("embedding")).as("x"))
    dots.collect()
    // ExactDotProduct stays OUT on purpose: WSCG's lazy column evaluation
    // would defer the hoisted normSqExact projection into broadcast-join
    // per-match loops — the decimal dot then runs per candidate PAIR
    // (measured: q88 0.84 → 3.72 s when an r11 experiment codegen'd it;
    // see the class doc). The fallback IS the materialization barrier.
    assert(!PlanSpans.inWholeStageCodegen(dots, "exactdotproduct"),
      "ExactDotProduct entered WholeStageCodegen — this re-breaks the " +
        "hoisted-norm discipline; read ExactDotProduct's class doc before changing")
  }

  test("ExactDotProduct equals the declarative decimal aggregate tree") {
    import org.apache.spark.sql.types.DecimalType
    val Dec = DecimalType(25, 15)
    val AccDec = DecimalType(35, 15)
    val vs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -0.25f, 0.125f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.fill(64)(0.01f), Array.fill(64)(0.99f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val native = vs.select(VectorFunctions.dotExact(col("a"), col("b")).as("d"))
      .collect().map(_.getDecimal(0)).toSeq
    val declarative = vs.select(
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
        lit(java.math.BigDecimal.ZERO).cast(AccDec),
        (acc, x) => (acc + x).cast(AccDec)).as("d"))
      .collect().map(_.getDecimal(0)).toSeq
    assert(native.map(_.toPlainString) == declarative.map(_.toPlainString))
  }
}

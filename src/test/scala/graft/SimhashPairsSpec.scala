package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.TextOps

/** q82 banded SimHash pair semantics the oracle can't express as a
  * property: COMPLETENESS (pigeonhole — every pair within Hamming 3 must
  * surface; the band join is a candidate FILTER, never a recall cut) and
  * the planted-duplicate behavior. Value equality is the DuckDB oracle's
  * job.
  */
class SimhashPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("band join is COMPLETE: operator pairs == brute-force all-pairs at hd <= 3") {
    val docs = Tables.documents(spark, sf)
    val sigs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h"))
      .groupBy(col("doc_id"))
      .agg(simhashWideBitSums(col("h")).head, simhashWideBitSums(col("h")).tail: _*)
      .select(col("doc_id"), simhashWideFromBitSums().as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sigs.nonEmpty && sigs.forall(_._2 >= 0L), "60-bit sigs are non-negative longs")
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb))).toSet
    val got = TextOps.simhashPairReport(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"banded pairs must equal brute force: got ${got.size}, brute ${brute.size}, " +
        s"missing ${(brute -- got).take(3)}, extra ${(got -- brute).take(3)}")
    assert(brute.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("planted duplicates: identical docs pair at hamming 0; a perturbed copy stays within radius") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      0L -> base,
      1L -> base, // identical → hd 0
      2L -> (base + "tiny tail perturbation"), // near-identical → small hd
      3L -> "completely different content about distributed query engines and parquet column pruning"
    ).toDF("doc_id", "text")
    val pairs = TextOps.simhashPairReport(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0, "identical docs must report hamming 0")
    pairs.get((0L, 2L)).foreach(hd => assert(hd <= 3))
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((1L, 3L)),
      "unrelated content must not pair")
  }

  test("radius beyond the band guarantee is refused") {
    import spark.implicits._
    val docs = Seq(0L -> "a b c").toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      TextOps.simhashPairReport(docs, maxHamming = 4))
    assert(e.getMessage.contains("band"))
  }
}

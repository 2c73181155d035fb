package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the curation-pipeline operators that the DuckDB oracle
  * can't express directly (conservation, cap, disjointness) — the oracle
  * gate proves value equality; these prove the SEMANTICS are the intended
  * ones.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir)

  test("q64: splits partition the corpus exactly (counts and id checksums conserve)") {
    val r = SparkEntry.queries("q64_train_split")(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(3))).toMap
    val total = docs.agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    assert(r.keySet == Set("train", "val", "test"))
    assert(r.values.map(_._1).sum == total.getLong(0), "every doc in exactly one split")
    assert(r.values.map(_._2).sum == total.getLong(1), "id checksum conserves")
    assert(r("train")._1 > r("val")._1 && r("train")._1 > r("test")._1)
  }

  test("q75: duplicated-span regions are maximal, in-bounds, and cover full-doc duplicates") {
    val r = SparkEntry.queries("q75_dup_spans")(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    r.foreach { case (id, (ntok, nSpans, nRegions, dupToks, frac)) =>
      assert(nRegions >= 1 && nRegions <= nSpans, s"doc $id region/span counts")
      assert(dupToks >= 10 && dupToks <= ntok, s"doc $id covered tokens in bounds")
      assert(math.abs(frac - dupToks.toDouble / ntok) == 0.0, s"doc $id fraction")
    }
  }

  test("q75 core: planted duplicates give exact interval arithmetic") {
    import spark.implicits._
    val w = (a: Int, b: Int) => (a to b).map(i => s"w$i").mkString(" ")
    // doc 0 ≡ doc 1 (full duplicate, 12 tokens); doc 2 shares exactly
    // tokens 1..10 with doc 3 (one 10-token window each, rest unique);
    // doc 4 is all-unique
    val docs = Seq(
      0L -> w(1, 12), 1L -> w(1, 12),
      2L -> (w(100, 109) + " x1 x2 x3 x4 x5"),
      3L -> (w(100, 109) + " y1 y2 y3 y4 y5"),
      4L -> w(200, 215)).toDF("doc_id", "text")
    val r = graft.operators.PipelineOps.dupSpanReport(docs, n = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    assert(!r.contains(4L), "all-unique doc reports nothing")
    // full duplicate: 3 windows, one merged region covering all 12 tokens
    Seq(0L, 1L).foreach { id =>
      assert(r(id) == ((12L, 3L, 1L, 12L, 1.0)), s"doc $id: ${r(id)}")
    }
    // partial: exactly the first window repeats → one region of 10 of 15
    Seq(2L, 3L).foreach { id =>
      assert(r(id) == ((15L, 1L, 1L, 10L, 10.0 / 15.0)), s"doc $id: ${r(id)}")
    }
  }

  test("q77 core: the classic BPE example trains the textbook merge sequence") {
    import spark.implicits._
    // Sennrich et al.'s worked example: low×5, lower×2, newest×6, widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq(0L -> text).toDF("doc_id", "text")
    val r = graft.operators.PipelineOps.bpeMergeTable(docs, iters = 4)
      .orderBy("merge_rank").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getString(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1L, "e", "s", "es", 9L, 9L),
      (2L, "es", "t", "est", 9L, 9L),
      (3L, "l", "o", "lo", 7L, 7L),
      (4L, "lo", "w", "low", 7L, 7L)))
  }

  test("q77 core: runs count pairs overlapping but apply merges non-overlapping") {
    import spark.implicits._
    val docs = Seq(0L -> "aaaa").toDF("doc_id", "text")
    val r = graft.operators.PipelineOps.bpeMergeTable(docs, iters = 1).collect()
    assert(r.length == 1)
    // 'aaaa' has 3 adjacent (a,a) pairs but greedy left-to-right replaces 2
    assert((r(0).getLong(4), r(0).getLong(5)) == ((3L, 2L)))
  }

  test("q84 removal: conservation, full-dup collapse, untouched docs keep their exact text") {
    import spark.implicits._
    val body = (1 to 30).map(i => s"tok$i").mkString(" ") // 30 unique tokens
    val docsDf = Seq(
      0L -> body, // duplicated verbatim by doc 1 → BOTH collapse (symmetric)
      1L -> body,
      2L -> (1 to 25).map(i => s"solo$i").mkString(" "), // unique → untouched
      3L -> "short doc under span width" // ntok < 10 → untouched
    ).toDF("doc_id", "text")
    val r = graft.operators.PipelineOps.dedupSpanRemovalReport(docsDf, n = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))).toMap
    // conservation on every row
    r.values.foreach { case (nt, kept, rem, _) => assert(kept + rem == nt) }
    // the duplicated pair collapses to nothing, both sides
    Seq(0L, 1L).foreach { id =>
      assert(r(id) == ((30L, 0L, 30L, "d41d8cd98f00b204e9800998ecf8427e")), s"doc $id")
    }
    // untouched docs hash to their ORIGINAL token join
    def md5of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(2L)._4 == md5of((1 to 25).map(i => s"solo$i").mkString(" ")))
    assert(r(2L)._2 == 25L && r(3L)._2 == 5L, "unique and short docs keep everything")
    // cross-consistency with q75 on the real fixture: removal's per-doc
    // removed_tokens equals the report's dup_tokens for every reported doc
    val docs = Tables.documents(spark, dir)
    val removal = graft.operators.PipelineOps.dedupSpanRemovalReport(docs, 10)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    val report = SparkEntry.queries("q75_dup_spans")(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(4))
    assert(report.nonEmpty)
    report.foreach { case (id, dupToks) =>
      assert(removal(id) == dupToks, s"doc $id: removal ${removal(id)} != report $dupToks")
    }
    // every doc q75 does NOT report removes zero tokens
    val reported = report.map(_._1).toSet
    removal.foreach { case (id, rem) =>
      if (!reported.contains(id)) assert(rem == 0L, s"unreported doc $id removed $rem")
    }
  }

  test("q77 envelope: merge counts past the checkpoint boundary keep lineage flat; the cap is enforced") {
    import spark.implicits._
    // a corpus whose longest word sustains > BpeCheckpointEvery merges: a
    // 41-distinct-char word trains a 40-merge chain (every adjacent pair
    // counts 1, so each merge extends the left prefix by one symbol),
    // crossing the 32-merge localCheckpoint boundary — without the
    // re-rooting this plan is a 40-deep stack of replace projections
    val word = (('a' to 'z') ++ ('A' to 'O')).mkString // 41 distinct chars
    val docs = Seq(0L -> word).toDF("doc_id", "text")
    val r = graft.operators.PipelineOps.bpeMergeTable(docs, iters = 40)
      .orderBy("merge_rank").collect()
    assert(r.length == 40, s"expected 40 merges, got ${r.length}")
    // single-occurrence chains: every merge has pair_freq = applied = 1
    assert(r.forall(x => x.getLong(4) == 1L && x.getLong(5) == 1L))
    // exhaustion still terminates early when asked for more than exists
    val tiny = graft.operators.PipelineOps.bpeMergeTable(
      Seq(0L -> "ab").toDF("doc_id", "text"), iters = 10).collect()
    assert(tiny.length == 1, "a 2-char vocab exhausts after its single merge")
    // the envelope cap is a hard require, not a silent truncation
    intercept[IllegalArgumentException] {
      graft.operators.PipelineOps.bpeMergeTable(docs,
        iters = graft.operators.PipelineOps.MaxBpeMerges + 1)
    }
  }

  test("q79: mixture sampling tracks target rates and is partitioning-stable") {
    val rows = SparkEntry.queries("q79_mixture_sampling")(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(4), x.getLong(5)))
    val byScr = rows.toMap
    def target(s: String): Double = s match {
      case "src0" => 1.0
      case "src1" | "src2" | "src3" | "src4" => 0.5
      case "src5" | "src6" | "src7" | "src8" | "src9" => 0.25
      case _ => 0.125
    }
    byScr.foreach { case (s, (n, k, rate, _)) =>
      assert(k <= n)
      assert(rate == k.toDouble / n)
      // 16-bit uniform over n docs: allow generous binomial slack
      val t = target(s)
      assert(math.abs(rate - t) <= 4.0 * math.sqrt(t * (1 - t) / n) + 1e-9,
        s"source $s realized $rate vs target $t over $n docs")
    }
    assert(byScr("src0")._3 == 1.0, "src0 keeps everything")
    // determinism: re-running over a different partitioning is identical
    val again = SparkEntry.queries("q79_mixture_sampling")(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(4), x.getLong(5)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q80: encode conserves symbols against q77's applied merge counts") {
    val enc = SparkEntry.queries("q80_bpe_encode")(spark, dir).collect()
    enc.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "BPE never increases token count")
      assert(r.getLong(3) >= r.getLong(1), "at least one token per word survives")
      assert(r.getDouble(4) >= 1.0)
    }
    // every merge application removes exactly one symbol, so the corpus-wide
    // reduction must equal the sum of q77's applied_freq column
    val reduced = enc.map(r => r.getLong(2) - r.getLong(3)).sum
    val applied = SparkEntry.queries("q77_bpe_merges")(spark, dir).collect()
      .map(_.getLong(5)).sum
    assert(reduced == applied,
      s"corpus symbol reduction $reduced != total applied merges $applied")
  }

  test("q65: packing conserves tokens and bins never overflow by more than one doc") {
    val bins = SparkEntry.queries("q65_sequence_packing")(spark, dir).collect()
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(bins.map(_.getLong(3)).sum == totalTokens, "token conservation")
    val maxDoc = docs
      .agg(max(size(split(col("text"), " ")))).collect()(0).getInt(0)
    bins.foreach { b =>
      assert(b.getLong(3) < 4096L + maxDoc,
        s"bin ${b.getLong(1)} of shard ${b.getLong(0)} overflows by more than one doc")
    }
  }

  test("packing is shard-parametric: any shard count keeps the ≤1-doc overflow contract") {
    // the production query fixes shards=8; the knob must preserve the
    // packing contract at other parallelism levels (≈ cluster cores)
    val q = graft.operators.PipelineOps.sequencePackingQuery("packing_s3", shards = 3, binSize = 512)
    val bins = q.run(spark, dir).collect()
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    val maxDoc = docs
      .agg(max(size(split(col("text"), " ")))).collect()(0).getInt(0)
    assert(bins.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    assert(bins.map(_.getLong(3)).sum == totalTokens, "token conservation at shards=3")
    bins.foreach { b =>
      assert(b.getLong(3) < 512L + maxDoc,
        s"bin ${b.getLong(1)} of shard ${b.getLong(0)} overflows by more than one doc")
    }
  }

  test("q66: benchmark docs are never flagged; every flagged doc truly overlaps") {
    val flagged = SparkEntry.queries("q66_decontamination")(spark, dir).collect()
    assert(flagged.forall(_.getLong(0) % 97 != 0), "benchmark side excluded")
    assert(flagged.forall(_.getLong(1) >= 1))
  }

  test("connected components converge on a 60-link chain (pointer jumping)") {
    import spark.implicits._
    // a pure chain is the worst case for min-label propagation: without
    // pointer jumping it needs one round per link and the 25-round cap
    // would fire (or, before the cap became a hard error, silently
    // mislabel); with jumping it converges in O(log n) rounds
    val chain = (0L until 60L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("id_a", "id_b")
    val labels = graft.operators.TextOps.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 60)
    assert(labels.values.forall(_ == 0L), "every chain node labels to the minimum")
  }

  test("connected components: a 100k-node path graph converges under the 25-round cap") {
    // the worst realistic shape as near-dup graphs grow: one long chain.
    // pointer jumping must close a diameter-100k graph in ~log2(100k) ≈ 17
    // rounds — without it the 25-round cap would fire (hard error); this
    // guards the q60/q62 component path at data scales where long chains
    // actually appear
    val n = 100000L
    val chain = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val labels = graft.operators.TextOps.connectedComponents(chain)
    val agg = labels
      .agg(count(lit(1)).as("n"),
        sum(when(col("comp") === 0L, 1L).otherwise(0L)).as("at_min")).collect()(0)
    assert(agg.getLong(0) == n, "every node labeled")
    assert(agg.getLong(1) == n, "every node labels to the chain minimum")
  }

  test("q69: repetition fractions are well-formed and consistent") {
    val r = SparkEntry.queries("q69_gopher_repetition")(spark, dir).collect()
    assert(r.length == docs.count())
    r.foreach { x =>
      val (n, nd) = (x.getLong(1), x.getLong(2))
      val (dup, t1, t2) = (x.getDouble(4), x.getDouble(5), x.getDouble(6))
      assert(nd >= 1 && nd <= n)
      assert(dup >= 0.0 && dup < 1.0)
      assert(t1 >= 1.0 / n && t1 <= 1.0, "top unigram bounded by [1/n, 1]")
      assert(t2 >= 0.0 && t2 <= 1.0)
    }
  }

  test("q70: vocabulary ranks are dense and frequencies non-increasing") {
    val r = SparkEntry.queries("q70_vocabulary")(spark, dir).collect()
    assert(r.map(_.getLong(3)).toSeq == (1L to r.length).toSeq, "dense ranks")
    assert(r.map(_.getLong(1)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "freq non-increasing in rank order")
    assert(r.forall(x => x.getLong(2) <= x.getLong(1)), "doc_freq <= freq")
  }

  test("q71: chunks tile every document — full coverage, fixed stride, no empty tail") {
    val chunks = SparkEntry.queries("q71_doc_chunking")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ntok = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0, s"doc $doc first chunk starts at 0")
      assert(sorted.last._3 + sorted.last._4 == ntok(doc), s"doc $doc last chunk ends at ntok")
      sorted.foreach { case (_, idx, start, len) =>
        assert(start == idx * 48 && len >= 1 && len <= 64)
      }
      // stride coverage: next chunk starts before the previous one ends
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 < a._3 + a._4, s"doc $doc gap between chunks")
        case _ =>
      }
    }
    assert(chunks.length > docs.count(), "long docs must produce multiple chunks")
  }

  test("q96: E-S weighted sample agrees with a driver-side reference; partition-invariant") {
    // independent reference implementation of the same selection: md5
    // nibble hash → u, key = ln(u)/ntok, top-50 by (key desc, doc_id)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text").cache()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.collect().map { r =>
      val text = r.getAs[String]("text")
      val hex = md.clone().asInstanceOf[java.security.MessageDigest]
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u16 = Integer.parseInt(hex.take(4), 16)
      val ntok = text.split(" ", -1).length
      val key = BigDecimal(math.log((u16 + 1.0) / 65537.0) / ntok)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r.getAs[Long]("doc_id"), key)
    }.sortBy { case (id, key) => (-key, id) }.take(50).map(_._1).toSeq
    val got = graft.operators.PipelineOps.weightedSampleReport(docs, 50)
      .orderBy("rk").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got == expected)
    // partitioning cannot change a deterministic content-keyed selection
    val reparts = graft.operators.PipelineOps.weightedSampleReport(docs.repartition(7), 50)
      .orderBy("rk").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(reparts == got)
  }

  test("q97: containment is exact — full inclusion 1.0, partial counted, disjoint absent") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"), // EVAL: 3 distinct shingles
      (1L, "intro alpha beta gamma delta epsilon outro"), // contains all 3
      (2L, "alpha beta gamma zzz yyy"), // shares exactly 1 of 3
      (3L, "totally different words here now") // disjoint
    ).toDF("doc_id", "text")
    val r = graft.operators.PipelineOps
      .fuzzyContainmentReport(docs, col("doc_id") === 0, minContain = 0.0)
      .collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r.keySet == Set(1L, 2L), s"got ${r.keySet}")
    assert(r(1L).getAs[Double]("containment") == 1.0)
    assert(r(1L).getAs[Long]("n_shared") == 3 && r(1L).getAs[Long]("eval_n") == 3)
    assert(r(2L).getAs[Double]("containment") == 1.0 / 3.0)
    // threshold drops the partial pair, keeps the full inclusion
    val thresholded = graft.operators.PipelineOps
      .fuzzyContainmentReport(docs, col("doc_id") === 0, minContain = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(thresholded == Set(1L))
    // partitioning cannot change exact integer-count scores
    val reparts = graft.operators.PipelineOps
      .fuzzyContainmentReport(docs.repartition(5), col("doc_id") === 0, minContain = 0.0)
      .orderBy("doc_id").collect().toSeq
    assert(reparts == r.toSeq.sortBy(_._1).map(_._2))
  }

  test("q67: no source exceeds its quota and ranks are dense from 1") {
    val kept = SparkEntry.queries("q67_source_quota")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    kept.groupBy(_._1).foreach { case (src, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks.size <= 5, s"source $src over quota")
      assert(ranks == (1L to ranks.size).toSeq, s"source $src ranks not dense")
    }
  }
}

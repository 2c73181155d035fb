package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties that make the 100 TB
  * story true — filters reaching the parquet scan, projections pruning
  * columns, small sides broadcast, and no accidental cartesian products —
  * asserted on the EXECUTED plan (after AQE) so a refactor that silently
  * turns a pruned scan into a full scan fails CI, not a cluster bill.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    // execute THIS DataFrame's own QueryExecution (count() would execute a
    // different one and leave this adaptive plan un-finalized)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed to the parquet scan; partial aggregation runs map-side") {
    val p = executedPlan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum"))
    assert(p.contains("Batched: true"))
  }

  test("q20: scan reads only the two referenced columns of documents") {
    val p = executedPlan("q20_token_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q02: dimension tables join as broadcasts, not shuffles") {
    val p = executedPlan("q02_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
  }

  test("q35/q60 LSH pipeline: no cartesian product anywhere") {
    assert(!executedPlan("q35_minhash_lsh_pairs").contains("CartesianProduct"))
  }

  test("q49: exactly one join after the semi-join fusion") {
    val p = executedPlan("q49_large_orders")
    assert("Join".r.findAllIn(p).size <= 2, "expected a single join (one hash-join pair of operators)")
    assert(!p.contains("CartesianProduct"))
  }

  test("q39: media metadata scan prunes the payload-bearing text column to 2 columns") {
    val p = executedPlan("q39_media_meta")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q43 as-of join: one shuffle family, no range-join blowup") {
    val p = executedPlan("q43_asof_last_error")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q75 dup-spans: ONE span explode (occurrence counts attach via window), no cartesian") {
    val p = executedPlan("q75_dup_spans").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // the md5-per-window span explode is the scan's dominant cost — the
    // pre-r7 plan ran it twice (dup-aggregate + join-back)
    assert("Generate".r.findAllIn(p).size == 1,
      p.linesIterator.filter(_.contains("Generate")).mkString("\n"))
  }

  test("q76 semdedup: the pair stage joins on the cluster key, never all-pairs") {
    val p = executedPlan("q76_semdedup")
    assert(!p.contains("CartesianProduct"),
      "within-cluster pairs must come from an equi-join on _centroid")
  }

  test("q82 simhash pairs: candidates come from the band equi-join, never all-pairs") {
    val p = executedPlan("q82_simhash_hamming_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "pairs must come from an equi-join on (band, bval)")
  }

  test("q78 bm25: corpus stats broadcast; the top-20 cut is distributed") {
    val p = executedPlan("q78_bm25")
    assert(!p.contains("CartesianProduct"))
    // the 1-row stats frame and the 3-row df frame must be broadcast sides
    assert("Broadcast".r.findAllIn(p).size >= 2, "df and avgdl/n_docs broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not globally sort")
  }

  test("q69 repetition stats: hash joins on doc_id only, no cartesian product") {
    val p = executedPlan("q69_gopher_repetition")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-doc aggregation must combine map-side")
  }

  test("q71 chunking: pure map + explode — no joins, pruned scan") {
    val p = executedPlan("q71_doc_chunking")
    assert(!p.contains("Join"), "chunking must not join anything")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q64 split: one pruned scan with map-side partial aggregation") {
    val p = executedPlan("q64_train_split")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("q66 decontamination: benchmark side broadcasts, no cartesian product") {
    val p = executedPlan("q66_decontamination")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q65/q67 window passes: pruned scans, no joins at all") {
    Seq("q65_sequence_packing", "q67_source_quota").foreach { q =>
      val p = executedPlan(q)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), q)
      assert(!p.contains("Join"), s"$q should be join-free")
    }
  }

  test("q73 WAV pipeline: scan reads ONLY doc_id (the payload is generated, text never read)") {
    val p = executedPlan("q73_wav_audio")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q74 PII redaction: join-free, shuffle-only-for-sort plan") {
    val p = executedPlan("q74_pii_redaction")
    assert(!p.contains("Join"), "redaction must not join anything")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q70 vocabulary: top-K is distributed, not a global sort of the vocabulary") {
    val p = executedPlan("q70_vocabulary")
    assert(p.contains("TakeOrderedAndProject"),
      "expected a distributed top-K (TakeOrderedAndProject) over the vocab aggregate")
  }

  test("q81 perplexity: the corpus explodes run ONCE (bigram counts attach via window, vocab is checkpointed)") {
    // AQE's toString prints the Final AND Initial plans — count in the
    // final section only, or one node would count twice
    val p = executedPlan("q81_bigram_perplexity").split("== Initial Plan ==").head
    // exactly one Generate: the shingle explode feeding the scoring frame.
    // The bigram counts come from a (w1,w2)-partitioned window over that
    // same frame (not a re-exploded aggregate), and the unigram explode is
    // behind the localCheckpoint, so neither appears as a second Generate —
    // the pre-r7 plan re-ran the corpus explode for the bigram aggregate.
    assert("Generate".r.findAllIn(p).size == 1,
      p.linesIterator.filter(_.contains("Generate")).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q94 correlation: ONE scan of sufficient statistics, pruned to the 4 numeric columns") {
    // the statistics agg runs inside the operator's localCheckpoint, so it
    // never appears in the returned DataFrame's plan — capture every plan
    // the session executes during the query instead
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString): Unit
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      SparkEntry.queries("q94_corr_matrix")(spark, dir).collect(): Unit
      // listener delivery is async — poll until the checkpoint's plan lands
      val deadline = System.nanoTime() + 10e9.toLong
      def stats(): Option[String] = {
        import scala.jdk.CollectionConverters._
        plans.iterator().asScala.find(_.contains("partial_sum"))
      }
      while (stats().isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      val p = stats().getOrElse(fail("no executed plan with the statistics agg arrived"))
      assert(!p.contains("Join"), "sufficient statistics need no join")
      assert(!p.contains("Expand"),
        "the whole point vs countDistinct-style profiles: no row multiplication")
      assert(p.contains(
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double>"),
        p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    } finally spark.listenerManager.unregister(l)
  }

  test("q100 IVF+PQ: candidates surface through the probed-list equi-join, never all-codes") {
    val p = executedPlan("q100_ann_ivfpq").split("== Initial Plan ==").head
    // the k=16-row centroid broadcast is the one sanctioned nested-loop
    // (the q47 probe pattern); the CODE scan must restrict by an equi-join
    // on the probed list id — a cartesian against the code table would be
    // the full-PQ-scan shape the composition exists to avoid
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "probed-list restriction must plan as a broadcast equi-join")
  }

  test("q95 sparse cosine: pairs come from the term equi-join, never all-pairs") {
    val p = executedPlan("q95_sparse_cosine_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "candidates must surface through the df-bounded inverted-index equi-join")
  }

  test("q105 DSIR: scoring rides a broadcast of the 256-row log-ratio table") {
    val p = executedPlan("q105_dsir_selection")
    assert(p.contains("BroadcastHashJoin"),
      "the bucket log-ratio table must broadcast onto the per-doc counts")
    assert(!p.contains("CartesianProduct"))
  }

  test("q106 CMS: top-k is a distributed TakeOrdered, sketch joins broadcast") {
    val p = executedPlan("q106_cms_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"),
      "the exact top-40 must come from TakeOrdered, not a global sort")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"))
  }

  test("ALL registry queries: every partition-less window sorts only limit-bounded input") {
    import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    // traversal that crosses AQE boundaries (AdaptiveSparkPlanExec /
    // QueryStageExec hide their real subtrees from .children)
    def walk(plan: SparkPlan): Seq[SparkPlan] = {
      val kids = plan match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      plan +: kids.flatMap(walk)
    }
    def isBounded(plan: SparkPlan): Boolean = walk(plan).exists {
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
      case _ => false
    }
    // a partition-less Window funnels its WHOLE input through one task — at
    // 100 TB that's a scale-killer unless the input is already cut to a
    // bounded row count by a limit. Swept over the ENTIRE query registry so
    // no query anywhere can funnel unbounded input through a one-task sort.
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      walk(df.queryExecution.executedPlan).foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          assert(isBounded(w.child),
            s"$q: partition-less window over unbounded input:\n$w")
        case _ => ()
      }
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnPq

/** Product quantization: codebook shape, exact ADC arithmetic on a tiny
  * hand-checkable case, and recall@3 against exact L2 on real embeddings.
  */
class AnnPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("codes are within [0, k) and one per subspace") {
    val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2)
    assert(cb.length == 8 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 8)))
    val codes = AnnPq.encode(emb, cb).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("saved+reloaded codebooks are exactly the trained arrays") {
    val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pq_persist").toString
    AnnPq.saveCodebooks(spark, cb, path)
    val cb2 = AnnPq.loadCodebooks(spark, path)
    // bit-exact double roundtrip → identical codebooks → identical codes
    assert(cb2.length == cb.length)
    cb.indices.foreach { j =>
      assert(cb2(j).length == cb(j).length)
      cb(j).indices.foreach(c => assert(cb2(j)(c).sameElements(cb(j)(c))))
    }
    val codes = AnnPq.encode(emb, cb).orderBy("vec_id").collect().map(_.toSeq).toSeq
    val codes2 = AnnPq.encode(emb, cb2).orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(codes2 == codes)
  }

  test("fused native encode == declarative argmin chain, code-for-code") {
    // the r10 PqCodes kernel replaces m·k interpreted lambda frames per
    // row; the q63 oracle replays the DECLARATIVE chain in DuckDB, so the
    // kernel must produce bit-identical codes — same left-to-right IEEE
    // distance fold, same first-minimum (SQL double ordering) tie-break
    val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2)
    val native = AnnPq.encode(emb, cb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val declarative = AnnPq.encode(emb, cb, exprKernel = false).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(native == declarative)

    // and on an adversarial fixture: exact ties between centroids (the
    // first-minimum tie-break is where a naive < or <= loop diverges) —
    // duplicate centroids guarantee tied distances in every subspace
    import spark.implicits._
    val tieDf = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(-1f, 0f, 0f, 1f)),
      (2L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val tieCb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(0.0, 0.0)),
      Array(Array(3.0, 4.0), Array(0.5, 0.5), Array(3.0, 4.0)))
    val nTie = AnnPq.encode(tieDf, tieCb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val dTie = AnnPq.encode(tieDf, tieCb, exprKernel = false).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(nTie == dTie)
    assert(nTie.head._2 == Seq(0, 0), "ties must pick the smallest code")
  }

  test("ADC scan projection stays inside whole-stage codegen") {
    // AdcDistance is the expression every candidate row evaluates; a
    // CodegenFallback there would drop the scan projection out of
    // whole-stage codegen exactly where the 100 TB row count is
    val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2)
    val enc = AnnPq.encode(emb, cb)
    val res = AnnPq.search(emb.where(col("vec_id") < 3), enc, cb, emb, topK = 3)
    res.collect() // force planning + execution (AQE finalizes the plan)
    // executedPlan is an AdaptiveSparkPlanExec with no children — unwrap
    // to the AQE-final plan, then descend into materialized query stages
    def spans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      val own = p.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      val nested = p.collect {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s.plan
      }.flatMap(spans)
      own ++ nested
    }
    val finalPlan = res.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val wscg = spans(finalPlan)
    assert(wscg.exists(_.toLowerCase.contains("adcdistance")),
      s"adcdistance not inside any WholeStageCodegen span:\n${wscg.mkString("\n---\n")}")

    // the encode projection (PqCodes — the corpus-sized build-time map)
    // must land inside a span too
    enc.collect() // finalize ITS adaptive plan (res only executed a copy)
    val encPlan = enc.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val encSpans = spans(encPlan)
    assert(encSpans.exists(_.toLowerCase.contains("pqcodes")),
      s"pqcodes not inside any WholeStageCodegen span:\n${encSpans.mkString("\n---\n")}")
  }

  test("ADC distance equals the sum of per-subspace table entries (hand case)") {
    import spark.implicits._
    // 4-dim vectors, m=2, k=2: centroids land on the two point clusters,
    // so ADC distance to a same-cluster vector is ~0
    val df = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(0.1f, 0f, 10f, 10.1f)),
      (2L, Array(5f, 5f, 0f, 0f)),
      (3L, Array(5.1f, 5f, 0f, 0.1f))).toDF("vec_id", "embedding")
    val cb = AnnPq.train(df, m = 2, k = 2, iters = 3)
    val enc = AnnPq.encode(df, cb)
    val res = AnnPq.search(df.where($"vec_id" === 0), enc, cb, df, topK = 1).collect()
    assert(res.length == 1)
    assert(res(0).getLong(1) == 1L) // nearest neighbor of 0 is 1
    assert(res(0).getDouble(2) < 1.0) // same-cluster ADC distance is small
  }

  test("AdcDistance null-propagates malformed input like element_at (ADVICE r10)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import spark.implicits._
    def adc(codes: org.apache.spark.sql.Column, tab: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.AdcDistance(
        ColumnBridge.expression(codes), ColumnBridge.expression(tab)))
    val tab = Seq(Seq(1.0, 2.0), Seq(10.0, 20.0))
    val rows = Seq(
      (0L, Seq[Integer](0, 1)),      // well-formed → 1.0 + 20.0
      (1L, Seq[Integer](0, null)),   // null code → null
      (2L, Seq[Integer](0, 99)),     // out-of-range code → null
      (3L, Seq[Integer](-1, 0)),     // negative code → null
      (4L, Seq[Integer](0, 1, 0)))   // more codes than table rows → null
      .toDF("id", "codes")
      .select(col("id"), col("codes").cast("array<int>").as("codes"),
        typedLit(tab).as("tab"))
    // codegen path (projection over a DataFrame)
    val got = rows.select(col("id"), adc(col("codes"), col("tab")).as("d"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))).toSeq
    assert(got == Seq(Some(21.0), None, None, None, None))
    // interpreted path (direct eval) agrees with codegen
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Seq[Any]): ArrayData = ArrayData.toArrayData(xs.toArray)
    val tabData = ArrayData.toArrayData(tab.map(r => arr(r)).toArray)
    assert(graft.functions.AdcDistance.compute(arr(Seq(0, 1)), tabData) == 21.0)
    assert(graft.functions.AdcDistance.compute(arr(Seq(0, null)), tabData) == null)
    assert(graft.functions.AdcDistance.compute(arr(Seq(0, 99)), tabData) == null)
  }

  test("fast kernel (exactMeans=false) trains the same-shape codebooks with recall parity") {
    val cb = AnnPq.train(emb, m = 8, k = 16, iters = 2, exactMeans = false)
    assert(cb.length == 8 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 8)))
    // double-sum means differ from the decimal kernel only by ULP wobble,
    // so per-centroid values must agree far beyond any recall-relevant scale
    val exact = AnnPq.train(emb, m = 8, k = 16, iters = 2, exactMeans = true)
    cb.zip(exact).foreach { case (fj, ej) =>
      fj.zip(ej).foreach { case (fc, ec) =>
        fc.zip(ec).foreach { case (f, e) =>
          assert(math.abs(f - e) < 1e-9, s"fast mean $f vs exact mean $e")
        }
      }
    }
    // and the end-to-end search path on the fast codebooks keeps recall
    val r = recallAt3(emb, nQueries = 10, refine = 10, exactMeans = false)
    assert(r >= 0.5, s"fast-kernel mean recall@3 = $r")
  }

  private def recallAt3(
      data: org.apache.spark.sql.DataFrame, nQueries: Int, refine: Int,
      exactMeans: Boolean = true): Double = {
    import spark.implicits._
    val cb = AnnPq.train(data, m = 8, k = 16, iters = 2, exactMeans = exactMeans)
    val enc = AnnPq.encode(data, cb).cache()
    val queries = data.orderBy("vec_id").limit(nQueries)

    val approx = AnnPq.search(queries, enc, cb, data, topK = 3, refine = refine)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // exact L2 top-3 (brute force)
    val q = queries.select($"vec_id".as("query_id"), $"embedding".cast("array<double>").as("qv"))
    val exact = data.select($"vec_id".as("neighbor_id"), $"embedding".cast("array<double>").as("nv"))
      .join(broadcast(q))
      .where($"query_id" =!= $"neighbor_id")
      .withColumn("d", aggregate(zip_with($"qv", $"nv", (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, v) => a + v))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"d", $"neighbor_id")))
      .where($"rk" <= 3)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (qq, rs) => qq -> rs.map(_.getLong(1)).toSet }

    val recalls = exact.map { case (qq, truth) =>
      approx.get(qq).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("recall@3 is high on clustered vectors (PQ's contract)") {
    import spark.implicits._
    // 20 well-separated centers, 10 points each with small noise — the
    // regime PQ is built for (real embedding spaces cluster)
    var seed = 7L
    def rand(): Double = { seed = (seed * 16807) % 2147483647L; seed.toDouble / 2147483647.0 }
    val centers = Array.fill(20, 64)(rand() * 10.0)
    val pts = (0 until 200).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(v => (v + (rand() - 0.5) * 0.2).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val r = recallAt3(df, nQueries = 10, refine = 5)
    assert(r >= 0.9, s"clustered mean recall@3 = $r")
  }

  test("recall@3 beats the shortlist baseline on the (high-entropy) sf0.001 embeddings") {
    // synthetic embeddings are near-uniform random — the worst case for any
    // quantizer; with exact re-rank of a refine×topK shortlist, recall is
    // bounded below by shortlist quality. Locks the pipeline end-to-end.
    val r = recallAt3(emb, nQueries = 10, refine = 10)
    assert(r >= 0.5, s"mean recall@3 = $r")
  }
}

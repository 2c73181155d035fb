package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q89 collocation properties beyond the value oracle: an exclusive pair
  * scores the exact independence ratio and outranks a promiscuous one,
  * the min-count floor drops rare pairs, and the report is
  * partitioning-invariant.
  */
class PmiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    // 5× "new york" (exclusive pair), 6× "the cat the dog" ("the" spreads
    // over two partners), 4× "rare pair" (below the count floor).
    val docs =
      (0 until 5).map(i => (i.toLong, "new york")) ++
        (0 until 6).map(i => (10L + i, "the cat the dog")) ++
        (0 until 4).map(i => (20L + i, "rare pair"))
    docs.toDF("doc_id", "text")
  }

  test("exclusive pair scores n/c12 exactly and tops the ranking") {
    val rows = TextOps.pmiReport(corpus, minCount = 5, topK = 25)
      .orderBy("rk").collect()
    // total tokens n = 5*2 + 6*4 + 4*2 = 42
    val top = rows.head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == ("new", "york"))
    assert(top.getAs[Long]("c12") == 5L)
    // exclusive pair: ratio = c12*n/(c12*c12) = n/c12 = 42/5 = 8.4
    assert(top.getAs[Double]("pmi_ratio") == 8.4)
    // "the cat": 6*42/(12*6) = 3.5 — diluted by "the"'s second partner
    val theCat = rows.find(r =>
      r.getAs[String]("w1") == "the" && r.getAs[String]("w2") == "cat").get
    assert(theCat.getAs[Double]("pmi_ratio") == 3.5)
    assert(top.getAs[Double]("pmi_ratio") > theCat.getAs[Double]("pmi_ratio"))
  }

  test("pairs below the count floor are dropped") {
    val pairs = TextOps.pmiReport(corpus, minCount = 5, topK = 25)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(!pairs.contains(("rare", "pair")), "c12=4 must not pass minCount=5")
    val loose = TextOps.pmiReport(corpus, minCount = 4, topK = 25)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(loose.contains(("rare", "pair")))
  }

  test("report is partition-count invariant (1/3/32 partitions)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = TextOps.pmiReport(docs, 5, 25).orderBy("rk").collect().toSeq
    assert(base.nonEmpty)
    for (p <- Seq(1, 3, 32)) {
      val got = TextOps.pmiReport(docs.repartition(p), 5, 25)
        .orderBy("rk").collect().toSeq
      assert(got == base, s"PMI report must not depend on input partitioning (p=$p)")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Count-min sketch (q106 core): merge-by-addition over corpus slices and
  * the one-sided error guarantee — the two properties that make it the
  * distributed/streaming counting primitive.
  */
class CmsSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tokenCounts(df: DataFrame): DataFrame =
    df.groupBy(col("tok")).agg(count(lit(1)).as("c"))

  private def sketch(tc: DataFrame): Map[(Int, Int), Long] =
    TextOps.cmsBuckets(tc, "tok")
      .groupBy(col("j"), col("b")).agg(sum(col("c")).as("cell"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  private def toks(n: Int, seed: Int): DataFrame = {
    import spark.implicits._
    // zipf-ish: token id = i % (1 + i % 37), plenty of collisions in w=512
    (0 until n).map(i => s"tok_${(i * seed) % (1 + i % 157)}").toDF("tok")
  }

  test("sketch of the whole == cell-wise sum of disjoint-slice sketches") {
    val all = toks(20000, 7)
    val s1 = sketch(tokenCounts(all.where(crc32(col("tok")) % 2 === 0)))
    val s2 = sketch(tokenCounts(all.where(crc32(col("tok")) % 2 =!= 0)))
    val whole = sketch(tokenCounts(all))
    val merged = (s1.keySet ++ s2.keySet).map { k =>
      k -> (s1.getOrElse(k, 0L) + s2.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole)
  }

  test("doc-sliced sketches merge identically (the streaming accumulation shape)") {
    val all = toks(9000, 11).withColumn("slice", monotonically_increasing_id() % 3)
    val parts = (0 until 3).map(s => sketch(tokenCounts(all.where(col("slice") === s))))
    val merged = parts.flatMap(_.keySet).toSet.map { (k: (Int, Int)) =>
      k -> parts.map(_.getOrElse(k, 0L)).sum
    }.toMap
    assert(merged == sketch(tokenCounts(all.drop("slice"))))
  }

  test("estimates never undercount, for EVERY token (one-sided error)") {
    val tc = tokenCounts(toks(15000, 13)).localCheckpoint()
    val buck = TextOps.cmsBuckets(tc, "tok")
    val cms = buck.groupBy(col("j"), col("b")).agg(sum(col("c")).as("cell"))
    val under = buck.join(cms, Seq("j", "b"))
      .groupBy(col("tok"), col("c")).agg(min(col("cell")).as("est"))
      .where(col("est") < col("c")).count()
    assert(under == 0L)
  }
}

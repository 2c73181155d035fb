package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ZOrder

/** Z-order layout: Morton math against hand-computed interleaves, and the
  * writer's file-level locality guarantee (disjoint code ranges per file —
  * what makes footer-stats pruning effective at scale).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("morton code interleaves bits exactly") {
    import spark.implicits._
    // qx=3 (011), qy=5 (101) → interleave y1x1..: bits x at even, y at odd:
    // x=3 spreads to 0b000101, y=5 spreads to 0b010001<<1 = 0b100010 → 0b100111 = 39
    val df = Seq(
      (3.0 / 65536.0, 5.0 / 65536.0),
      (0.0, 0.0),
      (65535.0 / 65536.0, 65535.0 / 65536.0),
      (1.0, 1.0) // clamps to the last cell
    ).toDF("mx", "my")
    val z = df.select(ZOrder.mortonCol(col("mx"), col("my"))).collect().map(_.getLong(0))
    assert(z(0) == 39L)
    assert(z(1) == 0L)
    assert(z(2) == 0xffffffffL)
    assert(z(3) == 0xffffffffL)
  }

  test("writeZOrdered produces disjoint per-file morton ranges; queries unaffected") {
    import spark.implicits._
    val pts = spark.range(5000).select(
      col("id"),
      ((col("id") * 7919 % 1000) / 1000.0).as("mx"),
      ((col("id") * 104729 % 1000) / 1000.0).as("my"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/pts"
    ZOrder.writeZOrdered(pts, dir, col("mx"), col("my"), numFiles = 8)

    val back = spark.read.parquet(dir)
    // layout must not change query results
    val bbox = col("mx") >= 0.25 && col("mx") < 0.5 && col("my") >= 0.25 && col("my") < 0.5
    assert(back.where(bbox).count() == pts.where(bbox).count())
    assert(back.count() == 5000)

    // per-file morton ranges are disjoint (repartitionByRange guarantee)
    val ranges = back
      .withColumn("_z", ZOrder.mortonCol(col("mx"), col("my")))
      .withColumn("_f", input_file_name())
      .groupBy("_f").agg(min("_z").as("lo"), max("_z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi <= lo) }
  }
}

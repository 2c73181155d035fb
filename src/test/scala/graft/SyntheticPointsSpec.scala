package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.SyntheticPoints

/** The jump-ahead distributed generator must reproduce the sequential LCG
  * draw exactly, at any partition count.
  */
class SyntheticPointsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("jump-ahead generation equals the sequential LCG reference") {
    val sequential = PointFixtures.uniform(500)
    val jumped = (0 until 500).map { i =>
      val (lng, lat) = SyntheticPoints.pointAt(42L, i.toLong)
      (i.toLong, lng, lat)
    }
    assert(jumped == sequential.toSeq)
  }

  test("distributed generation is partition-count invariant and exact") {
    val df = SyntheticPoints.uniform(spark, 300).repartition(7)
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(rows == PointFixtures.uniform(300).toSeq)
  }
}

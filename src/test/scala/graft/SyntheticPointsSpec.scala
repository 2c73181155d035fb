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

  test("city-gaussian generator matches the sequential reference stream") {
    // sequential re-derivation: 3 draws per point, same LCG
    val r = new PointFixtures.Lcg(42L)
    val sequential = (0 until 200).map { i =>
      val cityIdx = math.floor(r.next() * SyntheticPoints.CityCenters.length).toInt
      val (cLng, cLat, name) = SyntheticPoints.CityCenters(cityIdx)
      val u1 = r.next(); val u2 = r.next()
      val mag = math.sqrt(-2.0 * math.log(u1))
      (i.toLong, cLng + mag * math.cos(2.0 * math.Pi * u2) * 1.5,
        math.max(-85.0, math.min(85.0, cLat + mag * math.sin(2.0 * math.Pi * u2) * 1.5)),
        name)
    }
    val jumped = (0 until 200).map { i =>
      val (lng, lat, city) = SyntheticPoints.cityPointAt(42L, i.toLong)
      (i.toLong, lng, lat, city)
    }
    assert(jumped == sequential)

    val distributed = SyntheticPoints.cityGaussian(spark, 200).repartition(5)
      .collect().map(r2 => (r2.getLong(0), r2.getDouble(1), r2.getDouble(2), r2.getString(3)))
      .sortBy(_._1).toSeq
    assert(distributed == sequential)
    // realistic clustering: every point near one of the 20 centers
    assert(distributed.map(_._4).distinct.size > 5)
  }

  test("city filter-mask flow (P4): mask ≡ prefiltered load on demo data") {
    val pts = SyntheticPoints.cityGaussian(spark, 300)
    val active = Seq("Tokyo", "Paris")
    val mask = org.apache.spark.sql.functions.col("city").isInCollection(active)
    val masked = graft.cluster.ClusterEngine.load(pts, idCol = Some("row_id"),
      filterMask = Some(mask))
    val pre = graft.cluster.ClusterEngine.load(pts.where(mask), idCol = Some("row_id"))
    assert(masked.numPoints == pre.numPoints && masked.numPoints > 0)
    val a = masked.levels.select("zoom", "id", "point_count").collect().map(_.toSeq).sortBy(_.toString)
    val b = pre.levels.select("zoom", "id", "point_count").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}

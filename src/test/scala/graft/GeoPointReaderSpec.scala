package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GeoPointReader

class GeoPointReaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def wkb(lng: Double, lat: Double, littleEndian: Boolean,
      srid: Option[Int] = None): Array[Byte] = {
    val n = if (srid.isDefined) 25 else 21
    val buf = ByteBuffer.allocate(n)
    buf.order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    buf.put(if (littleEndian) 1.toByte else 0.toByte)
    buf.putInt(if (srid.isDefined) 1 | 0x20000000 else 1)
    srid.foreach(buf.putInt)
    buf.putDouble(lng)
    buf.putDouble(lat)
    buf.array()
  }

  test("WKB decode: both endiannesses, EWKB SRID, malformed → null") {
    val rows = Seq(
      (0L, wkb(-122.4, 37.8, littleEndian = true)),
      (1L, wkb(2.35, 48.86, littleEndian = false)),
      (2L, wkb(139.7, 35.7, littleEndian = true, srid = Some(4326))),
      (3L, Array[Byte](1, 2, 3)), // malformed
      (4L, wkb(0.0, 0.0, littleEndian = true).take(20))) // truncated
      .toDF("id", "geometry")
    val out = GeoPointReader.withLngLat(rows).orderBy("id")
      .select("id", "lng", "lat").collect()
    assert(out(0).getDouble(1) == -122.4 && out(0).getDouble(2) == 37.8)
    assert(out(1).getDouble(1) == 2.35 && out(1).getDouble(2) == 48.86)
    assert(out(2).getDouble(1) == 139.7 && out(2).getDouble(2) == 35.7)
    assert(out(3).isNullAt(1) && out(4).isNullAt(1))
  }

  test("array and struct encodings normalize identically") {
    val viaArray = GeoPointReader.withLngLat(
      Seq((0L, Array(10.0, 20.0))).toDF("id", "geometry"))
      .select("lng", "lat").collect()(0)
    val viaStruct = GeoPointReader.withLngLat(
      Seq((0L, (10.0, 20.0))).toDF("id", "xy")
        .select(col("id"), struct(col("xy._1").as("x"), col("xy._2").as("y")).as("geometry")))
      .select("lng", "lat").collect()(0)
    assert(viaArray == viaStruct)
  }

  test("round-trip: GeoParquet write → readPoints → cluster load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rt").toString + "/pts"
    val pts = PointFixtures.uniform(200).toSeq.toDF("row_id", "lng", "lat")
      .select(col("row_id"), array(col("lng"), col("lat")).as("geometry"))
    graft.io.GeoParquet.write(pts, dir)
    val back = GeoPointReader.readPoints(spark, dir)
    val idx = graft.cluster.ClusterEngine.load(back, idCol = Some("row_id"))
    assert(idx.numPoints == 200)
    assert(idx.getClusters((-180.0, -85.0, 180.0, 85.0), 0).count() > 0)
  }
}

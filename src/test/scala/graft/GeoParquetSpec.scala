package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GeoParquet

class GeoParquetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("GeoParquet write attaches geo footer metadata and round-trips data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geo").toString + "/pts"
    val df = Seq(
      (0L, -122.4, 37.8, "sf"), (1L, 2.35, 48.86, "paris"), (2L, 139.7, 35.7, "tokyo"))
      .toDF("id", "lng", "lat", "city")
      .select($"id", array($"lng", $"lat").as("geometry"), $"city")
      .repartition(2)

    GeoParquet.write(df, dir)

    val meta = GeoParquet.readGeoMetadata(spark, dir)
    assert(meta.isDefined, "geo metadata missing")
    assert(meta.get.contains(""""version":"1.1.0""""))
    assert(meta.get.contains(""""encoding":"point""""))
    assert(meta.get.contains(""""bbox":[-122.4,35.7,139.7,48.86]"""))

    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val rows = back.select($"id", element_at($"geometry", 1), $"city")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, -122.4, "sf"), (1L, 2.35, "paris"), (2L, 139.7, "tokyo")))
  }

  test("rewritten files keep parquet row-group integrity (readable, ZSTD)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geo2").toString + "/pts"
    val df = spark.range(1000)
      .select($"id", array(($"id" % 360 - 180).cast("double"),
        ($"id" % 170 - 85).cast("double")).as("geometry"))
    GeoParquet.write(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(sum($"id")).collect()(0).getLong(0) == 499500L)
    assert(GeoParquet.readGeoMetadata(spark, dir).exists(_.contains("1.1.0")))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.functions.VectorFunctions

/** The SQL-registered functions must return exactly what the Column API
  * returns.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftExtensions.register(s); s }
  import spark.implicits._

  test("graft_exact_dot and graft_dot match the Column API") {
    Seq((Array(1.5f, -2.0f, 0.25f), Array(4.0f, 0.5f, 8.0f)))
      .toDF("a", "b").createOrReplaceTempView("v")
    val sqlRow = spark.sql(
      "SELECT CAST(graft_exact_dot(a, b) AS DOUBLE) AS d, graft_dot(a, b) AS ad FROM v")
      .collect()(0)
    val apiRow = spark.table("v").select(
      VectorFunctions.dotExact($"a", $"b").cast("double"),
      VectorFunctions.dotApprox($"a", $"b")).collect()(0)
    assert(sqlRow.getDouble(0) == apiRow.getDouble(0))
    assert(sqlRow.getDouble(1) == apiRow.getDouble(1))
  }

  test("graft_minhash_bands matches the Column API") {
    Seq(Tuple1("the quick brown fox jumps over the lazy dog"))
      .toDF("text").createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      "SELECT graft_minhash_bands(split(text, ' '), 3, 4) AS bm FROM docs")
      .collect()(0).getSeq[String](0)
    val viaApi = spark.table("docs")
      .select(TextFunctions.tokens($"text").as("tk"))
      .select(TextFunctions.minhashBandMins($"tk", 3, 4))
      .collect()(0).getSeq[String](0)
    assert(viaSql == viaApi)
  }

  test("mercator SQL functions match the Column API bit-for-bit") {
    import graft.geo.Mercator
    Seq((12.34, 56.78), (-179.99, -84.9), (0.0, 0.0), (123.456, 89.9))
      .toDF("lng", "lat").createOrReplaceTempView("pts")
    val viaSql = spark.sql(
      """SELECT graft_fround(graft_mercator_x(lng)) AS mx,
        |       graft_fround(graft_mercator_y(lat)) AS my,
        |       graft_mercator_lng(graft_mercator_x(lng)) AS rlng,
        |       graft_mercator_lat(graft_mercator_y(lat)) AS rlat
        |FROM pts ORDER BY lng""".stripMargin).collect().toSeq
    val viaApi = spark.table("pts").select(
        Mercator.froundCol(Mercator.lngXCol($"lng")).as("mx"),
        Mercator.froundCol(Mercator.latYCol($"lat")).as("my"),
        Mercator.xLngCol(Mercator.lngXCol($"lng")).as("rlng"),
        Mercator.yLatCol(Mercator.latYCol($"lat")).as("rlat"))
      .orderBy($"lng").collect().toSeq
    assert(viaSql == viaApi)
  }

  test("cluster-id SQL decode matches ClusterId") {
    import graft.ids.ClusterId
    val tp = 1000L
    val id = ClusterId.encode(37L, 5, tp)
    val r = spark.sql(
      s"""SELECT graft_cluster_origin_level(${id}L, ${tp}L) AS lvl,
         |       graft_cluster_origin_index(${id}L, ${tp}L) AS idx,
         |       graft_is_cluster(${id}L, ${tp}L) AS c1,
         |       graft_is_cluster(17L, ${tp}L) AS c2""".stripMargin).collect()(0)
    assert(r.getInt(0) == ClusterId.originLevel(id, tp))
    assert(r.getLong(1) == ClusterId.originIndex(id, tp))
    assert(r.getBoolean(2) && !r.getBoolean(3))
  }

  test("graft_wkb_point decodes in SQL") {
    val bytes = {
      val buf = java.nio.ByteBuffer.allocate(21)
      buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte); buf.putInt(1); buf.putDouble(12.5); buf.putDouble(-33.25)
      buf.array()
    }
    Seq(Tuple1(bytes)).toDF("g").createOrReplaceTempView("wkb")
    val r = spark.sql("SELECT graft_wkb_point(g).lng, graft_wkb_point(g).lat FROM wkb")
      .collect()(0)
    assert(r.getDouble(0) == 12.5 && r.getDouble(1) == -33.25)
  }
}

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

package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** WKB point decode (reference P1 fallback: arrow-helpers.ts:52-63 decodes
  * non-GeoArrow geometry per row). Accepts plain WKB and EWKB-with-SRID;
  * anything that is not a 2-D point decodes to null (the reference writes
  * NaN for undecodable geometry, which the NaN filter then drops — null
  * hits the same `isNotNull` gate in ClusterEngine.load).
  */
case class WkbPointDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    StructType(Seq(StructField("lng", DoubleType), StructField("lat", DoubleType)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WkbPointDecode needs binary, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 21) return null
    val buf = ByteBuffer.wrap(bytes)
    buf.order(if (bytes(0) == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.position(1)
    var geomType = buf.getInt
    if ((geomType & 0x20000000) != 0) { // EWKB SRID flag: skip the SRID word
      if (bytes.length < 25) return null
      geomType &= ~0x20000000
      buf.getInt
    }
    if (geomType != 1) return null // 1 = Point
    if (buf.remaining() < 16) return null
    InternalRow(buf.getDouble, buf.getDouble)
  }

  override protected def withNewChildInternal(newChild: Expression): WkbPointDecode =
    copy(child = newChild)
}

/** Geometry-encoding-agnostic point reader (reference P1,
  * arrow-helpers.ts:12-69: GeoArrow fixed-size-list zero-copy path + WKB
  * per-row fallback). Spark analogue: the vectorized parquet reader IS the
  * zero-copy path; this helper only normalizes the geometry column shape
  * into flat `lng`/`lat` doubles — the codegen-friendly layout every
  * downstream operator (Mercator, ClusterEngine) consumes.
  */
object GeoPointReader {

  def wkbPoint(c: Column): Column =
    ColumnBridge.column(WkbPointDecode(ColumnBridge.expression(c)))

  /** Append `lng`/`lat` columns decoded from `geometryColumn`, whatever its
    * encoding: array<double> [lng,lat] (GeoArrow point), struct with
    * lng/lat or x/y fields, or WKB binary.
    */
  def withLngLat(df: DataFrame, geometryColumn: String = "geometry"): DataFrame = {
    val g = col(geometryColumn)
    df.schema(geometryColumn).dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        df.withColumn("lng", element_at(g, 1).cast("double"))
          .withColumn("lat", element_at(g, 2).cast("double"))
      case st: StructType if st.fieldNames.contains("lng") && st.fieldNames.contains("lat") =>
        df.withColumn("lng", g.getField("lng").cast("double"))
          .withColumn("lat", g.getField("lat").cast("double"))
      case st: StructType if st.fieldNames.contains("x") && st.fieldNames.contains("y") =>
        df.withColumn("lng", g.getField("x").cast("double"))
          .withColumn("lat", g.getField("y").cast("double"))
      case BinaryType =>
        df.withColumn("_pt", wkbPoint(g))
          .withColumn("lng", col("_pt.lng"))
          .withColumn("lat", col("_pt.lat"))
          .drop("_pt")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported geometry encoding: ${other.catalogString}")
    }
  }

  /** Read a (Geo)Parquet point table and normalize geometry to lng/lat. */
  def readPoints(spark: SparkSession, path: String,
      geometryColumn: String = "geometry"): DataFrame =
    withLngLat(spark.read.parquet(path), geometryColumn)
}

package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) spatial data layout — the storage-side half of the
  * 100 TB bbox-query story: points written in Morton order give every
  * parquet file a tight (mx, my) bounding box, so a bbox predicate prunes
  * whole files/row-groups from their footer stats instead of scanning the
  * world. (The reference holds everything in RAM and needs no layout;
  * at Spark scale layout IS the index.)
  *
  * The bit-interleave is pure integer shift/mask arithmetic — whole-stage
  * codegen on the Spark side, bit-identical SQL on the oracle side.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i. */
  private def spread16(v: Column): Column = {
    var x = v.bitwiseAND(lit(0xffffL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00ff00ffL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0f0f0f0fL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code from unit-square coords (16 bits per axis).
    * `mx`/`my` must be in [0, 1]; 1.0 maps to the last cell.
    */
  def mortonCol(mx: Column, my: Column): Column = {
    val qx = least(floor(mx * 65536.0).cast("long"), lit(65535L))
    val qy = least(floor(my * 65536.0).cast("long"), lit(65535L))
    spread16(qx).bitwiseOR(shiftleft(spread16(qy), 1))
  }

  /** The same fold in DuckDB SQL (text template; `X`/`Y` are column names
    * of unit-square doubles).
    */
  def mortonSql(x: String, y: String): String = {
    // expanded fold: spread(v) = ((v|v<<8)&0x00FF00FF → |<<4 &0x0F0F0F0F
    //                             → |<<2 &0x33333333 → |<<1 &0x55555555)
    def full(v: String) = {
      val s1 = s"((($v) | (($v) << 8)) & 16711935)"
      val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
      val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
      s"(($s3 | ($s3 << 1)) & 1431655765)"
    }
    val qx = s"LEAST(CAST(FLOOR($x * 65536.0) AS BIGINT), 65535)"
    val qy = s"LEAST(CAST(FLOOR($y * 65536.0) AS BIGINT), 65535)"
    s"(${full(qx)} | (${full(qy)} << 1))"
  }

  /** Write `df` parquet in Z-order: range-partition on the Morton code
    * (disjoint code ranges per file) and sort within partitions — footer
    * min/max stats per file become tight spatial boxes. `numFiles` sizes
    * the layout; at real scale pick ~file-per-128MB.
    */
  def writeZOrdered(
      df: DataFrame, path: String, mx: Column, my: Column, numFiles: Int): Unit = {
    df.withColumn("_z", mortonCol(mx, my))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}

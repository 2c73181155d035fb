package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet 1.1.0 writer/reader (reference S4:
  * examples/basic/scripts/generate-geoparquet.ts:167-199 — ZSTD, point
  * encoding, file-level `geo` key-value metadata).
  *
  * Spark's parquet sink cannot attach custom file metadata, so the write is
  * two-phase: (1) a normal distributed `df.write.parquet` (ZSTD, vectorized,
  * any number of part files), then (2) a driver-side footer rewrite per part
  * file via parquet-hadoop's `appendFile` — a byte-level row-group copy, no
  * re-encode, O(footer) extra work per file. At 100 TB the data never moves
  * twice; only footers are rewritten.
  */
object GeoParquet {

  /** Write `df` as GeoParquet. `geometryColumn` must be `array<double>`
    * of [lng, lat] points.
    */
  def write(
      df: DataFrame,
      path: String,
      geometryColumn: String = "geometry",
      compression: String = "zstd"): Unit = {
    require(df.columns.contains(geometryColumn), s"missing $geometryColumn column")
    val spark = df.sparkSession

    val staged = path + "_staged"
    df.write.option("compression", compression).mode("overwrite").parquet(staged)

    // file-level bbox, computed distributed (one pass over the staged data)
    val g = col(geometryColumn)
    val Array(bbox) = spark.read.parquet(staged).agg(
      min(element_at(g, 1)), min(element_at(g, 2)),
      max(element_at(g, 1)), max(element_at(g, 2))).collect()
    val geoMeta = geoJson(geometryColumn,
      bbox.getDouble(0), bbox.getDouble(1), bbox.getDouble(2), bbox.getDouble(3))

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    fs.listStatus(new Path(staged)).foreach { st =>
      val name = st.getPath.getName
      if (name.endsWith(".parquet"))
        rewriteWithMetadata(conf, st.getPath, new Path(path, name), Map("geo" -> geoMeta))
      else if (name == "_SUCCESS")
        fs.create(new Path(path, name)).close()
    }
    fs.delete(new Path(staged), true)
  }

  /** GeoParquet 1.1.0 `geo` metadata JSON (point encoding, as the
    * reference writes: generate-geoparquet.ts:173-188).
    */
  def geoJson(column: String, minX: Double, minY: Double, maxX: Double, maxY: Double): String =
    s"""{"version":"1.1.0","primary_column":"$column","columns":{"$column":{""" +
      s""""encoding":"point","geometry_types":["Point"],""" +
      s""""bbox":[$minX,$minY,$maxX,$maxY]}}}"""

  /** Copy all row groups of `src` byte-for-byte into `dst`, writing a new
    * footer that carries the original key-value metadata plus `extra`.
    */
  private def rewriteWithMetadata(
      conf: Configuration, src: Path, dst: Path, extra: Map[String, String]): Unit = {
    val in = HadoopInputFile.fromPath(src, conf)
    val reader = ParquetFileReader.open(in)
    val (schema, existing) =
      try {
        val md = reader.getFooter.getFileMetaData
        (md.getSchema, md.getKeyValueMetaData.asScala.toMap)
      } finally reader.close()
    // (rowGroupSize, maxPadding, columnIndexTruncate, statsTruncate,
    // pageChecksum) — parquet-hadoop defaults for the last three
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(dst, conf), schema, ParquetFileWriter.Mode.CREATE,
      128L * 1024 * 1024, 8 * 1024 * 1024, 64, Integer.MAX_VALUE, true)
    writer.start()
    writer.appendFile(in)
    writer.end((existing ++ extra).asJava)
  }

  /** Read the `geo` file metadata from the first part file (all parts carry
    * the same value).
    */
  def readGeoMetadata(spark: SparkSession, path: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    fs.listStatus(new Path(path)).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .headOption.flatMap { p =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo"))
        finally reader.close()
      }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ArrowIpc

/** Arrow IPC stream source/sink: exact roundtrip across partitions and
  * record batches (the reference's multi-chunk layout, multi-chunk.test.ts).
  */
class ArrowIpcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ipc").toString

  test("mixed-type roundtrip is exact (multi-partition, multi-batch)") {
    import spark.implicits._
    val df = spark.range(1000).repartition(7).select(
      col("id"),
      (col("id") * 1.5 - 250.0).as("d"),
      concat(lit("row-"), col("id")).as("s"),
      (col("id") % 3 === 0).as("b"),
      array(col("id") * 2, col("id") * 3).as("arr"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7).as("nullable"))
    val dir = tmp()
    ArrowIpc.write(df, dir, maxRecordsPerBatch = 64) // forces many batches/file
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema == df.schema)
    val a = df.collect().map(_.toSeq.map {
      case arr: Seq[_] => arr.toList; case x => x
    }).sortBy(_.toString)
    val b = back.collect().map(_.toSeq.map {
      case arr: Seq[_] => arr.toList; case x => x
    }).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("binary payload column roundtrips byte-exact") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, -3, 127)), (2L, Array.empty[Byte]))
      .toDF("k", "payload")
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir).orderBy("k").collect()
    assert(back(0).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, -3, 127))
    assert(back(1).getAs[Array[Byte]]("payload").isEmpty)
  }

  test("reader streams batch-by-batch (file count = partition count)") {
    val df = spark.range(100).repartition(4).toDF("id")
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrows"))
    assert(files.length == 4)
    assert(ArrowIpc.read(spark, dir).count() == 100)
  }

  test("serve-mode batch exports as IPC bytes that Spark reads back row-identical") {
    import spark.implicits._
    import graft.cluster.{ClusterEngine, ClusterOptions}
    val pts = PointFixtures.uniform(500).toSeq.toDF("row_id", "lng", "lat")
    val idx = ClusterEngine.load(pts, ClusterOptions(radius = 75.0), idCol = Some("row_id"))
    val bbox = (-120.0, -40.0, 100.0, 70.0)
    val batch = idx.getClustersLocalBatch(bbox, 4)
    assert(batch.size > 0, "fixture bbox must select rows")
    // small chunk size forces the multi-batch layout on the wire
    val bytes = ArrowIpc.writeBatchBytes(batch, maxRecordsPerBatch = 7)
    val dir = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-00000.arrows"), bytes)
    val back = ArrowIpc.read(spark, dir)
      .collect().map(r => graft.cluster.ClusterRow(
        r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    assert(back.toSeq == (0 until batch.size).map(batch.row))
    // and the wire rows are exactly what the distributed scan returns
    val df = idx.getClusters(bbox, 4).collect().map(r => graft.cluster.ClusterRow(
      r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(back.toSet == df)
    idx.unpersist()
  }
}

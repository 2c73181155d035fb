package graft.io

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.apache.spark.sql.types.StructType

/** Arrow IPC stream source/sink (reference S2/S3: arrow-supercluster's
  * native input format, `tests/test-utils.ts:14-31` builds IPC tables and
  * `multi-chunk.test.ts` feeds multi-batch streams).
  *
  * Files are standard Arrow IPC *stream* format — one `part-NNNNN.arrows`
  * per Spark partition, multiple record batches per file (the multi-chunk
  * layout the reference tests exercise). Rows are converted with Spark's own
  * `ArrowWriter`/`ArrowColumnVector` (via [[ArrowBridge]]), so every Spark
  * type Arrow supports round-trips. Both directions stream batch-by-batch:
  * memory is bounded by `maxRecordsPerBatch`, never the partition size, and
  * each partition is read/written by the executor that owns it — at 100 TB
  * the driver only lists files. The session's Hadoop configuration ships to
  * the tasks (as a serializable key/value snapshot — `Configuration` itself
  * is not serializable), so `spark.hadoop.*` filesystem settings (s3a
  * credentials, defaultFS, ...) apply on executors too.
  */
object ArrowIpc {

  /** Snapshot of a Hadoop config that survives closure serialization. */
  private def confSnapshot(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
    buf.toArray
  }

  private def restoreConf(snapshot: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    snapshot.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Write `df` as Arrow IPC stream files under `dir` (one per partition). */
  def write(df: DataFrame, dir: String, maxRecordsPerBatch: Int = 4096): Unit = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val snapshot = confSnapshot(hadoopConf)
    // overwrite-directory semantics: stale part files from a previous run
    // with a different partition count must not survive into a re-read
    val out = new Path(dir)
    val outFs = out.getFileSystem(hadoopConf)
    outFs.delete(out, true)
    outFs.mkdirs(out)
    ArrowBridge.toRdd(df).mapPartitionsWithIndex { (idx, rows) =>
      val allocator = ArrowBridge.newChildAllocator(s"graft-ipc-write-$idx")
      val arrowSchema = ArrowBridge.toArrowSchema(schema, tz)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val path = new Path(dir, f"part-$idx%05d.arrows")
      val fs = path.getFileSystem(restoreConf(snapshot))
      val os = fs.create(path, true)
      val writer = new ArrowStreamWriter(root, null, os)
      try {
        writer.start()
        val vecWriter = new ArrowBridge.RowVectorWriter(root)
        var n = 0
        while (rows.hasNext) {
          vecWriter.write(rows.next())
          n += 1
          if (n == maxRecordsPerBatch) {
            vecWriter.finish(); writer.writeBatch(); vecWriter.reset(); n = 0
          }
        }
        if (n > 0) { vecWriter.finish(); writer.writeBatch() }
        writer.end()
      } finally {
        writer.close(); os.close(); root.close(); allocator.close()
      }
      Iterator.single(idx)
    }.count()
  }

  /** Serve-mode result → Arrow IPC stream BYTES, driver-local, no Spark
    * job — the reference's serving loop in full: its engine hands the
    * layer/wire columnar typed arrays
    * (arrow-cluster-engine.ts `ClusterOutput`), and this closes the same
    * loop for graft: `getClustersLocalBatch` (primitive arrays, no Spark
    * job) → IPC bytes a browser/deck.gl client or [[DataServer]] can ship
    * directly. Chunked into `maxRecordsPerBatch` record batches so a
    * multi-chunk consumer (the reference's multi-chunk tests) streams it
    * without one giant allocation; the output is the standard stream
    * format [[read]] ingests, so the wire round-trips into Spark too
    * (ArrowIpcSpec proves bytes → Spark read → identical rows).
    */
  def writeBatchBytes(
      batch: graft.cluster.ClusterBatch,
      maxRecordsPerBatch: Int = 65536): Array[Byte] = {
    import org.apache.arrow.vector.{BigIntVector, BitVector, Float8Vector}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import scala.jdk.CollectionConverters._
    val i64 = FieldType.notNullable(new ArrowType.Int(64, true))
    val f64 = FieldType.notNullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
    val bool = FieldType.notNullable(ArrowType.Bool.INSTANCE)
    val schema = new Schema(List(
      new Field("id", i64, null), new Field("lng", f64, null),
      new Field("lat", f64, null), new Field("point_count", i64, null),
      new Field("is_cluster", bool, null)).asJava)
    val allocator = ArrowBridge.newChildAllocator("graft-serve-ipc")
    val root = VectorSchemaRoot.create(schema, allocator)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    try {
      writer.start()
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val lng = root.getVector("lng").asInstanceOf[Float8Vector]
      val lat = root.getVector("lat").asInstanceOf[Float8Vector]
      val pc = root.getVector("point_count").asInstanceOf[BigIntVector]
      val ic = root.getVector("is_cluster").asInstanceOf[BitVector]
      var off = 0
      while (off < batch.size) {
        val n = math.min(maxRecordsPerBatch, batch.size - off)
        root.allocateNew()
        var i = 0
        while (i < n) {
          id.setSafe(i, batch.id(off + i))
          lng.setSafe(i, batch.lng(off + i))
          lat.setSafe(i, batch.lat(off + i))
          pc.setSafe(i, batch.pointCount(off + i))
          ic.setSafe(i, if (batch.isCluster(off + i)) 1 else 0)
          i += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        off += n
      }
      writer.end()
      bos.toByteArray
    } finally {
      writer.close(); root.close(); allocator.close()
    }
  }

  /** Read a directory of Arrow IPC stream files; the schema comes from the
    * first file's stream header.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(hadoopConf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".arrows")).map(_.toString).sorted
    require(files.nonEmpty, s"no .arrows files under $dir")

    val schema = {
      val in = fs.open(new Path(files.head))
      val alloc = ArrowBridge.newChildAllocator("graft-ipc-schema")
      val reader = new ArrowStreamReader(in, alloc)
      try ArrowBridge.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); in.close(); alloc.close() }
    }

    val snapshot = confSnapshot(hadoopConf)
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .mapPartitions(_.flatMap(f => readFile(f, schema, snapshot)))
    ArrowBridge.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Read one IPC stream file batch-by-batch (executor-side). Resources are
    * released both on exhaustion AND via a task-completion listener, so a
    * partially-consumed iterator (limit/take/early join exit) cannot leak
    * the Arrow allocator or the input stream.
    */
  private def readFile(
      file: String, schema: StructType,
      confSnapshot: Array[(String, String)]): Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val path = new Path(file)
    val fs = path.getFileSystem(restoreConf(confSnapshot))
    val in = fs.open(path)
    val alloc = ArrowBridge.newChildAllocator(s"graft-ipc-read")
    val reader = new ArrowStreamReader(in, alloc)
    val root = reader.getVectorSchemaRoot

    var open = true
    def closeAll(): Unit = if (open) {
      open = false
      reader.close(); in.close(); alloc.close()
    }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))

    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var current: Iterator[org.apache.spark.sql.catalyst.InternalRow] = Iterator.empty
      private def advance(): Unit = {
        while (open && !current.hasNext) {
          if (reader.loadNextBatch()) current = ArrowBridge.batchRows(root, schema)
          else closeAll()
        }
      }
      def hasNext: Boolean = { advance(); current.hasNext }
      def next(): org.apache.spark.sql.catalyst.InternalRow = {
        advance(); current.next()
      }
    }
  }
}

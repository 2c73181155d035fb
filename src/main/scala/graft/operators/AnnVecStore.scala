package graft.operators

import java.net.URI

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The rerank-vector sidecar that takes local ANN serving past the
  * in-heap row cap (r13 verdict #3): full vectors dominate an
  * [[AnnLocal]] snapshot (n·dim doubles — 10M×16 ≈ 1.3 GB on the driver
  * heap, where the PQ codes are ~80 MB), yet the exact re-rank only ever
  * touches the ≤ topK·refine shortlist per query. So the vectors move to
  * a memory-MAPPED flat file: the codes + centroids stay resident, the
  * shortlist's ~hundreds of 128-byte records are random reads the page
  * cache absorbs, and interactive serving survives corpora whose vectors
  * would never fit the heap.
  *
  * Layout under `<indexPath>/vecstore/`:
  *  - `ids.bin` — n longs, STRICTLY ascending (big-endian, as
  *    DataOutputStream writes them)
  *  - `vectors.bin` — n·dim doubles, row-major, same order as ids.bin
  *  - `meta.txt` — `GRAFTVS1 <n> <dim>`, written LAST (the commit
  *    marker: a crashed save leaves no meta and [[open]] returns None)
  *
  * The store is written by one driver pass over the id-sorted corpus
  * (`toLocalIterator` — one partition of rows in memory at a time, no
  * collect), so save cost is one sort shuffle + a sequential write.
  * Doubles are stored exactly as the distributed path's
  * `cast("array<double>")` produces them, so a re-rank distance computed
  * from the mapped file is bit-identical to one computed from the heap
  * snapshot or the distributed join (AnnCodesLocalSpec pins it).
  *
  * Reading: ids load into one heap array (8 B/row — the binary-search
  * index); vectors are mapped in ≤1 GiB segments aligned to row
  * boundaries. `MappedByteBuffer` absolute reads are thread-safe, so one
  * open store serves a parallel query batch. Non-local filesystems
  * (hdfs/s3a) are first copied to a process-local temp file — the mmap
  * contract needs a local path; at 100 TB that copy is the standard
  * "ship the serving artifact to the serving node" step.
  */
object AnnVecStore {

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(URI.create(path), spark.sparkContext.hadoopConfiguration)

  private def dirOf(path: String) = new HPath(s"$path/vecstore")

  /** Does a COMMITTED vector store exist under `path`? (meta.txt is the
    * commit marker — a half-written store reads as absent.)
    */
  def exists(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new HPath(s"$path/vecstore/meta.txt"))

  /** Write the corpus vectors as the mmap-able rerank sidecar. One
    * distributed sort on the id, then a single sequential driver write.
    * Ids must be unique (strictly-ascending check while streaming).
    * Returns the row count written.
    */
  def save(
      emb: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    val dir = dirOf(path)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val sorted = emb
      .select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .sort(col("_id"))
    val idsOut = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new HPath(dir, "ids.bin"), true), 1 << 20))
    val vecOut = new java.io.BufferedOutputStream(
      fs.create(new HPath(dir, "vectors.bin"), true), 1 << 20)
    var n = 0L
    var dim = -1
    var prev = Long.MinValue
    var rowBuf: Array[Byte] = null
    var rowBB: java.nio.ByteBuffer = null
    try {
      sorted.toLocalIterator().asScala.foreach { r =>
        val id = r.getLong(0)
        require(id > prev,
          s"vecstore ids must be unique and sortable: saw $id after $prev")
        prev = id
        val v = r.getSeq[Double](1)
        if (dim < 0) {
          dim = v.length
          rowBuf = new Array[Byte](8 * dim)
          rowBB = java.nio.ByteBuffer.wrap(rowBuf)
        }
        require(v.length == dim,
          s"ragged embedding: id $id has dim ${v.length}, expected $dim")
        idsOut.writeLong(id)
        rowBB.clear()
        var i = 0
        while (i < dim) { rowBB.putDouble(v(i)); i += 1 }
        vecOut.write(rowBuf)
        n += 1
      }
    } finally { idsOut.close(); vecOut.close() }
    // commit marker LAST: a crash above leaves no meta → open() → None
    val metaOut = fs.create(new HPath(dir, "meta.txt"), true)
    try metaOut.write(s"GRAFTVS1 $n ${math.max(dim, 0)}\n".getBytes("UTF-8"))
    finally metaOut.close()
    n
  }

  /** Open the store: ids into one heap array, vectors memory-mapped.
    * None when no committed store exists at `path`.
    */
  def open(spark: SparkSession, path: String): Option[StoreVectors] = {
    val fs = fsFor(spark, path)
    val dir = dirOf(path)
    val metaPath = new HPath(dir, "meta.txt")
    if (!fs.exists(metaPath)) return None
    val meta = {
      val in = fs.open(metaPath)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    }
    val parts = meta.split("\\s+")
    require(parts.length == 3 && parts(0) == "GRAFTVS1",
      s"unrecognized vecstore meta at $path: '$meta'")
    val n = parts(1).toLong
    val dim = parts(2).toInt
    require(n <= Int.MaxValue, s"vecstore row count $n exceeds the open limit")
    // ids: one sequential read into the binary-search index
    val ids = new Array[Long](n.toInt)
    locally {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        fs.open(new HPath(dir, "ids.bin")), 1 << 20))
      try {
        var i = 0
        while (i < ids.length) { ids(i) = in.readLong(); i += 1 }
      } finally in.close()
    }
    // vectors: mmap a LOCAL file (direct for file://; remote stores are
    // copied to a process temp first — the artifact-shipping step)
    val vecPath = new HPath(dir, "vectors.bin")
    val localFile: java.io.File =
      if (fs.getScheme == "file")
        new java.io.File(fs.makeQualified(vecPath).toUri.getPath)
      else {
        val tmp = java.io.File.createTempFile("graft_vecstore", ".bin")
        tmp.deleteOnExit()
        fs.copyToLocalFile(false, vecPath,
          new HPath(tmp.getAbsolutePath), true)
        tmp
      }
    val rowBytes = math.max(8L * dim, 8L)
    // ≤1 GiB segments, aligned to row boundaries so no record straddles
    val rowsPerChunk = math.max(1L, (1L << 30) / rowBytes)
    val ch = java.nio.channels.FileChannel.open(
      localFile.toPath, java.nio.file.StandardOpenOption.READ)
    val chunks =
      try {
        val total = n
        (0L until total by rowsPerChunk).map { start =>
          val rows = math.min(rowsPerChunk, total - start)
          ch.map(java.nio.channels.FileChannel.MapMode.READ_ONLY,
            start * rowBytes, rows * rowBytes)
        }.toArray
      } finally ch.close()
    Some(new StoreVectors(ids, chunks, rowsPerChunk.toInt, dim))
  }
}

/** Mmap-backed exact-rerank vectors: binary-search the id, absolute-read
  * the row. Thread-safe (immutable index + absolute buffer reads).
  */
final class StoreVectors private[operators] (
    ids: Array[Long],
    chunks: Array[java.nio.MappedByteBuffer],
    rowsPerChunk: Int,
    val dim: Int) extends graft.operators.VectorSource {

  def size: Int = ids.length

  /** Exact squared L2 to the stored vector for `id` — the identical
    * left-to-right (q−v)² fold as [[AnnPq.sqDist]] and the heap
    * snapshot's rerank, on the identical doubles.
    */
  override def dist(id: Long, q: Array[Double]): Double = {
    val idx = java.util.Arrays.binarySearch(ids, id)
    if (idx < 0)
      throw new IllegalStateException(
        s"vecstore does not contain id $id — the store was built from a " +
          "different corpus than the index")
    val buf = chunks(idx / rowsPerChunk)
    val base = (idx % rowsPerChunk).toLong * 8L * dim
    var d = 0.0
    var i = 0
    while (i < dim) {
      val x = q(i) - buf.getDouble((base + 8L * i).toInt)
      d += x * x
      i += 1
    }
    d
  }
}

package graft.operators

import java.net.URI

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
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
  * SEGMENTED since r15 (r14 verdict #4): the store is a list of
  * independent (ids, vectors) SEGMENT file pairs under
  * `<indexPath>/vecstore/`, committed by `meta.txt` (written last, via
  * write-new-then-rename — the commit marker; a crashed save/append
  * leaves either no meta or the previous one):
  *  - `GRAFTVS2 <n> <dim> <nSegs>` header, then one
  *    `<idsFile> <vecFile> <rows>` line per segment
  *  - each segment: `rows` big-endian longs (STRICTLY ascending within
  *    the segment) + `rows`·dim big-endian doubles, row-major
  *  - v1 stores (`GRAFTVS1`, single `ids.bin`/`vectors.bin` pair) open
  *    unchanged as a one-segment store
  *
  * Why segments: (1) the SAVE becomes distributed — executors write
  * per-range sorted segments in parallel instead of one driver thread
  * streaming the whole corpus (16.7 s at 10M was hours at 1B); (2) an
  * APPEND ([[appendSegment]]) writes one new segment + a meta swap
  * instead of rewriting the n-row sidecar for a 10k batch — the ANN
  * analogue of the clustering store's touched-bucket merge; (3) no
  * single array/file needs to span the corpus, so the open survives past
  * Int.MaxValue TOTAL rows (each segment stays ≤ Int.MaxValue — the
  * per-segment binary-search index is one heap long array).
  *
  * Doubles are stored exactly as the distributed path's
  * `cast("array<double>")` produces them, so a re-rank distance computed
  * from the mapped file is bit-identical to one computed from the heap
  * snapshot or the distributed join (AnnCodesLocalSpec pins it).
  *
  * Reading: per-segment ids load into heap arrays (8 B/row — the
  * binary-search index); vectors are mapped in ≤1 GiB segments aligned
  * to row boundaries. `MappedByteBuffer` absolute reads are thread-safe,
  * so one open store serves a parallel query batch. Non-local
  * filesystems (hdfs/s3a) are first copied to a process-local temp file
  * — the mmap contract needs a local path; at 100 TB that copy is the
  * standard "ship the serving artifact to the serving node" step.
  *
  * [[openStandalone]] opens the store WITHOUT a SparkSession (plain
  * Hadoop FS on a default Configuration — local files, or any scheme on
  * the classpath): the serving-process shape, usable from executor JVMs
  * and standalone servers (r14 verdict #2).
  */
object AnnVecStore {

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(URI.create(path), spark.sparkContext.hadoopConfiguration)

  private def dirOf(path: String) = new HPath(s"$path/vecstore")

  /** One committed segment: file names are vecstore-relative. */
  private final case class SegMeta(idsFile: String, vecFile: String, rows: Long)

  private final case class StoreMeta(n: Long, dim: Int, segs: Seq[SegMeta])

  /** Does a COMMITTED vector store exist under `path`? (meta.txt is the
    * commit marker — a half-written store reads as absent.)
    */
  def exists(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new HPath(s"$path/vecstore/meta.txt"))

  private def readMeta(fs: FileSystem, path: String): Option[StoreMeta] = {
    val metaPath = new HPath(dirOf(path), "meta.txt")
    if (!fs.exists(metaPath)) return None
    val in = fs.open(metaPath)
    val txt =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    val lines = txt.split('\n').toIndexedSeq.map(_.trim).filter(_.nonEmpty)
    val head = lines.head.split("\\s+")
    head(0) match {
      case "GRAFTVS1" =>
        require(head.length == 3, s"unrecognized vecstore meta at $path: '${lines.head}'")
        val n = head(1).toLong
        Some(StoreMeta(n, head(2).toInt,
          if (n == 0) Seq.empty else Seq(SegMeta("ids.bin", "vectors.bin", n))))
      case "GRAFTVS2" =>
        require(head.length == 4, s"unrecognized vecstore meta at $path: '${lines.head}'")
        val segs = lines.tail.map { l =>
          val p = l.split("\\s+")
          require(p.length == 3, s"malformed vecstore segment line at $path: '$l'")
          SegMeta(p(0), p(1), p(2).toLong)
        }
        require(segs.length == head(3).toInt && segs.map(_.rows).sum == head(1).toLong,
          s"vecstore meta at $path is inconsistent with its segment lines")
        Some(StoreMeta(head(1).toLong, head(2).toInt, segs))
      case _ =>
        throw new IllegalArgumentException(
          s"unrecognized vecstore meta at $path: '${lines.head}'")
    }
  }

  /** Commit: write meta_new.txt, rename over meta.txt (atomic on HDFS
    * and local FS — readers see the old complete meta or the new one).
    */
  private def writeMeta(fs: FileSystem, path: String, m: StoreMeta): Unit = {
    val dir = dirOf(path)
    val tmp = new HPath(dir, "meta_new.txt")
    val dest = new HPath(dir, "meta.txt")
    val body = (s"GRAFTVS2 ${m.n} ${m.dim} ${m.segs.length}" +:
      m.segs.map(s => s"${s.idsFile} ${s.vecFile} ${s.rows}"))
      .mkString("", "\n", "\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    fs.delete(dest, false)
    require(fs.rename(tmp, dest), s"vecstore meta commit rename failed at $path")
  }

  /** One segment writer: streams (id, vec) rows to `<stem>.ids.bin` /
    * `<stem>.vec.bin`, enforcing strictly-ascending ids and a uniform
    * dimension. Returns (rows, dim, minId, maxId).
    */
  private def writeSegment(
      fs: FileSystem, dir: HPath, stem: String,
      rows: Iterator[(Long, scala.collection.Seq[Double])],
      dimHint: Int): (Long, Int, Long, Long) = {
    val idsOut = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new HPath(dir, s"$stem.ids.bin"), true), 1 << 20))
    val vecOut = new java.io.BufferedOutputStream(
      fs.create(new HPath(dir, s"$stem.vec.bin"), true), 1 << 20)
    var n = 0L
    var dim = dimHint
    var prev = Long.MinValue
    var minId = Long.MaxValue
    var rowBuf: Array[Byte] = null
    var rowBB: java.nio.ByteBuffer = null
    try {
      rows.foreach { case (id, v) =>
        require(id > prev,
          s"vecstore ids must be unique and sortable: saw $id after $prev")
        prev = id
        if (n == 0L) minId = id
        if (dim < 0) dim = v.length
        if (rowBuf == null) {
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
    (n, math.max(dim, 0), minId, prev)
  }

  /** Write the corpus vectors as the mmap-able rerank sidecar —
    * DISTRIBUTED since r15: one range-sort on the id, then every
    * partition writes its own sorted segment from the executor that
    * holds it (deterministic file names from the partition index, so a
    * task RETRY overwrites its own files — run with speculation off, as
    * any direct-filesystem writer requires), and the driver commits
    * meta.txt last, after verifying the segments chain in strict id
    * order. Ids must be unique (strictly-ascending check while
    * streaming, cross-segment check at commit). Returns rows written.
    *
    * @param targetSegmentBytes split the corpus so each segment's vector
    *   file stays near this size (default 1 GiB) — bounds both the write
    *   task's output and the open's per-segment id array
    */
  def save(
      emb: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      targetSegmentBytes: Long = 1L << 30): Long = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    val dir = dirOf(path)
    // GENERATION-stamped segment names + meta-swap-then-GC (r15 advice):
    // the old save deleted the committed directory before writing, so a
    // torn re-save (incl. compaction over a live store) left NO committed
    // sidecar. Now the previous store survives every crash window — the
    // new generation's files are unreferenced orphans until the meta
    // rename lands, and superseded files are deleted only after it.
    AnnArtifactLock.withLock(fs, dir) {
      val gen = java.util.UUID.randomUUID().toString.take(8)
      val prepared = emb
        .select(col(idCol).cast("long").as("_id"),
          col(vecCol).cast("array<double>").as("_v"))
      val n = prepared.count()
      val committed: Long =
        if (n == 0L) { writeMeta(fs, path, StoreMeta(0L, 0, Seq.empty)); 0L }
        else {
          val dim = prepared.select(size(col("_v"))).limit(1).collect()(0).getInt(0)
          val rowBytes = math.max(8L * dim, 8L)
          val nSegs = math.max(1L,
            math.min((n * rowBytes + targetSegmentBytes - 1) / targetSegmentBytes,
              1L << 16)).toInt
          val confSer = new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration)
          val pathStr = path
          val genLoc = gen
          import spark.implicits._
          val segStats: Array[(Int, Long, Int, Long, Long)] = prepared
            .repartitionByRange(nSegs, col("_id"))
            .sortWithinPartitions(col("_id"))
            .as[(Long, Array[Double])]
            .mapPartitions { it =>
              if (it.isEmpty) Iterator.empty
              else {
                val part = org.apache.spark.TaskContext.getPartitionId()
                val taskFs = FileSystem.get(URI.create(pathStr), confSer.value)
                val (rows, d, lo, hi) = writeSegment(
                  taskFs, new HPath(s"$pathStr/vecstore"), f"seg-$genLoc-p$part%05d",
                  it.map { case (id, v) => (id, v: scala.collection.Seq[Double]) }, -1)
                Iterator.single((part, rows, d, lo, hi))
              }
            }
            .collect()
          val ordered = segStats.sortBy(_._1)
          // cross-segment discipline: range partitions are contiguous in id,
          // so the chain must ascend strictly — a violation means duplicate ids
          ordered.sliding(2).foreach {
            case Array(a, b) =>
              require(a._5 < b._4,
                s"vecstore segments overlap in id space (${a._5} >= ${b._4}) — ids not unique")
            case _ =>
          }
          val dims = ordered.map(_._3).distinct
          require(dims.length == 1 && dims(0) == dim,
            s"ragged embedding dims across segments: ${dims.mkString(",")}")
          // commit n as the rows the segment writers actually persisted
          // (r15 advice: a non-deterministic source frame can make a
          // separate count() job disagree with the write job — the meta
          // must describe the bytes on disk, not the other plan's answer)
          val written = ordered.map(_._2).sum
          writeMeta(fs, path, StoreMeta(written, dim,
            ordered.toIndexedSeq.map(s =>
              SegMeta(f"seg-$genLoc-p${s._1}%05d.ids.bin",
                f"seg-$genLoc-p${s._1}%05d.vec.bin", s._2))))
          written
        }
      // GC superseded files only after the new meta is live; open
      // snapshots keep serving from their mmaps
      val referenced = readMeta(fs, path).map(_.segs)
        .getOrElse(Seq.empty)
        .flatMap(s => Seq(s.idsFile, s.vecFile)).toSet ++
        Set("meta.txt", "commit.lock")
      fs.listStatus(dir).foreach { st =>
        if (st.isFile && !referenced.contains(st.getPath.getName))
          fs.delete(st.getPath, false): Unit
      }
      committed
    }
  }

  /** Fold an embedding BATCH into a committed store as ONE new segment —
    * the incremental-maintenance write (r14 verdict #3): a 10k append
    * writes 10k rows + a meta swap, never rewriting the n-row sidecar.
    * The batch streams through the driver (batch-scale, not
    * corpus-scale), sorted by id, and every batch id is REQUIRED absent
    * from the existing store (checked against the opened id index while
    * streaming — ~µs binary searches). Readers holding the previous open
    * keep serving their snapshot (old segments are immutable; the meta
    * swap is the only mutation). Returns rows appended.
    */
  def appendSegment(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val fs = fsFor(spark, path)
    val dir = dirOf(path)
    AnnArtifactLock.withLock(fs, dir) {
      val meta = readMeta(fs, path).getOrElse(throw new IllegalStateException(
        s"no committed vecstore at $path to append to — run saveVectorStore first"))
      val sorted = batch
        .select(col(idCol).cast("long").as("_id"),
          col(vecCol).cast("array<double>").as("_v"))
        .sort(col("_id"))
      // range-pruned id-uniqueness check (r15 verdict #7): the old path
      // opened the WHOLE store's id index per append — an O(base) read
      // that was the one visible O(n) term in the append wall (10M's
      // 5.5 s vs 4M's 3.6 s). Each segment's id range is its first/last
      // long (two positioned reads); only segments overlapping the
      // batch's [lo, hi] load their ids at all — an append of fresh ids
      // beyond the existing range (the ingest shape) loads ZERO.
      val range = sorted.agg(min(col("_id")), max(col("_id"))).head()
      if (range.isNullAt(0)) 0L
      else {
        val probe = overlapIdProbe(fs, path, meta,
          range.getLong(0), range.getLong(1))
        val stem = s"seg-${java.util.UUID.randomUUID()}"
        val (rows, dim, _, _) = writeSegment(fs, dir, stem,
          sorted.toLocalIterator().asScala.map { r =>
            val id = r.getLong(0)
            require(!probe.contains(id),
              s"vecstore append: id $id already exists in the store at $path — " +
                "appended ids must be new (deletes are tombstones + compaction)")
            (id, r.getSeq[Double](1))
          }, if (meta.n == 0) -1 else meta.dim)
        if (rows == 0L) {
          fs.delete(new HPath(dir, s"$stem.ids.bin"), false)
          fs.delete(new HPath(dir, s"$stem.vec.bin"), false)
          0L
        } else {
          require(meta.n == 0 || dim == meta.dim,
            s"append dim $dim != store dim ${meta.dim} at $path")
          writeMeta(fs, path, StoreMeta(meta.n + rows,
            if (meta.n == 0) dim else meta.dim,
            meta.segs :+ SegMeta(s"$stem.ids.bin", s"$stem.vec.bin", rows)))
          rows
        }
      }
    }
  }

  /** Membership probe over ONLY the segments whose id range overlaps
    * [lo, hi]: per segment, two positioned reads fetch its min/max id;
    * overlapping segments load their sorted id arrays for binary search.
    */
  private final class IdProbe(loaded: Array[Array[Long]]) {
    def contains(id: Long): Boolean = {
      var s = 0
      while (s < loaded.length) {
        val ids = loaded(s)
        if (id >= ids(0) && id <= ids(ids.length - 1) &&
            java.util.Arrays.binarySearch(ids, id) >= 0) return true
        s += 1
      }
      false
    }
  }

  private def overlapIdProbe(
      fs: FileSystem, path: String, meta: StoreMeta,
      lo: Long, hi: Long): IdProbe = {
    val dir = dirOf(path)
    val loaded = meta.segs.filter(_.rows > 0L).flatMap { s =>
      val p = new HPath(dir, s.idsFile)
      val in = fs.open(p)
      val (segLo, segHi) =
        try {
          val first = in.readLong()
          in.seek((s.rows - 1L) * 8L)
          (first, in.readLong())
        } finally in.close()
      if (segHi < lo || segLo > hi) None
      else {
        require(s.rows <= Int.MaxValue,
          s"vecstore segment ${s.idsFile} holds ${s.rows} rows — above the " +
            "per-segment open limit")
        val ids = new Array[Long](s.rows.toInt)
        val in2 = new java.io.DataInputStream(new java.io.BufferedInputStream(
          fs.open(p), 1 << 20))
        try {
          var i = 0
          while (i < ids.length) { ids(i) = in2.readLong(); i += 1 }
        } finally in2.close()
        Some(ids)
      }
    }
    new IdProbe(loaded.toArray)
  }

  /** The stored corpus back as a (idCol, vecCol) DataFrame — one task
    * per segment streaming its flat files (distributed, no driver
    * materialization, no mmap). This is what lets [[AnnIvfPq
    * .compactServingArtifacts]] and [[AnnIvfPq.retrain]] default their
    * corpus to the sidecar instead of making callers re-supply the full
    * embedding table the store already holds. Bit-exact: the files hold
    * the same doubles the save's `cast("array<double>")` produced.
    */
  def toDataFrame(
      spark: SparkSession,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val fs = fsFor(spark, path)
    val meta = readMeta(fs, path).getOrElse(throw new IllegalStateException(
      s"no committed vecstore at $path — run saveVectorStore first"))
    if (meta.segs.isEmpty)
      spark.emptyDataset[(Long, Array[Double])].toDF(idCol, vecCol)
    else {
      val confSer = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      val pathStr = path
      val dim = meta.dim
      val segs = meta.segs.map(s => (s.idsFile, s.vecFile, s.rows))
      spark.sparkContext
        .parallelize(segs, segs.length)
        .flatMap { case (idsF, vecF, rows) =>
          val taskFs = FileSystem.get(URI.create(pathStr), confSer.value)
          val dir = new HPath(s"$pathStr/vecstore")
          val idsIn = new java.io.DataInputStream(new java.io.BufferedInputStream(
            taskFs.open(new HPath(dir, idsF)), 1 << 20))
          val vecIn = new java.io.DataInputStream(new java.io.BufferedInputStream(
            taskFs.open(new HPath(dir, vecF)), 1 << 20))
          new Iterator[(Long, Array[Double])] {
            private var read = 0L
            override def hasNext: Boolean = {
              val h = read < rows
              if (!h) { idsIn.close(); vecIn.close() }
              h
            }
            override def next(): (Long, Array[Double]) = {
              val id = idsIn.readLong()
              val v = new Array[Double](dim)
              var i = 0
              while (i < dim) { v(i) = vecIn.readDouble(); i += 1 }
              read += 1
              (id, v)
            }
          }
        }
        .toDF(idCol, vecCol)
    }
  }

  /** Open the store: per-segment ids into heap arrays, vectors
    * memory-mapped. None when no committed store exists at `path`.
    */
  def open(spark: SparkSession, path: String): Option[StoreVectors] =
    openWith(fsFor(spark, path), path)

  /** [[open]] with NO SparkSession — a default-Configuration Hadoop
    * filesystem (local paths and any scheme on the classpath): the
    * executor-JVM / standalone-serving-process entry point (r14 verdict
    * #2). The mmap + binary-search index is identical to the
    * Spark-session open's.
    */
  def openStandalone(
      path: String,
      conf: Configuration = new Configuration()): Option[StoreVectors] =
    openWith(FileSystem.get(URI.create(path), conf), path)

  private def openWith(fs: FileSystem, path: String): Option[StoreVectors] = {
    val meta = readMeta(fs, path).getOrElse(return None)
    val dir = dirOf(path)
    val segs = meta.segs.map { s =>
      require(s.rows <= Int.MaxValue,
        s"vecstore segment ${s.idsFile} holds ${s.rows} rows — above the " +
          "per-segment open limit; re-save with a smaller targetSegmentBytes")
      // BOTH files mmap a LOCAL copy (direct for file://; remote stores
      // are copied to a process temp first — the artifact-shipping
      // step), in ≤1 GiB windows aligned to row boundaries so no record
      // straddles (shared MmapIo mechanics — the serve pack maps its
      // code segments the same way). Since r16 the ID INDEX is mapped
      // too (it was an 8 B/row heap array — 2.4 GB resident at 300M
      // rows, the last per-row heap term in the serving tier): the
      // binary search runs on page-cache-warm absolute reads, and the
      // open no longer streams the id file at all.
      val idsLocal = MmapIo.localFile(fs, new HPath(dir, s.idsFile))
      val (idChunks, idRowsPerChunk) = MmapIo.mapRows(idsLocal, 8L, s.rows)
      val localFile = MmapIo.localFile(fs, new HPath(dir, s.vecFile))
      val rowBytes = math.max(8L * meta.dim, 8L)
      val (chunks, rowsPerChunk) = MmapIo.mapRows(localFile, rowBytes, s.rows)
      new VecSegment(idChunks, idRowsPerChunk, s.rows.toInt,
        chunks, rowsPerChunk.toInt)
    }
    Some(new StoreVectors(segs.toArray, meta.dim, meta.n))
  }
}

/** One mmap-backed segment: a sorted MAPPED id index plus row-aligned
  * map windows over the vector file (both from page cache — zero
  * per-row heap).
  */
private[operators] final class VecSegment(
    idChunks: Array[java.nio.MappedByteBuffer],
    idRowsPerChunk: Long,
    val n: Int,
    chunks: Array[java.nio.MappedByteBuffer],
    rowsPerChunk: Int) {
  private def idAt(i: Int): Long =
    idChunks((i / idRowsPerChunk).toInt)
      .getLong(((i % idRowsPerChunk) * 8L).toInt)
  def minId: Long = if (n == 0) Long.MaxValue else idAt(0)
  def maxId: Long = if (n == 0) Long.MinValue else idAt(n - 1)
  /** Row position of `id` in this segment, or -1 (binary search over the
    * mapped index — absolute reads, thread-safe).
    */
  def find(id: Long): Int = {
    if (n == 0 || id < idAt(0) || id > idAt(n - 1)) return -1
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = idAt(mid)
      if (v < id) lo = mid + 1
      else if (v > id) hi = mid - 1
      else return mid
    }
    -1
  }
  def sqDistAt(idx: Int, q: Array[Double], dim: Int): Double = {
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
  def vectorAt(idx: Int, dim: Int): Array[Double] = {
    val buf = chunks(idx / rowsPerChunk)
    val base = (idx % rowsPerChunk).toLong * 8L * dim
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = buf.getDouble((base + 8L * i).toInt); i += 1 }
    out
  }
}

/** Mmap-backed exact-rerank vectors over the committed segments:
  * binary-search the id (min/max range check skips non-overlapping
  * segments — base segments are id-disjoint by construction, appends
  * add at most a few more probes), absolute-read the row. Thread-safe
  * (immutable index + absolute buffer reads).
  */
final class StoreVectors private[operators] (
    segs: Array[VecSegment],
    val dim: Int,
    val rowCount: Long) extends graft.operators.VectorSource {

  def size: Long = rowCount

  /** Is `id` present in the store? (the append path's uniqueness check) */
  def contains(id: Long): Boolean = {
    var s = 0
    while (s < segs.length) {
      if (segs(s).find(id) >= 0) return true
      s += 1
    }
    false
  }

  /** The stored doubles for `id` (the drift report's base-sample read).
    * Throws on a foreign id, like [[dist]].
    */
  def vector(id: Long): Array[Double] = {
    var s = 0
    while (s < segs.length) {
      val idx = segs(s).find(id)
      if (idx >= 0) return segs(s).vectorAt(idx, dim)
      s += 1
    }
    throw new IllegalStateException(
      s"vecstore does not contain id $id — the store was built from a " +
        "different corpus than the index")
  }

  /** Exact squared L2 to the stored vector for `id` — the identical
    * left-to-right (q−v)² fold as [[AnnPq.sqDist]] and the heap
    * snapshot's rerank, on the identical doubles.
    */
  override def dist(id: Long, q: Array[Double]): Double = {
    var s = 0
    while (s < segs.length) {
      val idx = segs(s).find(id)
      if (idx >= 0) return segs(s).sqDistAt(idx, q, dim)
      s += 1
    }
    throw new IllegalStateException(
      s"vecstore does not contain id $id — the store was built from a " +
        "different corpus than the index")
  }
}

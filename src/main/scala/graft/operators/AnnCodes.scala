package graft.operators

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Storage behind the local ANN serving tiers' (ids, PQ codes) layout —
  * the r15 verdict's #1: [[AnnLocalCodes]] kept both as single HEAP
  * arrays, which capped the codes tier at `total·m ≤ Int.MaxValue` code
  * bytes (~268M rows at m=8) and charged ~(8+m) B/row of resident heap,
  * even though [[AnnServePack]] already persists exactly these arrays as
  * flat files. Splitting the access path behind [[CodesData]] lets the
  * session-free pack open serve the SAME search loop from memory-MAPPED
  * segments instead: resident footprint ~flat in corpus size (page cache
  * holds the hot lists), total rows a Long — the 100× step past the heap
  * tier, the same move [[AnnVecStore]] made for the rerank vectors.
  *
  * A [[CodesRun]] is one contiguous (ids, codes) row range of a single
  * coarse list, with NO chunk/segment arithmetic inside the accessors —
  * runs are pre-split at every mapping boundary at open time, so the ADC
  * scan's inner loop does pure absolute reads on both tiers (two
  * implementations: JIT-bimorphic, array-speed).
  */
private[operators] trait CodesRun {
  /** Rows in this run. */
  def n: Int
  /** Vector id of row `i` (run-relative). */
  def idAt(i: Int): Long
  /** Code byte `j` of row `i`, as an unsigned int. */
  def codeAt(i: Int, j: Int): Int
}

/** Heap-array run — the [[AnnLocal]]/[[AnnLocalCodes]] tiers' shape. */
private[operators] final class ArrayCodesRun(
    ids: Array[Long], codes: Array[Byte], from: Int,
    override val n: Int, m: Int) extends CodesRun {
  override def idAt(i: Int): Long = ids(from + i)
  override def codeAt(i: Int, j: Int): Int = codes((from + i) * m + j) & 0xFF
}

/** Mmap-backed run over one (ids, codes) buffer pair: absolute reads at
  * fixed byte bases (thread-safe — `MappedByteBuffer` absolute accessors
  * carry no position state).
  */
private[operators] final class MappedCodesRun(
    idBuf: java.nio.MappedByteBuffer, idBase: Int,
    codeBuf: java.nio.MappedByteBuffer, codeBase: Int,
    override val n: Int, m: Int) extends CodesRun {
  override def idAt(i: Int): Long = idBuf.getLong(idBase + 8 * i)
  override def codeAt(i: Int, j: Int): Int =
    codeBuf.get(codeBase + m * i + j) & 0xFF
}

/** The per-list access the [[AnnLocalIndex]] search loop needs. */
private[operators] trait CodesData {
  /** Total rows (physical — tombstoned rows included until compaction). */
  def size: Long
  /** The runs of coarse list `cid` (empty array when the list is absent). */
  def runsOf(cid: Int): Array[CodesRun]
}

/** Heap layout: per-list-contiguous flat arrays (the [[AnnLocal]] /
  * [[AnnLocalCodes]] snapshot shape — one run per list).
  */
private[operators] final class HeapCodes(
    listIndex: Map[Int, Int],
    offsets: Array[Int],
    ids: Array[Long],
    codes: Array[Byte],
    m: Int) extends CodesData {
  override def size: Long = ids.length.toLong
  private val empty = Array.empty[CodesRun]
  override def runsOf(cid: Int): Array[CodesRun] = listIndex.get(cid) match {
    case Some(li) =>
      Array[CodesRun](new ArrayCodesRun(
        ids, codes, offsets(li), offsets(li + 1) - offsets(li), m))
    case None => empty
  }
}

/** Mapped layout over a committed [[AnnServePack]]: the base snapshot's
  * per-list row ranges resolve into pre-split [[MappedCodesRun]]s over
  * the pack's segment files; delta appends ride as a small heap OVERLAY
  * (per-list-grouped arrays — O(appended) heap, folded away by
  * compaction). Intra-list row order is irrelevant to results (the
  * search loop scans whole probed lists and ranks by (dist, id)), so
  * base runs + overlay run answer bit-identically to the heap tier.
  */
private[operators] final class MappedCodes(
    override val size: Long,
    baseRuns: Map[Int, Array[CodesRun]],
    overlay: Option[HeapCodes]) extends CodesData {
  private val empty = Array.empty[CodesRun]
  override def runsOf(cid: Int): Array[CodesRun] = {
    val base = baseRuns.getOrElse(cid, empty)
    overlay match {
      case Some(ov) =>
        val o = ov.runsOf(cid)
        if (o.isEmpty) base else base ++ o
      case None => base
    }
  }
}

/** Shared mmap mechanics (localize-then-map) for the flat serving
  * artifacts — the [[AnnVecStore]] segment discipline, factored out so
  * the serve pack's mapped open reuses it byte-for-byte: mmap needs a
  * LOCAL file, so non-`file:` schemes are first copied to a process-local
  * temp (at 100 TB that copy is the standard "ship the serving artifact
  * to the serving node" step).
  */
private[graft] object MmapIo {

  def localFile(fs: FileSystem, p: HPath): java.io.File =
    if (fs.getScheme == "file")
      new java.io.File(fs.makeQualified(p).toUri.getPath)
    else {
      val tmp = java.io.File.createTempFile("graft_mmap", ".bin")
      tmp.deleteOnExit()
      fs.copyToLocalFile(false, p, new HPath(tmp.getAbsolutePath), true)
      tmp
    }

  /** Test-only window-size override: lets specs force multi-window maps
    * (and the run-splitting they require) at kilobyte scale, so the
    * >2 GB code path is covered without multi-GB fixtures. Production
    * never changes it.
    */
  private[graft] var chunkBytes: Long = 1L << 30

  /** Map a whole file read-only as ≤1 GiB windows aligned to `rowBytes`
    * boundaries (no record straddles a window). Returns the windows plus
    * rows-per-window.
    */
  def mapRows(file: java.io.File, rowBytes: Long, rows: Long)
      : (Array[java.nio.MappedByteBuffer], Long) = {
    val rowsPerChunk = math.max(1L, chunkBytes / rowBytes)
    val ch = java.nio.channels.FileChannel.open(
      file.toPath, java.nio.file.StandardOpenOption.READ)
    val chunks =
      try {
        (0L until rows by rowsPerChunk).map { start =>
          val n = math.min(rowsPerChunk, rows - start)
          ch.map(java.nio.channels.FileChannel.MapMode.READ_ONLY,
            start * rowBytes, n * rowBytes)
        }.toArray
      } finally ch.close()
    (chunks, rowsPerChunk)
  }

  def fsOf(path: String, conf: org.apache.hadoop.conf.Configuration): FileSystem =
    FileSystem.get(URI.create(path), conf)
}

/** Create-exclusive writer fence for the flat serving artifacts' meta
  * swaps (r15 advice: [[AnnServePack.appendDelta]] and
  * [[AnnVecStore.appendSegment]] were unguarded read-modify-writes of
  * meta.txt — two concurrent appends could both read the same meta and
  * the second commit silently dropped the first's line). The fence is
  * the [[graft.cluster.IndexStore]] discipline at its cheapest: create
  * `commit.lock` with no-overwrite, run the body, delete the lock. A
  * crashed writer leaves a stale lock that fails LOUDLY with the remedy
  * named (single-writer admin deletes it) — never a silent lost update.
  * Same atomicity caveat as the store's CAS: object stores need
  * conditional writes for create-no-overwrite to be atomic.
  */
private[operators] object AnnArtifactLock {

  def withLock[A](fs: FileSystem, dir: HPath)(body: => A): A = {
    val lock = new HPath(dir, "commit.lock")
    if (!fs.exists(dir)) { fs.mkdirs(dir); () }
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException if fs.exists(lock) =>
          throw new IllegalStateException(
            s"another writer holds $lock — serving-artifact mutations are " +
              "single-writer. If no writer is live (a crashed commit left " +
              s"the lock), delete the lock file and retry. ($e)")
      }
    try out.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    finally out.close()
    try body
    finally { fs.delete(lock, false); () }
  }
}

package graft.operators

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** The SESSION-FREE serving artifact (r14 verdict #2): everything the
  * codes-resident tier needs — coarse centroids, PQ codebooks, the
  * per-list-grouped (ids, codes) layout, the encoding variant, and the
  * persisted calibration — serialized as flat binary files under
  * `<indexPath>/servepack/`, openable with NO SparkSession ([[open]]
  * reads plain files; the exact-rerank vectors come from the
  * [[AnnVecStore]] sidecar's own session-free open). This is what takes
  * the `graft_ann_serve` SQL tier past the one-JVM boundary: an executor
  * (or a standalone serving process) that can reach the shipped artifact
  * directory opens the identical snapshot the driver would — same
  * arrays, same search loop, row-identical answers (AnnServeSqlSpec /
  * AnnCodesLocalSpec pin it).
  *
  * Write once at build time ([[save]], right after
  * `AnnIvfPq.saveIndex` + `saveVectorStore` + `saveCalibration`); the
  * pack is derived state — a re-saved index simply re-saves the pack.
  * `meta.txt` commits last (write-new-then-rename), so a crashed save
  * reads as absent and the registry falls back to the Spark-read open.
  *
  * Layout (all big-endian, as DataOutputStream writes):
  *  - `centroids.bin` — int count, then per centroid: int id +
  *    dim doubles
  *  - `codebooks.bin` — ints m, k, dsub, then m·k·dsub doubles
  *  - `lists.bin`     — int nLists, nLists int list-ids, (nLists+1)
  *    int offsets (the [[AnnLocalIndex]] per-list grouping)
  *  - `ids.bin`       — total longs, grouped per list
  *  - `codes.bin`     — total·m bytes, grouped per list
  *  - `meta.txt`      — `GRAFTSP1 <total> <dim> <m> <residual>` then
  *    `cal <targetRecall> <nprobe> <refine> <measuredRecall>
  *    <corpusSize> <topK> <metTarget> <epoch>` or `nocal`, then zero or
  *    more `delta <file> <rows>` lines
  *
  * DELTAS (r14 verdict #3): an [[AnnIvfPq.appendVectors]] batch lands as
  * one `delta-<uuid>.bin` file — `rows` × (long id, int list, m code
  * bytes) — plus a meta swap: O(batch) write, never a pack rebuild.
  * [[open]] merges base + deltas into the per-list layout in memory (an
  * O(n) copy the open already pays in reads); intra-list row order is
  * irrelevant to results — the search loop scans whole probed lists and
  * ranks by (dist, id).
  */
object AnnServePack {

  private def dirOf(path: String) = new HPath(s"$path/servepack")

  /** Does a committed serve pack exist under `path`? */
  def exists(conf: Configuration, path: String): Boolean =
    FileSystem.get(URI.create(path), conf)
      .exists(new HPath(dirOf(path), "meta.txt"))

  /** Build + persist the pack from a `saveIndex`'d index whose path
    * carries a committed vecstore sidecar. Driver-side, Spark-reading
    * (build time — the pack exists so SERVING never needs a session).
    * Returns the packed row count.
    */
  def save(
      spark: SparkSession,
      path: String,
      maxRows: Long = 20000000L): Long = {
    require(AnnVecStore.exists(spark, path),
      s"no vecstore sidecar at $path — the pack's rerank tier needs it; " +
        "run AnnIvfPq.saveVectorStore first")
    val (coded, centroids, codebooks) = AnnIvfPq.loadIndex(spark, path)
    val residual = AnnIvfPq.isResidual(spark, path)
    val ix = AnnLocalCodes.open(spark, path, coded, centroids, codebooks,
      maxRows = maxRows, residual = residual).getOrElse(
      throw new IllegalStateException(
        s"index at $path exceeds maxRows=$maxRows — a serve pack is the " +
          "codes-resident tier's artifact; raise maxRows or serve distributed"))
    val cal = AnnIvfPq.loadCalibration(spark, path)
    val fs = FileSystem.get(
      URI.create(path), spark.sparkContext.hadoopConfiguration)
    write(fs, path, ix, cal)
    ix.ids.length.toLong
  }

  private def write(
      fs: FileSystem, path: String, ix: AnnLocalIndex,
      cal: Option[AnnCalibration]): Unit = {
    val dir = dirOf(path)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    def out(name: String) = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(new HPath(dir, name), true), 1 << 20))
    locally {
      val o = out("centroids.bin")
      try {
        o.writeInt(ix.cents.length)
        ix.cents.foreach { case (cid, cv) =>
          o.writeInt(cid)
          o.writeInt(cv.length)
          cv.foreach(o.writeDouble)
        }
      } finally o.close()
    }
    locally {
      val o = out("codebooks.bin")
      try {
        val m = ix.codebooks.length
        val k = ix.codebooks(0).length
        val dsub = ix.codebooks(0)(0).length
        o.writeInt(m); o.writeInt(k); o.writeInt(dsub)
        ix.codebooks.foreach(_.foreach { cv =>
          require(cv.length == dsub, "ragged codebook")
          cv.foreach(o.writeDouble)
        })
      } finally o.close()
    }
    locally {
      val o = out("lists.bin")
      try {
        val listIds = ix.listIndex.toSeq.sortBy(_._2).map(_._1)
        o.writeInt(listIds.length)
        listIds.foreach(o.writeInt)
        ix.offsets.foreach(o.writeInt)
      } finally o.close()
    }
    locally {
      val o = out("ids.bin")
      try ix.ids.foreach(o.writeLong)
      finally o.close()
    }
    locally {
      val o = out("codes.bin")
      try o.write(ix.codes)
      finally o.close()
    }
    // meta LAST, rename-committed
    val calLine = cal match {
      case Some(c) =>
        s"cal ${c.targetRecall} ${c.nprobe} ${c.refine} ${c.measuredRecall} " +
          s"${c.corpusSize} ${c.topK} ${c.metTarget} ${c.epoch}"
      case None => "nocal"
    }
    commitMeta(fs, path, Seq(
      s"GRAFTSP1 ${ix.ids.length} ${ix.dim} ${ix.m} ${ix.residual}", calLine))
  }

  private def commitMeta(
      fs: FileSystem, path: String, lines: Seq[String]): Unit = {
    val dir = dirOf(path)
    val tmp = new HPath(dir, "meta_new.txt")
    val o = fs.create(tmp, true)
    try o.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally o.close()
    val dest = new HPath(dir, "meta.txt")
    fs.delete(dest, false)
    require(fs.rename(tmp, dest), s"servepack meta commit rename failed at $path")
  }

  /** Fold an already-assigned-and-encoded batch into the pack as one
    * delta file + a meta swap — O(batch), no pack rebuild (the
    * [[AnnIvfPq.appendVectors]] step). `codedBatch` is the (idCol,
    * _centroid, codes) frame the append wrote to the coded table; it
    * streams through the driver (batch-scale). Returns rows written.
    */
  def appendDelta(
      spark: SparkSession,
      path: String,
      codedBatch: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id"): Long = {
    import org.apache.spark.sql.functions.col
    val fs = FileSystem.get(
      URI.create(path), spark.sparkContext.hadoopConfiguration)
    val dir = dirOf(path)
    val metaPath = new HPath(dir, "meta.txt")
    require(fs.exists(metaPath),
      s"no committed servepack at $path to append to — run AnnServePack.save")
    val metaLines = readLines(fs, metaPath)
    val m = metaLines.head.split("\\s+")(3).toInt
    val name = s"delta-${java.util.UUID.randomUUID()}.bin"
    val o = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new HPath(dir, name), true), 1 << 20))
    var rows = 0L
    try {
      import scala.jdk.CollectionConverters._
      codedBatch
        .select(col(idCol).cast("long"), col("_centroid").cast("int"),
          col("codes").cast("array<int>"))
        .toLocalIterator().asScala.foreach { r =>
          o.writeLong(r.getLong(0))
          o.writeInt(r.getInt(1))
          val cs = r.getSeq[Int](2)
          require(cs.length == m, s"delta codes length ${cs.length} != m=$m")
          var j = 0
          while (j < m) { o.writeByte(cs(j)); j += 1 }
          rows += 1
        }
    } finally o.close()
    if (rows == 0L) { fs.delete(new HPath(dir, name), false); return 0L }
    commitMeta(fs, path, metaLines :+ s"delta $name $rows")
    rows
  }

  private def readLines(fs: FileSystem, p: HPath): Seq[String] = {
    val in = fs.open(p)
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      .split('\n').toIndexedSeq.map(_.trim).filter(_.nonEmpty)
    finally in.close()
  }

  /** Open the pack with NO SparkSession: flat-file reads for the codes
    * snapshot, the vecstore's session-free open for the rerank mmaps.
    * None when no committed pack exists. The returned index is the SAME
    * class every serve tier runs — identical search loop, identical
    * answers.
    */
  def open(
      path: String,
      conf: Configuration = new Configuration()
  ): Option[(AnnLocalIndex, Option[AnnCalibration])] = {
    val fs = FileSystem.get(URI.create(path), conf)
    val dir = dirOf(path)
    val metaPath = new HPath(dir, "meta.txt")
    if (!fs.exists(metaPath)) return None
    val metaLines = {
      val in = fs.open(metaPath)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split('\n').toIndexedSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    }
    val head = metaLines.head.split("\\s+")
    require(head.length == 5 && head(0) == "GRAFTSP1",
      s"unrecognized servepack meta at $path: '${metaLines.head}'")
    val total = head(1).toInt
    val m = head(3).toInt
    val residual = head(4).toBoolean
    val cal: Option[AnnCalibration] = metaLines(1).split("\\s+") match {
      case Array("nocal") => None
      case Array("cal", tr, np, rf, mr, cs, tk, mt, ep) =>
        Some(AnnCalibration(tr.toDouble, np.toInt, rf.toInt, mr.toDouble,
          cs.toLong, ep, topK = tk.toInt, metTarget = mt.toBoolean))
      case other => throw new IllegalStateException(
        s"malformed servepack calibration line at $path: '${other.mkString(" ")}'")
    }
    val deltaMetas: Seq[(String, Int)] = metaLines.drop(2).map { l =>
      val p = l.split("\\s+")
      require(p.length == 3 && p(0) == "delta",
        s"malformed servepack delta line at $path: '$l'")
      (p(1), p(2).toInt)
    }
    def in(name: String) = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(new HPath(dir, name)), 1 << 20))
    val cents = {
      val i = in("centroids.bin")
      try {
        val n = i.readInt()
        Array.fill(n) {
          val cid = i.readInt()
          val d = i.readInt()
          val cv = new Array[Double](d)
          var j = 0
          while (j < d) { cv(j) = i.readDouble(); j += 1 }
          (cid, cv)
        }
      } finally i.close()
    }
    val codebooks = {
      val i = in("codebooks.bin")
      try {
        val mm = i.readInt(); val k = i.readInt(); val dsub = i.readInt()
        require(mm == m, s"servepack codebooks m=$mm != meta m=$m at $path")
        Array.fill(mm)(Array.fill(k) {
          val cv = new Array[Double](dsub)
          var j = 0
          while (j < dsub) { cv(j) = i.readDouble(); j += 1 }
          cv
        })
      } finally i.close()
    }
    val (listIndex, offsets) = {
      val i = in("lists.bin")
      try {
        val nLists = i.readInt()
        val listIds = Array.fill(nLists)(i.readInt())
        val offs = Array.fill(nLists + 1)(i.readInt())
        require(offs(nLists) == total,
          s"servepack offsets end at ${offs(nLists)}, expected $total at $path")
        (listIds.zipWithIndex.toMap, offs)
      } finally i.close()
    }
    val ids = {
      val i = in("ids.bin")
      try Array.fill(total)(i.readLong())
      finally i.close()
    }
    val codes = {
      val i = in("codes.bin")
      try {
        val b = new Array[Byte](total * m)
        i.readFully(b)
        b
      } finally i.close()
    }
    // fold deltas into the per-list layout (O(n) in-memory copy; see
    // the DELTAS section of the class doc)
    val (mListIndex, mOffsets, mIds, mCodes) =
      if (deltaMetas.isEmpty) (listIndex, offsets, ids, codes)
      else {
        val dIds = Array.newBuilder[Long]
        val dLists = Array.newBuilder[Int]
        val dCodes = Array.newBuilder[Byte]
        deltaMetas.foreach { case (name, rows) =>
          val i = in(name)
          try {
            var r = 0
            while (r < rows) {
              dIds += i.readLong()
              dLists += i.readInt()
              var j = 0
              while (j < m) { dCodes += i.readByte(); j += 1 }
              r += 1
            }
          } finally i.close()
        }
        merge(listIndex, offsets, ids, codes,
          dIds.result(), dLists.result(), dCodes.result(), m)
      }
    val vecs = AnnVecStore.openStandalone(path, conf).getOrElse(
      throw new IllegalStateException(
        s"servepack at $path has no committed vecstore sidecar beside it — " +
          "the exact-rerank tier cannot open; re-run saveVectorStore + " +
          "AnnServePack.save"))
    Some((new AnnLocalIndex(cents, mListIndex, mOffsets, mIds, mCodes, vecs,
      codebooks, residual, vecs.dim, m), cal))
  }

  /** Rebuild the per-list-contiguous layout over base + delta rows. */
  private def merge(
      listIndex: Map[Int, Int], offsets: Array[Int],
      ids: Array[Long], codes: Array[Byte],
      dIds: Array[Long], dLists: Array[Int], dCodes: Array[Byte], m: Int
  ): (Map[Int, Int], Array[Int], Array[Long], Array[Byte]) = {
    val totalL = ids.length.toLong + dIds.length.toLong
    require(totalL <= Int.MaxValue && totalL * m <= Int.MaxValue,
      s"servepack with deltas holds $totalL rows x $m code bytes — above " +
        "the flat-array open limit; rebuild and serve distributed")
    val baseLists = listIndex.toSeq.sortBy(_._2).map(_._1)
    val counts = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    baseLists.zipWithIndex.foreach { case (l, li) =>
      counts(l) = offsets(li + 1) - offsets(li)
    }
    dLists.foreach(l => counts(l) = counts.getOrElse(l, 0) + 1)
    val newLists = counts.keys.toArray.sorted
    val newIndex = newLists.zipWithIndex.toMap
    val newOffsets = new Array[Int](newLists.length + 1)
    newLists.zipWithIndex.foreach { case (l, i) =>
      newOffsets(i + 1) = newOffsets(i) + counts(l)
    }
    val cursor = newOffsets.clone()
    val outIds = new Array[Long](totalL.toInt)
    val outCodes = new Array[Byte](totalL.toInt * m)
    baseLists.zipWithIndex.foreach { case (l, li) =>
      val from = offsets(li)
      val n = offsets(li + 1) - from
      val to = cursor(newIndex(l))
      System.arraycopy(ids, from, outIds, to, n)
      System.arraycopy(codes, from * m, outCodes, to * m, n * m)
      cursor(newIndex(l)) = to + n
    }
    var i = 0
    while (i < dIds.length) {
      val to = cursor(newIndex(dLists(i)))
      cursor(newIndex(dLists(i))) = to + 1
      outIds(to) = dIds(i)
      System.arraycopy(dCodes, i * m, outCodes, to * m, m)
      i += 1
    }
    (newIndex, newOffsets, outIds, outCodes)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.functions._

/** One local ANN answer row — mirrors [[AnnIvfPq.search]]'s output
  * (query_id is the caller's own key; dist is squared L2; rk is 1-based).
  */
final case class AnnHit(neighborId: Long, dist: Double, rk: Long)

/** Where [[AnnLocalIndex]]'s exact re-rank reads its vectors from: the
  * in-heap snapshot ([[HeapVectors]] — the full-local tier) or the
  * mmap-backed [[StoreVectors]] sidecar (the codes-resident tier, r13
  * verdict #3). Both compute the identical left-to-right (q−v)² fold on
  * the identical doubles, so the tier choice can never change a result.
  */
private[operators] trait VectorSource {
  def dist(id: Long, q: Array[Double]): Double
}

private[operators] final class HeapVectors(
    ids: Array[Long], vecs: Array[Double], dim: Int) extends VectorSource {
  // id → row position (built once: only the re-rank needs it)
  private val posById: java.util.HashMap[java.lang.Long, Integer] = {
    val h = new java.util.HashMap[java.lang.Long, Integer](ids.length * 2)
    var p = 0
    while (p < ids.length) { h.put(ids(p), p); p += 1 }
    h
  }
  override def dist(id: Long, q: Array[Double]): Double = {
    val base = posById.get(id).intValue() * dim
    var d = 0.0
    var i = 0
    while (i < dim) { val x = q(i) - vecs(base + i); d += x * x; i += 1 }
    d
  }
}

/** Driver-local IVF+PQ serving — the ANN analogue of the clustering
  * side's `getClustersLocal` (r11 verdict #4): the distributed
  * [[AnnIvfPq.search]] answers a 60-row probe batch in ~6 s at 10M
  * because every query pays the Spark JOB floor (plan + schedule +
  * shuffle-read), not because the ADC arithmetic is slow. Under a row
  * cap, the probed structures — centroids, per-list PQ codes, and the
  * original vectors for the exact re-rank — fit driver primitive arrays,
  * and a single query is then pure in-process arithmetic: probe
  * selection over k centroids, one ADC table per probed list, m lookups
  * per candidate, an exact re-rank of the topK·refine shortlist —
  * ms-scale instead of job-scale (the reference's whole value
  * proposition is this interactive latency; `benchmarks/run.ts:38-42`
  * measures exactly this loop shape on the clustering side).
  *
  * ROW-FOR-ROW PARITY with the distributed fast path (exactScores=false)
  * is a spec'd contract, not an aspiration: every scalar here replays a
  * distributed kernel exactly — probe cosine is [[graft.functions
  * .DoubleDotProduct]]'s left-to-right IEEE fold with the NaN→-2.0
  * guard, ADC table entries are [[AnnPq.sqDist]]'s zip_with fold, the
  * candidate total is [[graft.functions.AdcDistance]]'s j-order sum,
  * the re-rank distance is the same sqDist, and every ordering uses
  * Spark's SQL double comparator (`SQLOrderingUtil.compareDoubles`) with
  * the same (score, neighbor_id) tie-breaks. AnnLocalSpec pins equality
  * against [[AnnIvfPq.search]] on both encodings.
  *
  * THE CAP IS THE CONTRACT (same shape as the clustering serve
  * snapshot): [[AnnLocal.open]] refuses corpora above `maxRows` —
  * vectors dominate the snapshot (n·dim doubles; 1M rows at dim 16 ≈
  * 128 MB + 8 MB byte-packed codes). ABOVE this cap the next tier is
  * [[AnnLocalCodes.open]] — codes resident, vectors mmap'd from the
  * [[AnnVecStore]] sidecar (r13 verdict #3) — and only past THAT cap is
  * the distributed path the answer.
  */
object AnnLocal {

  /** Snapshot the composed index into driver arrays, or None when the
    * corpus exceeds `maxRows` (the caller falls back to
    * [[AnnLocalCodes]] or the distributed [[AnnIvfPq.search]] —
    * cap-checked BEFORE any collect so an over-cap open never
    * materializes driver memory).
    *
    * @param residual `coded` carries residual codes ([[AnnIvfPq
    *   .encodeResidual]]) — searches build per-probed-list ADC tables on
    *   the query's residual, exactly like the distributed residual branch
    */
  def open(
      coded: DataFrame,
      centroids: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxRows: Long = 2000000L,
      residual: Boolean = false): Option[AnnLocalIndex] = {
    val n = coded.count()
    if (n > maxRows) return None
    val cents = collectCentroids(centroids)
    val m = codebooks.length
    requireByteCodes(codebooks)
    // one collect: (id, list, codes, vector) — float vectors widen to
    // double exactly as the distributed casts do
    val rows = coded
      .select(col(idCol).cast("long").as("_id"), col("_centroid").cast("int"),
        col("codes").cast("array<int>"))
      .join(emb.select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v")), Seq("_id"))
      .collect()
    val dim = if (rows.isEmpty) 0 else rows.head.getSeq[Double](3).length
    // group by list: contiguous id/code/vector arrays per list
    val byList = rows.groupBy(_.getInt(1))
    val listIds = byList.keys.toArray.sorted
    val listIndex = listIds.zipWithIndex.toMap
    val offsets = new Array[Int](listIds.length + 1)
    listIds.zipWithIndex.foreach { case (l, i) =>
      offsets(i + 1) = offsets(i) + byList(l).length
    }
    val ids = new Array[Long](rows.length)
    val codes = new Array[Byte](rows.length * m)
    val vecs = new Array[Double](rows.length * dim)
    listIds.zipWithIndex.foreach { case (l, li) =>
      var p = offsets(li)
      byList(l).foreach { r =>
        ids(p) = r.getLong(0)
        val cs = r.getSeq[Int](2)
        var j = 0
        while (j < m) { codes(p * m + j) = cs(j).toByte; j += 1 }
        val v = r.getSeq[Double](3)
        var i = 0
        while (i < dim) { vecs(p * dim + i) = v(i); i += 1 }
        p += 1
      }
    }
    Some(new AnnLocalIndex(cents,
      new HeapCodes(listIndex, offsets, ids, codes, m),
      new HeapVectors(ids, vecs, dim), codebooks, residual, dim, m))
  }

  private[operators] def collectCentroids(
      centroids: DataFrame): Array[(Int, Array[Double])] =
    centroids
      .select(col("_c").cast("int"), col("_cv").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  private[operators] def requireByteCodes(
      codebooks: Array[Array[Array[Double]]]): Unit =
    require(codebooks(0).length <= 256,
      s"local serving packs PQ codes as bytes: k=${codebooks(0).length} > 256")
}

/** The codes-resident local tier (r13 verdict #3): snapshot ONLY the
  * centroids + byte-packed PQ codes + ids (≈ (8+m) B/row — 10M rows at
  * m=8 ≈ 160 MB driver memory), answer the ADC shortlist in-process, and
  * exact-rerank from the memory-mapped [[AnnVecStore]] sidecar (the
  * shortlist is ≤ topK·refine random row reads — page-cache-warm
  * microseconds). Row-for-row equal to [[AnnLocal]] and the distributed
  * search at the same knobs: the search loop IS [[AnnLocalIndex]], only
  * the rerank's [[VectorSource]] differs, and both sources read the
  * identical doubles. This is what keeps INTERACTIVE serving alive at
  * 10M+ rows, where the full-vector snapshot would blow the heap and
  * every query otherwise pays the ~14 s distributed-job floor.
  *
  * CAPACITY (r14 verdict #4 — the ceilings, stated with the math): the
  * sidecar itself no longer caps (GRAFTVS2 segments are independently
  * ≤ Int.MaxValue rows each; total rows are a Long). The CODES snapshot
  * holds two flat arrays — `ids: Array[Long]` (8 B/row) and
  * `codes: Array[Byte]` (m B/row) — so its hard ceiling is
  * `total ≤ Int.MaxValue/m` rows (m=8 → ~268M rows ≈ 2.1 GB codes +
  * 2.1 GB ids), guarded with a loud over-cap error (Long arithmetic —
  * r14 advice). The default `maxRows` = 20M (~320 MB at m=8) is a heap
  * BUDGET, raisable to the hard ceiling on a big-memory serving node.
  * PAST that ceiling the answer is no longer "serve distributed": the
  * [[AnnServePack]] MAPPED open (r15 verdict #1) runs this same search
  * loop over mmap'd segments — total rows a Long, resident heap ~flat —
  * so build the pack and open through it instead of this Spark-read
  * heap snapshot.
  */
object AnnLocalCodes {

  /** Open the codes tier over a [[AnnIvfPq.saveIndex]]'d index whose
    * path also carries an [[AnnVecStore.save]]'d sidecar. None when the
    * corpus exceeds `maxRows` or no committed vecstore exists.
    * The codes collect is PACKED per partition (primitive arrays, not
    * Row objects), so the driver transient is ~the final footprint.
    */
  def open(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      coded: DataFrame,
      centroids: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id",
      maxRows: Long = 20000000L,
      residual: Boolean = false): Option[AnnLocalIndex] = {
    val n = coded.count()
    if (n > maxRows) return None
    val vecs = AnnVecStore.open(spark, path).getOrElse { return None }
    val cents = AnnLocal.collectCentroids(centroids)
    val m = codebooks.length
    AnnLocal.requireByteCodes(codebooks)
    import spark.implicits._
    // compact collect: one (ids, lists, codes) triple per partition
    val packed: Array[(Array[Long], Array[Int], Array[Byte])] = coded
      .select(col(idCol).cast("long"), col("_centroid").cast("int"),
        col("codes").cast("array<int>"))
      .as[(Long, Int, Array[Int])]
      .mapPartitions { it =>
        val idsB = Array.newBuilder[Long]
        val listsB = Array.newBuilder[Int]
        val codesB = Array.newBuilder[Byte]
        it.foreach { case (id, l, cs) =>
          idsB += id
          listsB += l
          var j = 0
          while (j < cs.length) { codesB += cs(j).toByte; j += 1 }
        }
        Iterator.single((idsB.result(), listsB.result(), codesB.result()))
      }
      .collect()
    // Long arithmetic (r14 advice): a raised maxRows can admit corpora
    // whose id or code BYTE counts overflow Int — fail with the cap
    // named instead of a NegativeArraySizeException / corrupt packing
    val totalL = packed.iterator.map(_._1.length.toLong).sum
    require(totalL <= Int.MaxValue && totalL * m <= Int.MaxValue,
      s"codes tier cannot hold $totalL rows x $m code bytes in flat " +
        s"arrays (limit ${Int.MaxValue} of each) — lower codesServeCap " +
        "or serve this corpus distributed")
    val total = totalL.toInt
    // counting sort by list id → contiguous per-list layout
    val counts = new java.util.HashMap[Integer, Integer]()
    packed.foreach { case (_, lists, _) =>
      var i = 0
      while (i < lists.length) {
        counts.merge(lists(i), 1, (a, b) => a + b); i += 1
      }
    }
    val listIds = {
      val arr = new Array[Int](counts.size)
      val it = counts.keySet().iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      arr
    }
    val listIndex = listIds.zipWithIndex.toMap
    val offsets = new Array[Int](listIds.length + 1)
    listIds.zipWithIndex.foreach { case (l, i) =>
      offsets(i + 1) = offsets(i) + counts.get(l)
    }
    val cursor = offsets.clone()
    val ids = new Array[Long](total)
    val codes = new Array[Byte](total * m)
    packed.foreach { case (pIds, pLists, pCodes) =>
      var i = 0
      while (i < pIds.length) {
        val li = listIndex(pLists(i))
        val p = cursor(li)
        cursor(li) = p + 1
        ids(p) = pIds(i)
        System.arraycopy(pCodes, i * m, codes, p * m, m)
        i += 1
      }
    }
    Some(new AnnLocalIndex(cents,
      new HeapCodes(listIndex, offsets, ids, codes, m), vecs,
      codebooks, residual, vecs.dim, m))
  }
}

/** The in-process index the local tiers build — an immutable
  * [[CodesData]] layout (heap arrays, or mmap'd pack segments since r16)
  * plus a [[VectorSource]] for the exact re-rank; safe for concurrent
  * queries from many threads. `tombs` is the sorted tombstoned-id set
  * ([[AnnIvfPq.deleteVectors]]): the scan skips those rows, so a mapped
  * open whose base files physically contain deleted rows answers
  * identically to a rebuild on the surviving corpus (compaction folds
  * them away physically).
  */
final class AnnLocalIndex private[operators] (
    private[operators] val cents: Array[(Int, Array[Double])],
    private[operators] val data: CodesData,
    vsrc: VectorSource,
    private[operators] val codebooks: Array[Array[Array[Double]]],
    val residual: Boolean,
    val dim: Int,
    private[operators] val m: Int,
    private[operators] val tombs: Array[Long] = Array.emptyLongArray) {

  /** Snapshot size in PHYSICAL rows (tombstoned rows counted until a
    * compaction removes them — this is the heap/page-cache budget the
    * serve caps meter).
    */
  def size: Long = data.size

  private val dsub = codebooks(0)(0).length
  private val k = codebooks(0).length

  // DoubleDotProduct's fold, then the probe guard: NaN (0/0 or NaN
  // input) → -2.0, exactly AnnIvf.approxCosine
  private def cosGuarded(q: Array[Double], qn: Double, cv: Array[Double]): Double = {
    var d = 0.0; var cc = 0.0
    var i = 0
    while (i < cv.length) { d += q(i) * cv(i); cc += cv(i) * cv(i); i += 1 }
    val s = d / (qn * math.sqrt(cc))
    if (s.isNaN) -2.0 else s
  }

  /** ADC table for base vector `b` (the query, or its residual to the
    * probed list): table(j)(c) = AnnPq.sqDist(subvec(b, j), cb(j)(c)) —
    * the identical left-to-right (x−y)² fold.
    */
  private def adcTable(b: Array[Double]): Array[Array[Double]] = {
    val tab = Array.ofDim[Double](m, k)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val off = j * dsub
      var c = 0
      while (c < k) {
        val cv = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) { val x = b(off + i) - cv(i); d += x * x; i += 1 }
        tab(j)(c) = d
        c += 1
      }
      j += 1
    }
    tab
  }

  /** Top-`topK` neighbours of `query` — row-for-row equal to the
    * distributed [[AnnIvfPq.search]] at the same knobs (AnnLocalSpec).
    * `queryId` excludes the query's own row when it lives in the corpus
    * (the distributed `query_id =!= neighbor_id` filter); pass the
    * default for external query vectors.
    */
  def search(
      query: Array[Double],
      nprobe: Int,
      topK: Int = 3,
      refine: Int = 100,
      queryId: Long = Long.MinValue): Array[AnnHit] = {
    require(query.length == dim || data.size == 0L,
      s"query dim ${query.length} != index dim $dim")
    // probe selection: desc cosine, then centroid id — SQL double order
    var qq = 0.0
    var i = 0
    while (i < query.length) { qq += query(i) * query(i); i += 1 }
    val qn = math.sqrt(qq)
    val probed = cents
      .map { case (cid, cv) => (cid, cv, cosGuarded(query, qn, cv)) }
      .sortWith { case ((c1, _, s1), (c2, _, s2)) =>
        val c = SQLOrderingUtil.compareDoubles(s2, s1) // desc
        if (c != 0) c < 0 else c1 < c2
      }
      .take(nprobe)

    // bounded shortlist: keep the lexicographically smallest
    // (approx_dist, id) pairs — a size-S max-heap replicates
    // row_number over (approx_dist, neighbor_id) <= S
    val cap = math.max(topK * refine, 1)
    val heap = new java.util.PriorityQueue[(Double, Long)](cap,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = SQLOrderingUtil.compareDoubles(b._1, a._1) // max-heap
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })
    val rawTab = if (residual) null else adcTable(query)
    val hasTombs = tombs.length > 0
    probed.foreach { case (cid, cv, _) =>
      val runs = data.runsOf(cid)
      if (runs.nonEmpty) {
        val tab =
          if (!residual) rawTab
          else {
            val rq = new Array[Double](dim)
            var i2 = 0
            while (i2 < dim) { rq(i2) = query(i2) - cv(i2); i2 += 1 }
            adcTable(rq)
          }
        var r = 0
        while (r < runs.length) {
          val run = runs(r)
          val end = run.n
          var p = 0
          while (p < end) {
            val id = run.idAt(p)
            if (id != queryId &&
                (!hasTombs || java.util.Arrays.binarySearch(tombs, id) < 0)) {
              var acc = 0.0
              var j = 0
              while (j < m) { acc += tab(j)(run.codeAt(p, j)); j += 1 }
              if (heap.size < cap) heap.add((acc, id))
              else {
                val top = heap.peek()
                val c = SQLOrderingUtil.compareDoubles(acc, top._1)
                if (c < 0 || (c == 0 && id < top._2)) {
                  heap.poll(); heap.add((acc, id)): Unit
                }
              }
            }
            p += 1
          }
          r += 1
        }
      }
    }

    // exact re-rank of the shortlist: AnnPq.sqDist on the original
    // vectors (heap or mmap'd — identical doubles), ordered (dist, id)
    val short = heap.toArray(new Array[(Double, Long)](heap.size))
    val rescored = short.map { case (_, id) => (id, vsrc.dist(id, query)) }
    java.util.Arrays.sort(rescored, (a: (Long, Double), b: (Long, Double)) => {
      val c = SQLOrderingUtil.compareDoubles(a._2, b._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    })
    rescored.take(topK).zipWithIndex.map { case ((id, d), r) =>
      AnnHit(id, d, (r + 1).toLong)
    }
  }
}

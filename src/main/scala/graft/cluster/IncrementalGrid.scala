package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the grid/Morton hierarchy: fold a batch of
  * new points into an EXISTING index, bit-equal to rebuilding from
  * scratch on the union — touching the big index exactly twice.
  *
  * The reference engine can only rebuild (`arrow-cluster-engine.ts:66` —
  * `load()` re-indexes every point, and the layer caches exist precisely
  * because rebuilds are unaffordable per frame). At 100 TB the rebuild IS
  * the cost: a day's ingest is ~0.1% of the corpus, and re-shuffling the
  * other 99.9% to re-derive identical cells is wasted cluster time. Three
  * properties of the grid semantics make exact incrementality possible:
  *
  *  1. **Cluster ids are cell-derived** ([[GridHierarchy.cellIdCol]]), not
  *     sequence-derived: fusing one more point into a cell never renumbers
  *     any other cell's cluster.
  *  2. **Cell membership nests dyadically** (the f32-fround invariant, see
  *     [[MortonHierarchy]]): an ingested point's cell at every coarser
  *     zoom is a prefix of its finest cell.
  *  3. **Change is confined to the batch's ancestor-cell paths.** By
  *     induction down the zoom ladder: a record changes only if its cell
  *     at the deeper pass gained/changed members; the changed outputs (the
  *     cell's cluster, or its passthrough members) land in the parent
  *     cell of a cell containing an ingested point — which, by dyadic
  *     nesting, contains that point too. So the TOUCHED cells of every
  *     pass are known UPFRONT from the batch alone: the batch's cell ids
  *     at each zoom, one bounded set (|batch| × levels), no discovery
  *     iteration.
  *
  * Algorithm:
  *  - **Extract** (1st full-index pass): the rows consumed by touched
  *    cells — each level-ℓ row keyed by the cell of the pass that
  *    CONSUMES it (pass ℓ-1; the final level by its producing pass) — via
  *    one broadcast semi-join on that splice key. Everything after this
  *    runs on O(|batch| + cellmates) rows.
  *  - **Recompute**: the 17-level fold re-runs over ONLY the touched
  *    membership — stored members minus the rows touched cells produced
  *    (replaced wholesale) plus the previous pass's recomputed outputs —
  *    through the SAME shared expressions the batch build runs
  *    ([[GridHierarchy.passWide]]/[[GridHierarchy.emitLevel]]/
  *    [[GridHierarchy.nextRecords]]), which is what makes bit-equality
  *    hold by construction rather than by luck.
  *  - **Splice** (2nd full-index pass): stored rows NOT consumed by
  *    touched cells (one broadcast anti-join on the same splice key)
  *    unioned with the recomputed levels.
  *
  * One global cost remains: cluster ids carry a `+ totalPoints` id-space
  * offset (leaf ids stay below it), so growing the point count shifts
  * every stored cluster id by `|batch|`. That re-offset is a pure
  * shuffle-free map riding the splice scan, and keeps the merged index
  * indistinguishable from a fresh build — the contract
  * IncrementalGridSpec locks.
  *
  * New points must carry ids in `[oldTotalPoints, oldTotalPoints + n)` —
  * the continuation of the existing leaf id space (validated here).
  */
object IncrementalGrid {

  private val RecordCols =
    Seq("id", "mx", "my", "lng", "lat", "point_count", "is_cluster")

  /** @param index          level rows from [[GridHierarchy.build]] /
    *                       [[MortonHierarchy.build]] (or a previous merge)
    * @param newPoints      the ingest batch (same shape `build` takes)
    * @param oldTotalPoints the `points.count()` of the indexed data —
    *                       including any null-geometry rows, exactly as
    *                       `build` counted them
    * @return updated level rows, bit-equal to
    *         `GridHierarchy.build(old ∪ new)`, persisted + materialized
    */
  /** Phase timing to stdout when GRAFT_MERGE_DEBUG is set (a pass-through
    * otherwise) — how the committed phase attribution in BENCH.md was
    * measured.
    */
  private def dbg[A](tag: String)(f: => A): A =
    if (sys.env.contains("GRAFT_MERGE_DEBUG")) {
      val t0 = System.nanoTime(); val r = f
      println(f"MERGEDBG $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    } else f

  def merge(
      index: DataFrame,
      newPoints: DataFrame,
      oldTotalPoints: Long,
      opts: ClusterOptions = ClusterOptions(),
      lngCol: String = "lng",
      latCol: String = "lat",
      idCol: String = "row_id"): DataFrame = {
    // checkpointed intermediates, unpersisted once the result is
    // materialized — without this, back-to-back merges accumulate dead
    // cached blocks and degrade the executor (measured: a 3-rung bench
    // session ended with a 7x-inflated calibration probe)
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def ckpt(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(); scratch += c; c
    }
    val nNew = dbg("count_new")(newPoints.count())
    val newTotal = oldTotalPoints + nNew

    val addedBase = dbg("added_base")(
      ckpt(GridHierarchy.baseRecords(newPoints, lngCol, latCol, idCol)
        .repartition(deltaPartitions(newPoints.sparkSession, nNew))))
    validateIdRange(addedBase, oldTotalPoints, newTotal)

    // id-space re-offset: cluster ids (>= oldTotalPoints) shift by the
    // batch size in id, parent_id, and child_rank; leaf ids and -1
    // sentinels are below the cut and stay put. Pure map, no shuffle —
    // rides the extract/splice scans. ([[IndexStore]] skips this pass
    // entirely: its on-disk ids carry no offset, so its decode-at-read IS
    // the shift.)
    def shift(c: String) =
      when(col(c) >= oldTotalPoints, col(c) + nNew).otherwise(col(c)).as(c)
    val shifted = index.select(
      col("zoom"), col("mx"), col("my"), shift("id"), shift("parent_id"),
      col("point_count"), col("is_cluster"), col("lng"), col("lat"),
      shift("child_rank"))

    val (keep, emits) = recomputeTouched(shifted, addedBase, opts, newTotal, nNew, ckpt)
    // the final union is LOCAL-CHECKPOINTED (eager — the materialization
    // the persist+count pair used to do), not merely persisted: its
    // lineage runs through the scratch checkpoints unpersisted below, so
    // a persist-only result would become unrecomputable ('checkpoint
    // block not found') on any cached-block loss; truncating the lineage
    // first makes the scratch release safe by construction
    val all = dbg("final_ckpt")(
      (keep +: emits).reduce(_ unionByName _).localCheckpoint())
    // through PlanBridge: Dataset.unpersist is a silent no-op on
    // checkpointed frames (CacheManager never saw them) — the blocks
    // belong to the LogicalRDD inside the plan
    scratch.foreach(
      org.apache.spark.sql.graftbridge.PlanBridge.unpersistCheckpointBlocks(_))
    all
  }

  /** New point ids must continue the existing leaf id space (see class
    * doc) — shared validation for [[merge]] and [[IndexStore.mergeInto]].
    */
  private[cluster] def validateIdRange(
      addedBase: DataFrame, oldTotalPoints: Long, newTotal: Long): Unit = {
    val idRange = dbg("id_range")(addedBase.agg(min(col("id")), max(col("id"))).head())
    if (!idRange.isNullAt(0)) {
      require(idRange.getLong(0) >= oldTotalPoints && idRange.getLong(1) < newTotal,
        s"new point ids must continue the existing id space " +
          s"[$oldTotalPoints, $newTotal), got [${idRange.getLong(0)}, ${idRange.getLong(1)}]")
    }
  }

  /** The extract → recompute → splice-keep core, shared verbatim by the
    * in-memory [[merge]] and the storage-backed [[IndexStore.mergeInto]]
    * (which feeds it only the touched partitions of the stored index —
    * the semantics are identical because every row the recompute consumes
    * or replaces provably lives in a touched partition).
    *
    * @param shifted index rows ALREADY in the post-merge id space
    * @return (keep, emits): stored rows no touched cell consumed, and the
    *         recomputed level frames — their union is the merged index
    */
  /** The recompute runs ~2·levels sequential Spark jobs over DELTA-sized
    * frames; at default parallelism each job pays full-width task
    * scheduling for a few thousand rows (measured ~0.55 s/job at 10k —
    * the merge's floor). Right-size the delta's cached partitioning to
    * the batch instead: ~64k rows per partition, min 1, capped at the
    * session's parallelism. All merge arithmetic is partition-invariant
    * (the spec suite proves bit-equality under any layout), so this is
    * purely a scheduling-overhead knob. Cellmates of a pathologically
    * dense touched cell can exceed the estimate — a bigger task, still
    * correct.
    */
  private[cluster] def deltaPartitions(spark: org.apache.spark.sql.SparkSession, nNew: Long): Int = {
    val cap = math.max(spark.sparkContext.defaultParallelism, 1)
    math.max(1L, math.min(cap.toLong, nNew * 8 / 65536 + 1)).toInt
  }

  private[cluster] def recomputeTouched(
      shifted: DataFrame,
      addedBase: DataFrame,
      opts: ClusterOptions,
      newTotal: Long,
      nNew: Long,
      ckpt: DataFrame => DataFrame): (DataFrame, Seq[DataFrame]) = {
    // touched cells per pass, straight from the batch (property 3). Cell
    // ids embed the pass zoom in their low bits, so one flat set covers
    // all passes. Stays distributed: broadcast into the two join scans.
    val passes = (opts.minZoom to opts.maxZoom).toSeq
    val touchedC = ckpt(addedBase
      .select(explode(array(
        passes.map(z => GridHierarchy.cellIdCol(z, opts, newTotal)): _*)).as("_splice"))
      .distinct())
    val extract = extractTouched(shifted, touchedC, opts, newTotal, nNew, ckpt)

    // identity-pass skip, the build's zStar idea on the delta: a pass is a
    // pure pass-through unless some touched cell actually FUSES (>= 2
    // members AND mass >= minPoints). The deepest fusing pass z* is
    // computable UPFRONT — at the deepest such pass the upfront counts
    // (stored consumed rows + the new points) are exact because every
    // deeper pass is identity, and overestimating z* from the shallower
    // passes' approximate counts only skips fewer levels, never a wrong
    // one. Every pass deeper than z* emits by projection: no window job,
    // no checkpoint — on sparse deep zooms that is ~half the ladder.
    val zStarMerge: Int = {
      val fromStored = extract.where(col("zoom") > opts.minZoom).select(
        (col("zoom") - 1).cast("int").as("_pass"),
        GridHierarchy.cellIdColAt(col("zoom") - 1, opts, newTotal).as("_cell"),
        col("point_count"))
      // a touched cell id encodes its pass (+1) in the low 5 bits
      val fromAdded = addedBase
        .select(explode(array(
          passes.map(zz => GridHierarchy.cellIdCol(zz, opts, newTotal)): _*)).as("_cell"))
        .select((((col("_cell") - newTotal).bitwiseAND(31)) - 1).cast("int").as("_pass"),
          col("_cell"), lit(1L).as("point_count"))
      val row = fromStored.unionByName(fromAdded)
        .groupBy(col("_pass"), col("_cell"))
        .agg(count(lit(1)).as("_n"), sum(col("point_count")).as("_mass"))
        .where(col("_n") >= 2 && col("_mass") >= opts.minPoints)
        .agg(max(col("_pass"))).head()
      if (row.isNullAt(0)) opts.minZoom - 1 else row.getInt(0)
    }
    if (sys.env.contains("GRAFT_MERGE_DEBUG")) println("MERGEDBG zstar " + zStarMerge)

    val emits = ladderEmits(extract, opts, newTotal, zStarMerge, ckpt,
      storedBase => storedBase.unionByName(addedBase))
    (spliceKeep(shifted, touchedC, opts, newTotal), emits)
  }

  /** The removal mirror of [[recomputeTouched]] (r15 verdict #3): fold a
    * REMOVAL batch out of the index. Removals live on the batch's
    * ancestor-cell paths exactly like ingest — the same dyadic-nesting
    * induction: a record changes only if its deeper-pass cell lost or
    * changed members, and every changed output lands in an ancestor cell
    * of a removed point — so the touched cells are known UPFRONT from
    * the removed coordinates, and the ladder re-runs over only their
    * membership with the removed leaves dropped at the base level. The
    * id space is UNTOUCHED: survivors keep their ids (stable
    * identifiers), cluster ids stay offset by the original total, and
    * the result is bit-equal to `GridHierarchy.build(survivors,
    * idSpace = total)` (IndexStoreSpec pins it).
    *
    * The identity-pass skip needs a REMOVAL-safe z*: unlike ingest,
    * removal can create fusion at a SHALLOWER pass than any pre-removal
    * fusion (a dissolved cluster's members re-enter a coarser cell as
    * multiple records), so member counts from stored rows may
    * UNDERCOUNT post-removal membership. Post-removal cell MASS is
    * exact upfront (mass is conserved through dissolution: stored
    * consumed mass − removed leaf mass), so the fusion test here is
    * mass-exact and member-PESSIMISTIC: a cell "may fuse" when its
    * post-removal mass clears minPoints AND it either already has ≥ 2
    * member records or any member is a cluster (which dissolution could
    * expand). Overestimating z* only skips fewer passes — never a wrong
    * one.
    */
  private[cluster] def recomputeTouchedRemove(
      stored: DataFrame,
      removedBase: DataFrame,
      opts: ClusterOptions,
      total: Long,
      nRemoved: Long,
      ckpt: DataFrame => DataFrame): (DataFrame, Seq[DataFrame]) = {
    val passes = (opts.minZoom to opts.maxZoom).toSeq
    val touchedC = ckpt(removedBase
      .select(explode(array(
        passes.map(z => GridHierarchy.cellIdCol(z, opts, total)): _*)).as("_splice"))
      .distinct())
    val extract = extractTouched(stored, touchedC, opts, total, nRemoved, ckpt)
    val removedIds = ckpt(removedBase.select(col("id")).distinct())

    val zStarRemove: Int = {
      val fromStored = extract.where(col("zoom") > opts.minZoom).select(
        (col("zoom") - 1).cast("int").as("_pass"),
        GridHierarchy.cellIdColAt(col("zoom") - 1, opts, total).as("_cell"),
        col("point_count"), col("is_cluster"))
      val removedMass = removedBase
        .select(explode(array(
          passes.map(zz => GridHierarchy.cellIdCol(zz, opts, total)): _*)).as("_cell"))
        .groupBy(col("_cell")).agg(count(lit(1)).as("_rm"))
      val row = fromStored
        .groupBy(col("_pass"), col("_cell"))
        .agg(count(lit(1)).as("_n"), sum(col("point_count")).as("_mass"),
          max(col("is_cluster").cast("int")).as("_any_cluster"))
        .join(broadcast(removedMass), Seq("_cell"), "left")
        .withColumn("_rm", coalesce(col("_rm"), lit(0L)))
        .where((col("_mass") - col("_rm")) >= opts.minPoints &&
          (col("_n") >= 2 || col("_any_cluster") === 1))
        .agg(max(col("_pass"))).head()
      if (row.isNullAt(0)) opts.minZoom - 1 else row.getInt(0)
    }
    if (sys.env.contains("GRAFT_MERGE_DEBUG")) println("MERGEDBG zstar_rm " + zStarRemove)

    val emits = ladderEmits(extract, opts, total, zStarRemove, ckpt,
      storedBase => storedBase.join(broadcast(removedIds), Seq("id"), "left_anti"))
    (spliceKeep(stored, touchedC, opts, total), emits)
  }

  /** splice key: the consuming pass's cell for every level (the final
    * level, which no pass consumes, splices by its producing pass — the
    * same pass number, so one expression covers both). zoom z+1 rows are
    * consumed by pass z; zoom minZoom rows were produced by pass minZoom
    * — one closed-form expression over the zoom column (a zoom-branched
    * CASE here costs its 18 branches on every row of both full-index
    * scans).
    */
  private[cluster] def spliceKeyCol(opts: ClusterOptions, total: Long): Column =
    GridHierarchy.cellIdColAt(
      when(col("zoom") === opts.minZoom, lit(opts.minZoom)).otherwise(col("zoom") - 1),
      opts, total)

  /** 1st full-index pass: pull the touched membership out (small). The
    * ladder also needs "was this row PRODUCED by a touched cell" (those
    * rows are replaced wholesale by the recomputed outputs); that flag
    * is stamped here, during the one scan, so the 17-level loop never
    * joins against the touched set again. zoom zz rows (zz <= maxZoom)
    * were produced by pass zz; base-level rows (maxZoom + 1) by no pass
    * — the -1 default never matches.
    */
  private def extractTouched(
      shifted: DataFrame,
      touchedC: DataFrame,
      opts: ClusterOptions,
      total: Long,
      nDelta: Long,
      ckpt: DataFrame => DataFrame): DataFrame = {
    val prodKey: Column =
      when(col("zoom") <= opts.maxZoom,
        GridHierarchy.cellIdColAt(col("zoom"), opts, total))
        .otherwise(lit(-1L))
    val prodTouched = touchedC.select(col("_splice").as("_prod"))
      .withColumn("_prod_touched", lit(true))
    val extractPre = shifted
      .withColumn("_splice", spliceKeyCol(opts, total))
      .join(broadcast(touchedC), Seq("_splice"), "left_semi")
      .withColumn("_prod", prodKey)
      .join(broadcast(prodTouched), Seq("_prod"), "left")
      .withColumn("_prod_touched", coalesce(col("_prod_touched"), lit(false)))
      .drop("_prod", "_splice")
    // delta-sized from here on: cache it in batch-proportional partitions
    // so the per-pass jobs below schedule a handful of tasks, not the
    // session's full width (the repartition itself moves only delta rows)
    ckpt(extractPre.repartition(deltaPartitions(shifted.sparkSession, nDelta)))
  }

  /** The 17-level fold over the touched membership, shared by the merge
    * and removal recomputes — only the BASE-LEVEL membership transform
    * differs (union the ingested points in; anti-join the removed ids
    * out). Identity passes deeper than `zStar` emit by projection.
    */
  private def ladderEmits(
      extract: DataFrame,
      opts: ClusterOptions,
      total: Long,
      zStar: Int,
      ckpt: DataFrame => DataFrame,
      baseMembers: DataFrame => DataFrame): Seq[DataFrame] = {
    val emits = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var prevOutputs: DataFrame = null // recomputed outputs of the previous pass
    var z = opts.maxZoom
    while (z >= opts.minZoom) {
      // membership of touched cells at level z+1: stored consumed rows,
      // minus everything a touched deeper cell produced (replaced
      // wholesale by the previous pass's recomputed outputs), plus those
      // outputs (at z == maxZoom: the transformed stored base — ingested
      // points unioned in, or removed ids dropped)
      val stored = extract.where(col("zoom") === (z + 1))
      val members =
        (if (z == opts.maxZoom) baseMembers(stored.select(RecordCols.map(col): _*))
         else stored.where(!col("_prod_touched")).select(RecordCols.map(col): _*)
           .unionByName(prevOutputs))
      if (z > zStar) {
        // provably-identity pass: emit by projection (nothing fuses, so
        // every stamp is -1 — exactly what the stored rows carry too)
        emits += members.select(
          lit(z + 1).as("zoom"), col("mx"), col("my"), col("id"),
          lit(-1L).as("parent_id"), col("point_count"), col("is_cluster"),
          col("lng"), col("lat"), lit(-1L).as("child_rank"))
        prevOutputs = members
      } else {
        // checkpoint EVERY fusing pass — same cadence the batch build
        // measured out: an un-checkpointed wide re-executes once per
        // consumer (emit at the final union + the next pass's chain), and
        // the recompute dwarfs the barrier cost even at delta size
        // (26.7 s vs 19.6 s measured here)
        val wide = dbg(s"wide_z$z")(ckpt(GridHierarchy.passWide(members, z, opts, total)))
        emits += GridHierarchy.emitLevel(wide, z, opts)
        prevOutputs = GridHierarchy.nextRecords(wide, opts)
      }
      z -= 1
    }
    emits += prevOutputs.select(
      lit(opts.minZoom).as("zoom"), col("mx"), col("my"), col("id"),
      lit(-1L).as("parent_id"), col("point_count"), col("is_cluster"),
      col("lng"), col("lat"), lit(-1L).as("child_rank"))
    emits.toSeq
  }

  /** 2nd full-index pass: splice — keep every stored row no touched cell
    * consumed; the recomputed levels replace the rest.
    */
  private def spliceKeep(
      shifted: DataFrame,
      touchedC: DataFrame,
      opts: ClusterOptions,
      total: Long): DataFrame =
    shifted
      .withColumn("_splice", spliceKeyCol(opts, total))
      .join(broadcast(touchedC), Seq("_splice"), "left_anti")
      .drop("_splice")
}

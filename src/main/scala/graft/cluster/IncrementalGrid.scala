package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental maintenance of the grid/Morton hierarchy: fold a batch of
  * new points into an EXISTING index, bit-equal to rebuilding from
  * scratch on the union — without touching the untouched cells.
  *
  * The reference engine can only rebuild (`arrow-cluster-engine.ts:66` —
  * `load()` re-indexes every point, and the layer caches exist precisely
  * because rebuilds are unaffordable per frame). At 100 TB the rebuild IS
  * the cost: a day's ingest is ~0.1% of the corpus, and re-shuffling the
  * other 99.9% to re-derive identical cells is wasted cluster time. Two
  * properties of the grid semantics make exact incrementality possible:
  *
  *  1. **Cluster ids are cell-derived** ([[GridHierarchy.cellIdCol]]), not
  *     sequence-derived: fusing one more point into a cell never renumbers
  *     any other cell's cluster.
  *  2. **Cell membership nests dyadically** (the f32-fround invariant, see
  *     [[MortonHierarchy]]): a record's cell at every coarser zoom is a
  *     prefix of its finest cell, so a new point's influence is confined
  *     to its own ancestor-cell path — ≤ one cell per level — plus the
  *     sibling records already in those cells.
  *
  * Algorithm (top-down, one pass per zoom, mirroring [[GridHierarchy.build]]):
  * carry a record-level delta (added/removed level-(z+1) records, starting
  * with the new base points); the AFFECTED cells of pass z are the cells
  * of the delta; re-run the pass's window aggregation over ONLY the full
  * membership of affected cells (stored members minus removals plus
  * additions — full-membership recomputation, not sum patching, so
  * passthrough↔fused transitions in both directions and float summation
  * land exactly as a full rebuild would); splice the recomputed rows into
  * the stored level by an anti-join on the cell id; diff the pass's
  * outputs against the stored next level to get the next delta —
  * bit-identical records cancel, so the delta stays proportional to the
  * ingest, not the index. Per level the work is O(affected members), and
  * every aggregation/projection is the SAME shared expression the batch
  * build runs ([[GridHierarchy.passWide]]/[[GridHierarchy.emitLevel]]/
  * [[GridHierarchy.nextRecords]]), which is what makes bit-equality hold
  * by construction rather than by luck.
  *
  * One global cost remains: cluster ids carry a `+ totalPoints` id-space
  * offset (leaf ids stay below it), so growing the point count shifts
  * every stored cluster id by `|batch|`. That re-offset is a pure
  * shuffle-free map over the stored rows — the cheap kind of O(n) — and
  * keeps the merged index indistinguishable from a fresh build, which is
  * the contract IncrementalGridSpec locks.
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
  def merge(
      index: DataFrame,
      newPoints: DataFrame,
      oldTotalPoints: Long,
      opts: ClusterOptions = ClusterOptions(),
      lngCol: String = "lng",
      latCol: String = "lat",
      idCol: String = "row_id"): DataFrame = {
    val nNew = newPoints.count()
    val newTotal = oldTotalPoints + nNew

    val addedBase =
      GridHierarchy.baseRecords(newPoints, lngCol, latCol, idCol).localCheckpoint()
    val idRange = addedBase.agg(min(col("id")), max(col("id"))).head()
    if (!idRange.isNullAt(0)) {
      require(idRange.getLong(0) >= oldTotalPoints && idRange.getLong(1) < newTotal,
        s"new point ids must continue the existing id space " +
          s"[$oldTotalPoints, $newTotal), got [${idRange.getLong(0)}, ${idRange.getLong(1)}]")
    }

    // id-space re-offset: cluster ids (>= oldTotalPoints) shift by the
    // batch size in id, parent_id, and child_rank; leaf ids and -1
    // sentinels are below the cut and stay put. Pure map, no shuffle.
    def shift(c: String) =
      when(col(c) >= oldTotalPoints, col(c) + nNew).otherwise(col(c)).as(c)
    val shifted = index.select(
      col("zoom"), col("mx"), col("my"), shift("id"), shift("parent_id"),
      col("point_count"), col("is_cluster"), col("lng"), col("lat"),
      shift("child_rank"))

    def storedLevel(zoom: Int): DataFrame = shifted.where(col("zoom") === zoom)

    val spark = index.sparkSession
    val emptyRecs = addedBase.limit(0)
    var deltaAdd = addedBase
    var deltaRemove = emptyRecs
    val newLevels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var lastAffected: DataFrame = null
    var lastNewOut: DataFrame = null

    var z = opts.maxZoom
    while (z >= opts.minZoom) {
      val cellId = GridHierarchy.cellIdCol(z, opts, newTotal)
      val affected = deltaAdd.unionByName(deltaRemove)
        .select(cellId.as("_cell_id")).distinct().localCheckpoint()

      val stored = storedLevel(z + 1)
      // full membership of affected cells after the delta
      val oldRecsAff = stored
        .select(RecordCols.map(col): _*)
        .withColumn("_cell_id", cellId)
        .join(broadcast(affected), Seq("_cell_id"), "left_semi")
        .drop("_cell_id")
      val members = oldRecsAff.exceptAll(deltaRemove).unionByName(deltaAdd)

      val wide = GridHierarchy.passWide(members, z, opts, newTotal).localCheckpoint()

      // splice: untouched cells keep their stored stamps verbatim
      val keep = stored
        .withColumn("_cell_id", cellId)
        .join(broadcast(affected), Seq("_cell_id"), "left_anti")
        .drop("_cell_id")
      newLevels += keep.unionByName(GridHierarchy.emitLevel(wide, z, opts))

      // next delta: this pass's outputs vs the stored next level, within
      // affected cells only — bit-identical records cancel out
      val newOut = GridHierarchy.nextRecords(wide, opts)
      val oldOutAff = storedLevel(z)
        .select(RecordCols.map(col): _*)
        .withColumn("_cell_id", cellId)
        .join(broadcast(affected), Seq("_cell_id"), "left_semi")
        .drop("_cell_id")
      deltaAdd = newOut.exceptAll(oldOutAff).localCheckpoint()
      deltaRemove = oldOutAff.exceptAll(newOut).localCheckpoint()
      lastAffected = affected
      lastNewOut = newOut
      z -= 1
    }

    // final level (minZoom): outputs of the last pass, -1 stamps — splice
    // the affected cells' recomputed outputs over the stored rows
    val finalCell = GridHierarchy.cellIdCol(opts.minZoom, opts, newTotal)
    val finalKeep = storedLevel(opts.minZoom)
      .withColumn("_cell_id", finalCell)
      .join(broadcast(lastAffected), Seq("_cell_id"), "left_anti")
      .drop("_cell_id")
    val finalNew = lastNewOut.select(
      lit(opts.minZoom).as("zoom"), col("mx"), col("my"), col("id"),
      lit(-1L).as("parent_id"), col("point_count"), col("is_cluster"),
      col("lng"), col("lat"), lit(-1L).as("child_rank"))
    newLevels += finalKeep.unionByName(finalNew)

    val all = newLevels.reduce(_ unionByName _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    all.count()
    all
  }
}

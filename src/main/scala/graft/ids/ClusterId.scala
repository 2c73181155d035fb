package graft.ids

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cluster-ID bit packing (reference: arrow-cluster-engine.ts:304-310,378).
  *
  * `id = (indexAtLevel << 5) + (creationZoom + 1) + totalPoints` packs
  * (level, index) into one long so leaves and clusters share an ID space:
  * leaf IDs are source row indices `< totalPoints`, cluster IDs are
  * `>= totalPoints`. The `% 32` decode works because creationZoom+1 ≤ 17 < 32.
  */
object ClusterId {
  def encode(indexAtLevel: Long, creationZoom: Int, totalPoints: Long): Long =
    (indexAtLevel << 5) + (creationZoom + 1) + totalPoints

  /** Zoom level that holds this cluster's children (= creationZoom + 1). */
  def originLevel(id: Long, totalPoints: Long): Int =
    ((id - totalPoints) % 32).toInt

  /** Index of the origin point within its level. */
  def originIndex(id: Long, totalPoints: Long): Long =
    (id - totalPoints) >> 5

  def isCluster(id: Long, totalPoints: Long): Boolean = id >= totalPoints

  // Column forms (pure integer arithmetic → codegen, no UDF).
  def originLevelCol(id: Column, totalPoints: Long): Column =
    ((id - totalPoints) % 32).cast("int")
  def originIndexCol(id: Column, totalPoints: Long): Column =
    shiftright(id - totalPoints, 5)
  def isClusterCol(id: Column, totalPoints: Long): Column =
    id >= totalPoints
}

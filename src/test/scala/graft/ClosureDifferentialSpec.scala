package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{ClusterEngine, ClusterIndex, ClusterOptions}

/** Randomized differential guard for the pointer-doubling closure: on
  * random point sets (several seeds, both build modes), every subtree query
  * must equal a brute-force driver-side BFS over the collected parent
  * edges. The fixed fixtures (golden, spec constants) lock specific shapes;
  * this locks the ALGORITHM against arbitrary hierarchies.
  */
class ClosureDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def checkIndex(idx: ClusterIndex, label: String): Unit = {
    val edges = idx.levels.toDF()
      .where(col("parent_id") =!= -1L)
      .select(col("id"), col("parent_id"), col("is_cluster"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val children = edges.groupBy(_._2)

    def bfs(root: Long): (Set[Long], Set[Long]) = { // (leaf ids, descendant cluster ids)
      var leaves = Set.empty[Long]
      var clusters = Set.empty[Long]
      var frontier = List(root)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(p => children.getOrElse(p, Array.empty).map(e => (e._1, e._3)))
        clusters ++= next.collect { case (id, true) => id }
        leaves ++= next.collect { case (id, false) => id }
        frontier = next.collect { case (id, true) => id }
      }
      (leaves, clusters)
    }

    val roots = idx.levels.toDF()
      .where(col("is_cluster"))
      .select(col("id")).distinct().orderBy(col("id"))
      .collect().map(_.getLong(0))
    assert(roots.nonEmpty, s"$label: fixture produced no clusters")
    // a spread of probes: smallest, largest, and a middle cluster id
    val probes = Seq(roots.head, roots(roots.length / 2), roots.last).distinct
    probes.foreach { cid =>
      val (wantLeaves, wantClusters) = bfs(cid)
      val gotLeaves = idx.getLeaves(cid, limit = Int.MaxValue, offset = 0)
        .select(col("row_id")).collect().map(_.getLong(0)).toSet
      assert(gotLeaves == wantLeaves, s"$label cluster $cid: leaf set diverges from BFS")
      val gotDesc = idx.getDescendants(cid).toSet
      assert(gotDesc == wantClusters, s"$label cluster $cid: descendant set diverges from BFS")
      // DFS pagination: concatenated pages == the full DFS sequence
      val full = idx.getLeaves(cid, limit = Int.MaxValue, offset = 0, dfsOrder = true)
        .select(col("row_id")).collect().map(_.getLong(0)).toSeq
      val paged = Seq(0, 7).flatMap(off =>
        idx.getLeaves(cid, limit = 7, offset = off, dfsOrder = true)
          .select(col("row_id")).collect().map(_.getLong(0)))
      assert(paged == full.take(14), s"$label cluster $cid: DFS pages diverge")
    }
  }

  test("exact build: closure queries equal brute-force BFS on random fixtures") {
    Seq(42L, 7L, 1234L).foreach { seed =>
      val pts = PointFixtures.uniform(150, seed).toSeq.toDF("row_id", "lng", "lat")
      val idx = ClusterEngine.load(pts, ClusterOptions(), idCol = Some("row_id"))
      checkIndex(idx, s"exact/seed=$seed")
      idx.unpersist()
    }
  }

  test("distributed build: closure queries equal brute-force BFS on random fixtures") {
    Seq(42L, 99L).foreach { seed =>
      val pts = PointFixtures.uniform(150, seed).toSeq.toDF("row_id", "lng", "lat")
      val idx = ClusterEngine.loadDistributed(pts, ClusterOptions(), idCol = "row_id")
      checkIndex(idx, s"dist/seed=$seed")
      idx.unpersist()
    }
  }
}

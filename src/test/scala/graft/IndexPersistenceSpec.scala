package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{ClusterEngine, ClusterOptions, ClusterRow}

/** save/loadIndex must preserve the ENTIRE query surface — an index
  * reloaded from parquet (no source data, no rebuild) answers every query
  * identically to the index that built it: level rows, bbox scans, serve
  * snapshots, children, paginated leaves in all orders, navigation, and
  * the insertion-rank stamps when the build made them.
  */
class IndexPersistenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_persist_$name"

  private def pointsDf = {
    import spark.implicits._
    PointFixtures.uniform(500).toSeq.toDF("row_id", "lng", "lat")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("reloaded exact index answers every surface identically") {
    val built = ClusterEngine.load(pointsDf,
      ClusterOptions(radius = 75.0, insertionRanks = true), idCol = Some("row_id")).persist()
    built.save(tmp("exact"))
    val back = ClusterEngine.loadIndex(spark, tmp("exact"))
    try {
      assert(back.numPoints == built.numPoints)
      assert(rows(back.levels.toDF()) == rows(built.levels.toDF()), "level rows")
      val world = (-180.0, -85.0, 180.0, 85.0)
      for (z <- Seq(0, 3, 8, 16)) {
        assert(rows(back.getClusters(world, z)) == rows(built.getClusters(world, z)),
          s"bbox scan at z=$z")
        assert(back.getClustersLocal(world, z).toSet ==
          built.getClustersLocal(world, z).toSet, s"serve mode at z=$z")
      }
      val target = built.getClusters(world, 3)
        .where(col("is_cluster")).orderBy(desc("point_count"), col("id"))
        .limit(1).collect()(0).getLong(0)
      assert(rows(back.getChildren(target).toDF()) == rows(built.getChildren(target).toDF()),
        "children")
      // ranks survive the roundtrip: insertion-order pagination still works
      // and pages identically
      def page(idx: graft.cluster.ClusterIndex) =
        idx.getLeaves(target, limit = 7, offset = 2, insertionOrder = true)
          .collect().map(_.getLong(0)).toSeq
      assert(page(back) == page(built), "insertion-order leaf page")
      assert(back.navigationSummary(Seq(target)) == built.navigationSummary(Seq(target)),
        "navigation summary")
    } finally {
      back.unpersist(); built.unpersist(): Unit
    }
  }

  test("reloaded distributed (grid) index serves identically too") {
    val built = ClusterEngine.loadDistributed(pointsDf,
      ClusterOptions(radius = 75.0), idCol = "row_id")
    built.save(tmp("grid"))
    val back = ClusterEngine.loadIndex(spark, tmp("grid"))
    try {
      val world = (-180.0, -85.0, 180.0, 85.0)
      for (z <- Seq(0, 8, 16))
        assert(rows(back.getClusters(world, z)) == rows(built.getClusters(world, z)),
          s"grid bbox scan at z=$z")
    } finally {
      back.unpersist(); built.unpersist(): Unit
    }
  }

  test("an unranked build reloads with ranks unavailable (contract preserved)") {
    val built = ClusterEngine.load(pointsDf, ClusterOptions(radius = 75.0),
      idCol = Some("row_id"))
    built.save(tmp("unranked"))
    val back = ClusterEngine.loadIndex(spark, tmp("unranked"))
    try {
      val target = back.getClusters((-180.0, -85.0, 180.0, 85.0), 3)
        .where(col("is_cluster")).orderBy(desc("point_count"), col("id"))
        .limit(1).collect()(0).getLong(0)
      val e = intercept[IllegalArgumentException](
        back.getLeaves(target, insertionOrder = true).collect())
      assert(e.getMessage.contains("insertionRanks"))
    } finally {
      back.unpersist(); built.unpersist(): Unit
    }
  }
}

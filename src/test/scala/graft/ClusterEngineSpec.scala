package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{ClusterEngine, ClusterOptions}
import graft.geo.Mercator
import graft.ids.ClusterId

/** Deterministic fixtures: same LCG as the reference's tests
  * (tests/test-utils.ts:51-65) — seed 42, lng = rand()*360-180,
  * lat = rand()*170-85.
  */
object PointFixtures {
  final class Lcg(var seed: Long) {
    def next(): Double = { seed = (seed * 16807) % 2147483647L; seed.toDouble / 2147483647.0 }
  }
  def uniform(n: Int, seed: Long = 42L): Array[(Long, Double, Double)] = {
    val r = new Lcg(seed)
    Array.tabulate(n)(i => (i.toLong, r.next() * 360.0 - 180.0, r.next() * 170.0 - 85.0))
  }
}

class ClusterEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(pts: Seq[(Long, Double, Double)]): DataFrame =
    pts.toDF("row_id", "lng", "lat")

  private def load(pts: Seq[(Long, Double, Double)], opts: ClusterOptions = ClusterOptions()) =
    ClusterEngine.load(df(pts), opts, idCol = Some("row_id"))

  private val world = (-180.0, -85.0, 180.0, 85.0)

  test("empty table → empty output, no crash") {
    val idx = load(Seq.empty)
    assert(idx.numPoints == 0)
    assert(idx.getClusters(world, 0).count() == 0)
  }

  test("single point → one non-cluster row with original coords") {
    val idx = load(Seq((0L, 10.0, 20.0)))
    val rows = idx.getClusters(world, 5).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(!r.getAs[Boolean]("is_cluster"))
    assert(r.getAs[Double]("lng") == 10.0 && r.getAs[Double]("lat") == 20.0)
    assert(r.getAs[Long]("point_count") == 1L)
    assert(r.getAs[Long]("id") == 0L)
  }

  test("far pair stays unclustered at z16") {
    val idx = load(Seq((0L, -120.0, 40.0), (1L, 120.0, -40.0)))
    assert(idx.getClusters(world, 16).count() == 2)
  }

  test("identical pair fuses into one count-2 cluster at every zoom") {
    val idx = load(Seq((0L, 10.0, 20.0), (1L, 10.0, 20.0)))
    (0 to 16).foreach { z =>
      val rows = idx.getClusters(world, z).collect()
      assert(rows.length == 1, s"zoom $z")
      assert(rows.head.getAs[Boolean]("is_cluster"))
      assert(rows.head.getAs[Long]("point_count") == 2L)
    }
  }

  test("antimeridian pair: wrapped bbox query finds both") {
    val idx = load(Seq((0L, 179.9, 0.0), (1L, -179.9, 0.0)))
    val crossing = idx.getClusters((179.0, -10.0, -179.0, 10.0), 16).count()
    assert(crossing == 2)
  }

  test("polar points: mercator clamp keeps them queryable") {
    val idx = load(Seq((0L, 0.0, 85.0), (1L, 0.0, -85.0), (2L, 0.0, 84.9)))
    assert(idx.getClusters(world, 16).count() == 3)
  }

  test("partial bbox query") {
    val idx = load(Seq((0L, -100.0, 40.0), (1L, 100.0, 40.0), (2L, 0.0, 0.0)))
    val west = idx.getClusters((-180.0, -85.0, 0.0, 85.0), 16)
    assert(west.count() == 2) // -100 and 0
  }

  test("null/NaN coords silently excluded") {
    val d = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (0L, 10.0, 20.0), (1L, null, 20.0), (2L, Double.NaN, 5.0), (3L, 30.0, 40.0))
      .toDF("row_id", "lng", "lat")
    val idx = ClusterEngine.load(d, idCol = Some("row_id"))
    assert(idx.numPoints == 2)
  }

  // ---- invariants on the 500-point seeded fixture (SURVEY §5) ----
  private lazy val seeded = PointFixtures.uniform(500)
  private lazy val idx500 = load(seeded.toSeq)

  test("count conservation: every level sums to 500") {
    val sums = idx500.levels.groupBy($"zoom").agg(sum($"point_count").as("s"))
      .collect().map(r => r.getAs[Int]("zoom") -> r.getAs[Long]("s")).toMap
    (0 to 17).foreach(z => assert(sums(z) == 500L, s"zoom $z sums to ${sums(z)}"))
  }

  test("level cardinality is monotonically non-increasing as zoom decreases") {
    val counts = idx500.levels.groupBy($"zoom").count()
      .collect().map(r => r.getAs[Int]("zoom") -> r.getAs[Long]("count")).toMap
    (0 until 17).foreach(z => assert(counts(z) <= counts(z + 1), s"zoom $z"))
  }

  test("children's counts sum to parent's count, for every cluster") {
    val clusters = idx500.levels.filter($"is_cluster")
      .select($"id", $"point_count").distinct()
    val childSums = idx500.levels.filter($"parent_id" =!= -1L)
      .groupBy($"parent_id").agg(sum($"point_count").as("child_sum"))
    val mismatched = clusters
      .join(childSums, clusters("id") === childSums("parent_id"), "left")
      .where($"child_sum".isNull || $"child_sum" =!= $"point_count")
      .count()
    assert(mismatched == 0)
  }

  test("leaves: length == point_count, ids are source row indices") {
    val someCluster = idx500.getClusters(world, 4)
      .where($"is_cluster").orderBy(desc("point_count")).head()
    val cid = someCluster.getAs[Long]("id")
    val expected = someCluster.getAs[Long]("point_count")
    val leaves = idx500.getLeaves(cid, limit = Int.MaxValue, offset = 0).collect()
    assert(leaves.length.toLong == expected)
    assert(leaves.forall { r => val id = r.getAs[Long]("row_id"); id >= 0 && id < 500 })
    // pagination: limit/offset slices the same ordered set
    val page = idx500.getLeaves(cid, limit = 3, offset = 2).collect().map(_.getAs[Long]("row_id"))
    val full = leaves.map(_.getAs[Long]("row_id")).sorted
    assert(page.toSeq == full.slice(2, 5).toSeq)
  }

  test("cluster-ID encode/decode round-trip") {
    for (idx <- Seq(0L, 1L, 12345L); z <- 0 to 16) {
      val id = ClusterId.encode(idx, z, 500L)
      assert(ClusterId.originLevel(id, 500L) == z + 1)
      assert(ClusterId.originIndex(id, 500L) == idx)
      assert(ClusterId.isCluster(id, 500L))
    }
    assert(!ClusterId.isCluster(499L, 500L))
  }

  test("expansion zoom: bounded and strictly greater than creation level - 1") {
    val c = idx500.getClusters(world, 2).where($"is_cluster").head()
    val cid = c.getAs[Long]("id")
    val ez = idx500.getClusterExpansionZoom(cid)
    assert(ez >= ClusterId.originLevel(cid, 500L) - 1 && ez <= 17)
  }

  test("filterMask ≡ prefiltered load (metamorphic, filter-mask.test.ts:86-108)") {
    val pts = seeded.take(200).toSeq
    val masked = ClusterEngine.load(df(pts), idCol = Some("row_id"),
      filterMask = Some(col("row_id") % 2 === 0))
    val pre = ClusterEngine.load(df(pts.filter(_._1 % 2 == 0)), idCol = Some("row_id"))
    (0 to 17 by 4).foreach { z =>
      val a = masked.levels.filter($"zoom" === z).select($"mx", $"my", $"id", $"point_count")
        .collect().map(_.toString).sorted
      val b = pre.levels.filter($"zoom" === z).select($"mx", $"my", $"id", $"point_count")
        .collect().map(_.toString).sorted
      assert(a.toSeq == b.toSeq, s"zoom $z")
    }
  }

  test("partition-count invariance (≙ multi-chunk tests)") {
    val base = df(seeded.take(300).toSeq)
    val a = ClusterEngine.load(base.repartition(1), idCol = Some("row_id"))
    val b = ClusterEngine.load(base.repartition(7), idCol = Some("row_id"))
    val sa = a.levels.collect().map(_.toString).sorted
    val sb = b.levels.collect().map(_.toString).sorted
    assert(sa.toSeq == sb.toSeq)
  }

  test("getChildren of a cluster returns records whose parent pointer matches") {
    val c = idx500.getClusters(world, 3).where($"is_cluster").head()
    val cid = c.getAs[Long]("id")
    val kids = idx500.getChildren(cid).collect()
    assert(kids.nonEmpty)
    assert(kids.forall(_.parent_id == cid))
    assert(kids.map(_.point_count).sum == c.getAs[Long]("point_count"))
  }

  test("descendants closure contains all nested cluster ids") {
    val c = idx500.getClusters(world, 1).where($"is_cluster")
      .orderBy(desc("point_count")).head()
    val cid = c.getAs[Long]("id")
    val desc0 = idx500.getDescendants(cid)
    // every descendant must itself be a cluster id
    assert(desc0.forall(ClusterId.isCluster(_, 500L)))
  }

  test("navigation with NESTED roots keeps the inner root's subtree intact") {
    // outer root A and an inner root B ∈ descendants(A): batching them must
    // not drop B's own edge row — A's summary has to match the A-only probe
    val a = idx500.getClusters(world, 1).where($"is_cluster")
      .orderBy(desc("point_count")).head().getAs[Long]("id")
    val bOpt = idx500.getDescendants(a).headOption
    assert(bOpt.nonEmpty, "fixture needs a nested cluster")
    val b = bOpt.get
    val alone = idx500.navigationSummary(Seq(a)).head
    val batched = idx500.navigationSummary(Seq(a, b)).find(_._1 == a).get
    assert(batched == alone,
      "outer root's expansion zoom / descendant count must not change when an inner root is batched")
    assert(idx500.subtreeEdges(Seq(a, b)).exists(_.id == b),
      "the inner root's own edge row must stay in the batched edge set")
  }
}

class MercatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scalar round-trip: xLng∘lngX ≈ id, yLat∘latY ≈ id") {
    for (lng <- Seq(-180.0, -77.03, 0.0, 13.4, 179.99); lat <- Seq(-84.9, -45.0, 0.0, 38.9, 84.9)) {
      assert(math.abs(Mercator.xLng(Mercator.lngX(lng)) - lng) < 1e-9)
      assert(math.abs(Mercator.yLat(Mercator.latY(lat)) - lat) < 1e-9)
    }
  }

  test("latY clamps at the poles") {
    assert(Mercator.latY(90.0) == 0.0 || Mercator.latY(90.0) >= 0.0)
    assert(Mercator.latY(-90.0) <= 1.0)
    assert(Mercator.latY(89.99999) >= 0.0 && Mercator.latY(-89.99999) <= 1.0)
  }

  test("Column expressions agree with scalar math") {
    val pts = Seq((-122.4, 37.8), (13.4, 52.5), (151.2, -33.9), (0.0, 0.0)).toDF("lng", "lat")
    val rows = pts.select(
      Mercator.lngXCol($"lng").as("x"), Mercator.latYCol($"lat").as("y"),
      $"lng", $"lat").collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("x") - Mercator.lngX(r.getAs[Double]("lng"))) < 1e-12)
      assert(math.abs(r.getAs[Double]("y") - Mercator.latY(r.getAs[Double]("lat"))) < 1e-12)
    }
  }
}

class StyleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.style.Style

  test("radius formula matches the reference exactly (style-helpers.test.ts:161-169)") {
    val df = Seq(1L, 10L, 100L).toDF("point_count")
    val rows = df.select(Style.radius($"point_count", 1000L).as("r"), $"point_count").collect()
    rows.foreach { r =>
      val c = r.getAs[Long]("point_count").toDouble
      val expected = 4.0 + math.log(c + 1) / math.log(1001.0) * 50.0
      assert(math.abs(r.getAs[Double]("r") - expected) < 1e-12)
    }
  }

  test("text color: white on dark fills, black on light fills") {
    val df = Seq(
      (Seq(0, 0, 0, 255), "dark"),
      (Seq(255, 255, 255, 255), "light"),
      (Seq(51, 136, 255, 200), "brandblue")).toDF("fill", "name")
    val m = df.select($"name", Style.textColor($"fill").as("tc")).collect()
      .map(r => r.getAs[String]("name") -> r.getSeq[Int](1).toList).toMap
    assert(m("dark") == Seq(255, 255, 255, 255))
    assert(m("light") == Seq(0, 0, 0, 255))
    assert(m("brandblue") == Seq(255, 255, 255, 255)) // luminance ≈ 0.26 < 0.5
  }

  test("label text: count for clusters, null for points") {
    val df = Seq((true, 42L), (false, 1L)).toDF("is_cluster", "point_count")
    val got = df.select(Style.labelText($"is_cluster", $"point_count")).collect()
    assert(got(0).getString(0) == "42" && got(1).isNullAt(0))
  }
}

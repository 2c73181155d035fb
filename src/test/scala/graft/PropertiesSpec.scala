package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Mercator
import graft.ids.ClusterId
import graft.io.SyntheticPoints

/** Property-based suite (SURVEY §5): algebraic invariants checked over
  * seeded random samples (deterministic — no flakes).
  */
class PropertiesSpec extends AnyFunSuite {
  private def rng = new scala.util.Random(42)

  test("cluster-ID encode/decode round-trips for all (index, zoom, total)") {
    val r = rng
    (1 to 500).foreach { _ =>
      val idx = r.nextLong(1L << 40)
      val z = r.nextInt(17)
      val total = 1L + r.nextLong(1L << 40)
      val id = ClusterId.encode(idx, z, total)
      assert(ClusterId.originIndex(id, total) == idx)
      assert(ClusterId.originLevel(id, total) == z + 1)
      assert(ClusterId.isCluster(id, total))
    }
  }

  test("mercator projection round-trips within 1e-9 degrees") {
    val r = rng
    (1 to 1000).foreach { _ =>
      val lng = r.nextDouble() * 360.0 - 180.0
      val lat = r.nextDouble() * 169.8 - 84.9
      assert(math.abs(Mercator.xLng(Mercator.lngX(lng)) - lng) < 1e-9)
      assert(math.abs(Mercator.yLat(Mercator.latY(lat)) - lat) < 1e-9)
    }
  }

  test("mercator y is monotone decreasing in latitude and clamped to [0,1]") {
    val r = rng
    (1 to 1000).foreach { _ =>
      val a = r.nextDouble() * 180.0 - 90.0
      val b = r.nextDouble() * 180.0 - 90.0
      val (ya, yb) = (Mercator.latY(a), Mercator.latY(b))
      assert(ya >= 0.0 && ya <= 1.0)
      if (a < b) assert(ya >= yb) // north = smaller y
    }
  }

  test("LCG jump-ahead equals sequential draw at any position") {
    val r = rng
    (1 to 200).foreach { _ =>
      val seed = 1L + r.nextLong(100000L)
      val k = 1L + r.nextLong(2000L)
      var s = seed % 2147483647L
      (1L to k).foreach(_ => s = s * 16807 % 2147483647L)
      assert(SyntheticPoints.draw(seed, k) == s.toDouble / 2147483647L)
    }
  }

  test("greedy hierarchy conserves counts for arbitrary point sets") {
    val r = rng
    (1 to 25).foreach { _ =>
      val n = r.nextInt(200)
      val seed = 1L + r.nextLong(99999L)
      val pts = PointFixtures.uniform(n, seed)
      val rows = graft.cluster.GreedyCore
        .buildLevels(pts, graft.cluster.ClusterOptions()).toArray
      rows.groupBy(_.zoom).foreach { case (_, lvl) =>
        assert(lvl.map(_.point_count).sum == n.toLong)
      }
      val byParent = rows.filter(_.parent_id != -1L).groupBy(_.parent_id)
      rows.filter(_.is_cluster).groupBy(_.id).foreach { case (id, rs) =>
        byParent.get(id).foreach { kids =>
          assert(kids.map(_.point_count).sum == rs.head.point_count)
        }
      }
    }
  }

  test("WKB decode round-trips random coordinates in both endiannesses") {
    val r = rng
    (1 to 200).foreach { _ =>
      val lng = r.nextDouble() * 360.0 - 180.0
      val lat = r.nextDouble() * 180.0 - 90.0
      Seq(true, false).foreach { le =>
        val buf = java.nio.ByteBuffer.allocate(21)
        buf.order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
        buf.put(if (le) 1.toByte else 0.toByte); buf.putInt(1)
        buf.putDouble(lng); buf.putDouble(lat)
        val row = graft.io.WkbPointDecode(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            buf.array(), org.apache.spark.sql.types.BinaryType))
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        assert(row.getDouble(0) == lng && row.getDouble(1) == lat)
      }
    }
  }
}

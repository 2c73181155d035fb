package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{ClusterEngine, ClusterOptions, IndexCache}

/** C1 rebuild gating (arrow-cluster-layer.ts:94-106, comparator :46-55):
  * the reference rebuilds the engine when ANY cluster option changes and
  * holds exactly one live index per source. The cache must key on the full
  * options — a changed radius returns a FRESH build and unpersists the
  * superseded one — while identical options keep returning the same index.
  */
class IndexCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pts = spark.range(200).select(
    col("id").as("row_id"),
    (col("id") % 20 * 0.5 - 5.0).as("lng"),
    (col("id") % 10 * 0.5 - 2.5).as("lat"))

  test("same options hit the cache; a changed radius rebuilds and frees the old index") {
    val cache = new IndexCache
    var builds = 0
    def load(opts: ClusterOptions) = cache.get(spark, "memdir", opts) {
      builds += 1
      ClusterEngine.load(pts, opts, idCol = Some("row_id")).persist()
    }

    val a1 = load(ClusterOptions())
    val a2 = load(ClusterOptions())
    assert(builds == 1 && (a1 eq a2), "identical options must reuse the build")
    assert(a1.levels.storageLevel != StorageLevel.NONE)

    val b = load(ClusterOptions(radius = 80))
    assert(builds == 2, "a changed radius must trigger a rebuild")
    assert(!(b eq a1))
    assert(a1.levels.storageLevel == StorageLevel.NONE,
      "the superseded index's persisted levels must be freed")
    assert(b.levels.storageLevel != StorageLevel.NONE)

    // flipping back is ALSO a rebuild — the cache holds one index per dir,
    // mirroring the reference's single-engine-per-layer lifecycle
    val c = load(ClusterOptions())
    assert(builds == 3 && !(c eq a1))
    c.unpersist(); b.unpersist()
  }

  test("concurrent sessions keep separate entries — no cross-session thrash or unpersist") {
    val cache = new IndexCache
    val spark2 = spark.newSession()
    def load(s: org.apache.spark.sql.SparkSession) = cache.get(s, "memdir2", ClusterOptions()) {
      ClusterEngine.load(
        s.range(100).select(
          col("id").as("row_id"),
          (col("id") % 10 * 0.5).as("lng"), (col("id") % 5 * 0.5).as("lat")),
        ClusterOptions(), idCol = Some("row_id")).persist()
    }
    val i1 = load(spark)
    val i2 = load(spark2)
    assert(!(i1 eq i2), "each session builds its own index")
    // alternating sessions must hit, not rebuild+unpersist the other's
    assert(load(spark) eq i1)
    assert(load(spark2) eq i2)
    assert(i1.levels.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    assert(i2.levels.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    i1.unpersist(); i2.unpersist()
  }
}

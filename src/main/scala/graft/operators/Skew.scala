package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Hot-key (skew) toolkit — the two shapes AQE cannot fix on its own.
  *
  * AQE's skew handling splits oversized SORT-MERGE-JOIN partitions after a
  * shuffle; it does nothing for a hot key inside a WINDOW function (one
  * key = one task, unsplittable) and nothing for hash aggregations whose
  * per-key state is the problem. At 100 TB a single viral key (one URL,
  * one null-ish user id, one boilerplate document hash) routinely holds
  * 10^8+ rows, so per-key rank/top-k work needs an explicit two-phase
  * plan: fan the key out over deterministic salts, reduce within each
  * salt shard, then reduce the k·salts survivors. Both phases are
  * provably exact — no sampling, no approximation.
  */
object Skew {

  def all: Seq[GraftQuery] = Seq(skewTopKEvents)

  /** Exact per-key top-k that survives a hot key: phase 1 ranks within
    * (key, salt) shards — each task sees ≤ |hot key| / salts rows — and
    * keeps k per shard; phase 2 ranks the ≤ k·salts survivors per key.
    *
    * Exactness: any row in the true per-key top-k is also within the
    * top-k of its own salt shard (rows above it in its shard are above
    * it globally), so phase 1's survivor set contains the true top-k and
    * phase 2 recovers exactly it — for ANY salt assignment and ANY salt
    * count. `saltBy` should be a high-cardinality column (a row id); the
    * `order` columns must make the ranking total (tie-break) for a
    * deterministic result.
    */
  def skewTopK(
      df: DataFrame,
      key: Column,
      saltBy: Column,
      order: Seq[Column],
      k: Int,
      salts: Int): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    require(salts >= 1, s"salt count must be >= 1, got $salts")
    val salted = df.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val shard = Window.partitionBy(key, col("_salt")).orderBy(order: _*)
    val survivors = salted
      .withColumn("_rk1", row_number().over(shard))
      .where(col("_rk1") <= k)
      .drop("_salt", "_rk1")
    survivors
      .withColumn("rk", row_number().over(Window.partitionBy(key).orderBy(order: _*)).cast("long"))
      .where(col("rk") <= k)
  }

  /** Exact inner equi-join that survives a hot key on the big side: the
    * big side salts on `saltBy`, the small side replicates once per salt,
    * and the join key becomes (key, salt) — the hot key's rows spread
    * over `salts` tasks instead of one. Row-for-row equal to
    * `big.join(small, key)`: each big row meets exactly the small rows
    * of its key, in exactly one salt shard. Costs a `salts`× blowup of
    * the SMALL side only — size it so |small| · salts stays shuffle-cheap.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Column,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salt count must be >= 1, got $salts")
    val b = big.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val s = small.withColumn("_salt", explode(array((0 until salts).map(lit(_)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-5 events per event_type by value through the salted two-phase
    * window (salts = 8 on the unique event_id). The oracle is the PLAIN
    * top-k — the whole point: the salted plan is a pure execution-shape
    * change, value-identical to the single-window answer.
    */
  val skewTopKEvents: GraftQuery = GraftQuery.sql(
    "q90_skew_topk",
    """WITH ranked AS (
      |  SELECT event_id, event_type, value,
      |    CAST(ROW_NUMBER() OVER (
      |      PARTITION BY event_type
      |      ORDER BY value DESC, event_id) AS BIGINT) AS rk
      |  FROM events
      |)
      |SELECT event_id, event_type, value, rk
      |FROM ranked WHERE rk <= 5
      |ORDER BY event_type, rk""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    skewTopK(ev, col("event_type"), col("event_id"),
      Seq(desc("value"), col("event_id")), k = 5, salts = 8)
      .orderBy("event_type", "rk")
  }
}

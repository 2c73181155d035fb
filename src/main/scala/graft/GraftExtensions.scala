package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{AnnServe, DoubleDotProduct, ExactDotProduct, ShingleBandMins}
import graft.io.WkbPointDecode

/** SQL surface for graft's native Catalyst expressions.
  *
  * Two registration paths, same function set:
  *  - `spark.sql.extensions=graft.GraftExtensions` (cluster-wide, the
  *    idiomatic SparkSessionExtensions injection point), or
  *  - `GraftExtensions.register(spark)` on a live session (what Verify,
  *    Bench, and the specs use).
  *
  * Registered functions: `graft_exact_dot`, `graft_dot`,
  * `graft_minhash_bands`, `graft_wkb_point`, `graft_mercator_x/y`,
  * `graft_mercator_lng/lat`, `graft_fround`,
  * `graft_cluster_origin_level/origin_index`, `graft_is_cluster`,
  * `graft_ann_serve` (the calibrated ANN serving tier — see
  * [[graft.functions.AnnServe]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  // Composed functions registered as SQL: Catalyst trees built node-for-
  // node as the Column-API definitions build them (`Mercator.lngXCol`
  // etc. — same association, same folded constants), so the SQL forms
  // return bit-identical doubles; GraftExtensionsSpec locks the equality.
  // (The Column→Expression bridge can't be reused here: Column ops build
  // lazily-resolved ColumnNodes, and a function-registry builder must
  // return a tree the analyzer can finish directly.)
  import org.apache.spark.sql.catalyst.expressions.{
    Add, Atan, Cast, Divide, Exp, Greatest, GreaterThanOrEqual, Least, Log,
    Multiply, Remainder, ShiftRight, Sin, Subtract, ToRadians}
  import org.apache.spark.sql.types.{DoubleType, FloatType}
  private def d(v: Double): Expression = Literal(v)
  private def lngXExpr(lng: Expression): Expression = Add(Divide(lng, d(360.0)), d(0.5))
  private def latYExpr(lat: Expression): Expression = {
    val s = Sin(ToRadians(lat))
    val y = Subtract(d(0.5),
      Divide(Multiply(d(0.25), Log(Divide(Add(d(1.0), s), Subtract(d(1.0), s)))), d(math.Pi)))
    Least(Seq(Greatest(Seq(y, d(0.0))), d(1.0)))
  }
  private def xLngExpr(x: Expression): Expression = Multiply(Subtract(x, d(0.5)), d(360.0))
  private def yLatExpr(y: Expression): Expression = {
    val y2 = Multiply(Subtract(d(180.0), Multiply(y, d(360.0))), d(math.Pi / 180.0))
    Subtract(Divide(Multiply(d(360.0), Atan(Exp(y2))), d(math.Pi)), d(90.0))
  }
  private def froundExpr(e: Expression): Expression =
    Cast(Cast(e, FloatType), DoubleType)

  private[graft] val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_exact_dot",
      new ExpressionInfo(classOf[ExactDotProduct].getName, "graft_exact_dot"),
      { case Seq(a, b) => ExactDotProduct(a, b) }),
    ("graft_dot",
      new ExpressionInfo(classOf[DoubleDotProduct].getName, "graft_dot"),
      { case Seq(a, b) => DoubleDotProduct(a, b) }),
    ("graft_minhash_bands",
      new ExpressionInfo(classOf[ShingleBandMins].getName, "graft_minhash_bands"),
      { case Seq(tokens, n, bands) =>
        ShingleBandMins(tokens, intArg("n", n), intArg("bands", bands)) }),
    ("graft_wkb_point",
      new ExpressionInfo(classOf[WkbPointDecode].getName, "graft_wkb_point"),
      { case Seq(b) => WkbPointDecode(b) }),
    // mercator projection + the reference's f32 quantization (P5-P9)
    ("graft_mercator_x",
      new ExpressionInfo(graft.geo.Mercator.getClass.getName, "graft_mercator_x"),
      { case Seq(lng) => lngXExpr(lng) }),
    ("graft_mercator_y",
      new ExpressionInfo(graft.geo.Mercator.getClass.getName, "graft_mercator_y"),
      { case Seq(lat) => latYExpr(lat) }),
    ("graft_mercator_lng",
      new ExpressionInfo(graft.geo.Mercator.getClass.getName, "graft_mercator_lng"),
      { case Seq(x) => xLngExpr(x) }),
    ("graft_mercator_lat",
      new ExpressionInfo(graft.geo.Mercator.getClass.getName, "graft_mercator_lat"),
      { case Seq(y) => yLatExpr(y) }),
    ("graft_fround",
      new ExpressionInfo(graft.geo.Mercator.getClass.getName, "graft_fround"),
      { case Seq(e) => froundExpr(e) }),
    // cluster-ID packing (Q6): decode (id, total_points) without a lookup
    ("graft_cluster_origin_level",
      new ExpressionInfo(graft.ids.ClusterId.getClass.getName, "graft_cluster_origin_level"),
      { case Seq(id, tp) =>
        Cast(Remainder(Subtract(id, tp), Literal(32)), IntegerType) }),
    ("graft_cluster_origin_index",
      new ExpressionInfo(graft.ids.ClusterId.getClass.getName, "graft_cluster_origin_index"),
      { case Seq(id, tp) => ShiftRight(Subtract(id, tp), Literal(5)) }),
    ("graft_is_cluster",
      new ExpressionInfo(graft.ids.ClusterId.getClass.getName, "graft_is_cluster"),
      { case Seq(id, tp) => GreaterThanOrEqual(id, tp) }),
    // calibrated ANN serving tier (r13 verdict #5): 3-arg form uses the
    // serve() defaults (targetRecall 0.9, topK 3); 5-arg pins both.
    // Casts at the call boundary stand in for ImplicitCastInputTypes
    // (sql-private): float embeddings and int ids coerce exactly as the
    // Scala serve()'s cast("array<double>")/cast("long") do.
    ("graft_ann_serve",
      new ExpressionInfo(classOf[AnnServe].getName, "graft_ann_serve"),
      { args =>
        import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
        def build(p: Expression, q: Expression, v: Expression,
            tr: Expression, k: Expression) = {
          // warm the serving handle DRIVER-SIDE at analysis time: the
          // open reads parquet (a Spark job), which task-thread eval
          // cannot do — so the path must be a literal. Non-literal paths
          // defer to eval, which throws with this exact remedy. The
          // warmed GENERATION is pinned into the expression, so every
          // row of this query answers from this one save even when a
          // concurrent query's warm() refreshes the handle (r14 advice).
          val gen: Long =
            if (!p.foldable) -1L
            else {
              val pv = Cast(p, StringType).eval(null)
              if (pv == null) -1L
              else {
                graft.operators.AnnServeRegistry.warm(pv.toString)
                graft.operators.AnnServeRegistry.pin(pv.toString)
              }
            }
          AnnServe(Cast(p, StringType), Cast(q, LongType),
            Cast(v, ArrayType(DoubleType)), Cast(tr, DoubleType),
            Cast(k, IntegerType), gen)
        }
        args match {
          case Seq(p, q, v) => build(p, q, v, Literal(0.9), Literal(3))
          case Seq(p, q, v, tr, k) => build(p, q, v, tr, k)
          case other => throw new IllegalArgumentException(
            s"graft_ann_serve takes 3 or 5 arguments, got ${other.size}")
        }
      }))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}

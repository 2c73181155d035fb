package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DoubleDotProduct, ExactDotProduct, ShingleBandMins}
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
  * `graft_minhash_bands`, `graft_wkb_point`.
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
      { case Seq(b) => WkbPointDecode(b) }))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}

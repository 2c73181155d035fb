package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-Mercator unit-square projection (reference:
  * packages/arrow-supercluster/src/mercator.ts:9-31).
  *
  * Two faces of the same math: `Column` expressions for declarative plans
  * (pure built-in functions → whole-stage codegen, no UDFs) and plain
  * `Double` functions for the in-core clustering pass.
  */
object Mercator {
  // ---- Column expressions (Catalyst, codegen'd) ----

  /** lng → x in [0,1] (mercator.ts:9-11). */
  def lngXCol(lng: Column): Column = lng / 360.0 + 0.5

  /** lat → y in [0,1], clamped (mercator.ts:14-18). */
  def latYCol(lat: Column): Column = {
    val s = sin(radians(lat))
    val y = lit(0.5) - lit(0.25) * log((lit(1.0) + s) / (lit(1.0) - s)) / math.Pi
    least(greatest(y, lit(0.0)), lit(1.0))
  }

  /** x → lng (mercator.ts:21-23). */
  def xLngCol(x: Column): Column = (x - 0.5) * 360.0

  /** y → lat (mercator.ts:26-29). */
  def yLatCol(y: Column): Column = {
    val y2 = (lit(180.0) - y * 360.0) * (math.Pi / 180.0)
    lit(360.0) * atan(exp(y2)) / math.Pi - 90.0
  }

  /** f32 quantization (P9, arrow-cluster-engine.ts:94-95): keep for parity. */
  def froundCol(c: Column): Column = c.cast("float").cast("double")

  // ---- Scalar versions (identical math, used inside the cluster core) ----

  def lngX(lng: Double): Double = lng / 360.0 + 0.5

  // The scalar mirrors replicate the Column codegen BIT-EXACTLY: same
  // association (constants folded the way Catalyst folds them) and the
  // same intrinsics — Spark's `exp`/`log` lower to StrictMath, its
  // `sin`/`atan` to Math, and `radians` to Math.toRadians.
  //
  // NOTE: aligning the association to Catalyst (r6) also moved these
  // scalars' results at sub-ULP level for their PRE-EXISTING callers (the
  // golden-locked exact build in GreedyCore and the engine's bbox math) —
  // the exact-build golden differential fixture was re-verified green
  // under the new association (f32 quantization absorbs the shift), so
  // the Catalyst-matching form IS the scalar contract from r6 on.

  def latY(lat: Double): Double = {
    val s = Math.sin(Math.toRadians(lat))
    val y = 0.5 - 0.25 * StrictMath.log((1.0 + s) / (1.0 - s)) / math.Pi
    if (y < 0.0) 0.0 else if (y > 1.0) 1.0 else y
  }

  def xLng(x: Double): Double = (x - 0.5) * 360.0

  def yLat(y: Double): Double = {
    val y2 = (180.0 - y * 360.0) * (math.Pi / 180.0)
    360.0 * Math.atan(StrictMath.exp(y2)) / math.Pi - 90.0
  }

  def fround(d: Double): Double = d.toFloat.toDouble
}

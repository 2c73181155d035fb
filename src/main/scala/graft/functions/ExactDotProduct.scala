package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType, FloatType}

/** Exact decimal dot product of two float/double arrays as a single native
  * Catalyst expression.
  *
  * Semantics are IDENTICAL to the declarative tree
  * `aggregate(zip_with(a, b, (x,y) -> cast(x*y as decimal(25,15))), 0, +)`:
  * each IEEE-double product is rounded to scale 15 exactly the way Spark's
  * `Cast(double → decimal)` does (shortest-string BigDecimal, HALF_UP), and
  * the partial sums are exact (scale never truncated) — so results stay
  * bit-identical across engines and accumulation orders. One fused loop per
  * row replaces two materialized intermediate arrays and ~3·dim interpreted
  * lambda frames, which is what makes pairwise similarity joins feasible.
  *
  * Null if either array is null; mismatched lengths dot the common prefix
  * (zip_with pads with null — here we stop, equivalent since a null product
  * would nullify the sum; callers always pass equal-length vectors).
  *
  * DELIBERATELY CodegenFallback — measured, not an omission (r11). The
  * expensive decimal kernel is always used through the hoisted-norm
  * discipline: `normSqExact` is projected BELOW a broadcast join so each
  * input row pays ONE decimal dot (AnnIvf.search, Similarity q28/q88).
  * Whole-stage codegen evaluates projection columns LAZILY at first use:
  * make this expression codegen-able and the norm projection fuses into
  * the join stage, deferring the decimal dot into the per-MATCH loop —
  * every candidate pair recomputes both sides' norms, exactly what the
  * hoisting exists to prevent. Measured on the full sf0.1 suite when an
  * r11 experiment gave this expression a real `doGenCode`: q88 0.84 →
  * 3.72 s, q47 2.06 → 2.88 s, q98 2.18 → 3.50 s — reverting recovered
  * all three (focused: q88 1.07 s). The fallback is the materialization
  * barrier that keeps "once per row" true; the per-row call overhead it
  * costs is noise against the BigDecimal loop it wraps. The cheap
  * [[DoubleDotProduct]] prefilter below IS codegen'd — recomputing a
  * primitive loop per match is cheaper than breaking its stage.
  */
case class ExactDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DecimalType(35, 15)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ExactDotProduct needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rightIsFloat) ys.getFloat(i).toDouble else ys.getDouble(i)
      val p = x * y
      if (p != 0.0d)
        acc = acc.add(JBigDecimal.valueOf(p).setScale(15, RoundingMode.HALF_UP))
      i += 1
    }
    Decimal(acc.setScale(15))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Plain IEEE-double dot product, fused loop — the cheap prefilter
  * companion to [[ExactDotProduct]]: within ~1e-12 of the exact decimal
  * value, so `approx > t - 1e-6` never drops a pair whose exact score
  * passes `> t`, and the expensive exact kernel only runs on survivors.
  * Codegen'd with the loop INLINE (primitive accumulator, no calls) —
  * this is the prefilter every candidate pair evaluates, the exact shape
  * [[AdcDistance]] generates for.
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DoubleDotProduct needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private lazy val lFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = if (lFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rFloat) ys.getFloat(i).toDouble else ys.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, lFloat)} * ${get(b, rFloat)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

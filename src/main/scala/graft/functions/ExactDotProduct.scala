package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
  * Codegen'd (static-helper shape, like [[PqCodes]]): the BigDecimal loop
  * itself is the cost, but a CodegenFallback here would break the
  * SURROUNDING projection — the q25/q28/q35 candidate scans — out of
  * whole-stage codegen, forcing an interpreted row pipeline around every
  * candidate (the same argument that earned [[AdcDistance]] its
  * `doGenCode` in r10).
  *
  * Null if either array is null; mismatched lengths dot the common prefix
  * (zip_with pads with null — here we stop, equivalent since a null product
  * would nullify the sum; callers always pass equal-length vectors).
  */
case class ExactDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

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

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExactDotProduct.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.functions.ExactDotProduct.compute(
       |  $a, $b, $leftIsFloat, $rightIsFloat);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactDotProduct =
    copy(left = newLeft, right = newRight)
}

object ExactDotProduct {
  /** Shared by eval and generated code (static forwarder). Never null for
    * non-null inputs — nullSafeCodeGen's isNull from the children stands.
    */
  def compute(
      xs: ArrayData, ys: ArrayData,
      leftIsFloat: Boolean, rightIsFloat: Boolean): Decimal = {
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

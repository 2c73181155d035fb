package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused PQ kernels — the two interpreted-HOF hot loops of the product-
  * quantization ladder (q63/q100) as single native expressions.
  *
  * [[PqCodes]] replaces encode's declarative per-subspace argmin chain
  * (`transform(codebook_j, c -> aggregate(zip_with(slice(v), c, ...)))`
  * × m subspaces — m·k interpreted lambda frames and ~3·m·k small array
  * allocations PER ROW), which at 1M vectors measured 40 s of the 53 s
  * encode: the fused loop computes all m codes in primitive arithmetic,
  * one pass over the vector. Arithmetic is IDENTICAL to the declarative
  * tree: per-centroid distance is the strict left-to-right IEEE fold of
  * (x-y)², the winning code is the FIRST index attaining the minimum
  * under SQL double ordering (NaN greatest — `array_position(apx,
  * array_min(apx))` semantics), so encoded codes — and therefore the
  * q63 oracle replay — are bit-identical (AnnPqSpec proves it
  * differentially).
  *
  * [[AdcDistance]] replaces the per-candidate ADC lookup fold
  * (`aggregate(sequence(0, m-1), 0.0, (acc, j) -> acc +
  * tab[j][codes[j]])` — an interpreted 8-step fold with two nested
  * element_at per step): same j-order summation, bit-identical totals.
  * This is the PQ scan's inner loop — the expression every candidate
  * row evaluates — so it bounds full-scan and probed-list search alike.
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // the short-vector guard below returns null even for a non-null child
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PqCodes needs an array<float|double> input, got ${dt.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    PqCodes.compute(input.asInstanceOf[ArrayData], codebooks, isFloat)

  // codegen'd like AdcDistance (the encode projection is a corpus-sized
  // map at build time): the kernel body stays one static call, with the
  // codebooks riding along as a referenced object. The short-vector
  // guard surfaces as a null result, so isNull is re-derived from the
  // returned value.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => s"""
       |${ev.value} = graft.functions.PqCodes.compute($v, $cbRef, $isFloat);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** All m codes for one vector; null for a short vector (the
    * declarative path nulls out via zip_with padding; callers never hit
    * this). Shared by eval and generated code (static forwarder).
    */
  def compute(
      v: ArrayData,
      codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    if (v.numElements() < m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val off = j * dsub
      var best = 0
      var bestD = 0.0
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) v.getFloat(off + i).toDouble else v.getDouble(off + i)
          val diff = x - cv(i)
          d += diff * diff
          i += 1
        }
        // first-minimum under SQL double ordering (NaN greatest): a
        // strict compareDoubles win replaces the incumbent, ties and
        // NaNs never do — array_position-of-array_min semantics
        if (c == 0 ||
            org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(d, bestD) < 0) {
          bestD = d
          best = c
        }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}

/** ADC total for one candidate: sum over j of `table(j)(codes(j))`,
  * strict j-order double addition — see [[PqCodes]] class doc.
  * `left` = array<int> codes, `right` = array<array<double>> per-query
  * table. Codegen'd (not CodegenFallback): this is the expression every
  * candidate row of the PQ/IVF+PQ scan evaluates, and a fallback here
  * would break the scan projection out of whole-stage codegen.
  *
  * Malformed input null-propagates the way the declarative
  * `element_at` fold it replaces does (under `spark.sql.ansi.enabled =
  * false`, this codebase's mode): a null code, a null table row, or an
  * out-of-range/null lookup makes the WHOLE result null rather than
  * reading garbage — internal callers (PQ encode output joined to the
  * per-query table) never hit the guard, so the hot loop's extra
  * comparisons are branch-predicted away.
  */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // the malformed-input guard surfaces as null even for non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"AdcDistance needs (array<int>, array<array<double>>), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override protected def nullSafeEval(codesAny: Any, tabAny: Any): Any =
    AdcDistance.compute(
      codesAny.asInstanceOf[ArrayData], tabAny.asInstanceOf[ArrayData])

  // the loop stays inline and primitive (no per-row boxing — this is the
  // per-candidate inner loop); the guard mirrors AdcDistance.compute,
  // whose equivalence the interpreted-vs-codegen spec pins
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tab) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nt = ctx.freshName("nt")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $codes.numElements();
         |final int $nt = $tab.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($codes.isNullAt($j) || $j >= $nt || $tab.isNullAt($j)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  final org.apache.spark.sql.catalyst.util.ArrayData $row = $tab.getArray($j);
         |  final int $c = $codes.getInt($j);
         |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $row.getDouble($c);
         |}
         |${ev.value} = ${ev.isNull} ? 0.0 : $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  /** Boxed ADC total, or null on any malformed lookup (element_at null
    * semantics). Shared by eval and generated code (static forwarder) —
    * the same shape as [[PqCodes.compute]].
    */
  def compute(codes: ArrayData, tab: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    val tabs = tab.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || j >= tabs || tab.isNullAt(j)) return null
      val row = tab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

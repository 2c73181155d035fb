package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature kernel: token array → word n-gram shingles →
  * md5 per shingle → per-band minimum, in ONE native loop per row.
  *
  * Value-identical to the declarative chain
  * `shingles → shingleHashes → minhashBand(b)` (TextFunctions): shingle =
  * space-joined tokens, hash = lowercase md5 hex of the utf-8 shingle,
  * band b's hash = hex rotated left by 8·b chars, min = lexicographic
  * (equals binary order — hex is ASCII). The declarative chain evaluates
  * interpreted lambda frames per element per band; this kernel hashes each
  * shingle once and keeps 4 running minima — the difference between an
  * LSH signature scan being md5-bound and lambda-interpreter-bound.
  *
  * Returns null when the document has fewer than `n` tokens (the
  * declarative `array_min(empty)` is null per band; callers `element_at`
  * into the null array and get the same nulls).
  *
  * Codegen'd (static-helper shape, like [[PqCodes]]): the md5 loop is
  * the cost, but a CodegenFallback would break the q25/q35 signature
  * projection out of whole-stage codegen around it.
  */
case class ShingleBandMins(child: Expression, n: Int, bands: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 8, "shingle size out of range")
  require(bands >= 1 && bands <= 4, "hex rotation defines at most 4 bands")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // the short-document guard below returns null even for a non-null child
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ShingleBandMins needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleBandMins.compute(input.asInstanceOf[ArrayData], n, bands)

  // static-helper codegen like PqCodes: the short-document guard
  // surfaces as a null result, so isNull is re-derived from the value
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
       |${ev.value} = graft.functions.ShingleBandMins.compute($v, $n, $bands);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleBandMins =
    copy(child = newChild)
}

object ShingleBandMins {
  private val hexChars = "0123456789abcdef".toCharArray

  /** All band minima for one token array; null for a short document.
    * Shared by eval and generated code (static forwarder).
    */
  def compute(toks: ArrayData, n: Int, bands: Int): ArrayData = {
    val numTokens = toks.numElements()
    val numShingles = numTokens - (n - 1)
    if (numShingles <= 0) return null

    val md = MessageDigest.getInstance("MD5")
    // running minimum per band, as (hex, implicit rotation) — compare
    // without materializing rotated strings
    val mins = new Array[Array[Char]](bands)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < numShingles) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        val t = toks.getUTF8String(i + k)
        sb.append(if (t == null) "" else t.toString)
        k += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var d = 0
      while (d < 16) {
        hex(d * 2) = hexChars((digest(d) >> 4) & 0xf)
        hex(d * 2 + 1) = hexChars(digest(d) & 0xf)
        d += 1
      }
      var b = 0
      while (b < bands) {
        if (mins(b) == null || rotatedLess(hex, mins(b), b * 8)) mins(b) = hex
        b += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val h = mins(b)
      val rot = b * 8
      val r = new Array[Char](32)
      var k = 0
      while (k < 32) { r(k) = h((k + rot) % 32); k += 1 }
      out(b) = UTF8String.fromString(new String(r))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** hex-rotated-by-`rot` comparison: a < b under left rotation by rot. */
  private def rotatedLess(a: Array[Char], b: Array[Char], rot: Int): Boolean = {
    var k = 0
    while (k < 32) {
      val ca = a((k + rot) % 32)
      val cb = b((k + rot) % 32)
      if (ca != cb) return ca < cb
      k += 1
    }
    false
  }
}

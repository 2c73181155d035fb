package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE-encode kernel — q80's per-word hot loop as one native
  * expression.
  *
  * The declarative chain (the executable semantics spec, kept in
  * `PipelineOps` under `exprKernel = false` and replayed verbatim by the
  * DuckDB oracle) is: bracket every character
  * (`concat_ws("", transform(sequence(1, length(w)), i => "(" ||
  * substr(w, i, 1) || ")")`), apply each learned merge as a LITERAL
  * string replace of `"(l)(r)"` with `"(lr)"` in merge-rank order, then
  * count tokens as `size(split(substr(s, 2, length(s) - 2), "\\)\\("))`.
  * `transform` is an interpreted higher-order function — one lambda frame
  * and a string allocation PER CHARACTER of the corpus — and each replace
  * materializes another full-width intermediate string. That chain is the
  * whole cost of q80, the corpus-sized tokenization map.
  *
  * [[BpeTokenCount]] computes the identical integer in one pass: build
  * the bracketed form with a primitive code-point loop (code points are
  * exactly what `substr(w, i, 1)` yields per index — UTF8String counts
  * characters as code points, so supplementary-plane characters bracket
  * identically), run the same literal left-to-right non-overlapping
  * replaces (`String.replace` — the same scan-continue-after-replacement
  * discipline as Spark's `StringReplace`/UTF8String.replace and DuckDB's
  * `replace`; matching operates on the TEXT, so words containing
  * parentheses hit the same degenerate matches in both engines), and
  * count separators the way `split(..., "\\)\\(", -1)` does (parts =
  * non-overlapping matches + 1, trailing empties kept, `substr(2, n-2)`
  * of a string shorter than 2 characters is empty → 1 part). The result
  * is an exact integer, so kernel-vs-declarative equality is provable
  * row-for-row (BpeKernelSpec does, including paren/metacharacter/
  * unicode adversaries).
  */
object BpeKernels {
  /** One word → its post-merge BPE token count. `pats(j)`/`reps(j)` are
    * the pre-rendered `"(l)(r)"`/`"(lr)"` literals in merge-rank order.
    * Called from both eval and generated code (static forwarder).
    */
  def tokenCount(word: UTF8String, pats: Array[String], reps: Array[String]): Int = {
    val w = word.toString
    val sb = new java.lang.StringBuilder(w.length * 3)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      sb.append('(').append(w, i, i + n).append(')')
      i += n
    }
    var s = sb.toString
    var j = 0
    while (j < pats.length) {
      s = s.replace(pats(j), reps(j))
      j += 1
    }
    // size(split(substr(s, 2, cpLen - 2), "\)\(")): the inner substring
    // drops the first and last CODE POINT; a length-<2 string yields "".
    // ")(" is ASCII, so occurrence counting is identical on the UTF-16
    // representation; matches can't start inside the dropped first char
    // and can't extend into the dropped last char without being cut, so
    // count matches of ")(" strictly inside [firstCpWidth, len-lastCpWidth).
    val len = s.length
    if (len == 0) return 1
    val firstW = Character.charCount(s.codePointAt(0))
    val lastW = Character.charCount(s.codePointBefore(len))
    val lo = firstW
    val hi = len - lastW // exclusive end of the inner region
    if (hi <= lo) return 1 // fewer than 2 code points → inner is empty
    var count = 1
    var from = lo
    while (from < hi - 1) {
      val idx = s.indexOf(")(", from)
      if (idx < 0 || idx + 2 > hi) from = hi
      else { count += 1; from = idx + 2 }
    }
    count
  }
}

/** `BpeTokenCount(word)` — IntegerType, null-safe; see [[BpeKernels]]. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BpeTokenCount needs a string input, got ${dt.catalogString}")
  }

  @transient private lazy val pats: Array[String] =
    merges.map { case (l, r) => s"($l)($r)" }.toArray
  @transient private lazy val reps: Array[String] =
    merges.map { case (l, r) => s"($l$r)" }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeKernels.tokenCount(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the merge literals ride along as referenced objects — the kernel
    // call itself stays a static one-liner inside the fused projection
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    defineCodeGen(ctx, ev, w =>
      s"graft.functions.BpeKernels.tokenCount($w, $patsRef, $repsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

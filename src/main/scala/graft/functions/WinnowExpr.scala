package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing selection kernel (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03) as one native static method: codepoints → k-gram
  * polynomial hashes (`(h·31+c) mod 2³¹−1`, the same family as the
  * rolling-hash query) → sliding window-min → sorted distinct longs.
  *
  * Kept outside the expression class so the generated whole-stage code
  * calls a single JIT-compiled static method per row — the fused form
  * of the three chained array HOFs it replaces (char-split, per-gram
  * fold, window-min), which allocate three intermediate arrays and an
  * interpreter frame per lambda element.
  */
object WinnowKernel {
  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val gl = cps.length - k + 1
    if (gl < 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val grams = new Array[Long](gl)
    var i = 0
    while (i < gl) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + cps(i + j)) % 2147483647L; j += 1 }
      grams(i) = h
      i += 1
    }
    // window-min; if there are fewer grams than a window, one partial
    // window selects the global min (the HOF form's greatest(..., 1))
    val wn = math.max(gl - w + 1, 1)
    val sel = new Array[Long](wn)
    var p = 0
    while (p < wn) {
      var m = grams(p)
      var q = p + 1
      val end = math.min(p + w, gl)
      while (q < end) { if (grams(q) < m) m = grams(q); q += 1 }
      sel(p) = m
      p += 1
    }
    java.util.Arrays.sort(sel)
    var out = 1
    var r = 1
    while (r < wn) {
      if (sel(r) != sel(out - 1)) { sel(out) = sel(r); out += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sel, out))
  }
}

/** `winnow_select(text, k, w)` → sorted distinct selected gram hashes
  * (`array<bigint>`). Bit-identical to the HOF pipeline it replaces
  * (WinnowExprSpec proves equality over the corpus); NULL text → NULL.
  * k and w must be foldable positive ints (they parameterize generated
  * code).
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_select needs k,w >= 1, got ($k,$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_select expects a string column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowKernel.select($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSelect = copy(child = newChild)
}

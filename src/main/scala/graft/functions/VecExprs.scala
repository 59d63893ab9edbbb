package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native codegen'd vector kernels (`vec_dot`, `vec_dist2`) — the
  * custom-`Expression` tier of the extension ladder (SURVEY.md §7.3)
  * applied to the ANN/dedup hot path.
  *
  * Why not the `aggregate(zip_with(...))` higher-order-function fold that
  * VectorOps used through round 4: array HOFs are interpreted (they
  * allocate a lambda frame per element and fall out of whole-stage
  * codegen — PERF.md "negative results" documents the 3× HOF tax), and on
  * `ann_cosine_neardup` the pair dot runs once per CANDIDATE PAIR, so the
  * interpreter tax multiplies with the quadratic term. These kernels emit
  * a tight primitive `for` loop inside whole-stage codegen: no boxing, no
  * per-element closure, same arithmetic.
  *
  * Bit-parity contract (the DuckDB oracle hashes exact doubles): the loop
  * accumulates STRICTLY LEFT-TO-RIGHT in double — `acc += (double)a[i] *
  * (double)b[i]` — exactly the fold order of both the old HOF form and
  * the oracle's `list_sum(list_transform(...))` (memory: per-pair float
  * dots must stay left-to-right folds in BOTH engines). Float inputs are
  * widened per element (exact); no FMA, no pairwise/SIMD reassociation.
  *
  * Null semantics mirror the HOF form it replaces: NULL array → NULL;
  * NULL element or length mismatch → NULL (zip_with pads the short side
  * with NULL, and `null * x` poisons the HOF fold to NULL).
  */
abstract class VecFoldBase extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source for one accumulation step given element expressions. */
  protected def stepJava(acc: String, x: String, y: String): String
  /** Scala-side accumulation step (interpreted eval fallback). */
  protected def step(acc: Double, x: Double, y: Double): Double
  protected def fnName: String

  private def elemOk(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fnName expects (array<float|double>, array<float|double>), " +
            s"got (${l.sql}, ${r.sql})")
    }

  // hoisted once per expression instance — the interpreted fallback's
  // fold loop must not re-resolve the element type per element
  @transient private lazy val leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val leftIsFloat: Boolean = leftElem == FloatType
  @transient private lazy val rightIsFloat: Boolean = rightElem == FloatType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = leftIsFloat
    val rf = rightIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc = step(acc, x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lc = left.genCode(ctx)
    val rc = right.genCode(ctx)
    val a = ctx.freshName("va")
    val b = ctx.freshName("vb")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    def getter(t: DataType, arr: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val body =
      s"""
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |${lc.code}
         |if (!${lc.isNull}) {
         |  ${rc.code}
         |  if (!${rc.isNull}) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $a = ${lc.value};
         |    org.apache.spark.sql.catalyst.util.ArrayData $b = ${rc.value};
         |    final int $n = $a.numElements();
         |    if ($n == $b.numElements()) {
         |      ${ev.isNull} = false;
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |          ${ev.isNull} = true; break;
         |        }
         |        ${stepJava(acc, getter(leftElem, a), getter(rightElem, b))}
         |      }
         |      ${ev.value} = $acc;
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(code = code"$body")
  }
}

/** `vec_dot(a, b)` = Σᵢ aᵢ·bᵢ, left-to-right in double. */
case class VecDot(left: Expression, right: Expression) extends VecFoldBase {
  override protected def fnName: String = "vec_dot"
  override protected def step(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def stepJava(acc: String, x: String,
      y: String): String = s"$acc = $acc + $x * $y;"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

/** `vec_dist2(a, b)` = Σᵢ (aᵢ−bᵢ)², left-to-right in double. */
case class VecDist2(left: Expression, right: Expression)
    extends VecFoldBase {
  override protected def fnName: String = "vec_dist2"
  override protected def step(acc: Double, x: Double, y: Double): Double = {
    val d = x - y
    acc + d * d
  }
  override protected def stepJava(acc: String, x: String,
      y: String): String =
    s"{ final double d = $x - $y; $acc = $acc + d * d; }"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDist2 =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave of two 32-bit keys into one 64-bit
  * clustering key — the data-LAYOUT primitive for multi-dimensional
  * pruning at scale: sort/range-partition a 100 TB table by
  * `zorder2(a, b)` and parquet min/max row-group stats become selective
  * for predicates on EITHER dimension (a plain sort clusters only its
  * leading column). The expression itself is a per-row bit shuffle —
  * map-only, no shuffle — the layout job around it is a normal
  * `repartitionByRange(zorder2(...))` write.
  *
  * Inputs are treated as UNSIGNED 32-bit lanes (callers pass
  * non-negative keys or accept two's-complement lane order). Bit i of
  * `left` lands at output bit 2i, bit i of `right` at 2i+1 — the
  * classic magic-number spread, identical in interpreted eval and
  * generated code via the shared [[ZOrder]] helpers.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (INT, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ZOrder.interleave(l.asInstanceOf[Int], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.ZOrder.interleave($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Spread the 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. */
  def interleave(a: Int, b: Int): Long =
    spread(a) | (spread(b) << 1)

  /** Inverse of [[spread]] (test/debug surface). */
  def compact(z: Long): Int = {
    var x = z & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >>> 16)) & 0x00000000ffffffffL
    x.toInt
  }

  /** Inverse of [[interleave]]: (a, b) back out of the Morton code. */
  def deinterleave(z: Long): (Int, Int) =
    (compact(z), compact(z >>> 1))

  /** The oracle mirror: an unrolled 64-term bit-arithmetic SQL
    * expression computing the same Morton code in any engine with
    * BIGINT shifts (used by the DuckDB gate — no loops in SQL).
    * Callers must pass non-negative 31-bit expressions.
    */
  def unrolledSql(a: String, b: String): String = {
    val terms =
      (0 until 31).map(i =>
        s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i})") ++
        (0 until 31).map(i =>
          s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }
}

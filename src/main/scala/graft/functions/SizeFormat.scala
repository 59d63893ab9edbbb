package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Bytes → human-readable size string, exact parity with the reference's
  * utils/size_formatter.py:1-25 (the canonical variant — it feeds the ES
  * documents; SURVEY.md §7.4 risk 3).
  *
  * Parity subtleties:
  *  - `if not size_bytes` treats NULL and 0 alike → "0 B".
  *  - Python's f"{x:.1f}" rounds the exact binary double half-to-even
  *    (same as C printf, same as DuckDB's printf). Java's String.format
  *    rounds HALF_UP instead, so we go through BigDecimal(double) —
  *    the exact binary value — with HALF_EVEN.
  *  - Repeated `size /= 1024` is bit-exact equal to a single division by
  *    2^(10k) (power-of-two division only shifts the exponent), so the
  *    loop is safe to express either way.
  */
object SizeFormat {
  private val units = Array("B", "KB", "MB", "GB", "TB", "PB")

  def formatSize(sizeBytes: java.lang.Long): String = {
    if (sizeBytes == null || sizeBytes.longValue == 0L) return "0 B"
    var size = sizeBytes.doubleValue
    var i = 0
    while (size >= 1024d && i < units.length - 1) { size /= 1024d; i += 1 }
    if (size == math.floor(size) && !size.isInfinite)
      s"${size.toLong} ${units(i)}"
    else {
      val r = new JBigDecimal(size).setScale(1, RoundingMode.HALF_EVEN)
      s"${r.toPlainString} ${units(i)}"
    }
  }

  /** Column form. A plain Scala UDF (not codegen) is acceptable here: the
    * reference applies it once per output document at the sink boundary,
    * never in a hot join/agg path.
    */
  val format_size: Column => Column = {
    val u = udf(formatSize _)
    (c: Column) => u(c)
  }

  /** DuckDB-SQL equivalent used by the oracle queries: given an input
    * column name, yields (kExpr selecting the unit index, valueExpr) to be
    * staged through a CTE, plus the final formatting expression.
    */
  def duckdbExpr(col: String): String = {
    val k = (1 to 5).reverse
      .map(i => s"WHEN $col >= ${math.pow(2, 10.0 * i).toLong} THEN $i")
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""CASE WHEN $col IS NULL OR $col = 0 THEN '0 B' ELSE
       | (SELECT CASE WHEN v = floor(v)
       |    THEN CAST(CAST(v AS BIGINT) AS VARCHAR)
       |    ELSE printf('%.1f', v) END || ' ' ||
       |    (['B','KB','MB','GB','TB','PB'])[k + 1]
       |  FROM (SELECT $k AS k, $col / power(2.0, 10.0 * ($k)) AS v))
       |END""".stripMargin.replace("\n", " ")
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The native winnow_select kernel must be BIT-IDENTICAL to the
  * declarative HOF pipeline it replaced (char-split → per-gram poly
  * fold → window-min → sorted distinct) — the same parity discipline as
  * vec_dot vs the aggregate(zip_with(...)) fold.
  */
class WinnowExprSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"
  private val k = 8
  private val w = 4

  private def hofSel = expr(
    s"""array_sort(array_distinct(
       |  CASE WHEN size(grams) >= 1 THEN
       |    transform(sequence(1, greatest(size(grams) - $w + 1, 1)),
       |      j -> array_min(slice(grams, j, $w)))
       |  ELSE CAST(array() AS array<bigint>) END))""".stripMargin)

  test("native selection equals the HOF pipeline over the whole corpus") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables(spark, sf, "documents")
      .withColumn("gl", length(col("text")) - k + 1)
      .withColumn("codes",
        expr("transform(split(text, '(?!^)'), ch -> ascii(ch))"))
      .withColumn("grams", expr(
        s"""CASE WHEN gl >= 1 THEN transform(sequence(1, gl), i ->
           |  aggregate(slice(codes, i, $k),
           |    cast(0 AS bigint), (h, c) -> (h * 31 + c) % 2147483647))
           |ELSE CAST(array() AS array<bigint>) END""".stripMargin))
      .withColumn("hof", hofSel)
      .withColumn("native", expr(s"winnow_select(text, $k, $w)"))
    // compare on the driver: a filter on hof<=>native would be pushed
    // through the projections, inlining the gram pipeline into the
    // per-window lambdas (recomputing the gram array per element — an
    // O(n³) interpreted blowup this suite timed out on)
    val rows = docs.select(col("doc_id"), col("hof"), col("native"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native != HOF selection")
    }
  }

  test("kernel edge cases: sub-k text empty, ties deduped, null null") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("", 0), ("short", 1), ("aaaaaaaaaaaaaaaa", 2), // 16 a's: all grams equal
      ("exactly8", 3)).toDF("text", "id")
      .withColumn("sel", expr(s"winnow_select(text, $k, $w)"))
    val rows = df.select("id", "sel").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(rows(0).isEmpty && rows(1).isEmpty)
    // identical grams collapse to ONE selected hash
    assert(rows(2).length == 1)
    // text of exactly k chars: one gram, one window, one selection
    assert(rows(3).length == 1)
    val n = Seq((Option.empty[String], 0)).toDF("text", "id")
      .select(expr(s"winnow_select(text, $k, $w)").as("sel"))
      .collect()(0)
    assert(n.isNullAt(0))
  }
}

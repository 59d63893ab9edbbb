package graft.functions

import graft.SparkSpecBase

/** Morton-code correctness (known values + round-trip) and the locality
  * property that justifies z-order as a layout key: consecutive code
  * ranges of a complete grid cover square tiles, not full-width stripes.
  */
class ZOrderSpec extends SparkSpecBase {

  test("interleave: known bit patterns and inverses") {
    assert(ZOrder.interleave(0, 0) == 0L)
    // a = 0b11 → bits 0,2; b = 0b11 → bits 1,3
    assert(ZOrder.interleave(3, 0) == 0x5L)
    assert(ZOrder.interleave(0, 3) == 0xaL)
    assert(ZOrder.interleave(3, 3) == 0xfL)
    // bit i of a → 2i; bit i of b → 2i+1 (check a high bit)
    assert(ZOrder.interleave(1 << 30, 0) == (1L << 60))
    assert(ZOrder.interleave(0, 1 << 30) == (1L << 61))
    // full unsigned lanes survive
    assert(ZOrder.interleave(-1, -1) == -1L) // all 64 bits set
    val rnd = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      val a = rnd.nextInt(); val b = rnd.nextInt()
      assert(ZOrder.deinterleave(ZOrder.interleave(a, b)) == ((a, b)))
    }
  }

  test("locality: each 64-code run of a 32x32 grid is exactly an 8x8 tile") {
    // complete grid → consecutive z-ranges are perfect square tiles;
    // a row-major sort would give 2-row stripes of width 32 instead
    val codes = for (x <- 0 until 32; y <- 0 until 32)
      yield ZOrder.interleave(x, y)
    codes.sorted.grouped(64).foreach { chunk =>
      val pts = chunk.map(ZOrder.deinterleave)
      val (xs, ys) = (pts.map(_._1), pts.map(_._2))
      assert(xs.max - xs.min == 7 && ys.max - ys.min == 7,
        s"chunk bbox ${xs.min}-${xs.max} x ${ys.min}-${ys.max}")
    }
  }

  test("SQL-callable, codegen-planned, matches the unrolled oracle form") {
    GraftFunctions.register(spark)
    val df = spark.range(1000).selectExpr(
      "cast(id % 37 as int) AS u", "cast(id % 53 as int) AS v")
      .selectExpr("zorder2(u, v) AS zk",
        ZOrder.unrolledSql("u", "v") + " AS zs")
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // whole-stage codegen span
    // null propagates (nullSafe binary expression)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder2(CAST(NULL AS INT), 1)")
      .collect()(0).isNullAt(0))
  }
}

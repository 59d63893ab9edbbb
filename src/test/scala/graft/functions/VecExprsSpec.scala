package graft.functions

import graft.SparkSpecBase

/** The codegen'd vector kernels must be BIT-IDENTICAL to the interpreted
  * `aggregate(zip_with(...))` fold they replaced (the DuckDB oracle
  * hashes exact doubles, so "close" is not enough), share its null
  * semantics, and actually run inside whole-stage codegen.
  */
class VecExprsSpec extends SparkSpecBase {

  private def hofDot(a: String, b: String): String =
    s"""aggregate(zip_with(cast($a AS array<double>), cast($b AS array<double>),
       |  (x, y) -> x * y), cast(0.0 AS double), (acc, v) -> acc + v)""".stripMargin

  private def hofDist2(a: String, b: String): String =
    s"""aggregate(zip_with(cast($a AS array<double>), cast($b AS array<double>),
       |  (x, y) -> (x - y) * (x - y)), cast(0.0 AS double),
       |  (acc, v) -> acc + v)""".stripMargin

  test("vec_dot / vec_dist2 are bit-identical to the HOF fold (sweep)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 200 seeded random pairs, dims 1-64, magnitudes spanning 12 orders
    // so the fold order actually matters (different orders would diverge)
    val rnd = new scala.util.Random(42)
    def vec(n: Int): Array[Float] =
      Array.fill(n)((rnd.nextFloat() - 0.5f) *
        math.pow(10, rnd.nextInt(7) - 3).toFloat)
    val rows = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (vec(n), vec(n))
    }
    val got = rows.toDF("a", "b")
      .selectExpr(
        "vec_dot(a, b) AS kd", s"${hofDot("a", "b")} AS hd",
        "vec_dist2(a, b) AS k2", s"${hofDist2("a", "b")} AS h2")
      .collect()
    got.foreach { r =>
      // exact bit comparison, not a tolerance
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("double inputs accepted; float widening is exact") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((Array(0.1f, 0.2f), Array(0.3, 0.4)))
      .toDF("f", "d")
      .selectExpr("vec_dot(f, d) AS v", "vec_dot(d, d) AS dd")
      .collect()(0)
    assert(r.getDouble(0) == 0.1f.toDouble * 0.3 + 0.2f.toDouble * 0.4)
    assert(r.getDouble(1) == 0.3 * 0.3 + 0.4 * 0.4)
  }

  test("null semantics mirror the HOF form") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_dot(CAST(NULL AS array<double>), array(1.0d)) AS null_arr,
        |  vec_dot(array(1.0d, 2.0d), array(1.0d)) AS len_mismatch,
        |  vec_dot(array(1.0d, CAST(NULL AS double)), array(1.0d, 2.0d))
        |    AS null_elem,
        |  vec_dist2(CAST(array() AS array<double>),
        |            CAST(array() AS array<double>)) AS empty
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 0.0)
  }

  test("interpreted eval path (codegen off) agrees with codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5f, -2.5f, 3f), Array(2f, 4f, -1f)))
      .toDF("a", "b").selectExpr("vec_dot(a, b) AS v")
    val expected = 1.5f.toDouble * 2 + (-2.5f).toDouble * 4 +
      3f.toDouble * (-1)
    assert(df.collect()(0).getDouble(0) == expected)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.collect()(0).getDouble(0) == expected)
    }
  }

  test("runs inside a whole-stage-codegen span, no UDF") {
    GraftFunctions.register(spark)
    val df = spark.range(3).selectExpr(
      "vec_dot(array(cast(id AS double), 2.0d), array(3.0d, 4.0d)) AS v")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // codegen span
    assert(!plan.contains("UDF"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(8.0, 11.0, 14.0))
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

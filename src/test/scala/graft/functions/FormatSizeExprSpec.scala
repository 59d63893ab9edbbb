package graft.functions

import graft.SparkSpecBase

/** The native Expression must agree with the Scala function (and the
  * UDF form) everywhere, including the falsy NULL → "0 B" rule, and be
  * callable from SQL after registration.
  */
class FormatSizeExprSpec extends SparkSpecBase {

  test("native expression equals the Scala function across a sweep") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val values: Seq[java.lang.Long] =
      Seq[java.lang.Long](null, 0L, 1L, 1023L, 1024L, 1280L, 1536L, 1792L,
        1048576L, 123456789L, Long.MaxValue)
    val got = values.toDF("b")
      .selectExpr("format_size(b) AS s")
      .collect().map(_.getString(0))
    assert(got.toSeq == values.map(SizeFormat.formatSize))
  }

  test("SQL-callable, constant-foldable, codegen-planned") {
    GraftFunctions.register(spark)
    // literal input is folded away by Catalyst — itself proof the
    // expression participates in optimization like a builtin
    val folded = spark.sql("SELECT format_size(CAST(1536 AS BIGINT)) AS s")
    assert(folded.queryExecution.executedPlan.toString.contains("1.5 KB"))
    // non-foldable input: stays in the plan as the native expression
    // inside a WholeStageCodegen project, with no ScalaUDF anywhere
    val df = spark.range(1)
      .selectExpr("format_size(id + 1536) AS s")
    assert(df.collect()(0).getString(0) == "1.5 KB")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("formatsize"))
    assert(!plan.contains("UDF"))
    assert(plan.contains("*(1)")) // whole-stage codegen span
  }

  test("spark.sql.extensions wiring injects format_size by itself") {
    // newSession() rebuilds the function registry purely from the
    // session's extensions (explicit GraftFunctions.register calls from
    // other tests are isolated away) — so this passing proves the
    // `spark.sql.extensions=graft.functions.GraftExtensions` config set
    // in SparkSpecBase did the injection, the way a user would wire it.
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT format_size(CAST(1536 AS BIGINT)) AS s")
      .collect()(0).getString(0) == "1.5 KB")
  }

  test("UDF form still agrees (upgrade-path equivalence)") {
    import spark.implicits._
    val got = Seq(1536L, 0L, 1280L).toDF("b")
      .select(SizeFormat.format_size($"b"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1.5 KB", "0 B", "1.2 KB"))
  }
}

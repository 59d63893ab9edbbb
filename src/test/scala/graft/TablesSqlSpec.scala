package graft

/** The SQL entry point a reference (DuckDB-SQL) user lands on:
  * registerAll + spark.sql, with the library's scalar functions
  * available and pushdown intact through the views.
  */
class TablesSqlSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("registered views answer SQL with library functions in scope") {
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  format_size(CAST(sum(l_extendedprice) AS BIGINT)) AS vol
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("vol").nonEmpty))
  }

  test("filters through the views reach the parquet scan") {
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("1-URGENT"), plan)
  }
}

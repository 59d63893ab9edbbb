package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule that swaps the declarative `row_number <= k` window
  * idiom for the native GroupTopK operator. Ground truths use `rank()`
  * windows (NOT rewritten — different tie semantics) with total orders,
  * where rank == row_number.
  */
class GroupTopKRewriteSpec extends SparkSpecBase {

  import spark.implicits._

  private val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 5.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0), ("b", 7L, 6.0)
  ).toDF("g", "id", "score").repartition(3)

  private def planOf(q: DataFrame): String = {
    q.collect()
    q.queryExecution.executedPlan.toString
  }

  private def rankTruth(k: Int): Set[(String, Long, Int)] = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    df.withColumn("rk", rank().over(w)).filter(col("rk") <= k)
      .select("g", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("SQL row_number <= k rewrites to the native operator") {
    df.createOrReplaceTempView("rw_docs")
    val q = spark.sql(
      """SELECT g, id, rk FROM (
        |  SELECT g, id, row_number() OVER (
        |    PARTITION BY g ORDER BY score DESC, id) AS rk
        |  FROM rw_docs)
        |WHERE rk <= 2""".stripMargin)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getInt(2))).toSet
    assert(got === rankTruth(2))
    val p = planOf(q)
    assert(p.contains("GroupTopKPartial") && p.contains("GroupTopKFinal"), p)
    assert(!p.contains("Window"), p)
  }

  test("DataFrame withColumn+filter idiom rewrites too") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).select("g", "id", "rk")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getInt(2))).toSet === rankTruth(2))
    assert(planOf(q).contains("GroupTopKFinal"), planOf(q))
  }

  test("residual conjuncts survive above the rewritten node") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2 && col("score") > 5.5)
    // group a top-2 = ids 2,3 (scores 30,20); group b top-2 = 6,7 (7,6):
    // the score > 5.5 residual then keeps all but nothing of a changes
    assert(q.select("id").as[Long].collect().toSet === Set(2L, 3L, 6L, 7L))
    assert(planOf(q).contains("GroupTopKFinal"), planOf(q))
  }

  test("pagination: lower rank bound stays as a filter on the rank") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") >= 2 && col("rk") <= 3)
    // page 2: a → ids 3 (rk2), 1 (rk3); b → 7 (rk2), 5 (rk3)
    assert(q.select("id").as[Long].collect().toSet === Set(3L, 1L, 7L, 5L))
    val p = planOf(q)
    assert(p.contains("GroupTopKFinal"), p)
    assert(!p.contains("Window"), p)
  }

  test("rank() and row_number = 1 idioms are NOT rewritten") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val rankQ = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    assert(planOf(rankQ).contains("Window"), planOf(rankQ))
    assert(!planOf(rankQ).contains("GroupTopK"), planOf(rankQ))
    // the merge-winner idiom (rk = 1) keeps its pinned window plan
    val winnerQ = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    assert(planOf(winnerQ).contains("Window"), planOf(winnerQ))
    assert(!planOf(winnerQ).contains("GroupTopK"), planOf(winnerQ))
  }

  test("multi-expression windows are NOT rewritten") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rk", row_number().over(w))
      .withColumn("total", sum("score").over(
        Window.partitionBy("g")))
      .filter(col("rk") <= 2)
    // correctness over plan shape: whatever plan, values must be right
    val a = q.filter($"g" === "a").select("total").distinct()
      .as[Double].collect()
    assert(a.toSeq === Seq(65.0))
  }
}

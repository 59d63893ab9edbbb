package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule that swaps the declarative `row_number <= k` and
  * `rank() <= k` window idioms for the native GroupTopK operator
  * (row_number → exact-k heaps; rank → withTies gap-rank heaps).
  * Ground truths collect the UNFILTERED window (no Filter node → the
  * rule cannot fire) and bound the rank Scala-side.
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
    df.withColumn("rk", rank().over(w))
      .select("g", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= k).toSet
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

  test("rank() <= k rewrites to the native operator (total order)") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2).select("g", "id", "rk")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getInt(2))).toSet
    assert(got === rankTruth(2))
    val p = planOf(q)
    assert(p.contains("GroupTopKFinal"), p)
    assert(!p.contains("Window"), p)
  }

  test("rank() ties crossing k all survive with shared gap ranks") {
    // ids 2,3,5 tie at 20.0 under a NON-total order: rank() assigns
    // them all rank 2 and rank<=2 emits FOUR rows — the semantics the
    // withTies operator must reproduce, where row_number would cut at 2
    val tied = Seq(("a", 1L, 30.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 5.0), ("a", 5L, 20.0), ("b", 6L, 1.0), ("b", 7L, 1.0)
    ).toDF("g", "id", "score").repartition(3)
    val w = Window.partitionBy("g").orderBy(col("score").desc)
    val q = tied.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2).select("g", "id", "rk")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getInt(2))).toSet
    assert(got === Set(("a", 1L, 1), ("a", 2L, 2), ("a", 3L, 2),
      ("a", 5L, 2), ("b", 6L, 1), ("b", 7L, 1)))
    val p = planOf(q)
    assert(p.contains("GroupTopKFinal"), p)
    assert(!p.contains("Window"), p)
  }

  test("dense_rank and row_number = 1 idioms are NOT rewritten") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val denseQ = df.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 2)
    assert(planOf(denseQ).contains("Window"), planOf(denseQ))
    assert(!planOf(denseQ).contains("GroupTopK"), planOf(denseQ))
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

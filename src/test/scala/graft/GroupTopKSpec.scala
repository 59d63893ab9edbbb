package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{GroupTopK, GroupTopKPartialExec}

/** Native per-group top-k (graft.plans.GroupTopK): row_number parity with
  * the window form, the partial/final plan shape, and the map-side
  * reduction that is the operator's reason to exist.
  */
class GroupTopKSpec extends SparkSpecBase {

  import spark.implicits._

  private def windowTopK(df: DataFrame, group: String, order: String,
      tie: String, k: Int): DataFrame = {
    val w = Window.partitionBy(group)
      .orderBy(col(order).desc, col(tie))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Walk the physical plan INCLUDING through AQE stage boundaries. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Nil
    }
    (p +: p.children.flatMap(allNodes)) ++ through
  }

  private val base = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0),
    ("c", 7L, 1.0)
  ).toDF("g", "id", "score").repartition(4)

  test("matches the window row_number form (ties broken by id)") {
    val native = GroupTopK.topK(base, Seq("g"),
      Seq(("score", true), ("id", false)), 2)
    val window = windowTopK(base, "g", "score", "id", 2)
    assert(native.select("g", "id", "score", "rk").collect().toSet ===
      window.select("g", "id", "score", "rk").collect().toSet)
    // ties: both 30.0 rows in group a, id=2 must outrank id=4
    val a = native.filter($"g" === "a").orderBy("rk")
      .select("id").as[Long].collect()
    assert(a.toSeq === Seq(2L, 4L))
  }

  test("k larger than any group emits whole groups, ranked") {
    val native = GroupTopK.topK(base, Seq("g"),
      Seq(("score", true), ("id", false)), 100)
    assert(native.count() === base.count())
    val ranks = native.groupBy("g").agg(max("rk").as("m"), count("*").as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    assert(ranks.forall { case (_, m, n) => m === n })
  }

  test("null group keys form one group; empty input yields empty output") {
    val withNull = Seq((Option.empty[String], 1L, 2.0),
      (None: Option[String], 2L, 3.0), (Some("x"), 3L, 1.0))
      .toDF("g", "id", "score")
    val top1 = GroupTopK.topK(withNull, Seq("g"),
      Seq(("score", true), ("id", false)), 1)
    assert(top1.count() === 2) // null-group winner + x-group winner
    assert(top1.filter($"g".isNull).select("id").as[Long].collect()
      .toSeq === Seq(2L))
    val empty = GroupTopK.topK(base.filter($"id" < 0), Seq("g"),
      Seq(("score", true)), 3)
    assert(empty.count() === 0)
  }

  test("empty group list = global top-k (AllTuples distribution)") {
    val global = GroupTopK.topK(base, Nil, Seq(("score", true),
      ("id", false)), 3)
    assert(global.orderBy("rk").select("id").as[Long].collect().toSeq ===
      Seq(2L, 4L, 3L))
  }

  test("plan is partial/final with no Window, and the partial prunes " +
    "map-side") {
    // 1,000 rows, ONE group, 8 partitions: the window form would shuffle
    // all 1,000 rows; the partial heaps forward at most 8 × k candidates.
    val big = spark.range(1000)
      .select(lit("g").as("g"), $"id", ($"id" % 97).as("score"))
      .repartition(8)
    val q = GroupTopK.topK(big, Seq("g"), Seq(("score", true),
      ("id", false)), 3)
    val rows = q.collect()
    assert(rows.length === 3)
    val plan = q.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("GroupTopKPartial") && s.contains("GroupTopKFinal"),
      s"expected partial/final operators in:\n$s")
    assert(!s.contains("Window"), s"window leaked into:\n$s")
    val partialOut = allNodes(plan)
      .collect { case p: GroupTopKPartialExec => p }
      .map(_.metrics("numOutputRows").value).sum
    assert(partialOut > 0 && partialOut <= 8 * 3,
      s"partial forwarded $partialOut rows; expected ≤ 24 of 1000")
  }

  test("oracle-shape parity on real data: top spenders per event type") {
    val sf = "/root/testdata/sf0.001"
    val spend = Tables(spark, sf, "events")
      .groupBy("event_type", "user_id")
      .agg(round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
        .as("spend"))
    val native = GroupTopK.topK(spend, Seq("event_type"),
      Seq(("spend", true), ("user_id", false)), 3)
    val w = Window.partitionBy("event_type")
      .orderBy(col("spend").desc, col("user_id"))
    val window = spend.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    assert(native.collect().toSet === window.collect().toSet)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join and range (interval) join — the two classic
  * operators Spark's built-in join surface lacks (the builder prompt's own
  * examples for the custom-operator ladder). Both are implemented by
  * COMPOSITION (tier (a) of SURVEY.md §7.3): the semantics reduce exactly
  * to built-in window/equi-join plans, so a custom SparkStrategy would buy
  * nothing and lose Catalyst's pushdown/AQE handling.
  *
  * Scale shapes:
  *  - As-of join = union both sides + ONE window over (key, time): a
  *    single hash exchange on the join key, then a linear per-partition
  *    scan carrying the last build-side row forward. Never materializes
  *    the O(probe × build) inequality-join intermediate a naive
  *    `l.ts >= r.ts` theta-join would produce, and never collects
  *    anything — this is the standard distributed point-in-time join.
  *  - Range join = bin both sides to a fixed grid (intervals explode to
  *    the bins they overlap, points hash to their bin), equi-join on the
  *    bin, then re-check the exact bounds as a residual predicate. The
  *    inequality becomes an equi-shuffle: both sides co-partition by bin,
  *    so at 100 TB it scales like any hash join instead of a broadcast
  *    nested loop; comparisons are bounded per bin, not |L|×|R|.
  */
object TemporalJoins {

  // ------------------------------------------------------------------ //
  // As-of join: for every `error` event, the most recent `click` by    //
  // the same user at or before it (inclusive; ties on ts break toward  //
  // the highest click event_id — mirrored exactly in the oracle's      //
  // ORDER BY ts DESC, event_id DESC LIMIT 1).                          //
  // ------------------------------------------------------------------ //

  /** Generic as-of: for each left row, the latest right row with
    * `right.time <= left.time` per key (inclusive). Right's carried
    * columns ride in one struct so the union stays type-exact; ties on
    * (time) among right rows break by the struct's field order —
    * ascending payload, last wins — which the oracle mirrors with
    * `ORDER BY ts DESC, event_id DESC LIMIT 1`.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val rSide = right.select(col(key), col(time), lit(0).as("side"),
      struct(col(time).as("asof_time") +: payload.map(col): _*).as("asof"))
    val lCols = left.columns.filterNot(c => c == key || c == time).toSeq
    val lSide = left.select(col(key), col(time), lit(1).as("side"),
      lit(null).cast(rSide.schema("asof").dataType).as("asof"),
      struct(lCols.map(col): _*).as("lrow"))
    // side 0 = build (right), side 1 = probe (left): at equal times the
    // build row sorts FIRST, making the match inclusive.
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("side"), col("asof"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide, allowMissingColumns = true)
      .withColumn("asof", last(col("asof"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(Seq(col(key), col(time)) ++
        lCols.map(c => col(s"lrow.$c").as(c)) :+ col("asof.*"): _*)
  }

  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"))
    asof(errors, clicks, "user_id", "ts", Seq("click_id"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("err_time"),
        col("click_id"),
        (unix_millis(col("ts")) - unix_millis(col("asof_time")))
          .as("gap_ms"))
      .orderBy("event_id")
  }

  /** Oracle deliberately uses a DIFFERENT algorithm (per-row LATERAL
    * top-1) so the window rewrite is checked against the definition,
    * not against itself.
    */
  val asofJoinSql: String =
    """SELECT e.event_id, e.user_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_time,
      |  c.click_id, c.gap_ms
      |FROM events e
      |LEFT JOIN LATERAL (
      |  SELECT c2.event_id AS click_id,
      |         epoch_ms(e.ts) - epoch_ms(c2.ts) AS gap_ms
      |  FROM events c2
      |  WHERE c2.event_type = 'click' AND c2.user_id = e.user_id
      |    AND c2.ts <= e.ts
      |  ORDER BY c2.ts DESC, c2.event_id DESC LIMIT 1) c ON true
      |WHERE e.event_type = 'error'
      |ORDER BY e.event_id""".stripMargin

  // ------------------------------------------------------------------ //
  // Range join: events against overlapping value intervals             //
  // [i·20, i·20+28), i = 0..23 — overlap forces genuine multi-match    //
  // range-join semantics (a value can land in two intervals).          //
  // ------------------------------------------------------------------ //

  /** Generic binned range join: `points(valueCol) ∈ [lo, hi)` as an
    * equi-join on a bin grid of width `binW` plus the exact residual.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      valueCol: String, lo: String, hi: String, binW: Double): DataFrame = {
    val binned = intervals.withColumn("bin",
      explode(sequence(floor(col(lo) / binW).cast("long"),
        floor(col(hi) / binW).cast("long"))))
    points
      .withColumn("bin", floor(col(valueCol) / binW).cast("long"))
      .join(binned, "bin")
      .filter(col(valueCol) >= col(lo) && col(valueCol) < col(hi))
      .drop("bin")
  }

  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ivals = spark.range(24).select(
      col("id").as("interval_id"),
      (col("id") * 20).cast("double").as("lo"),
      (col("id") * 20 + 28).cast("double").as("hi"))
    val ev = Tables(spark, sfDir, "events").select("event_id", "value")
    binnedRangeJoin(ev, ivals, "value", "lo", "hi", 20.0)
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"))
      .orderBy("interval_id")
  }

  /** Oracle: the definitional inequality join (DuckDB plans its own
    * range strategy) — again a different algorithm than the binning.
    */
  val rangeJoinSql: String =
    """WITH iv AS (
      |  SELECT i AS interval_id, i * 20.0 AS lo, i * 20.0 + 28.0 AS hi
      |  FROM range(0, 24) t(i))
      |SELECT interval_id, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM iv JOIN events e ON e.value >= iv.lo AND e.value < iv.hi
      |GROUP BY interval_id ORDER BY interval_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_join" -> asofJoin,
    "events_range_join" -> rangeJoin)

  def oracleSql: Map[String, String] = Map(
    "events_asof_join" -> asofJoinSql,
    "events_range_join" -> rangeJoinSql)
}

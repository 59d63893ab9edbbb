package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance over the snapshot store's change feed:
  * keep a grouped count/sum aggregate current with work proportional to
  * the DELTA, not the table.
  *
  * The reference recomputes derived numbers by re-querying its full
  * DuckDB table each run (e.g. the direct-links staleness scan,
  * db_duckdb.py:219-268 re-reads `files`); at 100 TB a downstream
  * consumer cannot rescan the index to refresh a dashboard aggregate.
  * With [[graft.sinks.ParquetIndex.changeFeed]]`(from, to,
  * includeOld = true)` each changed key carries its new row AND its
  * previous row, which is exactly the information needed to maintain
  * any abelian aggregate (count, sum — and mean/variance as sums) by
  * adding the new contribution and retracting the old one:
  *
  *   - `added`   → +new
  *   - `removed` → −old
  *   - `updated` → +new −old
  *
  * Scale shape: the ± contribution union is map-only over the feed; the
  * delta aggregate is one map-side-combinable shuffle on the GROUP key
  * (|groups| rows, not |table|); folding it into the previous view is
  * one co-partitioned full-outer join on the same key. Nothing touches
  * the base table. Groups whose count reaches zero are dropped, so the
  * view never accumulates tombstones.
  *
  * Group keys may be null (null groups fold via null-safe equality).
  * Null sum values contribute nothing, and an all-null group's sum is
  * ZERO, not null — the seed aggregate coalesces `sum()` so both the
  * from-scratch and the folded path agree (a raw `sum` would yield
  * null from recompute but 0 from `prev + delta`).
  */
object IncrementalView {

  /** The full-recompute form — the view's definition, used to seed it
    * and (in specs) as the oracle the incremental path must match.
    * Output: groupCols ++ (`cnt`, and `sum_<c>` per sum column).
    */
  def fromScratch(snapshot: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c =>
          coalesce(sum(col(c)), lit(0L)).as(s"sum_$c")): _*)

  /** The per-feed group delta: ± contributions from one change feed
    * (which must carry `old` — [[graft.sinks.ParquetIndex.changeFeed]]
    * with `includeOld = true`).
    */
  private def delta(feed: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    // +new for added/updated: group/sum columns are the payload
    val plus = feed
      .filter(col("change_type").isin("added", "updated"))
      .select((groupCols ++ sumCols).map(col) :+ lit(1L).as("w"): _*)
    // −old for removed/updated: removed rows carry the old row AS the
    // payload; updated rows carry it in the `old` struct
    val minus = feed
      .filter(col("change_type").isin("removed", "updated"))
      .select((groupCols ++ sumCols).map(c =>
        when(col("change_type") === "removed", col(c))
          .otherwise(col(s"old.$c")).as(c)) :+ lit(-1L).as("w"): _*)
    plus.unionByName(minus)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("w")).as("d_cnt"),
        sumCols.map(c =>
          sum(col(c) * col("w")).as(s"d_sum_$c")): _*)
  }

  /** Fold one change feed into the previous view state. */
  def applyFeed(prev: DataFrame, feed: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val d = delta(feed, groupCols, sumCols)
    // null-safe key equality: a null group must fold into itself, not
    // produce a second null-group row per feed
    val cond = groupCols.map(k => prev(k) <=> d(k)).reduce(_ && _)
    val keys = groupCols.map(k => coalesce(prev(k), d(k)).as(k))
    val cnt = (coalesce(prev("cnt"), lit(0L)) +
      coalesce(d("d_cnt"), lit(0L))).as("cnt")
    val sums = sumCols.map(c =>
      (coalesce(prev(s"sum_$c"), lit(0L)) +
        coalesce(d(s"d_sum_$c"), lit(0L))).as(s"sum_$c"))
    prev.join(d, cond, "full_outer")
      .select(keys ++ (cnt +: sums): _*)
      .filter(col("cnt") =!= 0)
  }
}

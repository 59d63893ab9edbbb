package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{StoreOps, StreamOps}

/** The oracle-gated streaming/store rows' load-bearing semantics, pinned
  * in-JVM (the DuckDB gate checks values; these check the REASONS the
  * values are right):
  *
  *  - session_window's split rule is `gap > 30 min` (a gap of exactly
  *    the session duration still MERGES) — the oracle's lag condition
  *    is `>`, same as the batch sessionize query's;
  *  - the streamed complete-mode aggregates equal their one-shot batch
  *    formulations value-for-value (micro-batch cut points must not
  *    leak into results);
  *  - readMor equals the eager copy-on-write fold of the same
  *    generations (Merge + delete), on the REAL fixture, not just
  *    MorIndexSpec's synthetic rows.
  */
class StreamServeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window merges at exactly the 30-minute gap (> split rule)") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:30:00")), // gap == 1800 s → still merges
      (1L, ts("2024-01-01 01:00:01")), // gap == 1801 s → NEW session
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:29:59"))  // gap == 1799 s → merges
    ).toDF("user_id", "ts")
    val sessions = rows
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSet
    assert(sessions == Set(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2L),
      (1L, ts("2024-01-01 01:00:01"), ts("2024-01-01 01:30:01"), 1L),
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:59:59"), 2L)))
  }

  test("streamed hourly aggregate equals the batch window query") {
    val streamed = StreamOps.streamHourly(spark, sf)
    val batch = EventsOps.hourlyWindow(spark, sf)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streamed stateful distinct equals batch DISTINCT") {
    val streamed = StreamOps.streamDistinct(spark, sf).collect().toSeq
    val batch = graft.Tables(spark, sf, "events")
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("readMor row equals the eager merge+delete fold of the same generations") {
    import graft.model.SyntheticFs
    val files = SyntheticFs.files(spark, sf)
    val base = files.select("relative_path", "size_bytes", "modified_time")
    val delta = files.filter(col("l_orderkey") % 7 === 0)
      .select(col("relative_path"),
        (col("size_bytes") + 777).as("size_bytes"),
        (col("modified_time") + expr("INTERVAL 5 DAYS"))
          .as("modified_time"))
    val eager = Merge.merge(base, delta, "relative_path", "modified_time",
        batchWinsTies = false)
      .join(files.filter(col("l_orderkey") % 11 === 0)
        .select("relative_path"), Seq("relative_path"), "left_anti")
      .orderBy("relative_path")
      .select("relative_path", "size_bytes", "modified_time")
    val mor = StoreOps.morRead(spark, sf)
    assert(mor.collect().toSeq == eager.collect().toSeq)
  }

  test("streamed foreachBatch index equals the one-shot batch merge") {
    val streamed = StreamOps.streamIndex(spark, sf)
    val batch = FsOps.mergeUpsert(spark, sf)
      .select("relative_path", "size_bytes", "modified_time")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}

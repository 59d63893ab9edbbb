package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream operators over the `events` table (F10/F19 scalar surface
  * plus the event-time windowing the reference lacks but a Spark engine
  * gets natively — SURVEY.md §2.8 notes windowed capability as engine
  * surface; the streaming formulation with watermarks lives in
  * [[graft.streaming.EventsStream]] and is exercised by its spec).
  *
  * Scale notes: all three queries are single-shuffle groupBys on
  * low-cardinality keys (event_type × hour buckets), fully map-side
  * combinable; JSON extraction is a codegen'd scalar, no UDF. The
  * value sums go through DECIMAL so partition order can't flap a digit.
  */
object EventsOps {

  /** F19: JSON scalar extraction (`props` is a JSON object column, as in
    * the reference's API/Kibana payload boundary — lucidlink_api.py:99).
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
        min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Tumbling 1-hour event-time window aggregation. The window start is
    * emitted as a formatted string so Spark's µs timestamps and DuckDB's
    * ns timestamps hash identically.
    */
  def hourlyWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
          .as("value_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("value_sum"))
      .orderBy("hour_start", "event_type")

  val hourlyWindowSql: String =
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
      |FROM events
      |GROUP BY hour_start, event_type
      |ORDER BY hour_start, event_type""".stripMargin

  /** F10/F11: epoch↔timestamp round-trip (ns-epoch handling of
    * lucidlink_api.py:71-74 and the ISO formatting of
    * elasticsearch_integration.py:98-112). Seconds are floor-truncated on
    * both sides (Spark unix_timestamp ≙ epoch_ms // 1000).
    */
  def epochRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(timestamp_seconds(unix_timestamp(col("ts"))),
          "yyyy-MM-dd'T'HH:mm:ss").as("ts_iso"))
      .orderBy("event_id")

  val epochRoundtripSql: String =
    """SELECT event_id,
      |  epoch_ms(ts) // 1000 AS epoch_s,
      |  strftime(make_timestamp((epoch_ms(ts) // 1000) * 1000000),
      |           '%Y-%m-%dT%H:%M:%S') AS ts_iso
      |FROM events ORDER BY event_id""".stripMargin

  /** Sessionization via gap detection: a new session starts after a
    * >30-minute silence per user (lag + running sum — the classic
    * windowed-analytics formulation; Spark's `session_window` gives the
    * same result but is not DuckDB-mirrorable value-for-value).
    * Partitioned by user: the window shuffle is one hash exchange on
    * user_id, no global ordering anywhere.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    Tables(spark, sfDir, "events")
      .withColumn("gap",
        when(col("ts").cast("long") -
          lag(col("ts").cast("long"), 1).over(byUser) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum("gap").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long")))
          .as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_ms(ts) // 1000
      |           - lag(epoch_ms(ts) // 1000) OVER w > 1800
      |         THEN 1 ELSE 0 END AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000) AS duration_s
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_json_extract" -> jsonExtract,
    "events_hourly_window" -> hourlyWindow,
    "events_epoch_roundtrip" -> epochRoundtrip,
    "events_sessionize" -> sessionize)

  def oracleSql: Map[String, String] = Map(
    "events_json_extract" -> jsonExtractSql,
    "events_hourly_window" -> hourlyWindowSql,
    "events_epoch_roundtrip" -> epochRoundtripSql,
    "events_sessionize" -> sessionizeSql)
}

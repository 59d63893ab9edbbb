package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables (TESTDATA.md) from a
  * scale-factor directory. All queries in [[SparkEntry]] read their inputs
  * through here so the parquet scans stay uniform (pushdown + pruning are
  * Catalyst's job; we never cache raw tables — at 100 TB the scan itself
  * must stream).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** PLAN cache (never a data cache — the scan still streams from
    * parquet on every action): `spark.read.parquet` pays a driver-side
    * file listing plus a footer schema-inference job on every call, and
    * a bench/verify JVM constructs the same table frames hundreds of
    * times (StageProbe r17: five serial ~22 ms "parquet at Tables"
    * setup jobs inside ONE timed q9 run). Keyed by (session, path) so a
    * new session — or a new staged directory — re-lists; entries of
    * stopped sessions are evicted like SyntheticFs's frame cache.
    */
  private val planCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    planCache.filterInPlace { case ((s, _), _) =>
      !s.sparkContext.isStopped }
    planCache.getOrElseUpdate((spark, s"$sfDir/$name"),
      build(spark, sfDir, name))
  }

  private def build(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    // Normalize events.ts to a session-tz (UTC) µs TimestampType
    // whatever the generator wrote it as. Seen across driver rounds:
    // TIMESTAMP(NANOS) — the vectorized reader rejects it, sessions set
    // spark.sql.legacy.parquet.nanosAsLong so it arrives as epoch-ns
    // LongType, floor-divided here to µs (DuckDB's epoch_ms floor
    // semantics) — and TIMESTAMP(MICROS) without timezone, which
    // arrives as TIMESTAMP_NTZ and is reinterpreted as UTC (sessions
    // run with UTC session tz, so the wall clock is unchanged and the
    // DuckDB oracle, which reads the same naive µs values, agrees).
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** SQL surface: register every table of `sfDir` as a temp view (plus
    * the library's scalar functions), so `spark.sql("SELECT ... FROM
    * lineitem ...")` works exactly like the reference's SQL entry point
    * — a user who queried the reference through DuckDB SQL keeps
    * querying through SQL. Views are lazy plans over the parquet scans:
    * registration reads nothing, and pushdown/pruning behave as if the
    * DataFrame were used directly.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
  }
}

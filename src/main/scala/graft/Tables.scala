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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    // reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    // so it arrives as epoch-ns LongType — normalize it back to a µs
    // TimestampType here (floor division, matching DuckDB's epoch_ms
    // floor semantics in the oracles).
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
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

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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

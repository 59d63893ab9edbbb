package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 cross-db source — the JDBC parity path for the reference's
  * `ATTACH`-based DuckDB reads (direct_links.py:203 attaches the
  * scanner's database and reads its tables in place; db_duckdb.py owns
  * that file). The PRODUCTION default remains the staging-parquet
  * handoff (BASELINE.json blesses "DataFrame ops over Parquet +
  * DuckDB/ES sinks" — columnar files are the scale-native interchange,
  * and a 1000-executor scan of one .db file has no parallelism), but a
  * user migrating an existing DuckDB database can read it directly:
  * `spark.read.jdbc` against the DuckDB JDBC driver, one partition per
  * `partitionColumn` stride when bounds are given, a single-partition
  * read otherwise.
  *
  * The JDBC driver jar is NOT a production dependency — it ships
  * Test-scope only (JdbcSourceSpec proves the path end-to-end against
  * a real database file); at a deployment it arrives via `--jars` like
  * any JDBC driver.
  */
object JdbcSource {

  /** Read one table of a DuckDB database file. `numPartitions` +
    * `partitionColumn` + bounds split the read into parallel range
    * queries (the standard JDBC-source contract) — worth it only for
    * a genuinely large attached table; defaults read in one partition.
    */
  def duckdb(spark: SparkSession, dbPath: String, table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = 0L,
      numPartitions: Int = 1): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", s"jdbc:duckdb:$dbPath")
      .option("driver", "org.duckdb.DuckDBDriver")
      .option("dbtable", table)
    partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
        .load()
      case None => base.load()
    }
  }
}

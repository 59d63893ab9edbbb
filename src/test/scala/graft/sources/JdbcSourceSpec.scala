package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

/** S8 end-to-end: a real DuckDB database file, created through the
  * DuckDB JDBC driver (Test-scope jar), read back through
  * `spark.read.jdbc` — the ATTACH-parity path for migrating an
  * existing scanner database without a parquet staging hop.
  *
  * One knowable sharp edge, pinned here so a migration doesn't trip on
  * it: Spark's generic JDBC dialect maps the driver's integer metadata
  * WIDER than the parquet schema (BIGINT arrives as DECIMAL(20,0),
  * INTEGER as BIGINT) — the VALUES are identical and a cast to the
  * target schema restores exact row equality.
  */
class JdbcSourceSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def mkDb(table: String): String = {
    val db = Files.createTempDirectory("duck-jdbc")
      .resolve("scanner.db").toString
    val con = java.sql.DriverManager.getConnection(s"jdbc:duckdb:$db")
    try {
      con.createStatement().execute(
        s"CREATE TABLE $table AS " +
          s"SELECT * FROM read_parquet('$sf/$table.parquet')")
    } finally con.close()
    db
  }

  /** Cast the JDBC frame onto the parquet frame's exact schema — the
    * migration pattern for the dialect's integer widening.
    */
  private def alignedTo(target: DataFrame, jdbc: DataFrame): DataFrame =
    jdbc.select(target.schema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("a DuckDB table reads through spark.read.jdbc, values intact") {
    val db = mkDb("nation")
    val direct = spark.read.parquet(s"$sf/nation.parquet")
    val viaJdbc = JdbcSource.duckdb(spark, db, "nation")
    assert(viaJdbc.columns.toSeq == direct.columns.toSeq)
    assert(viaJdbc.count() == direct.count())
    assert(rows(alignedTo(direct, viaJdbc)) == rows(direct))
  }

  test("partitioned JDBC read splits into range queries, same rows") {
    val db = mkDb("customer")
    val direct = spark.read.parquet(s"$sf/customer.parquet")
    val viaJdbc = JdbcSource.duckdb(spark, db, "customer",
      partitionColumn = Some("c_custkey"),
      lowerBound = 1L, upperBound = 1000L, numPartitions = 4)
    assert(viaJdbc.rdd.getNumPartitions == 4)
    assert(rows(alignedTo(direct, viaJdbc)) == rows(direct))
  }
}

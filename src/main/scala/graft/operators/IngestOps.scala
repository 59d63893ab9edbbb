package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FindLsParser
import graft.model.SyntheticFs
import graft.sources.FsListing

/** Ingest-path parity queries: the find-ls text parser round-trip (P1/P2)
  * and the distributed listing source (S1-S4).
  */
object IngestOps {

  /** P1/P2/P5/P6/P10 round-trip: format `find -ls` lines from the
    * synthetic fs (recent mtimes as `MMM d HH:mm`, old ones as
    * `MMM d YYYY`, exactly find's age cutoff behavior), parse them back
    * with [[FindLsParser]], and emit the parsed fields. The oracle
    * computes the expected fields directly — minute precision for recent
    * rows, day precision for old rows — so the parse (including year
    * inference) is verified value-for-value.
    */
  def findLsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val now = expr(SyntheticFs.lastSeen)
    val e = SyntheticFs.entries(spark, sfDir)
    val recent =
      col("modified_time") >= expr(s"${SyntheticFs.lastSeen} - INTERVAL 6 MONTHS")
    val dateStr = when(recent, date_format(col("modified_time"), "MMM d HH:mm"))
      .otherwise(date_format(col("modified_time"), "MMM d yyyy"))
    val perms = when(col("type") === "directory", lit("drwxr-xr-x"))
      .otherwise(lit("-rw-r--r--"))
    val lines = e.select(concat_ws(" ",
      lit("1234567"), lit("8"), perms, lit("1"), lit("root"), lit("root"),
      coalesce(col("size_bytes"), lit(4096L)).cast("string"),
      dateStr, col("filepath")).as("line"))
    FindLsParser.parse(lines, now)
      .select(col("relative_path"), col("name"), col("entry_type"),
        col("size_bytes"), col("modified_time"), col("extension"))
      .orderBy("relative_path")
  }

  val findLsRoundtripSql: String = SyntheticFs.withCtes(
    s"""SELECT relative_path, name, type AS entry_type,
       |  coalesce(size_bytes, 4096) AS size_bytes,
       |  CASE WHEN modified_time >= ${SyntheticFs.lastSeen} - INTERVAL 6 MONTH
       |       THEN date_trunc('minute', modified_time)
       |       ELSE date_trunc('day', modified_time) END AS modified_time,
       |  extension
       |FROM fs_entries ORDER BY relative_path""".stripMargin)

  /** S1-S3: the real listing source over the scale-factor directory
    * itself (a flat dir of parquet files — names are SF-invariant, so the
    * DuckDB `glob()` oracle matches at any SF).
    */
  def listing(spark: SparkSession, sfDir: String): DataFrame =
    FsListing.list(spark, sfDir)
      .filter(col("entry_type") === "file")
      .select("name", "entry_type")
      .orderBy("name")

  val listingSql: String =
    """SELECT parse_filename(file) AS name, 'file' AS entry_type
      |FROM glob('/root/testdata/sf0.01/*')
      |ORDER BY name""".stripMargin

  /** Same listing through the DataSourceV2 path (`format("fslisting")`)
    * with the entry_type predicate pushed into the source.
    */
  def listingDsv2(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("fslisting").load(sfDir)
      .filter(col("entry_type") === "file")
      .select("name", "entry_type")
      .orderBy("name")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fs_find_ls_roundtrip" -> findLsRoundtrip,
    "fs_listing" -> listing,
    "fs_listing_dsv2" -> listingDsv2)

  def oracleSql: Map[String, String] = Map(
    "fs_find_ls_roundtrip" -> findLsRoundtripSql,
    "fs_listing" -> listingSql,
    "fs_listing_dsv2" -> listingSql)
}

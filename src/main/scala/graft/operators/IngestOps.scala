package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FindLsParser
import graft.model.SyntheticFs
import graft.sources.{FsListing, RestWalker}

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

  /** S6: the single-directory batch cap. `limit(n)` over an unordered
    * listing picks arbitrary rows, so the oracle-stable facts are the
    * COUNTS: the capped read returns exactly `min(cap, available)` rows,
    * the uncapped read returns them all. Both legs count every listed
    * entry; the glob oracle matches because the driver's sf dir is FLAT
    * (files only) — the same precondition the `fs_listing` oracle
    * already relies on, with the same hardcoded sf0.01 path (the
    * driver's Verify scale).
    */
  def listDirCap(spark: SparkSession, sfDir: String): DataFrame = {
    val capped = FsListing.listDir(spark, sfDir, batchSize = 4)
      .agg(count(lit(1)).as("n_capped"))
    val all = FsListing.listDir(spark, sfDir, batchSize = 1000000)
      .agg(count(lit(1)).as("n_all"))
    capped.crossJoin(all)
  }

  val listDirCapSql: String =
    """SELECT least(4, count(*)) AS n_capped, count(*) AS n_all
      |FROM glob('/root/testdata/sf0.01/*')""".stripMargin

  /** S5 as an oracle-checked query: BFS-traverse a deterministic fake
    * directory API whose entries are pure functions of the path, so a
    * DuckDB CTE can enumerate the exact expected row set. The tree
    * carries every exclusion trap: a hidden subtree (`.cache`) and a
    * skip-pattern file (`*.tmp`).
    */
  private[operators] object FakeApi extends RestWalker.Fetch {
    private def ns(p: String): Long = (1700000000L + p.length) * 1000000000L
    private def file(p: String) =
      RestWalker.ApiEntry(p, "file", p.length * 10L, ns(p))
    private def dir(p: String) =
      RestWalker.ApiEntry(p, "directory", 0L, ns(p))
    def apply(d: String): Seq[RestWalker.ApiEntry] = d match {
      case "/" =>
        (0 until 5).map(i => dir(s"/d$i")) ++
          (0 until 2).map(i => file(s"/r$i.txt"))
      case p if p.matches("/d\\d") =>
        (0 until 3).map(j => file(s"$p/f$j.dat")) ++
          Seq(dir(s"$p/sub"), dir(s"$p/.cache"), file(s"$p/skipme.tmp"))
      case p if p.matches("/d\\d/sub") =>
        (0 until 2).map(j => file(s"$p/g$j.log"))
      case p if p.endsWith("/.cache") => Seq(file(s"$p/x.bin"))
      case _ => Nil
    }
  }

  def restWalk(spark: SparkSession, sfDir: String): DataFrame =
    RestWalker.traverse(spark, FakeApi, "/", skipPatterns = Seq("*.tmp"))
      .select("path", "entry_type", "size_bytes", "modified_time")
      .orderBy("path")

  /** The distributed-frontier scale twin over the SAME fake API and the
    * SAME oracle: identical rows, but the BFS frontier and seen-set
    * never touch the driver (the parity walker mirrors the reference's
    * single-process queue; this is what a 10M-dir tree runs).
    */
  def restWalkDistributed(spark: SparkSession, sfDir: String): DataFrame =
    RestWalker.traverseDistributed(spark, FakeApi, "/",
      skipPatterns = Seq("*.tmp"))
      .select("path", "entry_type", "size_bytes", "modified_time")
      .orderBy("path")

  val restWalkSql: String =
    """WITH e(path, entry_type) AS (
      |  SELECT '/d' || i, 'directory' FROM generate_series(0, 4) t(i)
      |  UNION ALL
      |  SELECT '/r' || i || '.txt', 'file' FROM generate_series(0, 1) t(i)
      |  UNION ALL
      |  SELECT '/d' || i || '/f' || j || '.dat', 'file'
      |  FROM generate_series(0, 4) t(i), generate_series(0, 2) u(j)
      |  UNION ALL
      |  SELECT '/d' || i || '/sub', 'directory' FROM generate_series(0, 4) t(i)
      |  UNION ALL
      |  SELECT '/d' || i || '/sub/g' || j || '.log', 'file'
      |  FROM generate_series(0, 4) t(i), generate_series(0, 1) u(j)
      |)
      |SELECT path, entry_type,
      |  CAST(CASE WHEN entry_type = 'file' THEN length(path) * 10
      |            ELSE 0 END AS BIGINT) AS size_bytes,
      |  make_timestamp((1700000000 + length(path)) * 1000000) AS modified_time
      |FROM e ORDER BY path""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fs_find_ls_roundtrip" -> findLsRoundtrip,
    "fs_listing" -> listing,
    "fs_listing_dsv2" -> listingDsv2,
    "fs_list_dir" -> listDirCap,
    "rest_walk" -> restWalk,
    "rest_walk_distributed" -> restWalkDistributed)

  def oracleSql: Map[String, String] = Map(
    "fs_find_ls_roundtrip" -> findLsRoundtripSql,
    "fs_listing" -> listingSql,
    "fs_listing_dsv2" -> listingSql,
    "fs_list_dir" -> listDirCapSql,
    "rest_walk" -> restWalkSql,
    "rest_walk_distributed" -> restWalkSql)
}

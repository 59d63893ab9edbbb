package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic synthetic filesystem derived from the TPC-H-ish test
  * tables (FIXTURES.md §B maps SURVEY §2 fs operators onto them: "prefix
  * rollup (J3) → synthesized path column from nested keys").
  *
  * Layout: `/<nation>/c<custkey>/o<orderkey>/l<linenumber>.<ext>` — three
  * directory levels + files, so rollups, glob filters, hidden files and
  * skip patterns all have real work to do. The SQL mirror used by the
  * DuckDB oracle lives in [[SyntheticFs.sqlCtes]]; the two MUST stay in
  * lock-step (diffcheck/t2 enforces it).
  *
  * Determinism notes: sizes use floor() (round() ties differ across
  * engines); all derived strings are plain concat of ints/strings; the
  * only timestamps are shipdate-derived or fixed literals.
  */
object SyntheticFs {

  val lastSeen = "TIMESTAMP '2026-08-01 00:00:00'"
  val dirMtime = "TIMESTAMP '2025-01-01 00:00:00'"

  /** The synthetic fs is the *input* table of every fs operator (the
    * reference reads its `files` table from DuckDB storage, it does not
    * re-derive it per query). Persist the derived frames once per
    * (session, sfDir) so benchmarks measure the operator, not the
    * fixture's 4-way derivation join, and multi-use plans (e.g. es_docs =
    * entries ⋈ links ⋈ rollup(entries)) scan the input once.
    */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def cachedDf(key: String, spark: SparkSession)(
      build: => DataFrame): DataFrame = {
    // Evict entries of stopped sessions so long-lived JVMs (test suites,
    // repeated drivers) don't pin dead plans; their storage died with
    // the session's context, only the map references linger.
    cache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    cache.getOrElseUpdate((spark, key), {
      val df = build
      // SPARK_GRAFT_NO_CACHE: the persist is a WIN for bench/verify
      // JVMs that touch the same frame dozens of times at sf≤0.1, and
      // FATAL for the k=1000 scale-gate passes — the cached files/
      // entries frame is O(corpus) uncompressed columnar whose
      // MEMORY_AND_DISK overflow alone (~100 GB at k=1000) blows the
      // sandbox's disk reservation before any query shuffle does
      // (this, not the shuffles, was the r13 "disk-bound fs legs"
      // root cause). A gate JVM runs one query once, so it sets the
      // env and streams the derivation instead.
      if (!sys.env.contains("SPARK_GRAFT_NO_CACHE"))
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    })
  }

  /** File rows (one per lineitem). Hidden-file and skip-pattern variants
    * are carved out by key arithmetic so filters have targets:
    * orderkey%97==0 → dot-prefixed name; partkey%89==0 → `.tmp` extension.
    * orderkey%5==0 → mtime placed within ~5 months before [[lastSeen]]
    * ("recent" rows: `find -ls` prints these as `MMM d HH:mm`, exercising
    * the parser's year-inference path P2); the rest keep their 1990s
    * shipdate ("old" rows: `MMM d YYYY` format).
    */
  def files(spark: SparkSession, sfDir: String): DataFrame =
    cachedDf(s"files@$sfDir", spark) { filesUncached(spark, sfDir) }

  private def filesUncached(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    val cust = Tables(spark, sfDir, "customer")
    val nat = Tables(spark, sfDir, "nation")
    val base = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .withColumn("dir",
        concat(lit("/"), lower(col("n_name")), lit("/c"), col("c_custkey"),
          lit("/o"), col("o_orderkey")))
      .withColumn("ext",
        when(col("l_partkey") % 89 === 0, lit("tmp"))
          .otherwise(lower(concat(col("l_returnflag"), col("l_linestatus")))))
      // partkey/suppkey uniquify the name: (okey, lineno) alone collides in
      // the generated data, and a filesystem path must be a unique key.
      .withColumn("name",
        concat(
          when(col("l_orderkey") % 97 === 0, lit(".")).otherwise(lit("")),
          lit("l"), col("l_linenumber"), lit("-"), col("l_partkey"),
          lit("-"), col("l_suppkey"), lit("."), col("ext")))
      .withColumn("filepath", concat(col("dir"), lit("/"), col("name")))
      .withColumn("size_bytes",
        floor(col("l_extendedprice") * 100).cast("long"))
      .withColumn("modified_time",
        when(col("l_orderkey") % 5 === 0,
          expr(s"$lastSeen - make_dt_interval(CAST(l_orderkey % 150 + 1 AS INT))"))
          .otherwise(col("l_shipdate")))
    base.select(
      // F1 id dialect: the reference hashes the '/'-prefixed
      // relative_path (scanner.py:176-186 always restores the leading
      // slash before _generate_file_id) = our filepath — ids are
      // byte-compatible with a reference-built ES index
      sha2(col("filepath"), 256).as("id"),
      col("name"),
      expr("substring(filepath, 2)").as("relative_path"),
      col("filepath"),
      col("size_bytes"),
      col("modified_time"),
      col("modified_time").as("creation_time"),
      lit("file").as("type"),
      col("ext").as("extension"),
      lit("").as("checksum"),
      lit("").as("direct_link"),
      expr(lastSeen).as("last_seen"),
      // carried for link synthesis; dropped from entries()
      col("l_orderkey"), col("l_linenumber"))
  }

  /** Directory rows: the three ancestor levels of every file dir,
    * deduplicated. Directories carry NULL size (db_duckdb.py:164 allows
    * null size for dirs) — the rollup fills them.
    */
  def dirs(spark: SparkSession, sfDir: String): DataFrame = {
    val f = files(spark, sfDir)
      .select(col("filepath"))
      // strip "/name" → the containing dir, then walk up via prefix slices
      .withColumn("d3", expr("substring(filepath, 1, length(filepath) - length(substring_index(filepath, '/', -1)) - 1)"))
      .withColumn("d2", expr("substring(d3, 1, length(d3) - length(substring_index(d3, '/', -1)) - 1)"))
      .withColumn("d1", expr("substring(d2, 1, length(d2) - length(substring_index(d2, '/', -1)) - 1)"))
    val all = f.select(col("d3").as("filepath"))
      .union(f.select(col("d2")))
      .union(f.select(col("d1")))
      .distinct()
    all.select(
      sha2(col("filepath"), 256).as("id"),
      expr("substring_index(filepath, '/', -1)").as("name"),
      expr("substring(filepath, 2)").as("relative_path"),
      col("filepath"),
      lit(null).cast("long").as("size_bytes"),
      expr(dirMtime).as("modified_time"),
      expr(dirMtime).as("creation_time"),
      lit("directory").as("type"),
      lit("").as("extension"),
      lit("").as("checksum"),
      lit("").as("direct_link"),
      expr(lastSeen).as("last_seen"))
  }

  /** files ∪ dirs with the canonical FsEntry column set. */
  def entries(spark: SparkSession, sfDir: String): DataFrame =
    cachedDf(s"entries@$sfDir", spark) {
      files(spark, sfDir).select(FsEntry.columns.map(col): _*)
        .union(dirs(spark, sfDir))
    }

  /** Synthetic direct_links table (FIXTURES.md §A2): one link per order
    * (linenumber 1) for every third order; every sixth order's link is
    * stale (last_updated 30 days before the file's mtime) so J5 has work.
    */
  def directLinks(spark: SparkSession, sfDir: String): DataFrame = {
    files(spark, sfDir)
      .filter(col("l_linenumber") === 1 && col("l_orderkey") % 3 === 0)
      .select(
        col("id").as("file_id"),
        concat(lit("https://fs.example/"), expr("substring(id, 1, 16)"))
          .as("direct_link"),
        when(col("l_orderkey") % 2 === 0, lit("v2")).otherwise(lit("v3"))
          .as("link_type"),
        when(col("l_orderkey") % 2 === 0,
          concat(lit("fse-"), col("l_orderkey"))).otherwise(lit(null))
          .as("fsentry_id"),
        when(col("l_orderkey") % 6 === 0,
          col("modified_time") - expr("INTERVAL 30 DAYS"))
          .otherwise(expr(lastSeen)).as("last_updated"))
  }

  // ----------------------------------------------------------------------
  // DuckDB mirror — prepended to every oracle query that uses the fs view.
  // ----------------------------------------------------------------------

  val sqlCtes: String =
    s"""fs_base AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |    '/' || lower(n_name) || '/c' || c_custkey || '/o' || o_orderkey AS dir,
       |    CASE WHEN l_partkey % 89 = 0 THEN 'tmp'
       |         ELSE lower(l_returnflag || l_linestatus) END AS ext,
       |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS size_bytes,
       |    CASE WHEN l_orderkey % 5 = 0
       |         THEN $lastSeen - (l_orderkey % 150 + 1) * INTERVAL 1 DAY
       |         ELSE l_shipdate END AS modified_time
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |),
       |fs_named AS (
       |  SELECT *,
       |    CASE WHEN l_orderkey % 97 = 0 THEN '.' ELSE '' END
       |      || 'l' || l_linenumber || '-' || l_partkey || '-' || l_suppkey
       |      || '.' || ext AS name
       |  FROM fs_base
       |),
       |fs_files AS (
       |  SELECT sha256(dir || '/' || name) AS id, name,
       |    substr(dir || '/' || name, 2) AS relative_path,
       |    dir || '/' || name AS filepath,
       |    size_bytes, modified_time, modified_time AS creation_time,
       |    'file' AS type, ext AS extension, '' AS checksum,
       |    '' AS direct_link, $lastSeen AS last_seen,
       |    l_orderkey, l_linenumber
       |  FROM fs_named
       |),
       |fs_dirs AS (
       |  SELECT sha256(filepath) AS id,
       |    string_split(filepath, '/')[-1] AS name,
       |    substr(filepath, 2) AS relative_path, filepath,
       |    CAST(NULL AS BIGINT) AS size_bytes,
       |    $dirMtime AS modified_time, $dirMtime AS creation_time,
       |    'directory' AS type, '' AS extension, '' AS checksum,
       |    '' AS direct_link, $lastSeen AS last_seen
       |  FROM (
       |    SELECT DISTINCT dir AS filepath FROM fs_named
       |    UNION
       |    SELECT DISTINCT '/' || string_split(substr(dir, 2), '/')[1] || '/'
       |      || string_split(substr(dir, 2), '/')[2] FROM fs_named
       |    UNION
       |    SELECT DISTINCT '/' || string_split(substr(dir, 2), '/')[1] FROM fs_named
       |  )
       |),
       |fs_entries AS (
       |  SELECT id, name, relative_path, filepath, size_bytes, modified_time,
       |         creation_time, type, extension, checksum, direct_link, last_seen
       |  FROM fs_files
       |  UNION ALL
       |  SELECT * FROM fs_dirs
       |),
       |fs_links AS (
       |  SELECT id AS file_id,
       |    'https://fs.example/' || substr(id, 1, 16) AS direct_link,
       |    CASE WHEN l_orderkey % 2 = 0 THEN 'v2' ELSE 'v3' END AS link_type,
       |    CASE WHEN l_orderkey % 2 = 0 THEN 'fse-' || l_orderkey END AS fsentry_id,
       |    CASE WHEN l_orderkey % 6 = 0 THEN modified_time - INTERVAL 30 DAY
       |         ELSE $lastSeen END AS last_updated
       |  FROM fs_files
       |  WHERE l_linenumber = 1 AND l_orderkey % 3 = 0
       |)""".stripMargin

  /** Wrap an oracle query body with the fs CTEs. */
  def withCtes(body: String): String = s"WITH $sqlCtes\n$body"
}

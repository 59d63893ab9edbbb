package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * in [[queries]]; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle statement lives in [[oracleSql]] (same column names, fully
  * deterministic ordering — the driver hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * fs_es_docs is the reference's signature plan (SURVEY.md §3.2): dir
    * rollup ⋈ links enrichment ⋈ formatting — the full publish path.
    */
  def entry(spark: SparkSession): DataFrame =
    FsOps.esDocs(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ AnalyticsExt.queries ++ FsOps.queries ++
      EventsOps.queries ++ TextOps.queries ++ VectorOps.queries ++
      IngestOps.queries ++ MultimodalOps.queries ++ SkewOps.queries ++
      TemporalJoins.queries ++ StreamOps.queries ++ StoreOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Analytics.oracleSql ++ AnalyticsExt.oracleSql ++ FsOps.oracleSql ++
      EventsOps.oracleSql ++ TextOps.oracleSql ++ VectorOps.oracleSql ++
      IngestOps.oracleSql ++ MultimodalOps.oracleSql ++
      SkewOps.oracleSql ++ TemporalJoins.oracleSql ++
      StreamOps.oracleSql ++ StoreOps.oracleSql
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Globs
import graft.operators.Merge
import graft.sinks.ParquetIndex

/** J5's completion — the direct-link REFRESH loop
  * (direct_links.py:76-188): take the stale/missing-link work queue
  * (the query side is FsOps.staleLinks, P8+W1), fetch a fresh direct
  * link per file through a pluggable per-partition client, and
  * last-writer-wins-merge (J2, db_duckdb.py:242-245 INSERT OR REPLACE)
  * the results into the links store. Files whose fetch fails keep their
  * old link row; fresh links are never re-fetched (the v2 cache
  * semantics of direct_links.py:117-122).
  *
  * Scale notes: the fetch is `mapPartitions` — one client per partition,
  * no driver round-trip; the queue is a single left-join + filter; the
  * merge is [[Merge]]'s one key shuffle. Nothing here collects.
  */
object LinkRefresh {

  /** The links-store schema: the direct_links table
    * (direct_links.py:43-51) plus the API-timestamp columns of the
    * reference's extended variant (tests/test_api_timestamps.py:161-170)
    * — the ES mapping declares `api_creation_time`/`api_modified_time`
    * (EsAdmin mirror of elasticsearch_integration.py:84-87), so the
    * store must be able to carry them to the publish payload.
    */
  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("direct_link",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("link_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("fsentry_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("api_creation_time",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("api_modified_time",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("last_updated",
        org.apache.spark.sql.types.TimestampType)))

  /** An empty links frame — the first-run seed of a links store. */
  def emptyLinks(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Upgrade a links frame to the current [[schema]]: columns a
    * pre-API-timestamp store lacks come back as typed nulls, column
    * order is canonicalized. Keeps an old store readable AND lets the
    * next write migrate it (the refresh aligns its batch to the frame
    * passed in, so without this the old 5-column shape would
    * perpetuate and the publish path's api_* selects would fail).
    */
  def align(links: DataFrame): DataFrame = {
    val have = links.columns.toSet
    val widened = schema.fields.foldLeft(links)((df, f) =>
      if (have.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType)))
    widened.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** A successful fetch: the direct link plus whatever metadata the API
    * returned — v2 fsentry id (direct_links.py:112-124) and the API's
    * own creation/modification timestamps
    * (tests/test_api_timestamps.py:161-170), all optional.
    */
  final case class FetchedLink(
      directLink: String,
      fsentryId: Option[String] = None,
      apiCreationTime: Option[java.sql.Timestamp] = None,
      apiModifiedTime: Option[java.sql.Timestamp] = None)

  /** One link fetch: (filepath, cached fsentry_id) →
    * Some(FetchedLink) on success, None on failure
    * (direct_links.py:129-141; a 400 from the API means "unsupported
    * file — skip", which the reference also drops).
    */
  trait Fetch extends ((String, Option[String])
    => Option[FetchedLink]) with Serializable

  private[pipeline] final case class Fetched(
      file_id: String, direct_link: String, link_type: String,
      fsentry_id: Option[String],
      api_creation_time: Option[java.sql.Timestamp],
      api_modified_time: Option[java.sql.Timestamp])

  /** `merged` = the full LWW-merged links frame (the copy-on-write
    * write-back); `batch` = just the freshly fetched rows in store
    * schema (what the merge-on-read path appends); `refreshed` = the
    * batch's row count.
    */
  final case class Result(merged: DataFrame, refreshed: Long,
      batch: DataFrame)

  /** The work queue: files whose link is missing or older than the
    * file's mtime (same P8 predicate as the `fs_stale_links` query),
    * minus skip-pattern matches (direct_links.py:104-106). Carries the
    * cached fsentry_id so a v2 fetch can reuse it (:112-124).
    */
  def staleQueue(files: DataFrame, links: DataFrame,
      skipPatterns: Seq[String] = Nil): DataFrame = {
    val l = links.select(col("file_id"), col("last_updated"),
      col("fsentry_id"))
    val base = files.select("id", "filepath", "modified_time")
      .join(l, col("id") === col("file_id"), "left")
      .filter(col("file_id").isNull ||
        col("last_updated") < col("modified_time"))
      .select(col("id"), col("filepath"), col("fsentry_id"))
    if (skipPatterns.isEmpty) base
    else base.filter(
      !col("filepath").substr(lit(2), lit(Int.MaxValue))
        .rlike(Globs.skipRegex(skipPatterns)))
  }

  /** Fetch every queued link and J2-merge the successes into the
    * current links frame. `version` selects the reference's v2/v3 link
    * dialect; `now` stamps `last_updated` (a parameter, not
    * `current_timestamp()`, so runs are deterministic and testable).
    */
  def refresh(
      spark: SparkSession,
      files: DataFrame,
      links: DataFrame,
      fetch: Fetch,
      version: Int = 2,
      skipPatterns: Seq[String] = Nil,
      now: java.sql.Timestamp = java.sql.Timestamp.from(
        java.time.Instant.now())): Result = {
    import spark.implicits._
    val queue = staleQueue(files, links, skipPatterns)
    val linkType = s"v$version"
    val fetched = queue
      .select(col("id"), col("filepath"), col("fsentry_id"))
      .as[(String, String, Option[String])]
      .mapPartitions { it => // one client per partition
        it.flatMap { case (id, fp, cachedFse) =>
          fetch(fp, cachedFse).map { f =>
            Fetched(id, f.directLink, linkType, f.fsentryId,
              f.apiCreationTime, f.apiModifiedTime)
          }
        }
      }
      .toDF()
      .withColumn("fsentry_id", col("fsentry_id").cast("string"))
      .withColumn("last_updated", lit(now))
      // eager localCheckpoint: the HTTP fetch runs exactly ONCE, here —
      // neither the refreshed-count action nor the merge's shuffle can
      // re-trigger it (same fetch-once discipline as RestWalker)
      .localCheckpoint(true)
    val batch = fetched.select(links.columns.map(col).toIndexedSeq: _*)
    // J2 LWW on file_id: a fetched row always replaces the stored one
    // (its last_updated is `now`, but batchWinsTies guards equal stamps)
    val merged = Merge.merge(links, batch, "file_id", "last_updated",
      batchWinsTies = true)
    Result(merged, batch.count(), batch)
  }

  /** The full store round-trip: read the links [[ParquetIndex]], refresh
    * against `files`, reconcile away links whose file vanished from the
    * scan (without this the store grows monotonically on a churning
    * tree — every deleted file would leave a permanent orphan row), and
    * write the merged snapshot back — but ONLY when something changed
    * (links refreshed, orphans dropped, or the stored schema healed):
    * a steady-state run must not pay a full store rewrite for nothing.
    * Returns the count of refreshed links (re-running immediately
    * yields 0 — the queue drains, which IndexerSpec-style specs assert).
    */
  def refreshIndex(
      spark: SparkSession,
      files: DataFrame,
      linksIndex: ParquetIndex,
      fetch: Fetch,
      version: Int = 2,
      skipPatterns: Seq[String] = Nil,
      now: java.sql.Timestamp = java.sql.Timestamp.from(
        java.time.Instant.now()),
      reconcile: Boolean = true): Long = {
    // first run: an empty links store means EVERY file is queued —
    // exactly the reference's fresh direct_links DB; align() upgrades a
    // pre-API-timestamp store to the current schema
    val stored = linksIndex.read(spark)
    val links = align(stored.getOrElse(emptyLinks(spark)))
    // name-sequence compare, not count: a same-arity schema change must
    // still trigger the migrating write or align() papers over it forever
    val schemaHealed =
      stored.exists(_.columns.toSeq != schema.fieldNames.toSeq)
    val r = refresh(spark, files, links, fetch, version, skipPatterns, now)
    val keep = files.select(col("id")).distinct()
    val doReconcile = reconcile && stored.nonEmpty
    val finalLinks =
      if (doReconcile)
        r.merged.join(keep, r.merged("file_id") === keep("id"),
          "left_semi")
      else r.merged
    val mustWrite = r.refreshed > 0 || schemaHealed
    // the orphan probe is an extra job over the store — run it ONLY
    // when its answer actually decides whether to write
    val orphans =
      if (doReconcile && !mustWrite)
        links.join(keep, links("file_id") === keep("id"), "left_anti")
          .count()
      else 0L
    if (mustWrite || orphans > 0)
      linksIndex.write(finalLinks): Unit
    r.refreshed
  }

  /** The MOR view of a links store: base + pending log resolved with
    * the refresh's own LWW rule (J2, batch wins ties). Empty store →
    * None.
    */
  def readLinksMor(spark: SparkSession,
      linksIndex: ParquetIndex): Option[DataFrame] =
    linksIndex.readMor(spark, "file_id", "last_updated",
      batchWinsTies = true)

  /** [[refreshIndex]] on the MERGE-ON-READ write path: identical
    * observable store state (LinkRefreshSpec proves it against the
    * copy-on-write twin), but each refresh writes ONLY its fetched
    * batch as a log delta (plus a key-only delete sidecar for orphaned
    * links) instead of rewriting the whole links snapshot — at index
    * scale the links table is as big as the file index while a refresh
    * batch is the handful of stale links, which is exactly the
    * write-amplification case the MOR log exists for. The log folds
    * back into a real snapshot every `checkpointEvery` entries
    * (read amplification stays bounded; ParquetIndex measures the
    * amortization in MorIndexSpec/PERF.md).
    *
    * A store with a pre-API-timestamp schema takes the copy-on-write
    * path once (appendDelta requires base-schema parity; the CoW write
    * IS the migration), then appends thereafter.
    */
  def refreshIndexMor(
      spark: SparkSession,
      files: DataFrame,
      linksIndex: ParquetIndex,
      fetch: Fetch,
      version: Int = 2,
      skipPatterns: Seq[String] = Nil,
      now: java.sql.Timestamp = java.sql.Timestamp.from(
        java.time.Instant.now()),
      reconcile: Boolean = true,
      checkpointEvery: Int = 16): Long = {
    val stored = readLinksMor(spark, linksIndex)
    if (stored.exists(_.columns.toSeq != schema.fieldNames.toSeq))
      return refreshIndex(spark, files, linksIndex, fetch, version,
        skipPatterns, now, reconcile)
    val links = align(stored.getOrElse(emptyLinks(spark)))
    val r = refresh(spark, files, links, fetch, version, skipPatterns, now)
    // write ∝ batch: the fetched rows append as one log delta (the
    // first-ever batch just becomes the base snapshot inside
    // appendDelta); r.batch is already eagerly materialized by
    // refresh(), so it cannot observe the log it is appended to
    if (r.refreshed > 0)
      linksIndex.appendDelta(spark,
        r.batch.select(schema.fieldNames.map(col).toIndexedSeq: _*)): Unit
    if (reconcile && stored.nonEmpty) {
      // links whose file vanished from the scan → key-only delete
      // sidecar (readMor snapshots the log manifest eagerly, so this
      // plan reads the pre-append log state; orphans and the delta's
      // file_ids are disjoint by construction — fetched ⊆ files)
      val keep = files.select(col("id")).distinct()
      val orphans = links
        .join(keep, links("file_id") === keep("id"), "left_anti")
        .select("file_id")
        .localCheckpoint(true)
      if (orphans.count() > 0)
        linksIndex.appendDelete(spark, orphans, "file_id"): Unit
    }
    if (linksIndex.currentId.exists(cid =>
        linksIndex.morEntries(cid).size >= checkpointEvery))
      linksIndex.checkpointMor(spark, "file_id", "last_updated",
        batchWinsTies = true): Unit
    r.refreshed
  }
}

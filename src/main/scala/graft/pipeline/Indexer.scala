package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SizeFormat
import graft.operators.Merge
import graft.sinks.{EsAdmin, EsSink, ParquetIndex}
import graft.sources.FsListing
import graft.stats.RunStats

/** Pipeline configuration — the reference's indexer-config.yaml surface
  * (config/indexer-config.yaml: root_path, mode, skip_patterns,
  * batch sizes, ES index). Parsed from `key=value` lines by
  * [[IndexerConfig.load]] (no YAML dependency in a zero-egress build;
  * the keys match the reference's).
  */
final case class IndexerConfig(
    rootPath: String,
    indexRoot: String,
    mode: String = "elasticsearch", // or "index-only" (main.py:60-62)
    skipPatterns: Seq[String] = IndexerConfig.defaultSkips,
    includeHidden: Boolean = false,
    esIndex: String = "files",
    esBatchSize: Int = 1000,
    snapshotFiles: Int = 4,
    getDirectLinks: Boolean = true,
    partitionByPath: Boolean = true,
    // z-ordered snapshot layout (path-bucket × mtime Morton interleave
    // + per-file manifest) instead of path partitioning — the layout
    // for deployments whose hot queries are path+TIME windows
    // (growth timelines, retention cleanups) rather than pure
    // path prefixes; see ParquetIndex.zorderExprs
    zorderSnapshot: Boolean = false)

object IndexerConfig {
  /** Reference defaults (config/indexer-config.yaml:121-152, abridged). */
  val defaultSkips: Seq[String] = Seq(
    ".git", ".svn", "node_modules", "__pycache__", ".DS_Store",
    "*.tmp", "*.swp", "*.lock")

  def load(lines: Seq[String]): IndexerConfig = {
    val kv = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap
    IndexerConfig(
      rootPath = kv.getOrElse("root_path",
        sys.error("root_path is required")),
      indexRoot = kv.getOrElse("index_root",
        sys.error("index_root is required")),
      mode = kv.getOrElse("mode", "elasticsearch"),
      skipPatterns = kv.get("skip_patterns")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(defaultSkips),
      includeHidden = kv.get("include_hidden").exists(_.toBoolean),
      esIndex = kv.getOrElse("es_index", "files"),
      esBatchSize = kv.get("es_batch_size").map(_.toInt).getOrElse(1000),
      // single-node parity default (the reference's store is ONE DuckDB
      // file); set 0 on a cluster to keep the distributed write width
      snapshotFiles = kv.get("snapshot_files").map(_.toInt).getOrElse(4),
      // reference default true (main.py:121); effective only when a
      // link-fetch client is wired (mode=elasticsearch, main.py:190)
      getDirectLinks =
        kv.get("get_direct_links").forall(_.toBoolean),
      // snapshot partitioning by first path segment — the ART-index
      // replacement (SURVEY §4.1); off for flat trees where one segment
      // would hold everything
      partitionByPath =
        kv.get("partition_by_path").forall(_.toBoolean),
      zorderSnapshot =
        kv.get("zorder_snapshot").exists(_.toBoolean))
  }

  /** Load the reference's actual YAML config surface
    * (config/indexer-config.yaml via config/config.py:6-26
    * `yaml.safe_load`) — nested keys mapped onto [[IndexerConfig]]:
    *
    *  - `mode`, `root_path` → as-is
    *  - `skip_patterns.patterns` → skipPatterns;
    *    `skip_patterns.hidden_files` false → includeHidden
    *  - `elasticsearch.index_name` / `.bulk_size` → esIndex/esBatchSize
    *  - `lucidlink_filespace.get_direct_links` → getDirectLinks
    *  - `database.connection.url` (`duckdb:///path/db.duckdb`) → the
    *    snapshot-store root (the embedded-DuckDB file location becomes
    *    the ParquetIndex directory — same place in the deployment, a
    *    different storage format)
    *
    * `overrides` uses the same flat keys as [[load]] and wins over the
    * file (the reference's `--root-path` CLI override, main.py:44-47).
    */
  def loadYaml(text: String,
      overrides: Map[String, String] = Map.empty): IndexerConfig = {
    val doc = Yaml.parse(text)
    def over(k: String): Option[String] = overrides.get(k)
    val rootPath = over("root_path")
      .orElse(Yaml.str(doc, "root_path").filter(_.nonEmpty))
      .getOrElse(sys.error("root_path is required (file or override)"))
    val indexRoot = over("index_root")
      .orElse(Yaml.str(doc, "database", "connection", "url")
        .map(_.stripPrefix("duckdb://")))
      .getOrElse(sys.error("index_root or database.connection.url required"))
    IndexerConfig(
      rootPath = rootPath,
      indexRoot = indexRoot,
      mode = over("mode").orElse(Yaml.str(doc, "mode"))
        .getOrElse("elasticsearch"),
      skipPatterns = over("skip_patterns")
        .map(_.split(",").map(_.trim).toSeq)
        .orElse(Yaml.list(doc, "skip_patterns", "patterns")
          .map(_.collect { case s: String => s }))
        .getOrElse(defaultSkips),
      includeHidden = over("include_hidden").map(_.toBoolean)
        .orElse(Yaml.bool(doc, "skip_patterns", "hidden_files").map(!_))
        .getOrElse(false),
      esIndex = over("es_index")
        .orElse(Yaml.str(doc, "elasticsearch", "index_name"))
        .getOrElse("files"),
      esBatchSize = over("es_batch_size").map(_.toInt)
        .orElse(Yaml.long(doc, "elasticsearch", "bulk_size").map(_.toInt))
        .getOrElse(1000),
      // graft extension keys: honored as top-level YAML keys too, not
      // just flat overrides (they have no reference-yaml equivalent)
      snapshotFiles = over("snapshot_files").map(_.toInt)
        .orElse(Yaml.long(doc, "snapshot_files").map(_.toInt))
        .getOrElse(4),
      getDirectLinks = over("get_direct_links").map(_.toBoolean)
        .orElse(Yaml.bool(doc, "lucidlink_filespace", "get_direct_links"))
        .getOrElse(true),
      partitionByPath = over("partition_by_path").map(_.toBoolean)
        .orElse(Yaml.bool(doc, "partition_by_path"))
        .getOrElse(true),
      zorderSnapshot = over("zorder_snapshot").map(_.toBoolean)
        .orElse(Yaml.bool(doc, "zorder_snapshot"))
        .getOrElse(false))
  }
}

final case class RunReport(
    stats: RunStats.Stats,
    indexed: Long, esFailed: Long, removed: Long, snapshotId: String,
    linksRefreshed: Long = 0L)

/** The full pipeline lifecycle (SURVEY.md §3.1, main.py:245-365):
  * scan → normalize → merge into the index → reconcile deletions →
  * (elasticsearch mode) enrich with directory sizes and publish.
  *
  * Every stage is a DataFrame program: the scan streams out of
  * [[FsListing]]'s per-partition iterators, the merge/reconcile are
  * single key-shuffles ([[ParquetIndex]]), the rollup is the
  * ancestor-explode aggregation, and the ES publish is a
  * `foreachPartition` bulk sink. Nothing materializes on the driver but
  * the run counters (collected via `observe`, A8).
  */
final class Indexer(cfg: IndexerConfig, transport: Option[EsSink.Transport],
    admin: Option[EsAdmin.Transport] = None,
    linkFetch: Option[LinkRefresh.Fetch] = None) {

  private def normalize(listing: DataFrame): DataFrame =
    Indexer.normalize(listing)

  /** Ancestor-explode dir-size rollup over an entry frame (J3) — the
    * shared [[graft.operators.FsOps.ancestorSizePairs]] core (incl. its
    * depth-1 guard), aggregated to per-directory totals.
    */
  private def dirSizes(entries: DataFrame): DataFrame =
    graft.operators.FsOps
      .ancestorSizePairs(entries.filter(col("type") === "file"))
      .groupBy(col("directory_path").as("filepath"))
      .agg(sum("size_bytes").as("total_size"))

  // ------------------------------------------------------------------ //
  // Stored dirSizes rollup (r13 verdict #2): the publish no longer     //
  // re-runs the O(files × depth) ancestor explode every run — a        //
  // snapshot of (directory_path, sz, fc) lives beside the index and    //
  // is PATCHED with the signed change feed the merge already knows     //
  // (FsOps.dirRollupFoldAgg), recomputed from scratch only when its    //
  // corpus token says it no longer matches the files store.            //
  // ------------------------------------------------------------------ //

  private def rollupStore(): ParquetIndex =
    new ParquetIndex(s"${cfg.indexRoot}/dirsizes")

  // token I/O rides the Hadoop FileSystem API like the rest of the
  // store layer (GenMeta/ParquetIndex): the production index root is
  // HDFS/S3, where java.nio cannot resolve; a local path takes the
  // same code through LocalFileSystem. Tokens are made visible by a
  // RENAME of a fully-written temp file — a crash at any point leaves
  // either the old token (stale → recompute/catch-up) or none (same),
  // never a torn one; silent drift is impossible.
  private def readToken(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Option[String] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  private def writeToken(spark: SparkSession,
      p: org.apache.hadoop.fs.Path, t: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + ".tmp")
    val os = fs.create(tmp, true)
    os.write(t.getBytes("UTF-8"))
    os.close()
    // delete-then-rename (Hadoop rename refuses an existing dst): a
    // crash in the window leaves NO token, which reads as stale
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"token rename failed: $tmp -> $p")
  }

  private def rollupTokenPath =
    new org.apache.hadoop.fs.Path(
      s"${cfg.indexRoot}/dirsizes/_corpus_token")

  private def readRollupToken(spark: SparkSession): Option[String] =
    readToken(spark, rollupTokenPath)

  /** Stamp the rollup as valid for the files store's CURRENT corpus.
    * Written AFTER the rollup snapshot (crash between the two leaves a
    * stale token → the next publish recomputes; never a silent drift).
    */
  private def writeRollupToken(spark: SparkSession, t: String): Unit =
    writeToken(spark, rollupTokenPath, t)

  /** ES-PUBLISHED WATERMARK: the corpus token whose resolved view
    * Elasticsearch last received in full (a clean full [[run]] publish
    * or a clean [[publishScoped]]/[[publishCatchUp]]). [[publishScoped]]
    * refuses to run while the store is ahead of it — a bare
    * [[runScoped]] interlude, a crashed publish, or a store that was
    * never published would otherwise leave ES silently missing those
    * transitions forever (the r14 advice's drift hole);
    * [[publishCatchUp]] closes the gap with delta-sized traffic.
    * Advanced only on ZERO-failure sends, so a rejected batch keeps
    * the watermark behind and the catch-up re-sends it (ES upserts
    * and deletes are idempotent by id).
    */
  private def esWatermarkPath =
    new org.apache.hadoop.fs.Path(s"${cfg.indexRoot}/_es_published")

  private def readEsWatermark(spark: SparkSession): Option[String] =
    readToken(spark, esWatermarkPath)

  private def writeEsWatermark(spark: SparkSession, t: String): Unit =
    writeToken(spark, esWatermarkPath, t)

  /** Maintain the stored rollup across a corpus transition
    * `previous → current` and return the (directory_path, sz, fc)
    * frame for `current`. Incremental when the stored rollup's token
    * matches the pre-transition corpus: ONE explode-free full-outer
    * diff (the merge's reconcile legs — added/removed/resized file
    * rows) + the O(|Δ| × depth) delta fold; from-scratch otherwise
    * (first run, index-only interludes, or any crash that left the
    * token stale). Zero rows (a directory whose files all vanished)
    * are pruned — absence ≡ zero on every read path.
    */
  private def dirSizesMaintained(spark: SparkSession, idx: ParquetIndex,
      previous: Option[DataFrame], current: DataFrame,
      prevToken: String): DataFrame = {
    val rs = rollupStore()
    val next = previous match {
      case Some(prev) if rs.currentId.isDefined &&
          readRollupToken(spark).contains(prevToken) =>
        graft.operators.FsOps.dirRollupFoldAgg(rs.read(spark).get,
          graft.operators.FsOps.rollupDeltaAgg(
            Indexer.signedFileChanges(prev, current)))
          .filter(col("sz") =!= 0L || col("fc") =!= 0L)
      case _ =>
        graft.operators.FsOps.rollupOf(
          current.filter(col("type") === "file")
            .select(col("filepath"), col("size_bytes")))
    }
    rs.write(next)
    writeRollupToken(spark, Indexer.corpusToken(idx))
    rs.read(spark).get
  }

  /** The full document field surface of the reference's bulk payload
    * (elasticsearch_integration.py:98-112 + the mapping's fields) —
    * shared by the full publish and [[publishScoped]] so the two can
    * never drift. `sizes` is (dp, total_size); `links` the aligned
    * link columns keyed file_id.
    */
  private def buildDocs(current: DataFrame, sizes: DataFrame,
      links: DataFrame): DataFrame = {
    val iso = "yyyy-MM-dd'T'HH:mm:ss"
    // scale-adaptive build sides (rollup totals, link columns), anchored
    // on the snapshot store's on-disk size: broadcast under the
    // threshold (the doc stream then pays ZERO exchanges before the
    // sink), hinted shuffle_hash above it — the corpus-sized doc stream
    // must never be sorted on the publish path, same plan discipline as
    // FsOps.esDocs
    val build = graft.operators.FsOps
      .adaptiveBuildBy(current.sparkSession, cfg.indexRoot) _
    current
      .join(build(sizes), col("filepath") === col("dp"), "left")
      .join(build(links), col("id") === col("file_id"), "left") // J8
      .select(
        col("id"), col("relative_path"), col("filepath"), col("name"),
        col("type"), col("extension"), col("checksum"),
        when(col("type") === "directory",
          coalesce(col("total_size"), lit(0L)))
          .otherwise(col("size_bytes")).as("size_bytes"),
        date_format(col("modified_time"), iso).as("modified_time"),
        date_format(col("creation_time"), iso).as("creation_time"),
        date_format(col("last_seen"), iso).as("last_seen"),
        coalesce(col("dl"), lit("")).as("direct_link"),
        coalesce(col("fse"), lit("")).as("fsentry_id"),
        // mapping-declared API timestamps (EsAdmin mirror of
        // elasticsearch_integration.py:84-87): emitted when the
        // fetch returned them; null → to_json omits the field
        date_format(col("act"), iso).as("api_creation_time"),
        date_format(col("amt"), iso).as("api_modified_time"))
      .withColumn("size", SizeFormat.format_size(col("size_bytes")))
  }

  private def store(): ParquetIndex =
    if (cfg.zorderSnapshot)
      // 2-D layout: path-bucket × modification time. A path point/
      // prefix predicate maps to one bucket span, a time window to an
      // epoch span — readPruned opens only overlapping files
      // (ZOrderIndexSpec pins the pruning on this exact store shape)
      new ParquetIndex(cfg.indexRoot,
        writeFiles = cfg.snapshotFiles,
        zorderExprs = Indexer.zorderSnapshotExprs)
    else new ParquetIndex(cfg.indexRoot,
      partitionBy =
        if (cfg.partitionByPath) Seq(ParquetIndex.PathPartitionCol)
        else Nil,
      writeFiles = cfg.snapshotFiles,
      // row-group stats stay selective for point/prefix lookups within
      // each partition bucket (the read-side predicate is always a
      // relative_path point or prefix — pathPrefixFilter)
      sortWithin = Seq("relative_path"))

  /** Event-driven incremental run — the 100 TB mode a periodic full
    * rescan cannot be: refresh ONLY the subtrees under `changedDirs`
    * (root-relative paths, e.g. from inotify/object-store
    * notifications) through the snapshot store's merge-on-read log.
    * Scan cost ∝ the changed subtrees, write cost ∝ their entries
    * ([[ParquetIndex.refreshScopeMor]]); every other key is untouched.
    * A vanished subtree resolves to an empty rescan = scope-wide
    * deletion, INCLUDING the dir's own row. The scope dir itself is
    * re-statted (one lstat) and refreshed with its children: child
    * churn bumps the dir's mtime, and full-rescan parity requires
    * that row to move too. Also patches the stored dirSizes rollup
    * with the scope's signed change feed when its corpus token is
    * current. Returns the number of entries refreshed. Fold the log
    * with [[checkpointScoped]]; any later full [[run]] supersedes the
    * log by scan-is-truth.
    */
  def runScoped(spark: SparkSession, changedDirs: Seq[String]): Long =
    runScoped(spark, changedDirs, preScoped = None)

  /** [[runScoped]] core. `preScoped` (the publish path hands it in) is
    * the PRE-refresh MOR-resolved rows of the union scope, already
    * materialized — with it this method performs ZERO corpus-wide
    * resolves of its own; without it, exactly ONE (shared by every
    * changed dir), never one per dir as before r15.
    */
  private[pipeline] def runScoped(spark: SparkSession,
      changedDirs: Seq[String], preScoped: Option[DataFrame]): Long = {
    val idx = store()
    require(idx.currentId.isDefined,
      "runScoped: no base snapshot — run a full scan first")
    val baseCols = idx.read(spark).get.columns.toSeq
    val skipRe =
      if (cfg.skipPatterns.isEmpty) None
      else Some(graft.functions.Globs.skipRegex(cfg.skipPatterns).r)
    val dirs0 = changedDirs.map(_.stripPrefix("/").stripSuffix("/"))
    dirs0.foreach(d => require(d.nonEmpty,
      "runScoped: a root-wide event is a full rescan — use run()"))
    // subsume nested scopes: refreshing `a` walks the whole subtree,
    // so a second event for `a/b` is covered (and processing it
    // separately would double-count its rollup delta against the
    // shared pre-state below). Outermost distinct dirs only.
    val dirs = dirs0.distinct.filterNot(d =>
      dirs0.exists(o => o != d && d.startsWith(o + "/")))
    // an event-driven caller's debounced batch can drain to empty —
    // nothing changed, so nothing to refresh (and the shared pre-state
    // predicate below is a reduce over `dirs`, which must not be built
    // over an empty scope)
    if (dirs.isEmpty) return 0L
    // ONE shared pre-state for the whole call: the surviving dirs are
    // pairwise key-disjoint, so refreshing one never moves another's
    // pre-rows — each iteration just filters its slice out of this
    // frame. Only needed when the rollup can be patched incrementally
    // (`foldable` is loop-invariant: an incremental patch re-stamps
    // the token current, a skipped patch leaves it stale).
    val foldable = rollupStore().currentId.isDefined &&
      readRollupToken(spark).contains(Indexer.corpusToken(idx))
    val preAll: Option[DataFrame] =
      if (!foldable) None
      else preScoped.orElse(Some(
        idx.readMor(spark, "relative_path", "modified_time").get
          .filter(dirs.map(d => col("relative_path")
            .startsWith(d + "/")).reduce(_ || _))
          .localCheckpoint(true)))
    dirs.map { d =>
      val abs = cfg.rootPath.stripSuffix("/") + "/" + d
      // full-scan parity for the scope dir ITSELF: a full run prunes a
      // skip-matched or hidden directory before recursing, so an event
      // for (or under) one resolves to an empty rescan = subtree
      // deletion; a symlinked dir is likewise never recursed into by
      // the full scan (find -P), so its event must not index the
      // target's children
      val prefixes = d.split("/").toSeq
        .scanLeft("")((acc, s) => if (acc.isEmpty) s else s"$acc/$s")
        .drop(1)
      val prunedByFullScan =
        prefixes.exists(p =>
          skipRe.exists(_.findFirstIn(p).isDefined)) ||
          (!cfg.includeHidden &&
            d.split("/").exists(_.startsWith("."))) ||
          java.nio.file.Files.isSymbolicLink(
            java.nio.file.Paths.get(abs))
      val entries =
        (if (!prunedByFullScan && new java.io.File(abs).isDirectory) {
           val walked = normalize(FsListing.list(spark, abs,
             cfg.skipPatterns, cfg.includeHidden,
             // skip patterns are ROOT-relative: anchor the subtree
             // walk's matching at the subtree's own prefix
             matchPrefix = d + "/")
             // the subtree walk emits paths relative to ITS root;
             // re-root them so ids/keys match full-scan entries
             .withColumn("filepath",
               concat(lit("/" + d), col("filepath"))))
             .select(baseCols.map(col): _*)
           // re-stat the scope dir's OWN entry (one lstat): an event
           // for d means d's children changed, which also bumped d's
           // mtime — a full rescan would republish that row, so the
           // scoped refresh must too (IndexerSpec pins the parity).
           // A vanished/pruned d falls to the empty branch and the
           // widened scope predicate below deletes its row with the
           // subtree's.
           import spark.implicits._
           val f = new java.io.File(abs)
           val self = normalize(spark.createDataset(Seq(
             FsListing.Listed("/" + d, f.getName, 0L,
               new java.sql.Timestamp(f.lastModified()), "directory",
               ("/" + d).count(_ == '/')))).toDF())
             .select(baseCols.map(col): _*)
           walked.unionByName(self)
         } else idx.read(spark).get.limit(0))
          .localCheckpoint(true) // walk the subtree once, not per write
      // rollup maintenance anchor: this dir's slice of the SHARED
      // pre-refresh scope frame (one resolve per call, not per dir —
      // valid because surviving dirs are key-disjoint)
      val prevScope = preAll.map(
        _.filter(col("relative_path").startsWith(d + "/")))
      idx.refreshScopeMor(spark, entries,
        // the scope covers the dir's OWN row too (re-statted above):
        // its mtime moves with child churn, and a vanished subtree
        // deletes the dir row with its contents
        col("relative_path").startsWith(d + "/") ||
          col("relative_path") === d,
        "relative_path", "modified_time")
      // patch the stored dirSizes with the scope's signed change feed
      // — O(|scope| × depth); a stale/absent rollup stays stale (the
      // next publish recomputes it) rather than paying a full corpus
      // rescan inside the event-driven path
      prevScope.foreach { prev =>
        val rs = rollupStore()
        rs.write(graft.operators.FsOps.dirRollupFoldAgg(
            rs.read(spark).get,
            graft.operators.FsOps.rollupDeltaAgg(
              Indexer.signedFileChanges(prev, entries)))
          .filter(col("sz") =!= 0L || col("fc") =!= 0L))
        writeRollupToken(spark, Indexer.corpusToken(idx))
      }
      entries.count()
    }.sum
  }

  /** INCREMENTAL ES publish — the run mode a 100 TB deployment uses
    * between full republishes: refresh only the changed subtrees
    * through the store's MOR log ([[runScoped]]), patch the stored
    * dirSizes rollup with the scope's signed change feed, then send
    * ONLY the delta to Elasticsearch — the scope's current entries,
    * every directory (inside the scope or above it) whose rolled
    * total changed, and deletes for vanished scope keys. Publish cost
    * is ∝ |scope| + |touched ancestors|, never the corpus; the
    * resulting ES state is bit-identical (mod `last_seen`, scan-time
    * by contract) to a full republish — IndexerSpec pins it over a
    * delete+resize+add scenario.
    *
    * USAGE CONTRACT, ENFORCED (the equality's fine print): "≡ full
    * republish" holds only from a store state ES has already seen in
    * full — a bare [[runScoped]] interlude mutates the store without
    * sending its scope docs or touched-ancestor totals, and a scoped
    * publish on top would leave ES silently stale for those scopes
    * forever. The ES-published WATERMARK ([[esWatermarkPath]]) makes
    * that drift impossible to miss: this method REFUSES when the store
    * is ahead of the watermark, and [[publishCatchUp]] repairs the gap
    * with traffic ∝ the unpublished churn (replayed from the MOR log
    * suffix). Cost when used correctly is unchanged: the delta is ∝
    * the scope either way.
    *
    * Plan note: TWO corpus-wide MOR resolves per call (the pre-state
    * below, handed into [[runScoped]] so it resolves nothing itself,
    * and the post-state `after`) — the minimum for a before/after
    * diff.
    */
  def publishScoped(spark: SparkSession,
      changedDirs: Seq[String]): RunReport = {
    val t0 = System.nanoTime()
    require(cfg.mode == "elasticsearch" && transport.isDefined,
      "publishScoped: elasticsearch mode with a transport required")
    val idx = store()
    require(idx.currentId.isDefined,
      "publishScoped: no base snapshot — run a full scan first")
    // watermark gate (see [[esWatermarkPath]]): a scoped publish only
    // sends ITS transition's delta, so it is correct only from a store
    // state ES has already seen in full — refuse otherwise, pointing
    // at the repair, instead of leaving ES silently stale forever
    val pre = Indexer.corpusToken(idx)
    val wm = readEsWatermark(spark)
    require(wm.contains(pre),
      s"publishScoped: ES watermark ${wm.getOrElse("(none)")} != " +
        s"store state $pre — the store moved without a publish (bare " +
        "runScoped interlude, a failed publish, or ES never saw a " +
        "full publish); run publishCatchUp() (or a full run()) first")
    val dirs = changedDirs.map(_.stripPrefix("/").stripSuffix("/"))
    val scopePred = dirs.map(d =>
      col("relative_path").startsWith(d + "/") ||
        col("relative_path") === d).reduce(_ || _)
    val prevScope = idx.readMor(spark, "relative_path", "modified_time")
      .get.filter(scopePred).localCheckpoint(true)
    // store + rollup refreshed; the materialized pre-state rides along
    // so runScoped performs no corpus-wide resolve of its own
    runScoped(spark, changedDirs, preScoped = Some(prevScope))
    publishDelta(spark, idx, prevScope, _.filter(scopePred), t0)
  }

  /** Re-sync ES with the store after transitions that were never
    * published — the repair for the drift [[publishScoped]]'s
    * watermark gate refuses to paper over: bare [[runScoped]]
    * interludes (index-without-publish) and crashed/rejected publishes.
    * Works from the MOR log itself: the entries appended since the
    * watermark name exactly the touched keys, so traffic is ∝ the
    * unpublished churn (docs for keys that changed, deletes for keys
    * that vanished, re-publishes for ancestors whose totals moved) —
    * never the corpus. No-op (zero ES traffic) when the watermark is
    * already current.
    *
    * Requires the watermarked state to live in the CURRENT base's log
    * prefix (token = baseId + log length). A fold between publishes is
    * fine — [[checkpointScoped]] migrates a matching watermark across
    * it — but a store whose base was rewritten without a publish (a
    * full index-only [[run]], manual surgery, or ES never published)
    * has no per-key churn record to replay; that needs one full
    * publish ([[run]] in elasticsearch mode).
    */
  def publishCatchUp(spark: SparkSession): RunReport = {
    val t0 = System.nanoTime()
    require(cfg.mode == "elasticsearch" && transport.isDefined,
      "publishCatchUp: elasticsearch mode with a transport required")
    val idx = store()
    require(idx.currentId.isDefined,
      "publishCatchUp: no base snapshot — run a full scan first")
    val cur = Indexer.corpusToken(idx)
    val wm = readEsWatermark(spark)
    if (wm.contains(cur))
      return RunReport(RunStats.Stats(0L, 0L, 0L,
        (System.nanoTime() - t0) / 1e9), 0L, 0L, 0L,
        idx.currentId.getOrElse(""), 0L)
    val baseId = idx.currentId.get
    val publishedLen = wm match {
      case Some(w) if w.startsWith(s"$baseId+") =>
        w.substring(baseId.length + 1).toIntOption.getOrElse(
          sys.error(s"publishCatchUp: unparseable watermark $w"))
      case other =>
        sys.error("publishCatchUp: the store base was rewritten since " +
          s"the last publish (watermark ${other.getOrElse("(none)")}, " +
          s"store $cur) — no per-key churn record to replay; run a " +
          "full elasticsearch-mode run() to re-sync")
    }
    // keys the unpublished log suffix touched, and their rows at the
    // watermarked state (base + log prefix) — both ∝ the churn
    val touched = idx.morTouchedKeys(spark, "relative_path",
      from = publishedLen).get.localCheckpoint(true)
    val prevRows = idx.readMorPrefix(spark, "relative_path",
      "modified_time", batchWinsTies = false, upTo = publishedLen).get
      .join(touched, Seq("relative_path"), "left_semi")
      .localCheckpoint(true)
    publishDelta(spark, idx, prevRows,
      _.join(touched, Seq("relative_path"), "left_semi"), t0)
  }

  /** OPERATOR BOOTSTRAP for the ES-published watermark: a store last
    * published before the watermark existed — or one that lost the
    * token in [[writeToken]]'s delete→rename crash window — has no
    * `_es_published`, so [[publishScoped]] refuses and
    * [[publishCatchUp]] demands a full republish even when ES is in
    * fact current. This stamps the CURRENT corpus token as published,
    * on the operator's authority alone (nothing is sent to or checked
    * against ES). Use ONLY when you know ES holds the store's resolved
    * view in full; if it does not, the scoped publishes this unblocks
    * will drift exactly the way the watermark exists to prevent.
    * Returns the stamped token.
    */
  def assertPublished(spark: SparkSession): String = {
    val idx = store()
    require(idx.currentId.isDefined,
      "assertPublished: no base snapshot — nothing to stamp")
    val t = Indexer.corpusToken(idx)
    writeEsWatermark(spark, t)
    t
  }

  /** Shared delta-publish tail of [[publishScoped]] and
    * [[publishCatchUp]]: given the pre-transition rows of the affected
    * key set and a selector pulling the same key set out of the
    * post-transition resolve, send docs + touched-ancestor directory
    * rows, delete vanished keys, and advance the ES watermark iff
    * every send succeeded.
    */
  private def publishDelta(spark: SparkSession, idx: ParquetIndex,
      prevScope: DataFrame, selectCur: DataFrame => DataFrame,
      t0: Long): RunReport = {
    val after = idx.readMor(spark, "relative_path", "modified_time").get
      .localCheckpoint(true)
    val curScope = selectCur(after).localCheckpoint(true)
    // the rollup may have been stale before this run (e.g. index-only
    // interludes) — reconcile it now so the publish reads real totals
    val sizesAll = {
      val rs = rollupStore()
      if (readRollupToken(spark).contains(Indexer.corpusToken(idx)) &&
          rs.currentId.isDefined) rs.read(spark).get
      else {
        rs.write(graft.operators.FsOps.rollupOf(
          after.filter(col("type") === "file")
            .select(col("filepath"), col("size_bytes"))))
        writeRollupToken(spark, Indexer.corpusToken(idx))
        rs.read(spark).get
      }
    }
    // directories whose totals moved: the ancestors of the signed
    // change feed — inside OR above the scope
    val touched = graft.operators.FsOps.rollupDeltaAgg(
        Indexer.signedFileChanges(prevScope, curScope))
      .select(col("directory_path").as("filepath"))
    val dirRows = after.filter(col("type") === "directory")
      .join(touched, Seq("filepath"), "left_semi")
    // the observed counters ride the publish delta itself (A8 — one
    // pass, collected when the bulk sink consumes the docs)
    val (toPublish, obs) = RunStats.observed(
      curScope.unionByName(dirRows)
        .dropDuplicates("relative_path").localCheckpoint(true),
      typeCol = "type")

    admin.foreach(a => EsAdmin.ensureIndex(a, cfg.esIndex))
    val sink = new EsSink(transport.get, cfg.esBatchSize)
    val linksIdx = new ParquetIndex(s"${cfg.indexRoot}/links",
      writeFiles = cfg.snapshotFiles)
    val nLinks = (cfg.getDirectLinks, linkFetch) match {
      case (true, Some(fetch)) =>
        LinkRefresh.refreshIndexMor(spark,
          toPublish.filter(col("type") === "file"), linksIdx, fetch,
          skipPatterns = cfg.skipPatterns)
      case _ => 0L
    }
    val links = LinkRefresh.align(
      LinkRefresh.readLinksMor(spark, linksIdx).getOrElse(
        LinkRefresh.emptyLinks(spark)))
      .select(col("file_id"), col("direct_link").as("dl"),
        col("fsentry_id").as("fse"),
        col("api_creation_time").as("act"),
        col("api_modified_time").as("amt"))
    val sizes = sizesAll.select(col("directory_path").as("dp"),
      col("sz").as("total_size"))
    val s = sink.bulkIndex(buildDocs(toPublish, sizes, links),
      cfg.esIndex, "id")
    val removedIds = prevScope
      .join(curScope, Seq("relative_path"), "left_anti").select("id")
      .localCheckpoint(true)
    val removedCount = removedIds.count()
    val delFailed =
      if (removedCount > 0)
        sink.bulkDelete(removedIds, cfg.esIndex, "id").failed
      else 0L
    // ES now reflects the post-transition resolved state — advance the
    // watermark, but only on a zero-failure send: a rejected batch
    // keeps it behind so publishCatchUp re-sends (idempotent by id)
    if (s.failed + delFailed == 0L)
      writeEsWatermark(spark, Indexer.corpusToken(idx))
    val elapsed = (System.nanoTime() - t0) / 1e9
    RunReport(RunStats.collect(obs, elapsed), s.indexed,
      s.failed + delFailed, removedCount,
      idx.currentId.getOrElse(""), nLinks)
  }

  /** Fold the scoped-run MOR log into a real snapshot (periodic, or
    * when read amplification accumulates). None = nothing to fold.
    * A fold changes the corpus token WITHOUT changing the resolved
    * view, so a current ES watermark is migrated across it — otherwise
    * the next publishScoped would demand a pointless catch-up.
    */
  def checkpointScoped(spark: SparkSession): Option[String] =
    migrateWatermark(spark) {
      store().checkpointMor(spark, "relative_path", "modified_time")
    }

  /** Ratio-triggered fold: compact the scoped-run MOR log only once
    * its bytes exceed `maxLogRatio` of the base snapshot's — bounded
    * read amplification with write still ∝ change rate
    * ([[graft.sinks.ParquetIndex.checkpointMorIfNeeded]]).
    */
  def checkpointScopedIfNeeded(spark: SparkSession,
      maxLogRatio: Double = 0.3): Option[String] =
    migrateWatermark(spark) {
      store().checkpointMorIfNeeded(spark, "relative_path",
        "modified_time", maxLogRatio = maxLogRatio)
    }

  /** Run `fold` (a resolved-view-preserving store rewrite) and, if the
    * ES watermark matched the pre-fold token, re-stamp it with the
    * post-fold token — the two tokens name the SAME published state.
    */
  private def migrateWatermark(spark: SparkSession)(
      fold: => Option[String]): Option[String] = {
    val preTok = Indexer.corpusToken(store())
    val matched = readEsWatermark(spark).contains(preTok)
    val r = fold
    if (r.isDefined && matched)
      writeEsWatermark(spark, Indexer.corpusToken(store()))
    r
  }

  /** Label the jobs of one pipeline step (optimization guide §1.5 —
    * job descriptions are thread-local, so concurrent steps label
    * correctly); always restored so callers' own labels survive.
    */
  private def step[T](spark: SparkSession, name: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"indexer: $name")
    try body finally sc.setJobDescription(prev)
  }

  def run(spark: SparkSession): RunReport = {
    val t0 = System.nanoTime()
    val listing = FsListing.list(spark, cfg.rootPath, cfg.skipPatterns,
      cfg.includeHidden)
    val (observedListing, obs) = RunStats.observed(listing)
    val entries = normalize(observedListing)

    // J1 merge + J6 reconcile, composed into ONE snapshot write: the new
    // scan is the truth for both updates and deletions (reference scan
    // loop + cleanup), and both are pure functions of (previous, entries)
    // — Merge.mergeReconcile keeps the per-key winner restricted to
    // scanned keys in a single key shuffle, so the run does one
    // full-index write instead of merge-write → read-back → semi-join
    // write (at 100 TB that write is the dominant cost; this halves it).
    val idx = store()
    // rollup validity anchor: the corpus identity BEFORE this run's
    // write — the stored dirSizes snapshot is incremental-foldable
    // only if it was computed against exactly this state
    val prevCorpusToken = Indexer.corpusToken(idx)
    // Upgrade path: a snapshot written before path-partitioning lacks
    // the p0 column — derive it so the merge schemas line up and the
    // NEXT write migrates the store to the partitioned layout.
    // readMor (not read): a pending event-driven log folds into this
    // full-rescan merge — its tie-kept metadata (last_seen) survives —
    // and the write then consumes the log (scan is truth).
    val previous = idx.readMor(spark, "relative_path",
      "modified_time").map { prev =>
      if (prev.columns.contains(ParquetIndex.PathPartitionCol)) prev
      else prev.withColumn(ParquetIndex.PathPartitionCol,
        ParquetIndex.pathPartitionExpr(col("relative_path")))
    }
    // batchWinsTies = false is the REFERENCE's own tie rule
    // (scanner.py:232-244: ON CONFLICT DO UPDATE ... WHERE
    // excluded.modified_time > files.modified_time — an unchanged file
    // keeps its stored row, including last_seen).
    // writeKeepingLog, not write: `previous` (a readMor over the old
    // base + its pending event-driven log) is ALSO the input of the
    // deletion anti-join and the rollup maintainer's diff below —
    // both lazy — so the consumed log's files must outlive them; the
    // sweep runs at the end of this method.
    val snapId = step(spark, "scan + merge + snapshot write") {
      idx.writeKeepingLog(previous match {
        case None => entries
        case Some(prev) =>
          Merge.mergeReconcile(prev, entries, "relative_path",
            "modified_time")
      })
    }
    // Deletion set AFTER the write, for two reasons: (a) the write is
    // then the FIRST action on the observed scan, so the run counters
    // report real values even when AQE prunes the scan out of an
    // empty-previous anti-join; (b) keep=2 retention guarantees the
    // previous snapshot's files still exist here. localCheckpoint cuts
    // the lazy plan's lineage before those files are eventually pruned
    // (deltas are small; cheap even at scale).
    // r17: launched as a THIRD concurrent leg (guide §2.6) — the
    // anti-join reads only (previous, entries), disjoint from the link
    // refresh and rollup maintenance below, so its jobs back-fill
    // their straggler tails instead of running serially before them.
    // Awaited before anything consumes it (bulk delete / the report),
    // and before sweepConsumedLogs — the error contract is unchanged.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val removedIdsF: Future[Option[DataFrame]] = Future {
      previous.map(prev =>
        step(spark, "deletion reconcile") {
          prev.join(entries, Seq("relative_path"), "left_anti")
            .select("id").localCheckpoint(true)
        })
    }

    // ES publish (elasticsearch mode): direct-link refresh (the
    // reference's DirectLinkManager step, main.py:190-192) then the
    // enrichment join + formatting (J4/J8/F3/F11) and bulk index;
    // deletions → bulk delete (S11).
    val (indexed, esFailed, linksRefreshed) = (cfg.mode, transport) match {
      case ("elasticsearch", Some(t)) =>
        // create-before-bulk (elasticsearch_integration.py:27,30-41): a
        // fresh cluster gets the explicit mapping, incl. the
        // path_hierarchy analyzer — NOT dynamic mappings
        admin.foreach(a => EsAdmin.ensureIndex(a, cfg.esIndex))
        val sink = new EsSink(t, cfg.esBatchSize)
        val current = idx.read(spark).get
        // links live beside the files snapshots, like the reference's
        // sibling direct_links DB (main.py:124)
        val linksIdx = new ParquetIndex(s"${cfg.indexRoot}/links",
          writeFiles = cfg.snapshotFiles)
        // MERGE-ON-READ refresh: each run appends only its fetched
        // batch (+ orphan delete keys) to the links store's MOR log
        // instead of rewriting the snapshot — write cost ∝ stale set,
        // not links-store size (LinkRefreshSpec pins equivalence with
        // the copy-on-write twin)
        // Link refresh and rollup maintenance are INDEPENDENT (disjoint
        // stores; both only read `current`), so their jobs run
        // concurrently from two driver threads (guide §2.6 "overlap
        // independent jobs"): the scheduler back-fills one step's
        // straggler tail with the other's tasks. Job labels stay
        // correct — `step` sets the THREAD-local description inside
        // each future. Await rethrows the first failure, preserving
        // the sequential error contract.
        val linksF = Future {
          val n = (cfg.getDirectLinks, linkFetch) match {
            case (true, Some(fetch)) => step(spark, "link refresh") {
              LinkRefresh.refreshIndexMor(spark,
                current.filter(col("type") === "file"), linksIdx, fetch,
                skipPatterns = cfg.skipPatterns)
            }
            case _ => 0L
          }
          // manifest snapshot AFTER the refresh's append, inside the
          // same future — the read must see this run's batch
          val frame = LinkRefresh.align(
            LinkRefresh.readLinksMor(spark, linksIdx).getOrElse(
              LinkRefresh.emptyLinks(spark)))
            .select(col("file_id"), col("direct_link").as("dl"),
              col("fsentry_id").as("fse"),
              col("api_creation_time").as("act"),
              col("api_modified_time").as("amt"))
          (n, frame)
        }
        // sizes from the MAINTAINED rollup snapshot: incremental fold
        // of the merge's own change feed when valid, recompute
        // otherwise — never the per-run ancestor explode by default
        val sizesF = Future {
          step(spark, "dirSizes rollup maintenance") {
            dirSizesMaintained(spark, idx, previous, current,
              prevCorpusToken)
          }.select(col("directory_path").as("dp"),
            col("sz").as("total_size"))
        }
        val (nLinks, links) = Await.result(linksF, Duration.Inf)
        val sizes = Await.result(sizesF, Duration.Inf)
        val docs = buildDocs(current, sizes, links)
        val s = step(spark, "publish: bulk index") {
          sink.bulkIndex(docs, cfg.esIndex, "id")
        }
        // delete failures count toward esFailed — a rejected deletion
        // leaves a stale searchable document the next run's anti-join
        // will NOT retry, so it must be visible in the run report
        val delFailed = Await.result(removedIdsF, Duration.Inf)
          .filter(_.count() > 0)
          .map(ids => step(spark, "publish: bulk delete") {
            sink.bulkDelete(ids, cfg.esIndex, "id").failed
          }).getOrElse(0L)
        // the full publish IS the watermark's definition — ES saw the
        // whole resolved corpus; advance only on a clean send so a
        // failed batch keeps catch-up/scoped publishes honest
        if (s.failed + delFailed == 0L)
          writeEsWatermark(spark, Indexer.corpusToken(idx))
        (s.indexed, s.failed + delFailed, nLinks)
      case _ => (0L, 0L, 0L) // index-only
    }

    // the await pins the deletion anti-join's execution BEFORE the log
    // sweep below (futures memoize, so the ES branch's earlier await
    // and this one see the same checkpointed frame)
    val removedCount = Await.result(removedIdsF, Duration.Inf)
      .map(_.count()).getOrElse(0L)
    // every frame derived from the pre-write resolve (deletion
    // anti-join, rollup diff, publish) has executed — the superseded
    // MOR log is now safe to drop (see writeKeepingLog above)
    idx.sweepConsumedLogs()
    val elapsed = (System.nanoTime() - t0) / 1e9
    RunReport(RunStats.collect(obs, elapsed), indexed, esFailed,
      removedCount, snapId, linksRefreshed)
  }
}

object Indexer {

  /** Identity of the files store's resolved corpus: base snapshot id +
    * merge-on-read log length. The stored dirSizes rollup records the
    * token it was computed against; any transition the maintainer did
    * not witness (manual store surgery, a crash between the files
    * write and the rollup fold) shows up as a mismatch and forces a
    * from-scratch recompute instead of a silent wrong fold.
    */
  private[pipeline] def corpusToken(idx: ParquetIndex): String =
    idx.currentId
      .map(id => s"$id+${idx.morEntries(id).length}")
      .getOrElse("empty")

  /** The signed per-file change feed of a corpus transition — exactly
    * the merge's reconcile legs, derived with ONE explode-free
    * full-outer join: removed files (−size, −1), added files (+size,
    * +1), resized files (new−old, 0). Feeding this through
    * [[graft.operators.FsOps.rollupDeltaAgg]] patches a stored rollup
    * in O(|Δ| × depth) instead of re-exploding the corpus.
    */
  private[pipeline] def signedFileChanges(prev: DataFrame,
      cur: DataFrame): DataFrame = {
    val p = prev.filter(col("type") === "file")
      .select(col("filepath"), col("size_bytes").as("p_size"))
    val c = cur.filter(col("type") === "file")
      .select(col("filepath"), col("size_bytes").as("c_size"))
    p.join(c, Seq("filepath"), "full_outer")
      .select(col("filepath"),
        when(col("c_size").isNull, -col("p_size"))
          .when(col("p_size").isNull, col("c_size"))
          .otherwise(col("c_size") - col("p_size"))
          .cast("long").as("delta_size"),
        when(col("c_size").isNull, lit(-1L))
          .when(col("p_size").isNull, lit(1L))
          .otherwise(lit(0L)).as("delta_count"))
      .filter(col("delta_size") =!= 0L || col("delta_count") =!= 0L)
  }

  /** The z-ordered snapshot's two layout dimensions: a 64-way crc32
    * bucket of the relative path (a path point/prefix predicate maps
    * to one bucket value) and the modification time's epoch seconds (a
    * time window maps to an epoch span). Shared by the store config
    * and by callers deriving [[ParquetIndex.readPruned]] spans.
    */
  val zorderSnapshotExprs: Seq[String] = Seq(
    "pmod(crc32(relative_path), 64)",
    "unix_seconds(modified_time)")

  /** Driver-side bucket of one relative path under
    * [[zorderSnapshotExprs]]' first dimension (crc32 mod 64) — for
    * turning a point lookup into a `readPruned` span.
    */
  def pathBucket(relativePath: String): Long = {
    val c = new java.util.zip.CRC32
    c.update(relativePath.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Math.floorMod(c.getValue, 64L)
  }

  /** Normalize a listing to the canonical FsEntry columns (P5/P6/F1) —
    * shared by the batch pipeline and continuous indexing. The id hashes
    * the '/'-prefixed relative path (= filepath), matching the
    * reference's _generate_file_id byte-for-byte (scanner.py:176-186
    * always restores the leading slash first).
    */
  def normalize(listing: DataFrame): DataFrame = listing.select(
    sha2(col("filepath"), 256).as("id"),
    col("name"),
    expr("substring(filepath, 2)").as("relative_path"),
    col("filepath"),
    when(col("entry_type") === "file", col("size_bytes")).as("size_bytes"),
    col("modified_time"),
    col("modified_time").as("creation_time"),
    col("entry_type").as("type"),
    // Path(name).suffix parity: dotfiles like '.bashrc' have no extension
    lower(regexp_extract(col("name"), ".\\.([^./]+)$", 1)).as("extension"),
    lit("").as("checksum"),
    lit("").as("direct_link"),
    current_timestamp().as("last_seen"),
    // snapshot partition column (hash bucket of the first path
    // segment) — the ART-index replacement: point/prefix queries prune
    // to one of ≤256 partition dirs; hashing keeps the dir count
    // bounded on wide trees and the dir names charset-safe
    ParquetIndex.pathPartitionExpr(expr("substring(filepath, 2)"))
      .as(ParquetIndex.PathPartitionCol))
}

/** CLI entry point: `graft.pipeline.IndexerCli <config.yaml|config.kv>
  * [key=value overrides...]` or `root_path=... index_root=...
  * [mode=index-only]` args directly. A `.yaml`/`.yml` config file is
  * parsed with the reference's nested key surface
  * ([[IndexerConfig.loadYaml]]); anything else as flat `key=value`.
  */
object IndexerCli {
  def main(args: Array[String]): Unit = {
    def kvPairs(xs: Seq[String]): Map[String, String] =
      xs.flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim)
        case _ => None
      }).toMap
    val cfg =
      if (args.nonEmpty && (args(0).endsWith(".yaml") ||
          args(0).endsWith(".yml")))
        IndexerConfig.loadYaml(
          java.nio.file.Files.readString(java.nio.file.Paths.get(args(0))),
          kvPairs(args.drop(1).toSeq))
      else {
        val lines =
          if (args.length == 1 && java.nio.file.Files.exists(
              java.nio.file.Paths.get(args(0))))
            java.nio.file.Files.readAllLines(java.nio.file.Paths.get(args(0)))
              .toArray(Array.empty[String]).toSeq
          else args.toSeq
        IndexerConfig.load(lines)
      }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ST4: graceful shutdown — stop cleanly on SIGTERM/SIGINT.
    sys.addShutdownHook { spark.stop() }
    val esUrl = sys.env.get("GRAFT_ES_URL")
    val transport = esUrl.map(u => EsSink.http(u))
    val admin = esUrl.map(u => EsAdmin.http(u))
    // No link-fetch client here: the direct-link API is an external
    // service behind the pluggable LinkRefresh.Fetch boundary — library
    // users wire their client via the Indexer constructor.
    val report = new Indexer(cfg, transport, admin).run(spark)
    println(report.stats.summary +
      s"; es indexed=${report.indexed} failed=${report.esFailed}" +
      s" removed=${report.removed} links=${report.linksRefreshed}" +
      s" snapshot=${report.snapshotId}")
    spark.stop()
  }
}

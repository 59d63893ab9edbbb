package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Globs

/** S5: REST filesystem traversal (reference: lucidlink_api.py:182-298 —
  * an async BFS over a directory-listing HTTP API with per-level fan-out,
  * seen-path dedup, and skip-pattern pruning).
  *
  * Spark formulation: level-synchronous BFS. Each round lists the current
  * directory frontier in parallel (`mapPartitions`, one API client per
  * partition — the reference's connection-pool semantics), accumulates
  * entries, and seeds the next frontier from newly discovered unskipped
  * directories. The frontier (directory paths only) round-trips through
  * the driver — that is the reference's own design (its BFS queue lives
  * in one process); entry payloads stay distributed.
  *
  * The HTTP client is a pluggable [[RestWalker.Fetch]] so traversal
  * logic is testable hermetically; per-level fan-out chunking (50/30/20
  * by depth in the reference) becomes partition count capping.
  */
object RestWalker {

  /** One API listing entry; `mtime_ns` is the reference's ns-epoch
    * (lucidlink_api.py:71-74), converted here via F10.
    */
  final case class ApiEntry(
      path: String,
      entry_type: String,
      size_bytes: Long,
      mtime_ns: Long)

  /** Lists one directory (non-recursive). */
  trait Fetch extends (String => Seq[ApiEntry]) with Serializable

  def traverse(
      spark: SparkSession,
      fetch: Fetch,
      root: String,
      skipPatterns: Seq[String] = Nil,
      maxDepth: Int = 64,
      fanout: Int = 32): DataFrame = {
    import spark.implicits._

    val skipRe = if (skipPatterns.isEmpty) None
      else Some(Globs.skipRegex(skipPatterns).r)
    def skipped(p: String): Boolean =
      skipRe.exists(_.findFirstIn(p.stripPrefix("/")).isDefined)
    // P3 pushdown parity with FsListing: a hidden directory's rows are
    // all dropped by the final filter anyway, so its subtree must never
    // be FETCHED — against a real API that is a whole .git/.snapshots
    // tree of wasted HTTP listings per level.
    val hiddenRe = "(^|/)\\.[^/]*$".r
    def hidden(p: String): Boolean = hiddenRe.findFirstIn(p).isDefined

    var frontier = Seq(root)
    val seen = scala.collection.mutable.Set[String](root) // SO4 dedup
    var acc: Option[DataFrame] = None
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      val nPart = math.max(1, math.min(frontier.size, fanout))
      // Eager localCheckpoint (not .cache()): materializes the level ONCE
      // right here — the HTTP fetch can never re-run on a downstream
      // action — truncates lineage, and leaves no CacheManager entry
      // pinned for the walk's lifetime (blocks are released by the
      // ContextCleaner once the result frame is dropped).
      val listed = spark.createDataset(frontier)
        .repartition(nPart)
        .mapPartitions(_.flatMap(fetch))
        .toDF()
        .localCheckpoint(true)
      acc = Some(acc.fold(listed)(_.unionByName(listed)))
      frontier = listed
        .filter(col("entry_type") === "directory")
        .select("path").as[String].collect().toSeq
        .filterNot(p => skipped(p) || hidden(p) || seen.contains(p))
      frontier.foreach(seen.add)
      depth += 1
    }
    val out = acc.getOrElse(spark.emptyDataset[ApiEntry].toDF())
    // Skipped directories are pruned from recursion above; their own
    // entry rows (and any skip-matching files) are filtered here so the
    // result matches the reference's exclusion semantics exactly.
    val unskipped = skipRe.map(_.regex) match {
      case Some(re) => out.filter(!col("path").rlike(re))
      case None => out
    }
    unskipped
      .filter(!col("path").rlike("(^|/)\\.")) // P3 parity
      .withColumn("modified_time",
        timestamp_micros(expr("mtime_ns div 1000"))) // F10
      .drop("mtime_ns")
  }

  /** The SCALE twin of [[traverse]]: identical semantics (level-
    * synchronous BFS, seen-dedup, skip/hidden pruning before fetch),
    * but the frontier AND the seen-set stay DISTRIBUTED — the driver
    * holds only a per-level row count, never a path. [[traverse]]
    * mirrors the reference's own single-process BFS queue
    * (lucidlink_api.py:182-298) and collects each level's directory
    * list; its driver-side `seen` set grows with the TOTAL directory
    * count, so a 10M-dir tree would pressure the driver (r12 verdict
    * note). Here the next frontier is `listed dirs ANTI-JOIN seen`,
    * both eagerly localCheckpointed per level: driver memory is O(1),
    * dedup is a distributed join bounded per level by the frontier's
    * discovery volume, and the HTTP fetches stay in `mapPartitions`
    * exactly as before. Per level this costs one count action and one
    * anti-join shuffle — noise against the network-bound listings it
    * schedules, and the price of never materializing the tree's
    * directory names in one process.
    */
  def traverseDistributed(
      spark: SparkSession,
      fetch: Fetch,
      root: String,
      skipPatterns: Seq[String] = Nil,
      maxDepth: Int = 64,
      fanout: Int = 32): DataFrame = {
    import spark.implicits._

    // same exclusion semantics as traverse, expressed as Columns so the
    // pruning runs where the frontier lives; like traverse, recursion
    // pruning tests the root-stripped path, the final row filter the
    // raw path
    val hiddenCol = col("path").rlike("(^|/)\\.[^/]*$")
    val skipRe = if (skipPatterns.isEmpty) None
      else Some(Globs.skipRegex(skipPatterns))
    val skipRecurseCol = skipRe.fold(lit(false))(re =>
      regexp_replace(col("path"), "^/", "").rlike(re))
    val skipRowCol = skipRe.fold(lit(false))(re => col("path").rlike(re))

    var frontier = spark.createDataset(Seq(root)).toDF("path")
      .localCheckpoint(true)
    // SO4 dedup, kept distributed as PER-LEVEL checkpointed frames:
    // each level materializes ONLY its own frontier (the r13 shape
    // re-checkpointed the cumulative union every level — O(depth ×
    // total_dirs) checkpoint I/O); the anti-join reads the frames
    // through a lazy union, which scans the already-materialized
    // blocks without ever rewriting them (RestWalkerSpec pins the
    // per-level materialization count).
    var seenFrames = Vector(frontier)
    var frontierRows = 1L
    var acc: Option[DataFrame] = None
    var depth = 0
    while (frontierRows > 0 && depth < maxDepth) {
      val nPart = math.max(1, math.min(frontierRows, fanout.toLong)).toInt
      val listed = frontier.repartition(nPart)
        .as[String].mapPartitions(_.flatMap(fetch))
        .toDF()
        .localCheckpoint(true) // fetch runs ONCE, lineage truncated
      acc = Some(acc.fold(listed)(_.unionByName(listed)))
      val next = listed
        .filter(col("entry_type") === "directory")
        .select("path")
        .filter(!skipRecurseCol && !hiddenCol)
        .distinct()
        .join(seenFrames.reduce(_.unionByName(_)), Seq("path"),
          "left_anti")
        .localCheckpoint(true)
      seenFrames :+= next
      frontier = next
      frontierRows = next.count()
      depth += 1
    }
    val out = acc.getOrElse(spark.emptyDataset[ApiEntry].toDF())
    out
      .filter(!skipRowCol)
      .filter(!col("path").rlike("(^|/)\\.")) // P3 parity
      .withColumn("modified_time",
        timestamp_micros(expr("mtime_ns div 1000"))) // F10
      .drop("mtime_ns")
  }
}

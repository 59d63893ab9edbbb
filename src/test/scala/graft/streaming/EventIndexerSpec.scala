package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.pipeline.{Indexer, IndexerConfig}

/** Event-driven incremental indexing: a changed-dir event refreshes
  * exactly its subtree through the MOR log; untouched subtrees keep
  * their stored rows; the periodic checkpoint folds to a snapshot equal
  * to a from-scratch full rescan.
  */
class EventIndexerSpec extends SparkSpecBase {

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("evidx")
    Files.createDirectories(root.resolve("a/sub"))
    Files.createDirectories(root.resolve("b"))
    Files.writeString(root.resolve("a/f1.txt"), "1111")
    Files.writeString(root.resolve("a/f2.txt"), "22")
    Files.writeString(root.resolve("a/sub/f3.log"), "333")
    Files.writeString(root.resolve("b/g1.txt"), "gg")
    root
  }

  private def paths(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.getAs[String]("relative_path")).toSet

  test("a dir event refreshes its subtree only; checkpoint ≡ full rescan") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("evstore").toString
    val cfg = IndexerConfig(root.toString, idxRoot, mode = "index-only")
    val indexer = new Indexer(cfg, None)
    indexer.run(spark) // the base snapshot

    // mutate a/ only: add f4, remove f2, update f1; b/ untouched
    Files.writeString(root.resolve("a/f4.txt"), "44444")
    Files.delete(root.resolve("a/f2.txt"))
    Files.writeString(root.resolve("a/f1.txt"), "1111-updated")
    Files.setLastModifiedTime(root.resolve("a/f1.txt"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    var refreshed = 0L
    val q = EventIndexer.start(ms.toDF().toDF("dir"), indexer,
      Files.createTempDirectory("evckpt").toString,
      checkpointEvery = 2, // batch ids 0,1 → fold after the 2nd
      maxLogRatio = 0, // count policy under test; ratio policy has
      // its own long-run spec (MorPolicySpec) and would fold the tiny
      // test log before the count trigger gets its turn
      onBatch = (_, n) => refreshed += n)
    try {
      ms.addData("a"); q.processAllAvailable()
      val store = new graft.sinks.ParquetIndex(idxRoot)
      val mor = store.readMor(spark, "relative_path", "modified_time").get
      assert(paths(mor) == Set("a", "a/sub", "a/f1.txt", "a/f4.txt",
        "a/sub/f3.log", "b", "b/g1.txt"))
      // the update really flowed (f1's size changed)
      val f1 = mor.filter(col("relative_path") === "a/f1.txt")
        .select("size_bytes").collect()(0).getLong(0)
      assert(f1 == 12L)
      assert(refreshed > 0L)
      // second event batch (a no-op rescan of b) crosses checkpointEvery
      // → the log folds into a plain snapshot
      ms.addData("b"); q.processAllAvailable()
      assert(store.morEntries(store.currentId.get).isEmpty)
      val folded = store.read(spark).get
      assert(paths(folded) == paths(mor))
    } finally q.stop()

    // the folded snapshot equals a from-scratch full rescan (modulo
    // last_seen timestamps): same keys, sizes, mtimes
    val rescanRoot = Files.createTempDirectory("evstore2").toString
    new Indexer(IndexerConfig(root.toString, rescanRoot,
      mode = "index-only"), None).run(spark)
    // directory rows' OWN mtimes are compared as null: mutating files
    // inside a/ bumps a/'s mtime, which only a PARENT event refreshes
    // (scope is strictly-inside — documented in runScoped)
    def keyed(r: String) = new graft.sinks.ParquetIndex(r).read(spark).get
      .select(col("relative_path"), col("size_bytes"),
        when(col("type") === "file", col("modified_time")).as("mt"),
        col("type"))
      .collect().map(r => (r.getAs[String](0), Option(r.get(1)),
        Option(r.get(2)), r.getAs[String](3))).toSet
    assert(keyed(idxRoot) == keyed(rescanRoot))
  }

  test("scoped refresh honors ROOT-relative skip patterns and " +
      "skip-listed scope dirs") {
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("evstore4").toString
    // a path-ANCHORED pattern: matches only relative to the index root
    val cfg = IndexerConfig(root.toString, idxRoot, mode = "index-only",
      skipPatterns = Seq("b/g1*", "a/sub"))
    val indexer = new Indexer(cfg, None)
    indexer.run(spark)
    val store = new graft.sinks.ParquetIndex(idxRoot)
    val full = paths(store.read(spark).get)
    assert(!full.contains("b/g1.txt") && !full.contains("a/sub/f3.log"))

    // an event on b must NOT resurrect b/g1.txt (subtree-relative
    // matching would see only "g1.txt" and miss the pattern)
    Files.writeString(root.resolve("b/g2.txt"), "new")
    indexer.runScoped(spark, Seq("b"))
    val mor = paths(store.readMor(spark, "relative_path",
      "modified_time").get)
    assert(mor.contains("b/g2.txt") && !mor.contains("b/g1.txt"))

    // an event on (or under) a skip-listed dir is an empty rescan —
    // it must not index the pruned subtree
    assert(indexer.runScoped(spark, Seq("a/sub")) == 0L)
    val mor2 = paths(store.readMor(spark, "relative_path",
      "modified_time").get)
    assert(!mor2.exists(_.startsWith("a/sub/")))
  }

  test("a vanished subtree event deletes the subtree's entries") {
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("evstore3").toString
    val cfg = IndexerConfig(root.toString, idxRoot, mode = "index-only")
    val indexer = new Indexer(cfg, None)
    indexer.run(spark)

    // rm -r a/sub, then the event for it
    Files.delete(root.resolve("a/sub/f3.log"))
    Files.delete(root.resolve("a/sub"))
    assert(indexer.runScoped(spark, Seq("a/sub")) == 0L)
    val store = new graft.sinks.ParquetIndex(idxRoot)
    val mor = store.readMor(spark, "relative_path", "modified_time").get
    // f3 gone; the dir's own row is the parent's child — covered by a
    // parent event, exactly as documented
    assert(!paths(mor).contains("a/sub/f3.log"))
    assert(indexer.runScoped(spark, Seq("a")) > 0L)
    val mor2 = store.readMor(spark, "relative_path", "modified_time").get
    assert(!paths(mor2).contains("a/sub"))
  }
}

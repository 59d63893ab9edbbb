package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.pipeline.{Indexer, IndexerConfig}

/** Crash/restart semantics of the event-driven indexing loop — the
  * property a 100 TB deployment actually relies on: a streaming query
  * that dies mid-run RESUMES from its checkpoint without reprocessing
  * committed batches, and the one batch foreachBatch may legitimately
  * REPLAY (a crash between the sink's effect and the offset commit —
  * Structured Streaming's at-least-once window) leaves the resolved
  * store view unchanged, because `runScoped` is a rescan-is-truth
  * refresh through the MOR log's LWW resolution, not an accumulation.
  *
  * Reference behavior being re-expressed: the reference's producer
  * loop checkpoints progress in its DuckDB table and survives restart
  * by re-scanning (scanner.py's full-rescan reconciliation); here the
  * checkpoint is Spark's offset log and the idempotence is per
  * scoped batch.
  */
class StreamRecoverySpec extends SparkSpecBase {

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("recidx")
    Files.createDirectories(root.resolve("a/sub"))
    Files.createDirectories(root.resolve("b"))
    Files.writeString(root.resolve("a/f1.txt"), "1111")
    Files.writeString(root.resolve("a/f2.txt"), "22")
    Files.writeString(root.resolve("a/sub/f3.log"), "333")
    Files.writeString(root.resolve("b/g1.txt"), "gg")
    root
  }

  /** The stable identity of the resolved store view: everything except
    * `last_seen`, which is scan-time by CONTRACT (a replayed rescan
    * legitimately bumps it — same as the reference re-stamping its
    * scan timestamp on reconciliation).
    */
  private def viewKey(df: org.apache.spark.sql.DataFrame) =
    df.select("relative_path", "size_bytes", "modified_time", "type")
      .collect()
      .map(r => (r.getAs[String](0), Option(r.get(1)),
        Option(r.get(2)), r.getAs[String](3)))
      .toSet

  test("a restarted query resumes from the checkpoint: committed " +
    "batches are not reprocessed and the resumed run completes the state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("recstore").toString
    val ckpt = Files.createTempDirectory("recckpt").toString
    val cfg = IndexerConfig(root.toString, idxRoot, mode = "index-only")
    val indexer = new Indexer(cfg, None)
    indexer.run(spark) // base snapshot

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    // ---- incarnation 1: process the a/ mutation, then "crash" ----
    Files.writeString(root.resolve("a/f4.txt"), "44444")
    val run1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q1 = EventIndexer.start(ms.toDF().toDF("dir"), indexer, ckpt,
      maxLogRatio = 0, onBatch = (id, _) => run1 += id)
    try {
      ms.addData("a"); q1.processAllAvailable()
    } finally q1.stop() // the crash: offsets for batch 0 are committed
    assert(run1.nonEmpty)

    // ---- while down: more changes arrive ----
    Files.writeString(root.resolve("b/g2.txt"), "new-file")
    ms.addData("b")

    // ---- incarnation 2: SAME checkpoint, SAME source ----
    val run2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = EventIndexer.start(ms.toDF().toDF("dir"), indexer, ckpt,
      maxLogRatio = 0, onBatch = (id, _) => run2 += id)
    try {
      q2.processAllAvailable()
      // no committed batch id is reprocessed...
      assert(run2.toSet.intersect(run1.toSet).isEmpty,
        s"replayed committed batches: run1=$run1 run2=$run2")
      // ...and the resumed run carried the new event through
      val store = new graft.sinks.ParquetIndex(idxRoot)
      val view = viewKey(
        store.readMor(spark, "relative_path", "modified_time").get
          .filter(col("type") === "file"))
      assert(view.exists(_._1 == "a/f4.txt"), "incarnation-1 batch lost")
      assert(view.exists(_._1 == "b/g2.txt"), "post-crash event lost")
    } finally q2.stop()
  }

  test("a REPLAYED scoped batch (crash between sink effect and offset " +
    "commit) leaves the resolved store view unchanged") {
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("recstore2").toString
    val cfg = IndexerConfig(root.toString, idxRoot, mode = "index-only")
    val indexer = new Indexer(cfg, None)
    indexer.run(spark)

    // the batch: a/ mutated (add f4, delete f2, update f1)
    Files.writeString(root.resolve("a/f4.txt"), "44444")
    Files.delete(root.resolve("a/f2.txt"))
    Files.writeString(root.resolve("a/f1.txt"), "1111-updated")
    val store = new graft.sinks.ParquetIndex(idxRoot)
    def morView() = viewKey(
      store.readMor(spark, "relative_path", "modified_time").get)

    indexer.runScoped(spark, Seq("a")) // the effect that DID land
    val committed = morView()
    val logLen = store.morEntries(store.currentId.get).length

    // the replay: same batch, re-run by the restarted query
    indexer.runScoped(spark, Seq("a"))
    assert(morView() == committed,
      "replayed scoped batch drifted the resolved view")
    // the log grew (append-only — by design), but folding it yields
    // the SAME snapshot content the unreplayed log would have
    assert(store.morEntries(store.currentId.get).length > logLen)
    store.checkpointMor(spark, "relative_path", "modified_time")
    assert(store.morEntries(store.currentId.get).isEmpty)
    assert(viewKey(store.read(spark).get) == committed,
      "fold after replay differs from the committed view")

    // and the folded state equals a from-scratch rescan's (file rows;
    // dir OWN-mtime caveat as documented in runScoped)
    val rescanRoot = Files.createTempDirectory("recstore3").toString
    new Indexer(IndexerConfig(root.toString, rescanRoot,
      mode = "index-only"), None).run(spark)
    val fresh = viewKey(new graft.sinks.ParquetIndex(rescanRoot)
      .read(spark).get.filter(col("type") === "file"))
    val foldedFiles = viewKey(
      store.read(spark).get.filter(col("type") === "file"))
    assert(foldedFiles == fresh)
  }
}

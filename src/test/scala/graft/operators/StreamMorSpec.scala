package graft.operators

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** The streaming MOR ingestion path (`fs_stream_index_mor`), pinned
  * beyond the DuckDB gate's value check:
  *
  *  - write cost ∝ BATCH, not index: a micro-batch landed through
  *    `appendDelta` writes bytes proportional to its own rows (the
  *    rescan generation is ~1/7 of the tree), where the COW twin
  *    rewrites the full snapshot every batch;
  *  - the MOR fold equals the COW stream's final state row-for-row;
  *  - the green-row cadence (checkpoint every
  *    [[StreamOps.morCheckpointEvery]] batches) leaves a FOLDED store:
  *    empty log, same state served by both `read` and `readMor`.
  */
class StreamMorSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def dirBytes(p: Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_))
      .mapToLong(Files.size(_)).sum
    finally s.close()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("a streamed micro-batch writes ∝ its own size, and the MOR fold " +
    "equals the COW stream's state") {
    val root = Files.createTempDirectory("stream-mor-raw").toString
    StreamOps.stageScanGens(spark, sf, root)
    // append-only landing: no checkpoint, so the log survives for
    // byte-level inspection
    StreamOps.runIndexStream(spark, root) { (idx, batch, _) =>
      idx.appendDelta(batch.sparkSession, batch): Unit
    }
    val store = java.nio.file.Paths.get(root, "store")
    val ls = Files.list(store)
    val entries = try {
      val b = scala.collection.mutable.ArrayBuffer.empty[Path]
      ls.forEach(b += _); b.toSeq
    } finally ls.close()
    val snap = entries.filter(_.getFileName.toString.startsWith("snap-"))
    val mor = entries.filter(_.getFileName.toString.startsWith("mor-"))
    assert(snap.size == 1 && mor.size == 1,
      s"expected 1 base + 1 log, got ${entries.map(_.getFileName)}")
    val baseBytes = dirBytes(snap.head)
    val deltaBytes = dirBytes(mor.head.resolve("delta-00000"))
    // gen1 is the %7 rescan (~1/7 of rows); COW would have re-written
    // ~baseBytes for that batch — the delta must be a small fraction
    assert(deltaBytes > 0 && deltaBytes * 3 < baseBytes,
      s"delta $deltaBytes bytes vs base $baseBytes — not ∝ batch")
    val gen1Rows = spark.read.parquet(s"$root/in/gen1.parquet").count()
    val delta = new graft.sinks.ParquetIndex(store.toString)
    assert(spark.read.parquet(mor.head.resolve("delta-00000").toString)
      .count() == gen1Rows)
    val morState = delta
      .readMor(spark, "relative_path", "modified_time").get
      .select("relative_path", "size_bytes", "modified_time")
      .orderBy("relative_path")
    assert(rows(morState) == rows(StreamOps.streamIndex(spark, sf)))
  }

  test("the green-row cadence folds the log: empty morEntries, read ≡ " +
    "readMor ≡ the COW stream") {
    val expected = rows(StreamOps.streamIndex(spark, sf))
    val got = rows(StreamOps.streamIndexMor(spark, sf))
    assert(got == expected)
    // the query's own store (cached per sfDir) must be left folded
    val idxDirRoot = StreamOps.streamIndexMorStoreDir(sf)
      .getOrElse(fail("streamIndexMor store not cached"))
    val idx = new graft.sinks.ParquetIndex(s"$idxDirRoot/store")
    val cid = idx.currentId.getOrElse(fail("no base snapshot"))
    assert(idx.morEntries(cid).isEmpty,
      "checkpointMor did not fold the log")
    assert(rows(idx.read(spark).get
      .select("relative_path", "size_bytes", "modified_time")
      .orderBy("relative_path")) == expected)
  }
}

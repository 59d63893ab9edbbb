package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{FsOps, StreamOps}

/** MOR-cadence streaming rollup pins (r13 verdict #4): per-batch work
  * writes ONLY the delta aggregate to the log (never the snapshot),
  * the checkpoint fold is crash-safe under the write-snapshot-first /
  * trim-log-second order, and every step is idempotent under
  * Structured Streaming's batch-retry contract. The end-to-end row
  * (`fs_stream_rollup_mor`) shares `fs_dir_rollup_incremental`'s
  * DuckDB oracle; here we pin the mechanics the oracle can't see.
  */
class RollupMorStreamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** A tiny hand-rolled MOR root: snap-b0 + an empty log. */
  private def mkRoot(): String = {
    val root = Files.createTempDirectory("rollupmor").toString
    FsOps.dirRollupPrior(spark, sf).write.parquet(s"$root/snap-b0")
    root
  }

  private def feedSlices(): Seq[DataFrame] = {
    val feed = FsOps.rollupChangeFeed(spark, sf).localCheckpoint(true)
    // deterministic 2-way split standing in for micro-batch cuts
    Seq(feed.filter(crc32(col("filepath")) % 2 === 0),
      feed.filter(crc32(col("filepath")) % 2 === 1))
  }

  test("streamed MOR row == batch incremental row (cut points and " +
    "fold cadence are invisible)") {
    assert(rows(StreamOps.streamRollupMor(spark, sf)) ==
      rows(FsOps.dirRollupIncremental(spark, sf)))
  }

  test("per-batch writes touch only the log; the snapshot folds at " +
    "checkpoint cadence alone") {
    val root = mkRoot()
    val slices = feedSlices()
    StreamOps.rollupMorStep(root, slices(0), 0L)
    StreamOps.rollupMorStep(root, slices(1), 1L)
    def names = new java.io.File(root).listFiles.map(_.getName).toSet
    // two batches processed, zero new snapshot generations
    assert(names.filter(_.startsWith("snap-")) == Set("snap-b0"))
    val served = rows(StreamOps.rollupMorRead(spark, root))
    StreamOps.rollupMorCheckpoint(spark, root)
    assert(names.filter(_.startsWith("snap-")) ==
      Set("snap-b0", "snap-b2"))
    // the folded log is trimmed, and the fold changed nothing the
    // reader could observe
    assert(new java.io.File(s"$root/log").listFiles.isEmpty)
    assert(rows(StreamOps.rollupMorRead(spark, root)) == served)
  }

  test("a retried batch is idempotent: MOR log step and CoW fold step " +
    "both overwrite their own debris") {
    val root = mkRoot()
    val slices = feedSlices()
    StreamOps.rollupMorStep(root, slices(0), 0L)
    val once = rows(StreamOps.rollupMorRead(spark, root))
    StreamOps.rollupMorStep(root, slices(0), 0L) // retry, same batchId
    assert(rows(StreamOps.rollupMorRead(spark, root)) == once)

    // CoW twin: snap-<b+1> is keyed by batchId and overwritten — the
    // r13 shape (AtomicInteger + ErrorIfExists) failed permanently here
    val cow = mkRoot()
    Files.move(java.nio.file.Paths.get(s"$cow/snap-b0"),
      java.nio.file.Paths.get(s"$cow/snap-0"))
    StreamOps.rollupCowStep(cow, slices(0), 0L)
    val cowOnce = rows(spark.read.parquet(s"$cow/snap-1"))
    StreamOps.rollupCowStep(cow, slices(0), 0L) // retry
    assert(rows(spark.read.parquet(s"$cow/snap-1")) == cowOnce)
  }

  test("checkpoint crash-safety: already-folded log debris is ignored " +
    "by the read (watermark rule), and a re-checkpoint sweeps it") {
    val root = mkRoot()
    val slices = feedSlices()
    StreamOps.rollupMorStep(root, slices(0), 0L)
    StreamOps.rollupMorStep(root, slices(1), 1L)
    val served = rows(StreamOps.rollupMorRead(spark, root))
    StreamOps.rollupMorCheckpoint(spark, root)
    // crash window: snapshot landed but the trim didn't — resurrect a
    // folded batch as debris
    StreamOps.rollupMorStep(root, slices(0), 0L)
    // the reader must NOT double-apply it
    assert(rows(StreamOps.rollupMorRead(spark, root)) == served)
    // and folding again still changes nothing (debris below the
    // watermark is not refolded)
    StreamOps.rollupMorCheckpoint(spark, root)
    assert(rows(StreamOps.rollupMorRead(spark, root)) == served)
  }

  test("a torn snapshot (no _SUCCESS) is invisible: the previous " +
    "generation + untrimmed log still serve, via the Hadoop FS API " +
    "on an explicit file: URI") {
    // the r15 port: discovery runs through Hadoop FileSystem (the
    // production store is HDFS/S3) — exercise it with a scheme'd URI
    val root = "file:" + Files.createTempDirectory("rollupmor_uri")
    FsOps.dirRollupPrior(spark, sf).write.parquet(s"$root/snap-b0")
    val slices = feedSlices()
    StreamOps.rollupMorStep(root, slices(0), 0L)
    StreamOps.rollupMorStep(root, slices(1), 1L)
    val served = rows(StreamOps.rollupMorRead(spark, root))
    // crash mid-snapshot-write: a snap-b2 directory exists, partially
    // written, with NO _SUCCESS marker — max-generation discovery must
    // not select it (it would silently drop the unfolded log tail)
    val torn = new java.io.File(
      root.stripPrefix("file:") + "/snap-b2")
    assert(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3)) // garbage — unreadable if ever selected
    assert(rows(StreamOps.rollupMorRead(spark, root)) == served)
    // a real checkpoint then lands OVER the torn dir (overwrite mode)
    // and the store moves on
    StreamOps.rollupMorCheckpoint(spark, root)
    assert(rows(StreamOps.rollupMorRead(spark, root)) == served)
    assert(new java.io.File(torn, "_SUCCESS").exists())
  }

  test("a store whose snapshots ALL lack _SUCCESS fails fast with the " +
    "marksuccessfuljobs diagnosis, not a cryptic snap-b-1 read") {
    // the r15 advice hole: with
    // mapreduce.fileoutputcommitter.marksuccessfuljobs=false (common
    // on object stores) every snapshot looks torn — discovery must say
    // so instead of reading a nonexistent snap-b-1 path
    val root = Files.createTempDirectory("rollupmor_nosucc").toString
    val snap = new java.io.File(s"$root/snap-b0")
    assert(snap.mkdirs())
    java.nio.file.Files.write(snap.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    val e = intercept[RuntimeException] {
      StreamOps.rollupMorRead(spark, root)
    }
    assert(e.getMessage.contains("marksuccessfuljobs"),
      s"got: ${e.getMessage}")
  }
}

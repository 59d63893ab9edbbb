package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Indexer
import graft.sinks.ParquetIndex
import graft.sources.FsListing
import graft.stats.RunStats

/** Continuous indexing as a MODE, not a design note (ST1-ST3,
  * SURVEY.md §2.8): a streaming "tick" source drives repeated rescans;
  * every micro-batch re-lists the root and lands the full scan through
  * ONE `mergeReconcile` snapshot write — updates AND deletions both take
  * effect per batch, exactly the batch pipeline's semantics on a
  * cadence. This is the Spark-native shape of the reference's
  * producer-queue loop (scanner.py:312-320,364-403 + the cleanup at
  * main.py:339-362): the trigger replaces the producer thread, Spark's
  * micro-batch backpressure replaces the bounded queue, and the
  * reconcile-per-batch replaces the end-of-run cleanup pass.
  *
  * Scale notes: the per-batch work is the same plan the batch pipeline
  * runs — distributed listing, one key shuffle, one partitioned
  * snapshot write; nothing accumulates in streaming state (the snapshot
  * store IS the state, bounded by the index size). Counters come from
  * `observe` on the listing (A8) — one pass, no second scan.
  */
object ContinuousIndexer {

  /** Per-micro-batch outcome, delivered to the `onBatch` callback. */
  final case class BatchReport(
      batchId: Long, stats: RunStats.Stats, snapshotId: String)

  /** Start continuous indexing driven by `ticks` (any streaming frame —
    * its rows are ignored, its micro-batches are the rescan clock; use
    * [[rateTicks]] in production, a MemoryStream in tests).
    */
  def start(
      ticks: DataFrame,
      root: String,
      index: ParquetIndex,
      checkpointDir: String,
      skipPatterns: Seq[String] = Nil,
      includeHidden: Boolean = false,
      onBatch: BatchReport => Unit = _ => ()): StreamingQuery =
    ticks.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (tick: DataFrame, batchId: Long) =>
        // the rate source fires a micro-batch every second regardless
        // of the tick filter — an EMPTY tick batch must NOT rescan, or
        // rateTicks(1h) would rescan and rewrite the snapshot every
        // second instead of hourly
        if (!tick.isEmpty) {
          val spark = tick.sparkSession
          val t0 = System.nanoTime()
          val listing = FsListing.list(spark, root, skipPatterns,
            includeHidden)
          val (observed, obs) = RunStats.observed(listing)
          val entries = Indexer.normalize(observed)
          val snapId = index.upsertReconcile(spark, entries,
            "relative_path", "modified_time")
          val elapsed = (System.nanoTime() - t0) / 1e9
          onBatch(BatchReport(batchId, RunStats.collect(obs, elapsed),
            snapId))
        }
      }
      .start()

  /** Production tick source: one non-empty micro-batch (= one rescan)
    * per `intervalSeconds`; the in-between batches are empty and
    * skipped by the foreachBatch guard above.
    */
  def rateTicks(spark: SparkSession, intervalSeconds: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .filter(
        org.apache.spark.sql.functions.col("value") % intervalSeconds === 0)
}

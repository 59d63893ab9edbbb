package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.{Indexer, RunReport}

/** Continuous indexing as a MODE, not a design note (ST1-ST3,
  * SURVEY.md §2.8): a streaming "tick" source drives the FULL batch
  * pipeline once per non-empty micro-batch — scan → merge+reconcile
  * (one snapshot write) and, in elasticsearch mode, link refresh →
  * enrichment → bulk publish → bulk deletes. This is the Spark-native
  * shape of the reference's producer-queue loop
  * (scanner.py:312-320,364-403 + main.py:273-295's batch flushes +
  * the cleanup at main.py:339-362): the trigger replaces the producer
  * thread, Spark's micro-batch backpressure replaces the bounded
  * queue, and each tick's run is idempotent (ES writes keyed by _id,
  * snapshot pointer swapped atomically).
  *
  * Built ON [[Indexer.run]] rather than beside it — the batch pipeline
  * is a pure function of (store, filesystem), so the streaming mode is
  * just a clock. Nothing accumulates in streaming state; the snapshot
  * store IS the state, bounded by the index size.
  */
object ContinuousIndexer {

  /** Per-micro-batch outcome, delivered to the `onBatch` callback. */
  final case class BatchReport(batchId: Long, report: RunReport)

  /** Start continuous indexing driven by `ticks` (any streaming frame —
    * its rows are ignored, its non-empty micro-batches are the rescan
    * clock; use [[rateTicks]] in production, a MemoryStream in tests).
    */
  def start(
      ticks: DataFrame,
      indexer: Indexer,
      checkpointDir: String,
      onBatch: BatchReport => Unit = _ => ()): StreamingQuery =
    ticks.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (tick: DataFrame, batchId: Long) =>
        // the rate source fires a micro-batch every second regardless
        // of the tick filter — an EMPTY tick batch must NOT rescan, or
        // rateTicks(1h) would rescan and rewrite the snapshot every
        // second instead of hourly
        if (!tick.isEmpty)
          onBatch(BatchReport(batchId, indexer.run(tick.sparkSession)))
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

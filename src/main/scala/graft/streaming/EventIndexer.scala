package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Indexer

/** Event-DRIVEN incremental indexing — the complement of
  * [[ContinuousIndexer]] (which re-scans everything on a clock): a
  * stream of changed-directory events (column `dir`, root-relative —
  * inotify, object-store notifications, an upload service) drives
  * [[Indexer.runScoped]] per micro-batch, so each batch's I/O is
  * proportional to what actually changed; every `checkpointEvery`
  * batches the merge-on-read log is folded into a real snapshot.
  *
  * At 100 TB this is the only indexing mode whose steady-state cost
  * follows the CHANGE RATE instead of the tree size: the clock-driven
  * mode re-walks 10^9 entries to discover 10^3 changed ones, this one
  * walks the 10 notified subtrees. The periodic full [[Indexer.run]]
  * remains the reconciliation backstop for missed events (scan is
  * truth; it supersedes any pending log).
  */
object EventIndexer {

  /** Start the event loop. The per-batch `dir` set is collected to the
    * driver — event batches name directories, not files, and are small
    * by construction; dirs are deduplicated and sorted so a batch's
    * refresh order is deterministic.
    *
    * Log maintenance runs INSIDE the loop with two independent
    * triggers: the RATIO policy (`maxLogRatio`, default 0.3 — fold
    * when the MOR log's bytes exceed that fraction of the base's,
    * bounding steady-state read amplification at 1 + ratio no matter
    * how change volume swings; 0 disables) and the COUNT policy
    * (`checkpointEvery` batches — a wall-clock-ish staleness bound for
    * deployments that also time-travel off base snapshots; 0
    * disables). Ratio is the primary: N tiny deltas are harmless and
    * shouldn't trigger a fold, one huge delta isn't and should.
    */
  def start(
      events: DataFrame,
      indexer: Indexer,
      checkpointDir: String,
      checkpointEvery: Int = 0,
      maxLogRatio: Double = 0.3,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dirs = batch.select("dir").distinct()
          .collect().map(_.getString(0)).sorted.toIndexedSeq
        if (dirs.nonEmpty)
          onBatch(batchId,
            indexer.runScoped(batch.sparkSession, dirs))
        if (maxLogRatio > 0)
          indexer.checkpointScopedIfNeeded(batch.sparkSession,
            maxLogRatio): Unit
        if (checkpointEvery > 0 && (batchId + 1) % checkpointEvery == 0)
          indexer.checkpointScoped(batch.sparkSession): Unit
      }
      .start()
}

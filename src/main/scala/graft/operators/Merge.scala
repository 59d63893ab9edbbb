package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert semantics on immutable columnar storage (the reference's two
  * merge dialects, SURVEY.md §2.3):
  *
  *  - J1 (`scanner/scanner.py:225-244`): conditional merge — a batch row
  *    replaces the stored row only when its `tsCol` is strictly newer
  *    (`batchWinsTies = false`).
  *  - J2 (`database/db_duckdb.py:242-245` INSERT OR REPLACE): last-writer
  *    -wins — the batch row always replaces on key conflict
  *    (`batchWinsTies = true`).
  *
  * Implementation: union + ONE hash AGGREGATE on the merge key —
  * `max_by(row, (ts, tie))` picks each key's winner. Strictly better
  * than the row_number-window form it replaced: the aggregate
  * partial-combines map-side (each partition collapses to one candidate
  * row per key BEFORE the exchange, where a window shuffles and sorts
  * every input row), and the reconcile flag (`max(tag)`) rides the same
  * pass. At 100 TB both inputs would be bucketed by the key so even the
  * one exchange disappears.
  */
object Merge {

  def merge(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean,
      evolveSchema: Boolean = false): DataFrame =
    winners(existing, batch, keyCol, tsCol, batchWinsTies,
      restrictToBatch = false, evolveSchema = evolveSchema)

  /** ADDITIVE schema evolution (the Delta `mergeSchema` contract, made
    * explicit): the batch may carry NEW columns beyond `existing`'s —
    * never drop or retype one — and existing rows read the new columns
    * as null. Returns both frames aligned to the union schema
    * (existing's columns in order, then the batch's additions in batch
    * order). Additive-only is deliberate: a batch MISSING a column is
    * ambiguous under LWW (does the winner wipe the stored value to
    * null, or preserve it?) — we refuse instead of guessing, exactly
    * like un-evolved merges refuse any mismatch.
    */
  private[graft] def alignEvolved(existing: DataFrame, batch: DataFrame)
      : (DataFrame, DataFrame) = {
    val eCols = existing.columns.toSet
    val bTypes = batch.schema.fields.map(f => f.name -> f.dataType).toMap
    existing.schema.fields.foreach { f =>
      require(bTypes.contains(f.name),
        s"schema evolution is additive-only: batch is missing stored " +
          s"column ${f.name}")
      require(bTypes(f.name) == f.dataType,
        s"schema evolution cannot retype ${f.name}: " +
          s"${f.dataType.simpleString} vs ${bTypes(f.name).simpleString}")
    }
    val added = batch.schema.fields.filterNot(f => eCols.contains(f.name))
    val widened = added.foldLeft(existing)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
    val order = existing.columns.toSeq ++ added.map(_.name)
    (widened.select(order.map(col): _*), batch.select(order.map(col): _*))
  }

  /** J1 merge composed with J6/ST3 reconciliation in ONE pass: the
    * result holds, for every key present in `batch`, the merge winner —
    * and nothing else (keys that vanished from the scan drop out, the
    * scan-is-truth snapshot model). Doing both in one plan means ONE key
    * shuffle and ONE snapshot write, where merge-write → read-back →
    * semi-join-write costs two full-index writes per run — at 100 TB the
    * full-index write is the pipeline's dominant I/O, so this halves it.
    */
  def mergeReconcile(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean = false,
      evolveSchema: Boolean = false): DataFrame =
    winners(existing, batch, keyCol, tsCol, batchWinsTies,
      restrictToBatch = true, evolveSchema = evolveSchema)

  private def winners(
      existing0: DataFrame,
      batch0: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean,
      restrictToBatch: Boolean,
      evolveSchema: Boolean = false): DataFrame = {
    val (existing, batch) =
      if (evolveSchema) alignEvolved(existing0, batch0)
      else (existing0, batch0)
    val cols = existing.columns.toSeq
    require(batch.columns.toSet == cols.toSet,
      s"schema mismatch: ${cols.sorted} vs ${batch.columns.toSeq.sorted}")
    val tagged = existing.withColumn("__tag", lit(0))
      .unionByName(batch.select(cols.map(col): _*).withColumn("__tag", lit(1)))
    // winner = lexicographic max of (ts, tie-breaker): newest wins, and
    // on an exact-ts tie the batch row wins iff batchWinsTies (J2) —
    // identical to the previous row_number-window semantics (and equally
    // deterministic: per key the (ts, tag) pair is unique for one
    // existing + one batch row; duplicate keys WITHIN one side tie in
    // both formulations)
    val tieOrd = if (batchWinsTies) col("__tag") else -col("__tag")
    val agg = tagged.groupBy(col(keyCol).as("__k"))
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(tsCol), tieOrd)).as("__w"),
        max(col("__tag")).as("__scanned"))
    val kept =
      if (restrictToBatch) agg.filter(col("__scanned") === 1)
      else agg
    kept.select(cols.map(c => col(s"__w.$c").as(c)): _*)
  }
}

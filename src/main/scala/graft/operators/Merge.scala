package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Implementation: union + one `row_number` window partitioned by the
  * key — a single hash shuffle on the merge key, no driver involvement,
  * no nested-loop. At 100 TB both inputs would be bucketed by the key so
  * the window runs shuffle-free.
  */
object Merge {

  def merge(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean): DataFrame =
    winners(existing, batch, keyCol, tsCol, batchWinsTies,
      restrictToBatch = false)

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
      batchWinsTies: Boolean = false): DataFrame =
    winners(existing, batch, keyCol, tsCol, batchWinsTies,
      restrictToBatch = true)

  private def winners(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean,
      restrictToBatch: Boolean): DataFrame = {
    val cols = existing.columns.toSeq
    require(batch.columns.toSet == cols.toSet,
      s"schema mismatch: ${cols.sorted} vs ${batch.columns.toSeq.sorted}")
    val tagged = existing.withColumn("__tag", lit(0))
      .unionByName(batch.select(cols.map(col): _*).withColumn("__tag", lit(1)))
    val byKey = Window.partitionBy(keyCol)
    val tieOrder = if (batchWinsTies) col("__tag").desc else col("__tag").asc
    val w = byKey.orderBy(col(tsCol).desc, tieOrder)
    val ranked = tagged.withColumn("__rn", row_number().over(w))
    // both windows share the keyCol partitioning — one exchange total
    val kept =
      if (restrictToBatch)
        ranked.withColumn("__scanned", max("__tag").over(byKey))
          .filter(col("__rn") === 1 && col("__scanned") === 1)
      else ranked.filter(col("__rn") === 1)
    kept.select(cols.map(col): _*)
  }
}

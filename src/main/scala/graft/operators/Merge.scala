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
      batchWinsTies: Boolean): DataFrame = {
    val cols = existing.columns.toSeq
    require(batch.columns.toSet == cols.toSet,
      s"schema mismatch: ${cols.sorted} vs ${batch.columns.toSeq.sorted}")
    val tagged = existing.withColumn("__tag", lit(0))
      .unionByName(batch.select(cols.map(col): _*).withColumn("__tag", lit(1)))
    val tieOrder = if (batchWinsTies) col("__tag").desc else col("__tag").asc
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, tieOrder)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.map(col): _*)
  }
}

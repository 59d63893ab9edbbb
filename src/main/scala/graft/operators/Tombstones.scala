package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared DELETE lifecycle for the durable serving stores
  * ([[TermIndex]], [[AnnIndex]]) — the in-engine mirror of the
  * reference's search-sink delete semantics
  * (elasticsearch_integration.py:453-566, bulk delete by id): a delete
  * APPENDS tombstone ids (cheap — no store rewrite), every serving
  * read SUBTRACTS them, and the next [[fold]] (compaction) rewrites
  * the store without the tombstoned rows and [[clear]]s the tombstone
  * set — the hide-then-remove lifecycle merge-on-read deletes use
  * ([[graft.sinks.ParquetIndex]]'s MOR fold pattern, applied to the
  * pointer-less index stores).
  *
  * Scale shape: tombstones are bounded by delete volume since the last
  * fold (bare ids, a few bytes each), so the serving-side subtraction
  * is a BROADCAST anti-join that reshuffles nothing and leaves the
  * postings scan's partition pruning untouched; the fold is one
  * partition-layout-preserving rewrite through
  * [[graft.sinks.DirCompaction]]'s two-rename swap — a crash at any
  * point leaves the rows in exactly one of live/tmp/old, and the
  * tombstone set clears only after every data subdir has folded, so an
  * interrupted compaction still serves correctly and a re-run finishes
  * the job (subtracting already-removed ids is a no-op).
  */
private[operators] object Tombstones {

  private val TmpSuffix = ".compact-tmp"
  private val OldSuffix = ".compact-old"

  def path(dir: String): String = s"$dir/tombstones"

  def exists(spark: SparkSession, dir: String): Boolean =
    StoreUtil.exists(spark, path(dir))

  /** Append tombstone ids. Duplicates (re-deleting an id, or an id the
    * store never held) are harmless: the subtraction is an anti-join.
    */
  def append(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(idCol).distinct()
      .coalesce(1).write.mode("append").parquet(path(dir))

  /** Serving-side subtraction: `df` minus the tombstoned ids. No
    * tombstones → `df` unchanged (the common case pays one existence
    * check and keeps its exact plan, so the pinned plan shapes of
    * tombstone-free stores are unaffected).
    */
  def minus(spark: SparkSession, dir: String, df: DataFrame,
      idCol: String): DataFrame =
    if (exists(spark, dir))
      df.join(broadcast(spark.read.parquet(path(dir)).select(idCol)),
        Seq(idCol), "left_anti")
    else df

  /** Rewrite `dir/$sub` without the tombstoned rows, preserving its
    * partition layout, via the tmp/old two-rename swap (recovering an
    * interrupted earlier swap first). No-op when the store carries no
    * tombstones.
    */
  def fold(spark: SparkSession, dir: String, sub: String, idCol: String,
      partitionCols: Seq[String]): Unit = {
    if (!exists(spark, dir)) return
    val base = new HPath(s"$dir/$sub")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, base)
    if (!fs.exists(base)) return
    val tmp = new HPath(s"$dir/$sub$TmpSuffix")
    val old = new HPath(s"$dir/$sub$OldSuffix")
    // mergeSchema: after a metadata-era evolution the dir holds files
    // of different (additive) widths — a sampled-footer read would
    // silently DROP a newer era's columns from the rewritten store
    val kept = minus(spark, dir,
      spark.read.option("mergeSchema", "true").parquet(base.toString),
      idCol)
    // the tmp parquet commit fully executes the filtered plan BEFORE
    // the first rename — the live dir is never touched while a plan
    // still reads it
    val w = kept.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    require(fs.rename(base, old), s"fold: rename $base -> $old")
    require(fs.rename(tmp, base), s"fold: rename $tmp -> $base")
    fs.delete(old, true): Unit
  }

  /** Drop the tombstone set — the LAST step of a compaction, after
    * every data subdir has folded (clearing first would resurrect the
    * hidden rows in any not-yet-folded subdir).
    */
  def clear(spark: SparkSession, dir: String): Unit = {
    val p = new HPath(path(dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true): Unit
  }

  /** Repair an interrupted swap of `base` —
    * [[graft.sinks.DirCompaction]]'s state table: live dir present →
    * the orphans are stale, drop them; live dir missing → the
    * completed tmp (the first rename happens only after tmp's parquet
    * commit) or the untouched old restores it.
    */
  private def recover(fs: FileSystem, base: HPath): Unit = {
    val tmp = new HPath(base.getParent, base.getName + TmpSuffix)
    val old = new HPath(base.getParent, base.getName + OldSuffix)
    if (fs.exists(base)) {
      fs.delete(tmp, true)
      fs.delete(old, true): Unit
    } else if (fs.exists(tmp)) {
      require(fs.rename(tmp, base), s"recover: rename $tmp -> $base")
      fs.delete(old, true): Unit
    } else if (fs.exists(old)) {
      require(fs.rename(old, base), s"recover: rename $old -> $base")
    }
  }
}

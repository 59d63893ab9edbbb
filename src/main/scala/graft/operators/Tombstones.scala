package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared DELETE/UPSERT lifecycle for the durable serving stores
  * ([[TermIndex]], [[AnnIndex]], [[NearDupIndex]]) — the in-engine
  * mirror of the reference's search-sink delete semantics
  * (elasticsearch_integration.py:453-566, bulk delete by id): a delete
  * APPENDS tombstone ids (cheap — no store rewrite), every serving
  * read SUBTRACTS them, and the next [[fold]] (compaction) rewrites
  * the store without the tombstoned rows and [[clear]]s the tombstone
  * set — the hide-then-remove lifecycle merge-on-read deletes use
  * ([[graft.sinks.ParquetIndex]]'s MOR fold pattern, applied to the
  * pointer-less index stores).
  *
  * GENERATION THRESHOLDS (since r12): each tombstone row carries
  * `ts_gen` — it hides rows of its id whose write generation (the
  * stores' [[GenMeta]]-stamped `gen` column) is `<= ts_gen`. Hide-sets
  * are downward-closed intervals, so deduping a re-tombstoned id by
  * MAX ts_gen is the exact union. This is what makes upsert-by-id
  * work WITHOUT a compact between delete and re-add: a delete
  * tombstones at the store's current generation, and a later upsert
  * writes at a strictly higher one — visible immediately. Rows/stores
  * without a generation column are generation 0 (the insert-only
  * layout), hidden by every tombstone, so the legacy hide-all
  * semantics ([[NearDupIndex]], pre-r12 tombstone files) are the
  * degenerate case of the same rule.
  *
  * COMMIT WATERMARK (since r13 — reader-ATOMIC upsert): each tombstone
  * row additionally carries `ts_wgen`, the generation of the WRITER
  * that appended it — 0 for deletes (visible immediately, as ever),
  * `g` for the tombstone an upsert-to-generation-`g` writes. When the
  * store has a [[GenMeta]] commit watermark, [[minus]] snapshots it
  * once at plan time and gates BOTH sides on it: tombstones with
  * `ts_wgen > watermark` and data rows with `gen > watermark` are
  * in-flight (or torn) and do not serve. An upsert therefore appends
  * its data AND its tombstone first — both invisible — and flips them
  * visible together with [[GenMeta.commit]]'s one-file append: a
  * concurrent reader serves the OLD version of every upserted doc
  * throughout the window, never a gap and never both versions, and a
  * crashed upsert's rows stay invisible until the re-run's higher
  * tombstone hides them. Stores without a watermark table (insert-only
  * or pre-r13) read exactly as before — one existence check, same
  * plans.
  *
  * Scale shape: tombstones are bounded by delete/upsert volume since
  * the last fold (bare ids + a long, a few bytes each), so the
  * serving-side subtraction is a BROADCAST anti-join that reshuffles
  * nothing and leaves the postings scan's partition pruning untouched.
  * The contract is SELF-ENFORCING on two axes: [[append]] merges the
  * one-file-per-delete accumulation back to a single file past a
  * count threshold (append-then-drop, crash-safe superset at every
  * step), and [[minus]] measures the tombstone bytes before planning —
  * past `spark.graft.tombstone.broadcastBytes` (default 8 MB parquet)
  * it drops the broadcast hint and lets AQE pick a shuffle anti-join,
  * so a mass-delete cannot broadcast an over-large frame. The fold is
  * one partition-layout-preserving rewrite through the tmp/old
  * two-rename swap — a crash at any point leaves the rows in exactly
  * one of live/tmp/old, and the tombstone set clears only after every
  * data subdir has folded, so an interrupted compaction still serves
  * correctly and a re-run finishes the job (subtracting
  * already-removed ids is a no-op). Writers are single at a time per
  * store (the stores' documented discipline); readers racing a merge
  * or fold see either layout, never a torn one.
  */
private[operators] object Tombstones {

  private val TmpSuffix = ".compact-tmp"
  private val OldSuffix = ".compact-old"

  /** Generation threshold column of a tombstone row (hide gens <= it). */
  private val GenCol = "ts_gen"

  /** Writer-generation column: the [[GenMeta]] generation whose commit
    * makes this tombstone row visible (0 = always — deletes and every
    * pre-watermark file).
    */
  private val WGenCol = "ts_wgen"

  /** Merge the tombstone dir back to one file past this many files —
    * each delete/upsert appends one, and between folds every serving
    * query's anti-join reads them all.
    */
  private val MergeAtFiles = 16

  /** Parquet-bytes ceiling for broadcasting the tombstone set; above
    * it [[minus]] lets AQE plan the anti-join (a mass-delete must not
    * force-broadcast). Overridable per session for tests/tuning.
    */
  private val BroadcastBytesKey = "spark.graft.tombstone.broadcastBytes"
  private val BroadcastBytesDefault = 8L * 1024 * 1024

  def path(dir: String): String = s"$dir/tombstones"

  def exists(spark: SparkSession, dir: String): Boolean =
    StoreUtil.exists(spark, path(dir))

  private def hfs(spark: SparkSession, p: HPath): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(fs: FileSystem, p: HPath): Array[HPath] =
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath)

  /** Append tombstone ids hiding generations `<= gen` (default: hide
    * every generation — the insert-only stores' delete semantics).
    * Duplicates (re-deleting an id, or an id the store never held) are
    * harmless: the subtraction is an anti-join and re-tombstoned ids
    * dedup by max threshold. Past [[MergeAtFiles]] files the set is
    * merged back to one file: the merged file APPENDS first and the
    * captured originals drop after, so a crash at any point leaves a
    * row SUPERSET with the identical hide-set (max-dedup at read).
    */
  def append(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String, gen: Long = Long.MaxValue,
      wgen: Long = 0L): Unit = {
    ids.select(idCol).distinct().withColumn(GenCol, lit(gen))
      .withColumn(WGenCol, lit(wgen))
      .coalesce(1).write.mode("append").parquet(path(dir))
    val p = new HPath(path(dir))
    val fs = hfs(spark, p)
    val files = dataFiles(fs, p)
    if (files.length > MergeAtFiles) {
      // merge per (id, WRITER generation), not per id: collapsing an
      // id's rows across writer generations onto one max-ts row would
      // tag a committed hide-set with an uncommitted writer — the old
      // delete would stop serving until the in-flight upsert commits.
      // Grouping by (id, wgen) preserves the visible hide-set at EVERY
      // watermark; (id, wgen) repeats only across separate delete
      // calls (wgen 0), which is exactly what the merge is for.
      readAll(spark, dir)
        .groupBy(idCol, WGenCol).agg(max(GenCol).as(GenCol))
        .coalesce(1).write.mode("append").parquet(path(dir))
      files.foreach(f => fs.delete(f, false): Unit)
    }
  }

  /** The tombstone set with `ts_gen`/`ts_wgen` normalized: legacy rows
    * (files written before either column existed) read as null through
    * the merged schema and mean "hide everything" / "visible at every
    * watermark". `watermark` (when the store has one) drops rows an
    * uncommitted writer appended.
    */
  private def readAll(spark: SparkSession, dir: String,
      watermark: Option[Long] = None): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(path(dir))
    def norm(df: DataFrame, c: String, dflt: Long) =
      if (df.columns.contains(c))
        df.withColumn(c, coalesce(col(c), lit(dflt)))
      else df.withColumn(c, lit(dflt))
    val all = norm(norm(raw, GenCol, Long.MaxValue), WGenCol, 0L)
    watermark.fold(all)(w => all.filter(col(WGenCol) <= w))
  }

  /** Hint the tombstone side for the anti-join: broadcast while the
    * set is small (the common bounded-by-delete-volume case — plan
    * shape unchanged vs pre-guard), plain past the byte ceiling so AQE
    * picks the join for a mass-delete.
    */
  private def sized(spark: SparkSession, dir: String,
      tomb: DataFrame): DataFrame = {
    val p = new HPath(path(dir))
    val fs = hfs(spark, p)
    val bytes = dataFiles(fs, p).map(fs.getFileStatus(_).getLen).sum
    val ceiling = spark.conf.getOption(BroadcastBytesKey)
      .map(_.toLong).getOrElse(BroadcastBytesDefault)
    if (bytes <= ceiling) broadcast(tomb) else tomb
  }

  /** Serving-side subtraction: `df` minus the tombstone-hidden rows.
    * With `genCol` (and `df` carrying it), a row hides iff SOME
    * tombstone of its id has `ts_gen >= row.gen` — upserted rows at a
    * higher generation survive their own id's older tombstones.
    * Without it, `df`'s rows are generation 0 and every tombstone of
    * the id hides them (ts_gen is never negative), so the plain
    * id-anti-join is exact. No tombstones → `df` unchanged (the common
    * case pays one existence check and keeps its exact plan, so the
    * pinned plan shapes of tombstone-free stores are unaffected).
    */
  def minus(spark: SparkSession, dir: String, df: DataFrame,
      idCol: String, genCol: Option[String] = None): DataFrame = {
    // the watermark snapshots ONCE, driver-side, before the plan is
    // built — every leaf the plan later reads is gated on the same
    // committed generation, so a reader racing an upsert sees a
    // CONSISTENT old snapshot whichever leg executes first. Absent
    // watermark table (insert-only / pre-r13 stores): ungated, the
    // exact legacy read.
    val wm = GenMeta.committed(spark, dir)
    val gated = genCol.filter(df.columns.contains) match {
      case Some(g) =>
        // rows stamped above the watermark are in-flight/torn upsert
        // data — invisible until their GenMeta.commit lands
        wm.fold(df)(w => df.filter(coalesce(col(g), lit(0L)) <= w))
      case None => df
    }
    if (!exists(spark, dir)) gated
    else genCol.filter(df.columns.contains) match {
      case Some(g) =>
        val tomb = readAll(spark, dir, wm)
          .groupBy(idCol).agg(max(GenCol).as(GenCol))
          .withColumnRenamed(idCol, "__ts_id")
        val t = sized(spark, dir, tomb)
        val cond: Column = gated(idCol) === t("__ts_id") &&
          coalesce(gated(g), lit(0L)) <= t(GenCol)
        gated.join(t, cond, "left_anti")
      case None =>
        gated.join(
          sized(spark, dir, readAll(spark, dir, wm).select(idCol)),
          Seq(idCol), "left_anti")
    }
  }

  /** Rewrite `dir/$sub` without the tombstone-hidden rows, preserving
    * its partition layout, via the tmp/old two-rename swap (recovering
    * an interrupted earlier swap first). No-op when the store carries
    * no tombstones.
    */
  def fold(spark: SparkSession, dir: String, sub: String, idCol: String,
      partitionCols: Seq[String],
      genCol: Option[String] = None): Unit = {
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
      idCol, genCol)
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

  /** Tombstone rows currently pending (0 without a set) — the debt
    * numerator the stores' ratio-triggered auto-fold alarms on.
    */
  def pendingRows(spark: SparkSession, dir: String): Long =
    if (exists(spark, dir))
      spark.read.parquet(path(dir)).count()
    else 0L

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

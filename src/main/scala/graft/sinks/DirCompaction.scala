package graft.sinks

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}

import org.apache.spark.sql.SparkSession

/** Bin-packing compaction for PLAIN append-only parquet stores (the
  * [[graft.operators.NearDupIndex]] band/shingle dirs, the
  * [[graft.operators.AnnIndex]] cell-partitioned postings) — the
  * pointer-less sibling of [[ParquetIndex.compact]]: every LEAF
  * directory holding parquet files is rewritten to
  * `ceil(bytes / targetFileBytes)` files when its file count exceeds
  * the healthy bound, via write-to-temp then swap.
  *
  * All store access goes through the Hadoop FileSystem API resolved
  * from the root path, so the same code compacts `file:`, `hdfs:` or
  * `s3a:` stores — matching the Hadoop-FS discipline of the index
  * stores it serves (a java.nio walk would silently see nothing on a
  * URI-style root).
  *
  * Single-writer stores only: callers pause updates for the swap (the
  * same discipline their `update()` already assumes — concurrent
  * appends to one store are undefined with or without compaction).
  * The rewrite is restartable and never deletes live data mid-swap:
  * the temp dir is written completely, then the original renames to
  * `.compact-old`, the temp renames into place, and only then is the
  * old copy removed — a crash at any point leaves the rows intact in
  * exactly one of the three names. Every `compact()` begins with a
  * RECOVERY sweep that repairs exactly those states: a missing live
  * dir is restored from its completed `.compact-tmp` (crash between
  * the two renames; the tmp write completed before the first rename)
  * or from `.compact-old` (the untouched original), and only
  * then are leftover orphans deleted — so no crash point leaves a
  * store partition unreadable or corrupts partition discovery with a
  * lingering suffixed sibling.
  */
object DirCompaction {

  private val TmpSuffix = ".compact-tmp"
  private val OldSuffix = ".compact-old"

  private def listed(fs: FileSystem, dir: HPath): Seq[FileStatus] =
    if (fs.exists(dir)) fs.listStatus(dir).toSeq else Nil

  private def parquetFiles(fs: FileSystem, dir: HPath): Seq[FileStatus] =
    listed(fs, dir).filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet"))

  private def leafDirs(fs: FileSystem, root: HPath): Seq[HPath] = {
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return Nil
    val subdirs = listed(fs, root).filter(s => s.isDirectory &&
      !s.getPath.getName.endsWith(TmpSuffix) &&
      !s.getPath.getName.endsWith(OldSuffix))
    if (subdirs.isEmpty) Seq(root)
    else subdirs.flatMap(s => leafDirs(fs, s.getPath))
  }

  /** Repair any interrupted swap under `root` before compacting.
    *
    * State table (per base dir, from the swap protocol's crash points):
    *  - base EXISTS + orphan(s): crash before the first rename (tmp may
    *    be incomplete) or after the second (old superseded) → the live
    *    dir is authoritative, delete orphans.
    *  - base MISSING + tmp exists: crash between the two renames. The
    *    tmp write had already completed (the first rename happens only
    *    after the tmp parquet commit), so tmp IS the compacted result →
    *    rename it into place, then drop old.
    *  - base MISSING + only old: crash immediately after the first
    *    rename on a store whose tmp vanished (shouldn't occur, but
    *    restorable) → rename old back into place.
    */
  private def recover(fs: FileSystem, root: HPath): Unit = {
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return
    def walk(dir: HPath): Unit = listed(fs, dir).filter(_.isDirectory)
      .foreach { s =>
        val name = s.getPath.getName
        if (name.endsWith(TmpSuffix) || name.endsWith(OldSuffix)) {
          val baseName =
            name.stripSuffix(TmpSuffix).stripSuffix(OldSuffix)
          val base = new HPath(dir, baseName)
          val tmp = new HPath(dir, baseName + TmpSuffix)
          val old = new HPath(dir, baseName + OldSuffix)
          if (fs.exists(base)) {
            fs.delete(tmp, true)
            fs.delete(old, true): Unit
          } else if (fs.exists(tmp)) {
            require(fs.rename(tmp, base), s"recover: rename $tmp -> $base")
            fs.delete(old, true): Unit
          } else if (fs.exists(old)) {
            require(fs.rename(old, base), s"recover: rename $old -> $base")
          }
        } else walk(s.getPath)
      }
    walk(root)
  }

  /** Compact every over-fragmented leaf dir under `root` (recovering
    * any interrupted earlier swap first); returns the number of
    * directories rewritten.
    */
  def compact(spark: SparkSession, root: String, maxFilesPerDir: Int = 4,
      targetFileBytes: Long = 128L << 20): Int = {
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, rootPath)
    var done = 0
    leafDirs(fs, rootPath).foreach { dir =>
      val files = parquetFiles(fs, dir)
      if (files.nonEmpty) {
        val bytes = files.map(_.getLen).sum
        val target = math.max(1,
          math.ceil(bytes.toDouble / targetFileBytes).toInt)
        // healthy = within the count bound OR already byte-sized wide
        if (files.size > math.max(maxFilesPerDir, target)) {
          val tmp = new HPath(dir.getParent, dir.getName + TmpSuffix)
          val old = new HPath(dir.getParent, dir.getName + OldSuffix)
          fs.delete(tmp, true)
          fs.delete(old, true)
          // mergeSchema: a leaf dir can hold files of different
          // (additive) metadata eras — a sampled-footer read would
          // silently drop a newer era's columns from the rewrite
          spark.read.option("mergeSchema", "true")
            .parquet(dir.toString).coalesce(target)
            .write.mode("overwrite").parquet(tmp.toString)
          // swap via two renames, never a delete of live data: a crash
          // at any point leaves the rows in exactly one of dir /
          // .compact-tmp / .compact-old — recoverable by the entry
          // sweep above, never silently missing (rm-before-move would
          // lose the dir on a crash between the two calls)
          require(fs.rename(dir, old), s"compact: rename $dir -> $old")
          require(fs.rename(tmp, dir), s"compact: rename $tmp -> $dir")
          fs.delete(old, true)
          done += 1
        }
      }
    }
    done
  }
}

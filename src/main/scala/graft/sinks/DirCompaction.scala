package graft.sinks

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Bin-packing compaction for PLAIN append-only parquet stores (the
  * [[graft.operators.NearDupIndex]] band/shingle dirs, the
  * [[graft.operators.AnnIndex]] cell-partitioned postings) — the
  * pointer-less sibling of [[ParquetIndex.compact]]: every LEAF
  * directory holding parquet files is rewritten to
  * `ceil(bytes / targetFileBytes)` files when its file count exceeds
  * the healthy bound, via write-to-temp then swap.
  *
  * Single-writer stores only: callers pause updates for the swap (the
  * same discipline their `update()` already assumes — concurrent
  * appends to one store are undefined with or without compaction).
  * The rewrite is restartable and never deletes live data mid-swap:
  * the temp dir is written completely, then the original renames to
  * `.compact-old`, the temp renames into place, and only then is the
  * old copy removed — a crash at any point leaves the rows intact in
  * exactly one of the three names (orphan `.compact-tmp`/`.compact-old`
  * dirs are swept on the next run and excluded from leaf discovery).
  */
object DirCompaction {

  private def listed(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator.asScala.toSeq finally s.close()
  }

  private def parquetFiles(dir: Path): Seq[Path] =
    listed(dir).filter(p => p.getFileName.toString.endsWith(".parquet") &&
      Files.isRegularFile(p))

  private def leafDirs(root: Path): Seq[Path] = {
    if (!Files.isDirectory(root)) return Nil
    val subdirs = listed(root).filter(p => Files.isDirectory(p) &&
      !p.getFileName.toString.endsWith(".compact-tmp") &&
      !p.getFileName.toString.endsWith(".compact-old"))
    if (subdirs.isEmpty) Seq(root) else subdirs.flatMap(leafDirs)
  }

  private def rm(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator.asScala.foreach(rm) finally s.close()
    }
    Files.deleteIfExists(p): Unit
  }

  /** Compact every over-fragmented leaf dir under `root`; returns the
    * number of directories rewritten.
    */
  def compact(spark: SparkSession, root: String, maxFilesPerDir: Int = 4,
      targetFileBytes: Long = 128L << 20): Int = {
    var done = 0
    leafDirs(Paths.get(root)).foreach { dir =>
      val files = parquetFiles(dir)
      if (files.nonEmpty) {
        val bytes = files.map(Files.size).sum
        val target = math.max(1,
          math.ceil(bytes.toDouble / targetFileBytes).toInt)
        // healthy = within the count bound OR already byte-sized wide
        if (files.size > math.max(maxFilesPerDir, target)) {
          val tmp = dir.resolveSibling(
            dir.getFileName.toString + ".compact-tmp")
          val old = dir.resolveSibling(
            dir.getFileName.toString + ".compact-old")
          rm(tmp); rm(old)
          spark.read.parquet(dir.toString).coalesce(target)
            .write.mode("overwrite").parquet(tmp.toString)
          // swap via two renames, never a delete of live data: a crash
          // at any point leaves the rows in exactly one of dir /
          // .compact-tmp / .compact-old — recoverable, never silently
          // missing (rm-before-move would lose the dir on a crash
          // between the two calls)
          Files.move(dir, old)
          Files.move(tmp, dir)
          rm(old)
          done += 1
        }
      }
    }
    done
  }
}

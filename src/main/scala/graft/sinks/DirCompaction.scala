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
  * The rewrite is restartable: the temp dir is written completely
  * before the original is removed, so a crash leaves either the old
  * or the new layout plus at worst an orphan `.compact-tmp` to sweep.
  */
object DirCompaction {

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.list(dir).iterator.asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        Files.isRegularFile(p))
      .toSeq

  private def leafDirs(root: Path): Seq[Path] = {
    if (!Files.isDirectory(root)) return Nil
    val children = Files.list(root).iterator.asScala.toSeq
    val subdirs = children.filter(p => Files.isDirectory(p) &&
      !p.getFileName.toString.endsWith(".compact-tmp"))
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
          rm(tmp)
          spark.read.parquet(dir.toString).coalesce(target)
            .write.mode("overwrite").parquet(tmp.toString)
          rm(dir)
          Files.move(tmp, dir)
          done += 1
        }
      }
    }
    done
  }
}

package graft.streaming

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.sinks.ParquetIndex

/** ST1-ST3 as a live mode: two micro-batches over a mutating tree — the
  * second batch's updates AND deletions land in the snapshot, one
  * snapshot write per batch, counters observed per batch.
  */
class ContinuousIndexerSpec extends SparkSpecBase {

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("contidx")
    Files.createDirectories(root.resolve("proj/sub"))
    Files.writeString(root.resolve("proj/a.txt"), "aaaa")
    Files.writeString(root.resolve("proj/sub/b.log"), "bb")
    root
  }

  test("micro-batches index, update, and delete through the snapshot") {
    import spark.implicits._
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("contidx-store").toString
    val ckpt = Files.createTempDirectory("contidx-ckpt").toString
    val idx = new ParquetIndex(idxRoot,
      partitionBy = Seq(ParquetIndex.PathPartitionCol), writeFiles = 2)

    implicit val sq = spark.sqlContext
    val ticks = MemoryStream[Int]
    val reports = mutable.Buffer.empty[ContinuousIndexer.BatchReport]
    val q = ContinuousIndexer.start(ticks.toDF(), root.toString, idx,
      ckpt, onBatch = reports.synchronized(reports += _))
    try {
      // batch 1: initial scan
      ticks.addData(1)
      q.processAllAvailable()
      val snap1 = idx.read(spark).get.collect()
        .map(r => r.getAs[String]("relative_path") ->
          r.getAs[Long]("size_bytes")).toMap
      assert(snap1.keySet ==
        Set("proj", "proj/sub", "proj/a.txt", "proj/sub/b.log"))
      assert(snap1("proj/a.txt") == 4L)

      // mutate: update a.txt, delete b.log, create c.txt
      Files.writeString(root.resolve("proj/a.txt"), "aaaaaaaa")
      Files.delete(root.resolve("proj/sub/b.log"))
      Files.writeString(root.resolve("proj/c.txt"), "cc")
      Thread.sleep(1100) // fs mtime granularity can be 1 s

      // batch 2: the rescan lands updates AND deletions
      ticks.addData(2)
      q.processAllAvailable()
      val snap2 = idx.read(spark).get.collect()
        .map(r => r.getAs[String]("relative_path") ->
          r.getAs[Long]("size_bytes")).toMap
      assert(!snap2.contains("proj/sub/b.log")) // deletion reconciled
      assert(snap2("proj/a.txt") == 8L)         // update merged
      assert(snap2("proj/c.txt") == 2L)         // insert landed

      // one snapshot write per micro-batch, counters observed per batch
      val rs = reports.synchronized(reports.toList)
      assert(rs.map(_.batchId) == List(0L, 1L))
      assert(rs.head.stats.files == 2 && rs.head.stats.dirs == 2)
      assert(rs(1).stats.files == 2) // a.txt + c.txt (b.log gone)
      assert(rs.map(_.snapshotId).distinct.size == 2)
    } finally q.stop()
  }
}

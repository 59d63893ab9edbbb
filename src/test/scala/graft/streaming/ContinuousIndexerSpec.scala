package graft.streaming

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.pipeline.{Indexer, IndexerConfig, LinkRefresh}
import graft.sinks.{ParquetIndex, TransportProbe}

/** ST1-ST3 as a live mode: micro-batches drive the FULL pipeline over a
  * mutating tree — updates AND deletions land in the snapshot per
  * batch, and in elasticsearch mode the publish + bulk-delete + link
  * refresh all ride along.
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
    val cfg = IndexerConfig(root.toString, idxRoot, mode = "index-only",
      snapshotFiles = 2)
    val indexer = new Indexer(cfg, None)

    implicit val sq = spark.sqlContext
    val ticks = MemoryStream[Int]
    val reports = mutable.Buffer.empty[ContinuousIndexer.BatchReport]
    val q = ContinuousIndexer.start(ticks.toDF(), indexer, ckpt,
      onBatch = r => reports.synchronized { reports += r })
    try {
      def snap() = new ParquetIndex(idxRoot,
        partitionBy = Seq(ParquetIndex.PathPartitionCol)).read(spark).get
        .collect()
        .map(r => r.getAs[String]("relative_path") ->
          r.getAs[Long]("size_bytes")).toMap

      // batch 1: initial scan
      ticks.addData(1)
      q.processAllAvailable()
      val snap1 = snap()
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
      val snap2 = snap()
      assert(!snap2.contains("proj/sub/b.log")) // deletion reconciled
      assert(snap2("proj/a.txt") == 8L)         // update merged
      assert(snap2("proj/c.txt") == 2L)         // insert landed

      // one full pipeline run per micro-batch, counters per batch
      val rs = reports.synchronized(reports.toList)
      assert(rs.map(_.batchId) == List(0L, 1L))
      assert(rs.head.report.stats.files == 2 &&
        rs.head.report.stats.dirs == 2)
      assert(rs(1).report.stats.files == 2) // a.txt + c.txt (b.log gone)
      assert(rs(1).report.removed >= 1)
      assert(rs.map(_.report.snapshotId).distinct.size == 2)
    } finally q.stop()
  }

  test("elasticsearch mode per tick: publish, links, and bulk deletes") {
    import spark.implicits._
    val root = mkTree()
    val idxRoot = Files.createTempDirectory("contidx-es").toString
    val ckpt = Files.createTempDirectory("contidx-es-ckpt").toString
    val fetch = new LinkRefresh.Fetch {
      def apply(fp: String, cached: Option[String]) =
        Some(LinkRefresh.FetchedLink(s"https://fs.example/c${fp.length}",
          Some("fse-c")))
    }
    val cfg = IndexerConfig(root.toString, idxRoot, snapshotFiles = 2)
    val indexer = new Indexer(cfg, Some(TransportProbe.transport),
      linkFetch = Some(fetch))

    implicit val sq = spark.sqlContext
    val ticks = MemoryStream[Int]
    val reports = mutable.Buffer.empty[ContinuousIndexer.BatchReport]
    TransportProbe.reset()
    val q = ContinuousIndexer.start(ticks.toDF(), indexer, ckpt,
      onBatch = r => reports.synchronized { reports += r })
    try {
      ticks.addData(1)
      q.processAllAvailable()
      val r1 = reports.synchronized(reports.head.report)
      assert(r1.indexed == 4 && r1.esFailed == 0) // 2 files + 2 dirs
      assert(r1.linksRefreshed == 2)

      Files.delete(root.resolve("proj/sub/b.log"))
      TransportProbe.reset()
      ticks.addData(2)
      q.processAllAvailable()
      val r2 = reports.synchronized(reports(1).report)
      assert(r2.removed >= 1)
      assert(r2.linksRefreshed == 0) // queue drained; nothing changed
      import scala.jdk.CollectionConverters._
      val sent = TransportProbe.calls.asScala.flatten.mkString("\n")
      assert(sent.contains("\"delete\":")) // bulk delete rode the tick
      assert(sent.contains("https://fs.example/c")) // links published
    } finally q.stop()
  }
}

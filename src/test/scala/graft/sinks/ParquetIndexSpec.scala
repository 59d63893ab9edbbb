package graft.sinks

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpecBase

/** Snapshot store round-trip: write → upsert (J1) → reconcile (J6) →
  * pointer swap + pruning (db_duckdb.py behavior re-expressed on
  * immutable Parquet).
  */
class ParquetIndexSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def df(rows: (String, Long, Timestamp)*) = {
    import spark.implicits._
    rows.toDF("key", "size", "mtime")
  }

  test("write → upsert → reconcile round-trip") {
    val root = Files.createTempDirectory("pidx").toString
    val idx = new ParquetIndex(root)
    assert(idx.read(spark).isEmpty)

    idx.write(df(
      ("k1", 1L, ts("2020-01-01 00:00:00")),
      ("k2", 2L, ts("2020-01-02 00:00:00"))))
    assert(idx.read(spark).get.count() == 2)

    // J1: k2 comes back newer, k3 is new, k1 untouched
    idx.upsert(spark, df(
      ("k2", 22L, ts("2021-01-01 00:00:00")),
      ("k3", 3L, ts("2021-01-01 00:00:00"))), "key", "mtime")
    val afterUpsert = idx.read(spark).get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(afterUpsert == Set(("k1", 1L), ("k2", 22L), ("k3", 3L)))

    // J6: k1 vanished from the scan
    idx.reconcile(spark, df(
      ("k2", 0L, ts("2021-01-01 00:00:00")),
      ("k3", 0L, ts("2021-01-01 00:00:00"))), "key")
    val afterRec = idx.read(spark).get.collect()
      .map(_.getString(0)).toSet
    assert(afterRec == Set("k2", "k3"))
  }

  test("partitioned snapshots prune point queries to one directory") {
    val root = Files.createTempDirectory("pidx3").toString
    val idx = new ParquetIndex(root, partitionBy = Seq("key"))
    val id = idx.write(df(
      ("k1", 1L, ts("2020-01-01 00:00:00")),
      ("k2", 2L, ts("2020-01-01 00:00:00"))))
    // physical layout: one directory per key value
    val parts = new java.io.File(s"$root/snap-$id").list()
      .filter(_.startsWith("key=")).sorted
    assert(parts.toSeq == Seq("key=k1", "key=k2"))
    // a point lookup reads only the matching partition
    val q = idx.read(spark).get.filter(org.apache.spark.sql.functions
      .col("key") === "k1")
    assert(q.count() == 1)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(key"), scan)
  }

  test("partition values with escaped chars and numerics round-trip") {
    val root = Files.createTempDirectory("pidx3").toString
    val idx = new ParquetIndex(root, partitionBy = Seq("key"),
      writeFiles = 2)
    // '=' and ' ' are URL-escaped in partition dir names; '123' would
    // flip to int under dir-name inference without the schema sidecar.
    // (Non-ASCII partition VALUES are not exercised here: Hadoop's local
    // FS rejects them under a non-UTF8 JVM charset — which is exactly
    // why the pipeline's own partition column is a hex hash bucket,
    // never a raw path segment.)
    val keys = Seq("a=b", "sp ace", "123")
    idx.write(df(keys.map(k => (k, 1L, ts("2020-01-01 00:00:00"))): _*))
    val back = idx.read(spark).get
    assert(back.schema("key").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(back.collect().map(_.getAs[String]("key")).toSet == keys.toSet)
    // still mergeable against an in-memory batch (schema sets match)
    val id2 = idx.upsertReconcile(spark,
      df(keys.take(2).map(k => (k, 9L, ts("2021-01-01 00:00:00"))): _*),
      "key", "mtime")
    assert(id2.nonEmpty)
    val after = idx.read(spark).get.collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("size")).toMap
    assert(after == Map("a=b" -> 9L, "sp ace" -> 9L)) // others reconciled away
  }

  test("empty frame round-trips through a partitioned snapshot") {
    val root = Files.createTempDirectory("pidx4").toString
    val idx = new ParquetIndex(root, partitionBy = Seq("key"),
      writeFiles = 2)
    idx.write(df())
    val back = idx.read(spark).get
    assert(back.count() == 0)
    assert(back.columns.toSeq == Seq("key", "size", "mtime"))
  }

  test("pointer always names a complete snapshot; old snaps pruned") {
    val root = Files.createTempDirectory("pidx2").toString
    val idx = new ParquetIndex(root, keep = 2)
    val id1 = idx.write(df(("a", 1L, ts("2020-01-01 00:00:00"))))
    val id2 = idx.write(df(("b", 2L, ts("2020-01-01 00:00:00"))))
    val id3 = idx.write(df(("c", 3L, ts("2020-01-01 00:00:00"))))
    assert(idx.currentId.contains(id3))
    val snaps = new java.io.File(root).list().filter(_.startsWith("snap-"))
    assert(snaps.toSet == Set(s"snap-$id2", s"snap-$id3"))
    assert(id1 != id2)
  }
  test("time travel: history window, readAsOf, pruned ids return None") {
    val root = Files.createTempDirectory("pidx_tt").toString
    val idx = new ParquetIndex(root, keep = 2)
    val id1 = idx.write(df(("k1", 1L, ts("2020-01-01 00:00:00"))))
    val id2 = idx.write(df(("k1", 10L, ts("2020-01-02 00:00:00")),
      ("k2", 2L, ts("2020-01-02 00:00:00"))))
    assert(idx.history == Seq(id1, id2))
    assert(idx.readAsOf(spark, id1).get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == Set(("k1", 1L)))
    assert(idx.readAsOf(spark, id2).get.count() == 2)
    // a third write prunes id1 out of the keep=2 window
    val id3 = idx.write(df(("k2", 2L, ts("2020-01-03 00:00:00"))))
    assert(idx.history == Seq(id2, id3))
    assert(idx.readAsOf(spark, id1).isEmpty)
    assert(idx.readAsOf(spark, "no-such-id").isEmpty)
    // current read still the tip
    assert(idx.read(spark).get.collect().map(_.getString(0)).toSet ==
      Set("k2"))
  }

  test("changeFeed classifies added/updated/removed with the right payload") {
    val root = Files.createTempDirectory("pidx_cdc").toString
    val idx = new ParquetIndex(root, keep = 3)
    val id1 = idx.write(df(
      ("kept", 1L, ts("2020-01-01 00:00:00")),
      ("upd", 2L, ts("2020-01-01 00:00:00")),
      ("gone", 3L, ts("2020-01-01 00:00:00"))))
    val id2 = idx.write(df(
      ("kept", 1L, ts("2020-01-01 00:00:00")), // identical → not in feed
      ("upd", 22L, ts("2020-01-02 00:00:00")),
      ("new", 4L, ts("2020-01-02 00:00:00"))))
    val feed = idx.changeFeed(spark, id1, id2, "key").get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(feed == Map(
      "upd" -> ((22L, "updated")),  // new row rides the feed
      "new" -> ((4L, "added")),
      "gone" -> ((3L, "removed"))))  // old row rides the feed
    assert(!feed.contains("kept"))
    // schema: key, payload columns, change_type LAST
    val cols = idx.changeFeed(spark, id1, id2, "key").get.columns.toSeq
    assert(cols == Seq("key", "size", "mtime", "change_type"))
    assert(idx.changeFeed(spark, "nope", id2, "key").isEmpty)
  }

  test("sortWithin lays each written file out sorted on the layout key") {
    val root = Files.createTempDirectory("pidx_sort").toString
    val idx = new ParquetIndex(root, writeFiles = 1,
      sortWithin = Seq("key"))
    // write deliberately shuffled keys
    val rows = scala.util.Random.shuffle((1 to 200).toList)
      .map(i => (f"k$i%04d", i.toLong, ts("2020-01-01 00:00:00")))
    idx.write(df(rows: _*))
    // read ONE physical parquet file raw: rows must already be ordered
    val snapDir = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("snap-")).head
    val file = snapDir.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val keys = spark.read.parquet(file.getPath)
      .collect().map(_.getString(0)).toSeq
    assert(keys == keys.sorted)
    assert(keys.size == 200)
  }

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  private def snapDir(root: String, id: String) =
    new java.io.File(s"$root/snap-$id")

  test("compact: fragmented unpartitioned snapshot rewritten, rows untouched") {
    val root = Files.createTempDirectory("pidx_cmp").toString
    val idx = new ParquetIndex(root)
    val rows = (1 to 64).map(i => (f"k$i%03d", i.toLong,
      ts("2020-01-01 00:00:00")))
    idx.write(df(rows: _*).repartition(16))
    val before = idx.currentId.get
    assert(dataFiles(snapDir(root, before)).size == 16)
    val beforeRows = idx.read(spark).get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    val after = idx.compact(spark).get
    assert(dataFiles(snapDir(root, after)).size <= 4)
    assert(idx.read(spark).get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == beforeRows)
    // no row changed: the feed across the compaction is empty
    assert(idx.changeFeed(spark, before, after, "key").get.count() == 0)
    // already healthy now: no further snapshot is committed
    assert(idx.compact(spark).isEmpty)
    assert(idx.currentId.get == after)
  }

  test("compact: partitioned — fragmented dirs rewritten, healthy dirs linked") {
    import spark.implicits._
    val root = Files.createTempDirectory("pidx_cmp2").toString
    val idx = new ParquetIndex(root, partitionBy = Seq("pt"))
    val rows = (1 to 32).map(i => ("a", f"k$i%03d", i.toLong)) :+
      (("b", "z1", 99L))
    // round-robin over 8 tasks: pt=a lands as 8 small files, pt=b as 1
    val before = idx.write(rows.toDF("pt", "key", "size").repartition(8))
    val aBefore = dataFiles(new java.io.File(s"$root/snap-$before/pt=a"))
    val bBefore = dataFiles(new java.io.File(s"$root/snap-$before/pt=b"))
    assert(aBefore.size > 4 && bBefore.size == 1)
    val beforeRows = idx.read(spark).get.collect()
      .map(r => (r.getAs[String]("pt"), r.getAs[String]("key"),
        r.getAs[Long]("size"))).toSet

    val after = idx.compact(spark).get
    val aAfter = dataFiles(new java.io.File(s"$root/snap-$after/pt=a"))
    val bAfter = dataFiles(new java.io.File(s"$root/snap-$after/pt=b"))
    assert(aAfter.size == 1)
    // healthy dir carried over file-for-file (hard links, not a rewrite)
    assert(bAfter.map(_.getName).toSet == bBefore.map(_.getName).toSet)
    val sameInode = scala.util.Try {
      Files.getAttribute(bAfter.head.toPath, "unix:ino") ==
        Files.getAttribute(bBefore.head.toPath, "unix:ino")
    }
    sameInode.foreach(same => assert(same))
    assert(idx.read(spark).get.collect()
      .map(r => (r.getAs[String]("pt"), r.getAs[String]("key"),
        r.getAs[Long]("size"))).toSet == beforeRows)
    assert(idx.changeFeed(spark, before, after, "key").get.count() == 0)
    assert(idx.compact(spark).isEmpty)
  }

  test("compact: non-string partition column falls back to a full rewrite") {
    import spark.implicits._
    val root = Files.createTempDirectory("pidx_cmp3").toString
    val idx = new ParquetIndex(root, partitionBy = Seq("num"))
    val rows = (1 to 24).map(i => (i % 2, f"k$i%03d", i.toLong))
    val before = idx.write(rows.toDF("num", "key", "size").repartition(8))
    assert(dataFiles(new java.io.File(s"$root/snap-$before/num=0")).size > 4)
    val beforeRows = idx.read(spark).get.collect()
      .map(r => (r.getAs[Int]("num"), r.getAs[String]("key"))).toSet

    val after = idx.compact(spark).get
    Seq(0, 1).foreach { v =>
      assert(dataFiles(
        new java.io.File(s"$root/snap-$after/num=$v")).size == 1)
    }
    assert(idx.read(spark).get.collect()
      .map(r => (r.getAs[Int]("num"), r.getAs[String]("key"))).toSet ==
        beforeRows)
  }

}

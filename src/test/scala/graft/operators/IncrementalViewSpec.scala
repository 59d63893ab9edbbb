package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpecBase
import graft.sinks.ParquetIndex

/** Incremental view maintenance: after every commit, folding the change
  * feed into the running aggregate must equal recomputing the aggregate
  * from the snapshot — including updates that move rows between groups,
  * groups that vanish (count 0), and null group keys.
  */
class IncrementalViewSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def df(rows: (String, String, Long, Timestamp)*) = {
    import spark.implicits._
    rows.toDF("key", "ext", "size", "mtime")
  }

  private val groupCols = Seq("ext")
  private val sumCols = Seq("size")

  private def snap(view: org.apache.spark.sql.DataFrame) =
    view.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet

  test("incremental fold matches full recompute across a change sequence") {
    val root = Files.createTempDirectory("ivm").toString
    val idx = new ParquetIndex(root)

    var prevId = idx.write(df(
      ("k1", "a", 1L, ts("2020-01-01 00:00:00")),
      ("k2", "a", 2L, ts("2020-01-01 00:00:00")),
      ("k3", "b", 3L, ts("2020-01-01 00:00:00")),
      ("k4", null, 4L, ts("2020-01-01 00:00:00"))))
    var view = IncrementalView
      .fromScratch(idx.read(spark).get, groupCols, sumCols)
      .localCheckpoint(true)

    val steps: Seq[() => String] = Seq(
      // update k2 into a NEW group (a → c) + plain add
      () => idx.upsert(spark, df(
        ("k2", "c", 20L, ts("2021-01-01 00:00:00")),
        ("k5", "b", 5L, ts("2021-01-01 00:00:00"))), "key", "mtime"),
      // full rescan: k3 and k4 vanish (null group empties), k1 grows
      () => idx.upsertReconcile(spark, df(
        ("k1", "a", 10L, ts("2022-01-01 00:00:00")),
        ("k2", "c", 20L, ts("2021-01-01 00:00:00")),
        ("k5", "b", 5L, ts("2021-01-01 00:00:00"))), "key", "mtime"),
      // null group reappears; k5 updated within its group
      () => idx.upsert(spark, df(
        ("k6", null, 6L, ts("2023-01-01 00:00:00")),
        ("k5", "b", 50L, ts("2023-01-01 00:00:00"))), "key", "mtime"))

    for (step <- steps) {
      val cur = step()
      val feed = idx
        .changeFeed(spark, prevId, cur, "key", includeOld = true).get
      view = IncrementalView.applyFeed(view, feed, groupCols, sumCols)
        .localCheckpoint(true)
      val oracle = IncrementalView
        .fromScratch(idx.read(spark).get, groupCols, sumCols)
      assert(snap(view) == snap(oracle), s"after snapshot $cur")
      prevId = cur
    }
    // the vanished-then-reborn null group ended with exactly k6
    assert(snap(view).contains((None, 1L, 6L)))
    // no zero-count tombstones survive
    assert(snap(view).forall(_._2 > 0))
  }

  test("seeded randomized model check: incremental equals recompute each step") {
    val rnd = new scala.util.Random(20260812L)
    val root = Files.createTempDirectory("ivm_rand").toString
    val idx = new ParquetIndex(root)
    val exts = Array("a", "b", "c", null)
    val keys = (1 to 30).map(i => s"k$i")
    var t = 0
    def batch(ks: Seq[String]) = {
      t += 1
      df(ks.map(k => (k, exts(rnd.nextInt(exts.length)),
        rnd.nextInt(100).toLong,
        Timestamp.from(ts("2020-01-01 00:00:00").toInstant
          .plusSeconds(t * 86400L)))): _*)
    }
    var prevId = idx.write(batch(rnd.shuffle(keys).take(10)))
    var view = IncrementalView
      .fromScratch(idx.read(spark).get, groupCols, sumCols)
      .localCheckpoint(true)
    for (step <- 1 to 8) {
      val ks = rnd.shuffle(keys).take(1 + rnd.nextInt(12))
      // alternate incremental merges with full-rescan reconciles: both
      // produce feeds with all three change types over random groups
      val cur =
        if (step % 3 != 0) idx.upsert(spark, batch(ks), "key", "mtime")
        else idx.upsertReconcile(spark, batch(ks), "key", "mtime")
      val feed = idx
        .changeFeed(spark, prevId, cur, "key", includeOld = true).get
      view = IncrementalView.applyFeed(view, feed, groupCols, sumCols)
        .localCheckpoint(true)
      val oracle = IncrementalView
        .fromScratch(idx.read(spark).get, groupCols, sumCols)
      assert(snap(view) == snap(oracle), s"step $step snapshot $cur")
      prevId = cur
    }
  }

  test("empty feed (e.g. across a compaction) leaves the view unchanged") {
    val root = Files.createTempDirectory("ivm2").toString
    val idx = new ParquetIndex(root)
    val a = idx.write(df(("k1", "a", 1L, ts("2020-01-01 00:00:00")))
      .repartition(8))
    val view = IncrementalView
      .fromScratch(idx.read(spark).get, groupCols, sumCols)
      .localCheckpoint(true)
    val b = idx.compact(spark, maxFilesPerDir = 1).get
    val feed = idx.changeFeed(spark, a, b, "key", includeOld = true).get
    assert(feed.count() == 0)
    val after = IncrementalView.applyFeed(view, feed, groupCols, sumCols)
    assert(snap(after) == snap(view))
  }
}

package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Merge

/** Merge-on-read: the appended-log read resolves to EXACTLY the state
  * the copy-on-write path (sequential Merge.merge + key drops) reaches,
  * in both tie modes; checkpoint folds the log and clears it; deltas
  * write only their batch.
  */
class MorIndexSpec extends SparkSpecBase {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("ts", LongType),
    StructField("v", StringType)))

  private def df(rows: (String, Long, String)*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      schema)

  private def state(d: DataFrame): Set[(String, Long, String)] =
    d.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet

  // base; overlapping newer+older+tied updates; deletes; a re-add after
  // delete with an OLDER ts (the revive case that breaks naive
  // global-max resolution)
  private val b0 = df(("a", 5L, "a0"), ("b", 3L, "b0"), ("c", 7L, "c0"),
    ("d", 1L, "d0"))
  private val b1 = df(("a", 6L, "a1"), ("b", 3L, "b1"), ("c", 2L, "c1"),
    ("e", 4L, "e1"))
  private val delKeys = Seq("a", "d")
  private val b2 = df(("a", 2L, "a2"), ("f", 9L, "f2"))

  private def cowState(ties: Boolean): Set[(String, Long, String)] = {
    val s1 = Merge.merge(b0, b1, "k", "ts", ties)
    val s2 = s1.filter(!col("k").isin(delKeys: _*))
    state(Merge.merge(s2, b2, "k", "ts", ties))
  }

  private def buildMor(ties: Boolean): ParquetIndex = {
    val idx = new ParquetIndex(
      Files.createTempDirectory(s"mor-$ties").toString)
    idx.appendDelta(spark, b0) // no base yet → becomes the base
    idx.appendDelta(spark, b1)
    idx.appendDelete(spark, df(delKeys.map(k => (k, 0L, "")): _*), "k")
    idx.appendDelta(spark, b2)
    idx
  }

  for (ties <- Seq(false, true)) {
    val mode = if (ties) "J2 batch-wins" else "J1 existing-wins"
    test(s"MOR read ≡ sequential copy-on-write fold ($mode)") {
      val idx = buildMor(ties)
      assert(state(idx.readMor(spark, "k", "ts", ties).get) ==
        cowState(ties))
    }
  }

  test("the revive case: a re-add after delete wins over the dead row") {
    val idx = buildMor(false)
    val a = idx.readMor(spark, "k", "ts", false).get
      .filter(col("k") === "a").collect()
    // base had (a,5); deleted; re-added at ts=2 — the OLD row must not
    // resurrect even though its ts is higher
    assert(a.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((2L, "a2")))
  }

  test("checkpoint folds the log, clears it, and read() serves the fold") {
    val idx = buildMor(false)
    val before = state(idx.readMor(spark, "k", "ts", false).get)
    val oldBase = idx.currentId.get
    val newBase = idx.checkpointMor(spark, "k", "ts", false)
    assert(newBase.isDefined && newBase.get != oldBase)
    assert(idx.morEntries(idx.currentId.get).isEmpty)
    assert(state(idx.read(spark).get) == before)
    assert(state(idx.readMor(spark, "k", "ts", false).get) == before)
    // a second checkpoint with an empty log is a no-op
    assert(idx.checkpointMor(spark, "k", "ts", false).isEmpty)
    // and the log keeps working against the new base
    idx.appendDelta(spark, df(("g", 1L, "g0")))
    assert(state(idx.readMor(spark, "k", "ts", false).get) ==
      before + (("g", 1L, "g0")))
  }

  test("a delta writes only its batch (write cost ∝ batch, not index)") {
    val idx = buildMor(false)
    val root = java.nio.file.Paths.get(
      idx.read(spark).get.inputFiles.head
        .stripPrefix("file:").split("/snap-").head)
    val morDir = java.nio.file.Files.list(root).iterator()
    val mor = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    while (morDir.hasNext) { val p = morDir.next()
      if (p.getFileName.toString.startsWith("mor-")) mor += p }
    assert(mor.size == 1)
    // delta-00000 carries exactly b1's rows
    val d0 = spark.read.parquet(s"${mor.head}/delta-00000")
    assert(d0.count() == b1.count())
  }

  test("scope refresh reconciles inside the scope, touches nothing else") {
    val idx = new ParquetIndex(
      Files.createTempDirectory("mor-scope").toString)
    // two "directories" by key prefix
    idx.appendDelta(spark, df(("a/1", 1L, "a1"), ("a/2", 1L, "a2"),
      ("a/3", 1L, "a3"), ("b/1", 1L, "b1"), ("b/2", 1L, "b2")))
    // rescan of a/: a/1 updated, a/2 unchanged, a/3 VANISHED, a/4 new
    val rescan = df(("a/1", 2L, "a1x"), ("a/2", 1L, "a2"),
      ("a/4", 2L, "a4"))
    idx.refreshScopeMor(spark, rescan, col("k").startsWith("a/"),
      "k", "ts")
    val got = state(idx.readMor(spark, "k", "ts", false).get)
    assert(got == Set(("a/1", 2L, "a1x"), ("a/2", 1L, "a2"),
      ("a/4", 2L, "a4"), ("b/1", 1L, "b1"), ("b/2", 1L, "b2")))
    // a second identical refresh is idempotent
    idx.refreshScopeMor(spark, rescan, col("k").startsWith("a/"),
      "k", "ts")
    assert(state(idx.readMor(spark, "k", "ts", false).get) == got)
    // and the fold preserves it all
    idx.checkpointMor(spark, "k", "ts", false)
    assert(state(idx.read(spark).get) == got)
  }

  test("MOR checkpoints drive changeFeed → IncrementalView maintenance") {
    import graft.operators.IncrementalView
    val s4 = StructType(Seq(
      StructField("k", StringType), StructField("ts", LongType),
      StructField("g", StringType), StructField("x", LongType)))
    def df4(rows: (String, Long, String, Long)*): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(
        rows.map(r => Row(r._1, r._2, r._3, r._4)): _*), s4)

    val idx = new ParquetIndex(
      Files.createTempDirectory("mor-view").toString, keep = 3)
    idx.appendDelta(spark, df4(("k1", 1L, "a", 10L), ("k2", 1L, "a", 20L),
      ("k3", 1L, "b", 30L)))
    val id1 = idx.currentId.get
    val view1 = IncrementalView.fromScratch(
      idx.read(spark).get, Seq("g"), Seq("x"))

    // update k2, add k4, delete k3 — all through the MOR log
    idx.appendDelta(spark, df4(("k2", 2L, "a", 25L), ("k4", 2L, "b", 5L)))
    idx.appendDelete(spark, df4(("k3", 0L, "", 0L)), "k")
    idx.checkpointMor(spark, "k", "ts", batchWinsTies = false)
    val id2 = idx.currentId.get

    val feed = idx.changeFeed(spark, id1, id2, "k",
      includeOld = true).get
    val folded = IncrementalView.applyFeed(view1, feed, Seq("g"), Seq("x"))
    val scratch = IncrementalView.fromScratch(
      idx.read(spark).get, Seq("g"), Seq("x"))
    def vstate(d: DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(vstate(folded) == vstate(scratch))
    // sanity: the deletion really flowed through (group b lost k3)
    assert(vstate(folded).contains(("b", 1L, 5L)))
  }

  test("log lifecycle: upsert folds a pending log; compact defers; " +
      "a direct write supersedes and consumes it") {
    // upsert folds: the log's update must survive a COW upsert
    val idx = new ParquetIndex(
      Files.createTempDirectory("mor-life").toString)
    idx.appendDelta(spark, b0)
    idx.appendDelta(spark, df(("e", 4L, "e1"))) // pending log entry
    idx.upsert(spark, df(("f", 1L, "f0")), "k", "ts")
    assert(idx.morEntries(idx.currentId.get).isEmpty)
    val s = state(idx.read(spark).get)
    assert(s.contains(("e", 4L, "e1")) && s.contains(("f", 1L, "f0")))

    // compact defers while a log is pending (layout-only maintenance
    // must not consume data), reconcile refuses outright
    val idx2 = new ParquetIndex(
      Files.createTempDirectory("mor-life2").toString)
    idx2.appendDelta(spark, b0)
    idx2.appendDelta(spark, df(("e", 4L, "e1")))
    assert(idx2.compact(spark, maxFilesPerDir = 0).isEmpty)
    intercept[IllegalArgumentException] {
      idx2.reconcile(spark, b0.select("k"), "k")
    }
    // ...and a direct write (full-rescan semantics) supersedes the log
    val superseded = df(("z", 9L, "z0"))
    idx2.write(superseded)
    assert(idx2.morEntries(idx2.currentId.get).isEmpty)
    assert(state(idx2.readMor(spark, "k", "ts", false).get) ==
      state(superseded))
  }

  test("empty delta and empty delete dirs read back cleanly") {
    val idx = new ParquetIndex(
      Files.createTempDirectory("mor-empty").toString)
    idx.appendDelta(spark, b0)
    idx.appendDelta(spark, b0.limit(0))
    idx.appendDelete(spark, b0.limit(0), "k")
    assert(state(idx.readMor(spark, "k", "ts", false).get) == state(b0))
  }
}

package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.sinks.ParquetIndex

case class Ev(ts: Timestamp, event_type: String)
case class KEv(user_id: String, ts: Timestamp, event_type: String)
case class DEv(event_id: String, ts: Timestamp)
case class UEv(ts: Timestamp, user_id: String)
case class Entry(key: String, size: Long, mtime: Timestamp)

/** ST1/ST2 micro-batch semantics: windowed event-time aggregation with a
  * watermark, and continuous indexing through the same J1 merge the
  * batch pipeline uses (foreachBatch ≙ the reference's 100k-row batch
  * flushes, main.py:273-295).
  */
class EventsStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly windowed counts emit once the watermark passes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = EventsStream.hourlyCounts(ms.toDF())
      .writeStream.format("memory").queryName("hc")
      .outputMode("append").start()
    try {
      ms.addData(
        Ev(ts("2024-01-01 00:05:00"), "click"),
        Ev(ts("2024-01-01 00:40:00"), "click"),
        Ev(ts("2024-01-01 00:59:00"), "view"))
      q.processAllAvailable()
      // watermark hasn't passed hour-0's end yet → nothing emitted
      assert(spark.table("hc").count() == 0)
      // an event 3h later pushes the watermark (2h) past hour-0
      ms.addData(Ev(ts("2024-01-01 03:30:00"), "click"))
      q.processAllAvailable()
      val got = spark.table("hc").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        (ts("2024-01-01 00:00:00"), "click", 2L),
        (ts("2024-01-01 00:00:00"), "view", 1L)))
      // late-data handling: an hour-0 event arriving after the
      // watermark passed hour-0 is dropped, not re-emitted
      ms.addData(Ev(ts("2024-01-01 00:10:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("hc").count() == 2)
    } finally q.stop()
  }

  test("session windows split on the 30-minute gap and merge within it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[UEv]
    val q = EventsStream.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName("sc")
      .outputMode("append").start()
    try {
      ms.addData(
        // u1: two events 10 min apart (one session), then a 40-min
        // silence, then one more (second session)
        UEv(ts("2024-01-01 00:00:00"), "u1"),
        UEv(ts("2024-01-01 00:10:00"), "u1"),
        UEv(ts("2024-01-01 00:50:00"), "u1"),
        // u2: single event
        UEv(ts("2024-01-01 00:05:00"), "u2"))
      q.processAllAvailable()
      // flush: push the watermark far past every session's close
      ms.addData(UEv(ts("2024-01-01 06:00:00"), "u9"))
      q.processAllAvailable()
      val got = spark.table("sc").collect()
        .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
      assert(got == Set(
        (ts("2024-01-01 00:00:00"), "u1", 2L), // merged 00:00+00:10
        (ts("2024-01-01 00:50:00"), "u1", 1L), // split by the 40-min gap
        (ts("2024-01-01 00:05:00"), "u2", 1L)))
    } finally q.stop()
  }

  test("stateful stream dedup passes first occurrence only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = EventsStream.dedupStream(spark, ms.toDS())
      .toDF("key", "payload")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      ms.addData(("k1", "first"), ("k1", "dup-same-batch"), ("k2", "x"))
      q.processAllAvailable()
      ms.addData(("k1", "dup-later-batch"), ("k3", "y"))
      q.processAllAvailable()
      val got = spark.table("dedup").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("k1", "first"), ("k2", "x"), ("k3", "y")))
    } finally q.stop()
  }

  test("watermark-bounded dedup: exact inside the window, state expires") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DEv]
    val q = EventsStream.dedupWithinWatermark(ms.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    try {
      // same-batch and cross-batch duplicates inside the window drop
      ms.addData(DEv("a", ts("2024-01-01 00:00:00")),
        DEv("a", ts("2024-01-01 00:01:00")),
        DEv("b", ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      ms.addData(DEv("a", ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      assert(spark.table("wmdedup").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
      // push the watermark (2h delay) far past 'a''s state, then the key
      // recurs with a fresh event time: state expired -> re-emitted.
      // That bounded-state/at-least-once trade IS the contract.
      ms.addData(DEv("z", ts("2024-01-01 08:00:00")))
      q.processAllAvailable()
      ms.addData(DEv("a", ts("2024-01-01 08:01:00")))
      q.processAllAvailable()
      assert(spark.table("wmdedup").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("a", "a", "b", "z"))
    } finally q.stop()
  }

  test("continuous indexing merges each micro-batch into the snapshot") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("stream-idx").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val idx = new ParquetIndex(root)
    val ms = MemoryStream[Entry]
    val q = EventsStream.indexContinuously(ms.toDF(), idx, "key", "mtime",
      ckpt)
    try {
      ms.addData(Entry("k1", 1L, ts("2020-01-01 00:00:00")),
        Entry("k2", 2L, ts("2020-01-01 00:00:00")))
      q.processAllAvailable()
      assert(idx.read(spark).get.count() == 2)
      ms.addData(Entry("k2", 22L, ts("2021-01-01 00:00:00")),
        Entry("k3", 3L, ts("2021-01-01 00:00:00")))
      q.processAllAvailable()
      val got = idx.read(spark).get.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("k1", 1L), ("k2", 22L), ("k3", 3L)))
    } finally q.stop()
  }
  test("asofStream: in-batch ordering, cross-batch state, tie inclusive") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Int, Long)]
    val q = EventsStream.asofStream(spark, ms.toDS())
      .writeStream.format("memory").queryName("asf")
      .outputMode("append").start()
    try {
      // batch 1 (user 1): build@100(id 500), probe@100 (tie → inclusive),
      // probe@50 (before any build → no match), build@200(id 501),
      // probe@250; user 2 probe isolated from user 1's state
      ms.addData(
        (1L, 100L, 0, 500L), (1L, 100L, 1, 900L), (1L, 50L, 1, 901L),
        (1L, 200L, 0, 501L), (1L, 250L, 1, 902L),
        (2L, 300L, 1, 903L))
      q.processAllAvailable()
      val b1 = spark.table("asf").collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) None
          else Some(r.getLong(3)))).toMap
      assert(b1 == Map(900L -> Some(500L), 901L -> None,
        902L -> Some(501L), 903L -> None))
      // batch 2: probe@300 uses batch-1 state (build 501); a new
      // build@400 then serves probe@450; an OLD build@150 must NOT
      // regress the state (max-ts wins)
      ms.addData((1L, 300L, 1, 904L), (1L, 400L, 0, 502L),
        (1L, 150L, 0, 499L), (1L, 450L, 1, 905L))
      q.processAllAvailable()
      val b2 = spark.table("asf").collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) None
          else Some(r.getLong(3)))).toMap
      assert(b2(904L) == Some(501L) && b2(905L) == Some(502L))
    } finally q.stop()
  }

  test("topkStream: leaderboard state matches the batch operator after " +
    "every prefix") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val q = EventsStream.topkStream(spark, ms.toDS(), k = 3)
      .writeStream.format("memory").queryName("lb")
      .outputMode("update").start()

    def batchTruth(rows: Seq[(String, Long, Double)])
        : Map[String, Seq[Long]] = {
      val df = rows.toDF("g", "id", "score")
      graft.plans.GroupTopK
        .topK(df, Seq("g"), Seq(("score", true), ("id", false)), 3)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
        .groupBy(_._1)
        .map { case (g, rs) => g -> rs.sortBy(_._3).map(_._2).toSeq }
    }

    val b1 = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 7.0),
      ("a", 4L, 1.0), ("b", 5L, 2.0))
    val b2 = Seq(("a", 6L, 8.0), ("b", 7L, 4.0), ("b", 8L, 2.0))
    try {
      ms.addData(b1: _*)
      q.processAllAvailable()
      val after1 = spark.table("lb").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1))).toSet
      assert(after1 === batchTruth(b1).toSet)
      // batch 2: a new high score displaces a's #3; b grows; every
      // emitted ranking after the second batch must equal the batch
      // operator over the FULL prefix (streaming state == bounded
      // mergeable summary)
      ms.addData(b2: _*)
      q.processAllAvailable()
      val truthAll = batchTruth(b1 ++ b2)
      val rows = spark.table("lb").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1))).toSet
      // memory sink holds batch-1 AND batch-2 emissions; the batch-2
      // ones must be present and correct for both touched groups
      assert(rows.contains(("a", truthAll("a"))), s"$rows vs $truthAll")
      assert(rows.contains(("b", truthAll("b"))), s"$rows vs $truthAll")
      // ties broken by id: b has two score-2.0 observations (5 and 8)
      assert(truthAll("b") === Seq(7L, 5L, 8L))
    } finally q.stop()
  }

  test("stream-stream interval join: matches within horizon, same user") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[KEv]
    val clicks = MemoryStream[KEv]
    val q = EventsStream.intervalJoinStream(imps.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      imps.addData(
        KEv("u1", ts("2024-01-01 10:00:00"), "imp"),
        KEv("u2", ts("2024-01-01 10:00:00"), "imp"))
      clicks.addData(
        KEv("u1", ts("2024-01-01 10:30:00"), "click"), // in horizon
        KEv("u1", ts("2024-01-01 11:30:00"), "click"), // past 1h horizon
        KEv("u2", ts("2024-01-01 09:30:00"), "click"), // before the imp
        KEv("u3", ts("2024-01-01 10:15:00"), "click")) // no matching imp
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getString(0), r.getTimestamp(3))).toSet
      assert(got == Set(("u1", ts("2024-01-01 10:30:00"))))
      // inner join emits immediately; a LATER click for an OLD imp still
      // joins while both rows are within watermark bounds
      clicks.addData(KEv("u2", ts("2024-01-01 10:45:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("ij").count() == 2)
    } finally q.stop()
  }

  test("conversionStream: one conversion per user, cross-batch state, " +
    "in-batch event-time order") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val q = EventsStream.conversionStream(spark, ms.toDS())
      .writeStream.format("memory").queryName("conv")
      .outputMode("append").start()
    try {
      // batch 1: u1 views; u2's purchase ARRIVES before its view but
      // carries a later event time (in-batch sort converts it);
      // u3 purchases with no view ever (never converts)
      ms.addData(
        (1L, 1000L, "view"),
        (2L, 2500L, "purchase"), (2L, 2000L, "view"),
        (3L, 500L, "purchase"))
      q.processAllAvailable()
      val after1 = spark.table("conv").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after1 == Set((2L, 500L)))
      // batch 2: u1's purchase lands (cross-batch state: lag measured
      // from the batch-1 view); u2 purchases again — already converted,
      // no second emission; u3's FIRST purchase (batch 1, t=500)
      // precedes its first view (t=600), so the batch predicate
      // min(purchase) >= min(view) fails — u3 is settled non-converted
      // and the later purchase@900 does NOT convert (batch parity)
      ms.addData(
        (1L, 5000L, "purchase"),
        (2L, 9000L, "purchase"),
        (3L, 600L, "view"), (3L, 900L, "purchase"))
      q.processAllAvailable()
      val after2 = spark.table("conv").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after2 == Set((2L, 500L), (1L, 4000L)))
    } finally q.stop()
  }

  test("conversionStream: same-timestamp view+purchase converts, lag 0") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val q = EventsStream.conversionStream(spark, ms.toDS())
      .writeStream.format("memory").queryName("convtie")
      .outputMode("append").start()
    try {
      // the batch predicate min(purchase) - min(view) >= 0 counts an
      // equal-timestamp pair as converted with lag 0; the purchase is
      // ADDED FIRST so arrival order alone would shadow the view —
      // the (ts, view-first) sort must restore batch parity
      ms.addData((7L, 1000L, "purchase"), (7L, 1000L, "view"))
      q.processAllAvailable()
      val got = spark.table("convtie").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((7L, 0L)))
    } finally q.stop()
  }

}

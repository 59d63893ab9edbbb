package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase

/** Edge semantics the sf-fixture oracle run can't be trusted to cover:
  * equal-timestamp inclusivity, tie-breaks among build rows, keys with no
  * prior match, key isolation, and range-join boundary/overlap rules.
  */
class TemporalJoinsSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: inclusive match, ties break to highest payload, key-isolated") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")), // exact-tie with click 102/103
      (2L, 10L, ts("2024-01-01 00:00:05")), // between clicks
      (3L, 10L, ts("2024-01-01 00:00:01")), // before any click
      (4L, 20L, ts("2024-01-01 00:00:30"))  // other user: only its click
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:02"), 101L),
      (10L, ts("2024-01-01 00:00:10"), 102L), // same instant as error 1
      (10L, ts("2024-01-01 00:00:10"), 103L), // tie: higher id must win
      (10L, ts("2024-01-01 00:00:20"), 104L), // after every error
      (20L, ts("2024-01-01 00:00:25"), 201L)
    ).toDF("user_id", "ts", "click_id")
    val got = TemporalJoins.asof(left, right, "user_id", "ts",
        Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(
      1L -> Some(103L), // inclusive + max-id tie-break
      2L -> Some(101L),
      3L -> None,       // nothing at-or-before
      4L -> Some(201L)))
  }

  test("asof plan: one exchange on the key, no cartesian/BNLJ") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:10")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 00:00:02"), 101L))
      .toDF("user_id", "ts", "click_id")
    val plan = TemporalJoins.asof(left, right, "user_id", "ts",
      Seq("click_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the probe/build union flows through a single window, not a join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"))
  }

  test("binned range join: [lo, hi) bounds exact at bin edges + overlap") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 19.999), (3L, 20.0), (4L, 27.999),
      (5L, 28.0), (6L, 40.0), (7L, 47.999), (8L, 48.0), (9L, -0.001))
      .toDF("pid", "value")
    // intervals [0,28) and [20,48): 20.0-27.999 lands in BOTH
    val ivals = Seq((0L, 0.0, 28.0), (1L, 20.0, 48.0))
      .toDF("interval_id", "lo", "hi")
    val got = TemporalJoins.binnedRangeJoin(points, ivals,
        "value", "lo", "hi", 20.0)
      .select("pid", "interval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (1L, 0L), (2L, 0L),
      (3L, 0L), (3L, 1L), (4L, 0L), (4L, 1L), // overlap double-match
      (5L, 1L), (6L, 1L), (7L, 1L)))
    // 28.0 not in [0,28); 48.0 not in [20,48); -0.001 below every lo
  }

  test("binned range join result = naive inequality join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "value")
    val ivals = (0 to 9).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF("interval_id", "lo", "hi")
    val binned = TemporalJoins.binnedRangeJoin(points, ivals,
        "value", "lo", "hi", 7.0)
      .select("pid", "interval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(ivals)
      .filter($"value" >= $"lo" && $"value" < $"hi")
      .select("pid", "interval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive && binned.nonEmpty)
  }
}

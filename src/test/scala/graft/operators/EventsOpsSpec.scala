package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Sketch outputs aren't bit-stable across engines, so accuracy is
  * bounded HERE against the exact forms on the same data — the check a
  * 100 TB pipeline would run on a sampled shard before trusting the
  * sketches fleet-wide. The declared `events_approx_stats` query then
  * compresses exactly these bounds into deterministic booleans, which
  * the DuckDB oracle gates as literal `true` rows.
  */
class EventsOpsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  test("approx percentiles land within 2% of the exact quantiles") {
    val approx = EventsOps.approxStatsRaw(spark, sf)
      .select("event_type", "p50_approx", "p99_approx").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = EventsOps.valueQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (p50e, p99e)) <- exact) {
      val (p50a, p99a) = approx(k)
      assert(math.abs(p50a - p50e) <= 0.02 * math.max(1.0, p50e.abs),
        s"$k p50 approx=$p50a exact=$p50e")
      assert(math.abs(p99a - p99e) <= 0.02 * math.max(1.0, p99e.abs),
        s"$k p99 approx=$p99a exact=$p99e")
    }
  }

  test("HLL distinct users lands within the configured 5% rsd (3 sigma)") {
    val approx = EventsOps.approxStatsRaw(spark, sf)
      .select("event_type", "users_approx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble <= math.max(3.0, 0.15 * e),
        s"$k approx=$a exact=$e")
    }
  }

  test("gated approx query reports every bound as holding (oracle shape)") {
    val rows = EventsOps.approxStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"bound violated for ${r.getString(0)}: $r")
    }
  }

  test("funnel stages are ordered and monotonically shrinking") {
    val rows = EventsOps.funnel(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val Seq(v, c, p) = rows.map(_.getLong(1)).toSeq
    assert(v >= c && c >= p, s"funnel widened: $v -> $c -> $p")
    assert(p > 0, "sf0.01 has full conversions")
  }

  test("anomaly: flagged rows really sit 3 sigma out") {
    val rows = EventsOps.anomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) >= 3.0, s"$r"))
    // the fixture's value distribution is right-skewed (heavy upper
    // tail, bounded at 0 below) — every 3-sigma outlier is positive;
    // a negative z here would mean the moments drifted
    assert(rows.map(_.getDouble(3)).forall(_ > 0))
  }

  test("freq sketch: top-10 count sequence matches exact in gate regime") {
    val rows = EventsOps.freqTopk(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"sketch drifted from exact: $r")
      assert(r.getLong(1) == r.getLong(2))
    }
    // counts must be non-increasing by rank
    val ns = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("retention: day-0 is each cohort's peak and offsets stay in-week") {
    val rows = EventsOps.retention(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n) =>
      assert(off >= 0 && off <= 7 && n > 0)
    }
    rows.groupBy(_._1).foreach { case (day, cohort) =>
      val byOff = cohort.map(c => c._2 -> c._3).toMap
      byOff.get(0).foreach { day0 =>
        assert(byOff.values.forall(_ <= day0),
          s"cohort $day retains more users than it started with")
      }
    }
  }

  test("conversion lag: converted within viewed, quantiles ordered") {
    val rows = EventsOps.conversionLag(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    val (viewed, converted, rate) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(converted >= 0 && converted <= viewed)
    assert(rate >= 0.0 && rate <= 1.0)
    assert(math.abs(rate - converted.toDouble / viewed) < 1e-3)
    if (converted > 0) {
      val (p50, p90) = (r.getDouble(3), r.getDouble(4))
      assert(p50 >= 0.0 && p50 <= p90, s"p50 $p50 > p90 $p90")
    }
    // cross-check the conversion count by direct computation
    val direct = graft.Tables(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("view", "purchase"))
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("event_type") === "view",
            org.apache.spark.sql.functions.col("ts"))).as("v"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("event_type") === "purchase",
            org.apache.spark.sql.functions.col("ts"))).as("p"))
      .collect()
      .map(r => (Option(r.getTimestamp(1)), Option(r.getTimestamp(2))))
    assert(viewed == direct.count(_._1.nonEmpty))
    assert(converted == direct.count { case (v, p) =>
      v.nonEmpty && p.nonEmpty && !p.get.before(v.get) })
  }

  test("HLL partial sketches merge losslessly across rollup grains") {
    val raw = EventsOps.sketchRollupRaw(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // ALL row's fan-in = sum of per-type fan-ins (every partial merged)
    val typed = raw.view.filterKeys(_ != "ALL").toMap
    assert(raw("ALL")._1 == typed.values.map(_._1).sum,
      "ALL fan-in must equal the sum of per-type partial counts")
    // merge-invariance: register-wise max is decomposable, so the
    // estimate from merged per-day partials equals the estimate of one
    // sketch built over the whole partition in a single pass
    val direct = graft.Tables(spark, sf, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.hll_sketch_estimate(
        org.apache.spark.sql.functions.hll_sketch_agg(
          org.apache.spark.sql.functions.col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, (_, est, _)) <- typed)
      assert(est == direct(k),
        s"$k merged-partials estimate $est != single-pass ${direct(k)}")
    // accuracy: every grain within the gated ±5% (floor 2) of exact
    for ((k, (_, est, exact)) <- raw)
      assert(math.abs(est - exact).toDouble <=
        math.max(exact * 0.05, 2.0), s"$k est=$est exact=$exact")
  }

  test("HLL inclusion-exclusion overlap covers every type pair within bound") {
    val rows = EventsOps.sketchOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    val types = graft.Tables(spark, sf, "events")
      .select("event_type").distinct().count().toInt
    // one row per unordered type pair, all estimator bounds holding
    assert(rows.length == types * (types - 1) / 2)
    assert(rows.forall(_._4), s"estimator bound failed: ${
      rows.filterNot(_._4).mkString(", ")}")
    // overlap can never exceed either side's distinct-user count
    val perType = EventsOps.sketchRollupRaw(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    for ((a, b, ov, _) <- rows)
      assert(ov <= math.min(perType(a), perType(b)),
        s"($a,$b) overlap $ov exceeds a side")
  }

  test("sketch gates hold in the DENSE regime the fixtures never reach") {
    // the events fixture's cardinalities (150/1,500 users) keep the
    // HLL sketches sparse-exact, so the declared ±5%/±10% gates are
    // never stressed there; a bigger corpus promotes to dense
    // registers with real estimation error. Prove the gated bounds at
    // 200k distinct keys — lgK=12 dense, rse ≈ 1.6% — including the
    // merged-partials and inclusion-exclusion forms the two queries
    // gate, so a scale-up can't flip the booleans.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 200000
    val base = spark.range(n.toLong).toDF("user_id")
      .withColumn("day", (col("user_id") % 30).cast("int"))
      .localCheckpoint(true)
    val merged = base.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    assert(math.abs(merged - n).toDouble <= 0.05 * n,
      s"dense merged estimate $merged vs exact $n breaches the 5% gate")
    // overlap: A = [0, 150k), B = [50k, 200k), exact |A∩B| = 100k
    val a = base.filter(col("user_id") < 150000)
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val b = base.filter(col("user_id") >= 50000)
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val Array(estA, estB, estU) = a.as("x").crossJoin(b.as("y"))
      .select(hll_sketch_estimate(col("x.sk")),
        hll_sketch_estimate(col("y.sk")),
        hll_sketch_estimate(hll_union(col("x.sk"), col("y.sk"))))
      .head() match { case r => Array(r.getLong(0), r.getLong(1),
        r.getLong(2)) }
    val estOverlap = estA + estB - estU
    assert(math.abs(estOverlap - 100000).toDouble <= 0.10 * 100000,
      s"dense overlap estimate $estOverlap vs exact 100000 breaches " +
        "the 10% gate")
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** `kmv_sketch`: exact below k, a partition-invariant bottom-k sample
  * at k — and the theta intersection estimator built on it passes in
  * the skewed-overlap regime where HLL inclusion–exclusion fails
  * (the `events_sketch_theta` scaladoc's saturated-regime pin).
  */
class KmvSketchSpec extends SparkSpecBase {

  private val k = 4096
  private val maxL = Long.MaxValue

  private def hashed(df: DataFrame): DataFrame =
    df.select(expr(s"xxhash64(m) & ${maxL}L").as("h"), col("m"))

  private def sketchOf(df: DataFrame): Array[Long] =
    hashed(df).agg(expr(s"kmv_sketch(h, $k)").as("sk"))
      .collect()(0).getSeq[Long](0).toArray

  /** The estimator sketchTheta ships: θ = min over sets of (kth-min
    * hash, or MaxValue when the sketch holds the whole set); estimate =
    * |{h ∈ A∩B sketches : h < θ}| · 2⁶³ / θ.
    */
  private def thetaEstimate(a: Array[Long], b: Array[Long]): Double = {
    def theta(s: Array[Long]) = if (s.length < k) maxL else s.last
    val t = math.min(theta(a), theta(b))
    val bs = b.toSet
    val n = a.count(h => h < t && bs.contains(h))
    n.toDouble * maxL.toDouble / t.toDouble
  }

  test("below k the sketch IS the ascending distinct hash set and the " +
    "intersection estimate is exact") {
    import spark.implicits._
    val a = (1L to 500L).toDF("m")
    val dupes = ((1L to 500L) ++ (1L to 500L)).toDF("m")
    val ska = sketchOf(a)
    assert(ska.length == 500)
    assert(ska.toSeq == ska.toSeq.sorted)
    // duplicate inputs change nothing
    assert(sketchOf(dupes).toSeq == ska.toSeq)
    val b = (401L to 900L).toDF("m")
    assert(thetaEstimate(ska, sketchOf(b)) == 100.0)
  }

  test("the sketch is invariant to partitioning (map-side merge)") {
    import spark.implicits._
    val rows = (1L to 20000L).toDF("m")
    val one = sketchOf(rows.repartition(1))
    val many = sketchOf(rows.repartition(17))
    assert(one.length == k && one.toSeq == many.toSeq)
  }

  test("saturated skewed-overlap regime: theta estimate holds ±10% " +
    "where HLL inclusion-exclusion misses by more") {
    // A = 300k ids; B = equal size, mostly disjoint, sharing only the
    // m % 50 == 0 slice (6,000 ids ≈ 1% of the union) — the regime the
    // events_sketch_theta scaladoc names
    val a = spark.range(1, 300001).select(col("id").as("m"))
    val b = spark.range(1, 300001).select(
      when(col("id") % 50 === 0, col("id"))
        .otherwise(col("id") + 10000000L).as("m"))
    val exact = 6000.0
    val est = thetaEstimate(sketchOf(a), sketchOf(b))
    val thetaErr = math.abs(est - exact)
    assert(thetaErr <= exact * 0.10,
      s"theta estimate $est vs $exact (err $thetaErr)")
    // HLL inclusion-exclusion on the same sets: three ~O(set-size)
    // estimate errors stack against a truth 1% of their size
    val ie = {
      def sk(df: DataFrame, nm: String) =
        df.agg(hll_sketch_agg(col("m")).as(nm))
      sk(a, "ha").crossJoin(sk(b, "hb"))
        .select((hll_sketch_estimate(col("ha")) +
          hll_sketch_estimate(col("hb")) -
          hll_sketch_estimate(hll_union(col("ha"), col("hb"))))
          .cast("double").as("ie"))
        .collect()(0).getDouble(0)
    }
    val ieErr = math.abs(ie - exact)
    assert(ieErr > exact * 0.10,
      s"expected IE to fail the 10% gate here, got $ie vs $exact")
    assert(thetaErr < ieErr,
      s"theta err $thetaErr not below IE err $ieErr")

    // the rest of the theta ALGEBRA holds in the saturated regime too:
    // per-set cardinality via (k−1)/θ and union via re-sketching the
    // merged bottom-k samples (= the union's own bottom-k)
    def cardEstimate(s: Array[Long]): Double =
      if (s.length < k) s.length.toDouble
      else (k - 1).toDouble * maxL.toDouble / s.last.toDouble
    val (ska, skb) = (sketchOf(a), sketchOf(b))
    val cardA = cardEstimate(ska)
    assert(math.abs(cardA - 300000.0) <= 30000.0, s"cardA $cardA")
    val skU = (ska ++ skb).distinct.sorted.take(k)
    val unionTrue = 2 * 300000.0 - 6000.0
    val unionEst = cardEstimate(skU)
    assert(math.abs(unionEst - unionTrue) <= unionTrue * 0.10,
      s"union $unionEst vs $unionTrue")

    // SET DIFFERENCE under the same shared θ: sample A's hashes below
    // θ that B's sample lacks, scaled 1/θ — the "new ids this grain"
    // estimator; its error scales with |A∖B|'s sample count, not the
    // set sizes (here |A∖B| is 98% of A, so a generous relative gate)
    def diffEstimate(x: Array[Long], y: Array[Long]): Double = {
      def theta(s: Array[Long]) = if (s.length < k) maxL else s.last
      val t = math.min(theta(x), theta(y))
      val ys = y.toSet
      x.count(h => h < t && !ys.contains(h)).toDouble *
        maxL.toDouble / t.toDouble
    }
    val diffTrue = 300000.0 - 6000.0
    val diffEst = diffEstimate(ska, skb)
    assert(math.abs(diffEst - diffTrue) <= diffTrue * 0.10,
      s"diff $diffEst vs $diffTrue")
    // and exact below k (the unsaturated regime)
    import spark.implicits._
    val smallA = (1L to 500L).toDF("m")
    val smallB = (401L to 900L).toDF("m")
    assert(diffEstimate(sketchOf(smallA), sketchOf(smallB)) == 400.0)
  }

  test("partial re-aggregation is LOSSLESS: re-sketching per-group " +
    "partials equals the one-shot sketch array exactly") {
    import spark.implicits._
    val rows = (1L to 50000L).toDF("m")
    val oneShot = sketchOf(rows)
    // 7 partials (the ingest-time table), then merged by re-sketching
    // the exploded partial hashes — bottom-k of a union of bottom-k
    // samples IS the union's bottom-k
    val partials = hashed(rows)
      .withColumn("g", col("m") % 7)
      .groupBy("g").agg(expr(s"kmv_sketch(h, $k)").as("sk"))
    val merged = partials.select(explode(col("sk")).as("h"))
      .agg(expr(s"kmv_sketch(h, $k)").as("sk"))
      .collect()(0).getSeq[Long](0).toArray
    assert(merged.toSeq == oneShot.toSeq)
  }
}

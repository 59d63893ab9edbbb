package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash banding scale probe: times `docs_simhash_pairs`' pipeline
  * (60-bit fingerprint → 4×15-bit banded equi-join → hamming ≤ 3) over
  * synthetic corpora of increasing size at CONSTANT duplicate density,
  * so the claim in TextOps' scaladoc — candidates meet through band
  * keys, never all-pairs — is a measured near-linear runtime curve,
  * not an assertion. (An all-pairs plan would grow 16× from 25k to
  * 100k docs; the banded one tracks the corpus size.)
  *
  * Corpus shape: every 10th doc is a near-duplicate — 38 of its 40
  * tokens come from its 1000-id block's base vocabulary, 2 are unique
  * — giving ~100-member families (≤4950 true pairs each, so output
  * and per-family work stay ∝ N);
  * the other 90% draw 40 tokens from a 1M-token vocabulary by hash
  * (unique-ish, only chance band collisions). Fully deterministic:
  * tokens are hash arithmetic, no RNG.
  *
  * usage: `graft.SimhashProbe [sizes...]` (defaults 25000 50000 100000)
  */
object SimhashProbe {

  private[graft] def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(1, 40), j ->
        |  CASE WHEN id % 10 = 0 AND j <= 38
        |  THEN concat('b', cast(id div 1000 AS string), '_', j)
        |  ELSE concat('t', pmod(hash(id, j), 1000000)) END))"""
        .stripMargin).as("text"))

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(25000L, 50000L, 100000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // session-level JIT/codegen warmup on a throwaway corpus — without
    // it the FIRST size's min-of-2 carries ~1 s of one-time compilation
    // and the curve reads superlinear at the small end
    Bench.checksum(operators.TextOps.simhashPairsOn(corpus(spark, 5000L))): Unit
    val cells = sizes.map { n =>
      val docs = operators.TextOps.simhashPairsOn(corpus(spark, n))
      // count FIRST: it pre-warms this size's plan (on top of
      // timedMinOf2's own warmup) instead of re-running the whole
      // pipeline a fourth time after the timing
      val pairs = docs.count()
      val (sec, _, _, _) = Bench.timedMinOf2(() => Bench.checksum(docs))
      s""""$n":{"sec":${"%.3f".format(sec)},"pairs":$pairs}"""
    }
    println(s"""{"probe":"simhash_pairs","sizes":${cells.mkString("{", ",", "}")},"cpus":${Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE trainer scale probe: times the full 8-round
  * count→pick→merge→recount loop ([[operators.TextOps.bpeTrainOn]])
  * over synthetic corpora of increasing size at CONSTANT vocabulary
  * shape, so the scaladoc's cost claim — each round is one map-local
  * pair explode + a partial-aggregated count bounded by the pair
  * vocabulary + a map-ONLY replace pass — is a measured near-linear
  * wall-clock curve, not an assertion. (A plan that shuffled the
  * corpus per round, or whose lineage re-ran earlier rounds, would
  * grow superlinearly; the checkpoint-per-round loop tracks corpus
  * size.)
  *
  * Corpus shape: 40 tokens per doc drawn by hash from a 50-token
  * vocabulary — small enough that every round has a clear corpus-wide
  * winner, so all 8 rounds run at every size. Fully deterministic:
  * tokens are hash arithmetic, no RNG.
  *
  * usage: `graft.BpeProbe [sizes...]` (defaults 25000 50000 100000)
  */
object BpeProbe {

  private[graft] def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(1, 40), j ->
        |  concat('w', pmod(hash(id, j), 50))))""".stripMargin)
        .as("text"))

  /** One full training; returns (wall sec, merges learned). */
  private def train(spark: SparkSession, n: Long): (Double, Int) = {
    val t0 = System.nanoTime()
    val (t, merges) = operators.TextOps.bpeTrainOn(corpus(spark, n))
    val sec = (System.nanoTime() - t0) / 1e9
    t.unpersist()
    (sec, merges.length)
  }

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(25000L, 50000L, 100000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // session-level JIT/codegen warmup on a throwaway corpus
    train(spark, 5000L): Unit
    val cells = sizes.map { n =>
      // min-of-2 full trainings per size (the training IS the measured
      // unit — there is no separable warm plan to re-time)
      val (s1, m1) = train(spark, n)
      val (s2, m2) = train(spark, n)
      require(m1 == m2, s"nondeterministic merge count at n=$n")
      s""""$n":{"sec":${"%.3f".format(math.min(s1, s2))},"merges":$m1}"""
    }
    println(s"""{"probe":"bpe_train","sizes":${cells.mkString("{", ",", "}")},"cpus":${Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}

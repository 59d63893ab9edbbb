package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable-ANN-store INGEST probe: measures [[operators.AnnIndex.update]]
  * cost for a CONSTANT-size batch as the store grows, isolating the one
  * term that scales with store size — the membership anti-join, which
  * reads the postings' narrow vec_id column (plus partition discovery)
  * on every incremental batch. Two numbers per store size:
  *
  *  - `append_sec`: update of a fresh batch (anti-join + assignment +
  *    PQ codes + sketch + partitioned append);
  *  - `replay_sec`: the SAME batch again — appends nothing, so this is
  *    the pure membership-check + plan overhead, the floor every
  *    batch pays regardless of its own size.
  *
  * If replay_sec grows linearly with store size, the anti-join's
  * O(store) id-column scan is the dominant incremental-ingest term and
  * a membership manifest (per-cell id ranges or blooms) becomes worth
  * its complexity; if it stays near-flat at these sizes, the narrow
  * column scan is cheap enough that the simpler design wins.
  *
  * Corpus: deterministic hash-arithmetic embeddings (64 dims), labels
  * l0..l7, seeds vec_id 1..8 present in the first build. No RNG.
  *
  * usage: `graft.IngestProbe [storeSizes...]` (defaults 10000 40000 160000)
  */
object IngestProbe {

  private[graft] def corpus(spark: SparkSession, lo: Long,
      hi: Long): DataFrame =
    spark.range(lo, hi).select(
      col("id").as("vec_id"),
      concat(lit("l"), pmod(col("id"), lit(8))).as("label"),
      expr("""transform(sequence(1, 64), j ->
        |  cast(pmod(hash(id, j), 1000) AS float) / cast(1000 AS float))"""
        .stripMargin).as("embedding"))

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(10000L, 40000L, 160000L)
    val batch = 5000L
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // session warmup: one tiny build+update cycle compiles the plans
    locally {
      val d = java.nio.file.Files.createTempDirectory("ingestwarm")
      operators.AnnIndex.build(spark, d.toString, corpus(spark, 0L, 2000L))
      operators.AnnIndex.update(spark, d.toString,
        corpus(spark, 2000L, 3000L))
      Bench.rm(d)
    }
    val cells = sizes.map { s =>
      val dir = java.nio.file.Files.createTempDirectory("ingestprobe")
      try {
        operators.AnnIndex.build(spark, dir.toString, corpus(spark, 0L, s))
        val fresh = corpus(spark, s, s + batch)
        val t0 = System.nanoTime()
        operators.AnnIndex.update(spark, dir.toString, fresh)
        val appendSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        operators.AnnIndex.update(spark, dir.toString, fresh)
        val replaySec = (System.nanoTime() - t1) / 1e9
        s""""$s":{"append_sec":${"%.3f".format(appendSec)},""" +
          s""""replay_sec":${"%.3f".format(replaySec)}}"""
      } finally Bench.rm(dir)
    }
    println(s"""{"probe":"ann_ingest","batch":$batch,"sizes":${
      cells.mkString("{", ",", "}")},"cpus":${
      Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-tier serving probe: times the 8-byte sign-sketch Hamming
  * top-k against the exact cosine top-k on synthetic 64-dim corpora,
  * BOTH arms scanning pre-materialized inputs (localCheckpoint'ed), so
  * the comparison is serving-scan cost only — packing is index-time
  * work in the AnnIndex deployment shape. Corpus: deterministic hash
  * floats in [-1, 1], label = id mod 10, queries = vec_id < 5. No RNG.
  *
  * usage: `graft.BinaryProbe [sizes...]`
  * (default sizes 100000 500000 1000000 2000000)
  */
object BinaryProbe {

  private[graft] def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      pmod(col("id"), lit(10)).cast("int").as("label"),
      expr("""transform(sequence(1, 64), j ->
        |  cast((pmod(hash(id, j), 2001) - 1000) / 1000.0 AS float))"""
        .stripMargin).as("embedding"))

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(100000L, 500000L, 1000000L, 2000000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // warmup: one-time codegen for both arms off the measured curve
    locally {
      val w = corpus(spark, 10000L).localCheckpoint(true)
      val ws = operators.VectorOps.signSketches(w).localCheckpoint(true)
      Bench.checksum(operators.VectorOps.bruteTopkOn(spark, w)): Unit
      Bench.checksum(operators.VectorOps.binaryTopkOn(ws)): Unit
      w.unpersist(); ws.unpersist()
    }
    val cells = sizes.map { n =>
      val emb = corpus(spark, n).localCheckpoint(true)
      val sk = operators.VectorOps.signSketches(emb).localCheckpoint(true)
      val (bSec, _, _, _) = Bench.timedMinOf2(() =>
        Bench.checksum(operators.VectorOps.bruteTopkOn(spark, emb)))
      val (hSec, _, _, _) = Bench.timedMinOf2(() =>
        Bench.checksum(operators.VectorOps.binaryTopkOn(sk)))
      emb.unpersist(); sk.unpersist()
      s""""$n":{"brute_sec":${"%.3f".format(bSec)},""" +
        s""""hamming_sec":${"%.3f".format(hSec)},""" +
        s""""speedup":${"%.1f".format(bSec / hSec)}}"""
    }
    println(s"""{"probe":"binary_serving","sizes":${
      cells.mkString("{", ",", "}")},"cpus":${
      Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Containment-join scale probe: times the blocked (per-source
  * cartesian) form against the PPJoin prefix-filtered twin over
  * ONE-source synthetic corpora at 1% dup density — the regime the
  * TextOps scaladoc claims for each: the cartesian's work is N²/2 set
  * intersections regardless of dup rate, the prefix twin's tracks
  * actual rare-token collisions. Corpus: every 100th doc is the first
  * 10 tokens of its successor (contained, cont = 1.0); all other docs
  * draw 40 tokens from a 2M vocabulary by hash. Deterministic, no RNG.
  *
  * usage: `graft.ContainmentProbe [maxBlocked] [sizes...]`
  * (defaults: blocked timed up to 4000 docs, sizes 1000 2000 4000
  * 20000 50000)
  */
object ContainmentProbe {

  private[graft] def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      lit("src").as("source"),
      expr("""CASE WHEN id % 100 = 0 THEN
        |  concat_ws(' ', transform(sequence(1, 10), j ->
        |    concat('t', pmod(hash(id + 1, j), 2000000))))
        |ELSE
        |  concat_ws(' ', transform(sequence(1, 40), j ->
        |    concat('t', pmod(hash(id, j), 2000000))))
        |END""".stripMargin).as("text"))

  def main(args: Array[String]): Unit = {
    val maxBlocked = if (args.nonEmpty) args(0).toLong else 4000L
    val sizes =
      if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(1000L, 2000L, 4000L, 20000L, 50000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // session warmup (SimhashProbe's lesson: the first size otherwise
    // carries the one-time codegen cost and skews the curve)
    Bench.checksum(
      operators.TextOps.containmentPrefixPairsOn(corpus(spark, 500L))): Unit
    Bench.checksum(
      operators.TextOps.containmentPairsOn(corpus(spark, 500L))): Unit
    val cells = sizes.map { n =>
      val pre = operators.TextOps.containmentPrefixPairsOn(corpus(spark, n))
      val pairs = pre.count()
      val (pSec, _, _, _) = Bench.timedMinOf2(() => Bench.checksum(pre))
      val blocked =
        if (n <= maxBlocked) {
          val b = operators.TextOps.containmentPairsOn(corpus(spark, n))
          val (bSec, _, _, _) = Bench.timedMinOf2(() => Bench.checksum(b))
          s""","blocked_sec":${"%.3f".format(bSec)}"""
        } else ""
      s""""$n":{"prefix_sec":${"%.3f".format(pSec)},"pairs":$pairs$blocked}"""
    }
    println(s"""{"probe":"containment_join","sizes":${cells.mkString("{", ",", "}")},"cpus":${Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed-components scale probe (VERDICT r9 item #5): the
  * near-dup clustering routes ≤1M-edge graphs to driver union-find and
  * larger graphs to the distributed min-label fixpoint
  * ([[graft.operators.TextOps.components]]) — but the distributed leg
  * had never been *measured* at a size that exercises it. This main
  * synthesizes near-dup-shaped graphs (disjoint 11-node families —
  * family COUNT scales, family SIZE stays constant, exactly how the
  * banded MinHash pair generator's output grows with corpus size) at
  * 1M/4M/10M edges in two diameter regimes, and times BOTH legs on
  * each, printing one JSON line per (shape, size) cell for PERF.md:
  *
  *   - `star`: hub + 10 leaves per family (diameter 2) — the dense
  *     duplicate-family shape real near-dup graphs have; the fixpoint
  *     should converge in ~3 rounds REGARDLESS of edge count.
  *   - `chain`: 11-node path per family (diameter 10) — the worst
  *     plausible family diameter; rounds ≈ 10, again size-independent.
  *
  * The claim under test: fixpoint ROUNDS are topology-bound (constant
  * as edges grow 10×) and per-round cost is ~linear in edges, while
  * the driver leg's collect grows linearly with no parallelism —
  * pinning WHERE the 1M cutover belongs with data instead of argument.
  *
  * usage: `graft.ComponentsProbe [edgeCounts...]` (default 1000000
  * 4000000 10000000)
  */
object ComponentsProbe {

  /** `nEdges/10` disjoint chain families: node ids `f*11 + 0..10`,
    * edges (pos, pos+1) — diameter 10.
    */
  private def chainPairs(spark: org.apache.spark.sql.SparkSession,
      nEdges: Long): DataFrame =
    spark.range(nEdges).select(
      expr("(id div 10) * 11 + (id % 10)").as("a_id"),
      expr("(id div 10) * 11 + (id % 10) + 1").as("b_id"))

  /** `nEdges/10` disjoint star families: hub `f*11`, leaves
    * `f*11 + 1..10` — diameter 2.
    */
  private def starPairs(spark: org.apache.spark.sql.SparkSession,
      nEdges: Long): DataFrame =
    spark.range(nEdges).select(
      expr("(id div 10) * 11").as("a_id"),
      expr("(id div 10) * 11 + (id % 10) + 1").as("b_id"))

  /** `nEdges/100` disjoint 101-node paths — diameter 100, the
    * pathological regime where the fixpoint's rounds (≈ diameter + 1)
    * dwarf the contraction's log-bounded count.
    */
  private def longChainPairs(spark: org.apache.spark.sql.SparkSession,
      nEdges: Long): DataFrame =
    spark.range(nEdges).select(
      expr("(id div 100) * 101 + (id % 100)").as("a_id"),
      expr("(id div 100) * 101 + (id % 100) + 1").as("b_id"))

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000000L, 4000000L, 10000000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    for ((shape, gen) <- Seq(
        ("star", starPairs _), ("chain", chainPairs _),
        ("longchain", longChainPairs _));
        // longchain runs the smallest size only: the fixpoint arm costs
        // ~diameter rounds (101 at this shape), so larger cells would
        // add minutes to re-prove an already-unambiguous regime
        n <- (if (shape == "longchain") sizes.take(1) else sizes)) {
      // checkpoint the pair list so generation cost stays out of the
      // timed arms (the minhash pipeline pays its own generation)
      val pairs = gen(spark, n).localCheckpoint(true)
      // the DEFAULT distributed leg: alternating star contraction
      val (starSec, nodes) =
        time(operators.TextOps.components(pairs, localEdgeLimit = 0L)
          .count())
      val starRounds = operators.TextOps.lastStarRounds.get
      // the reference it replaced: diameter-bound min-label fixpoint
      val (fixSec, nodes3) =
        time(operators.TextOps.componentsFixpoint(pairs).count())
      val rounds = operators.TextOps.lastFixpointRounds.get
      val (drvSec, nodes2) =
        time(operators.TextOps
          .components(pairs, localEdgeLimit = Long.MaxValue).count())
      require(nodes == nodes2 && nodes == nodes3,
        s"paths disagree: $nodes vs $nodes2 vs $nodes3")
      println(
        s"""{"probe":"components","shape":"$shape","edges":$n,""" +
          s""""nodes":$nodes,"star_sec":${"%.2f".format(starSec)},""" +
          s""""star_rounds":$starRounds,""" +
          s""""fixpoint_sec":${"%.2f".format(fixSec)},""" +
          s""""fixpoint_rounds":$rounds,""" +
          s""""driver_sec":${"%.2f".format(drvSec)}}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Measures the training-order crossover the trainOrderRanged scaladoc
  * claims: the oracle-parity global row_number window is ONE
  * single-partition sort (a serialization point), the ranged form is a
  * range exchange + parallel within-partition sorts + a ≤parts-row
  * offset collect. `graft.OrderProbe [rows] [rows...]` times both arms
  * at each size (min-of-2, Bench methodology) and asserts their
  * checksums agree — the positions are partitioning-invariant by
  * construction, so the two arms must stay bit-identical while their
  * costs diverge.
  */
object OrderProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(10_000_000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    sizes.foreach { n =>
      val keyed = spark.range(n).select(col("id").as("doc_id"),
        sha2(concat(lit("seed42:"), col("id").cast("string")), 256)
          .as("shuffle_key"))
        .localCheckpoint(true)
      val (gSec, gChk, _, _) = Bench.timedMinOf2(() =>
        Bench.checksum(operators.TextOps.trainOrderGlobalOn(keyed)))
      val (rSec, rChk, _, _) = Bench.timedMinOf2(() =>
        Bench.checksum(
          operators.TextOps.trainOrderRangedOn(spark, keyed, parts = 32)))
      require(gChk == rChk,
        s"order probe: arms diverged at n=$n ($gChk vs $rChk)")
      println(f"""{"probe":"train_order","rows":$n,""" +
        f""""global_sec":$gSec%.3f,"ranged_sec":$rSec%.3f,""" +
        f""""speedup":${gSec / rSec}%.2f,"checksum":$gChk}""")
      keyed.unpersist(true): Unit
    }
    spark.stop()
  }
}

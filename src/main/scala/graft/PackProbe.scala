package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the pack-manifest window crossover the sharded form exists
  * for (the OrderProbe discipline applied to the OTHER global-window
  * parity shape): `docs_pack_segments`' running token sum is ONE
  * unpartitioned window — a single-partition sort — while
  * `docs_pack_segments_sharded` windows per shard (one hash exchange,
  * 1/shards of the window state each). The kernels below mirror
  * TextOps.packSegments / packSegmentsSharded (TextOps.scala:1732,
  * :1839) on a synthetic (doc_id, nt) frame so the probe times the
  * WINDOW + explode arithmetic, not tokenization — and PackProbeSpec
  * pins the mirror against the gated query's output on real data, so
  * the copy cannot silently drift from the kernel it claims to time.
  * The two manifests differ by design (different concatenation
  * streams), so the asserted invariant is coverage: both tile exactly
  * Σnt tokens.
  *
  * `graft.PackProbe [rows...]` — per size, min-of-2 seconds per arm.
  */
object PackProbe {
  private val B = 2048L

  private[graft] def segments(df: DataFrame, w: org.apache.spark.sql
      .expressions.WindowSpec, shardCols: Seq[String]): DataFrame =
    df.withColumn("e", sum("nt").over(w))
      .withColumn("s", col("e") - col("nt"))
      .filter(col("nt") > 0)
      .select(shardCols.map(col) ++ Seq(col("doc_id"), col("nt"),
        col("s"),
        explode(expr(s"sequence(s div $B, (e - 1) div $B)"))
          .as("pack_id")): _*)
      .select(shardCols.map(col) ++ Seq(col("pack_id"), col("doc_id"),
        greatest(lit(0L), col("pack_id") * B - col("s")).as("doc_from"),
        (least(col("nt"), (col("pack_id") + 1) * B - col("s")) -
          greatest(lit(0L), col("pack_id") * B - col("s")))
          .as("seg_len"),
        greatest(col("s") - col("pack_id") * B, lit(0L))
          .as("pack_off")): _*)

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(10_000_000L)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    sizes.foreach { n =>
      val docs = spark.range(n).select(col("id").as("doc_id"),
        (pmod(xxhash64(col("id")), lit(200L)) + 1L).as("nt"))
        .localCheckpoint(true)
      val totalTokens =
        docs.agg(sum("nt")).collect()(0).getLong(0)
      def covered(m: DataFrame): Long =
        m.agg(sum("seg_len")).collect()(0).getLong(0)

      val wGlobal = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val (gSec, gCov, _, _) = Bench.timedMinOf2(() =>
        covered(segments(docs, wGlobal, Nil)))
      val sharded = docs.withColumn("shard", col("doc_id") % 32)
      val wShard = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val (sSec, sCov, _, _) = Bench.timedMinOf2(() =>
        covered(segments(sharded, wShard, Seq("shard"))))
      require(gCov == totalTokens && sCov == totalTokens,
        s"pack probe: coverage broke at n=$n " +
          s"($gCov / $sCov vs $totalTokens)")
      println(f"""{"probe":"pack_manifest","rows":$n,""" +
        f""""tokens":$totalTokens,"global_sec":$gSec%.3f,""" +
        f""""sharded_sec":$sSec%.3f,"speedup":${gSec / sSec}%.2f}""")
      docs.unpersist(true): Unit
    }
    spark.stop()
  }
}

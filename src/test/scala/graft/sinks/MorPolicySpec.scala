package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Ratio-triggered MOR compaction (the lakehouse maintenance POLICY
  * over the appendDelta/checkpointMor mechanisms): a LONG stream of
  * small upsert batches must keep read amplification bounded — after
  * every policy call the log's bytes stay within `maxLogRatio` of the
  * base's — while each append writes only its batch, folds fire
  * sparsely (amortized over many batches, not per batch), and the
  * final resolved state is exactly last-writer-wins over everything
  * appended.
  */
class MorPolicySpec extends SparkSpecBase {

  test("a long appendDelta stream keeps log/base bytes bounded; folds " +
    "are sparse; writes stay proportional to the batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("morpolicy").toString
    val idx = new ParquetIndex(root)
    // base 500× the batch size: with a small base, per-file parquet
    // overhead makes every 40-row delta a large fraction of the base
    // and the ratio fires near-every batch — the realistic regime (and
    // the one the amortization assertion is about) is base ≫ batch
    val n = 20000
    val base = spark.range(n).select(
      concat(lit("k"), col("id")).as("k"),
      lit(0L).as("ts"),
      concat(lit("v"), col("id")).as("v"))
    idx.write(base): Unit

    // driver-side truth: last-writer-wins by ts (ties impossible — ts
    // strictly increases per batch)
    val expected = scala.collection.mutable.Map.empty[String, (Long, String)]
    (0 until n).foreach(i => expected(s"k$i") = (0L, s"v$i"))

    val ratio = 0.25
    val batches = 30
    var folds = 0
    var maxPostRatio = 0.0
    var maxDeltaBytes = 0L
    (0 until batches).foreach { b =>
      val keys = (0 until 40).map(j => (b * 37 + j * 53) % n)
      val ts = (b + 1).toLong
      keys.foreach(i => expected(s"k$i") = (ts, s"b$b-$i"))
      val batch = keys.map(i => (s"k$i", ts, s"b$b-$i"))
        .toDF("k", "ts", "v")
      val before = idx.morLogBytes
      idx.appendDelta(spark, batch): Unit
      // append cost is the batch's own parquet, never the index
      maxDeltaBytes = math.max(maxDeltaBytes, idx.morLogBytes - before)
      if (idx.checkpointMorIfNeeded(spark, "k", "ts",
          maxLogRatio = ratio).isDefined)
        folds += 1
      // the bounded-read-amplification invariant: after the policy
      // runs, a reader re-merges at most ratio × base extra bytes
      maxPostRatio = math.max(maxPostRatio,
        idx.morLogBytes.toDouble / idx.baseBytes)
    }
    assert(maxPostRatio <= ratio,
      f"log exceeded budget after policy: $maxPostRatio%.3f > $ratio")
    assert(folds >= 1, "ratio never triggered across the whole run")
    assert(folds * 3 <= batches,
      s"$folds folds in $batches batches — the policy isn't amortizing")
    assert(maxDeltaBytes * 4 < idx.baseBytes,
      s"a delta write ($maxDeltaBytes B) is not small vs the base " +
        s"(${idx.baseBytes} B) — write amplification crept in")

    // final state: exactly LWW over base + every appended batch
    val got = idx.readMor(spark, "k", "ts").get
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got == expected.toMap)

    // and once folded + log clear, the policy is a no-op
    idx.checkpointMor(spark, "k", "ts"): Unit
    assert(idx.checkpointMorIfNeeded(spark, "k", "ts",
      maxLogRatio = ratio).isEmpty)
    assert(idx.morLogBytes == 0L)
  }
}

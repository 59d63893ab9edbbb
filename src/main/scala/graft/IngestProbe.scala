package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable-ANN-store INGEST probe: measures [[operators.AnnIndex.update]]
  * cost for a CONSTANT-size batch as the store grows. The default mode
  * times the DEFAULT ingest path (manifest membership since r11). Two
  * numbers per store size:
  *
  *  - `append_sec`: update of a fresh batch (membership + assignment +
  *    PQ codes + sketch + partitioned append);
  *  - `replay_sec`: the SAME batch again — appends nothing, so this is
  *    the pure membership-check + plan overhead, the floor every
  *    batch pays regardless of its own size.
  *
  * The `manifest` mode separates the two membership paths explicitly
  * (legacy O(store) id-column scan vs manifest range+bloom) — the
  * measurement that justified making the manifest the default.
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

  /** Manifest-vs-scan membership probe (VERDICT r9 item #7): for each
    * store size, measure the per-batch membership floor of BOTH paths —
    * the default anti-join (reads the store's vec_id column) and the
    * flag-gated manifest (range + bloom; reads ~KBs however big the
    * store). Quantizer quality is irrelevant to membership cost, so
    * stores build with `lloydRounds = 0` to keep the 5M-vector cell
    * tractable. Columns per size:
    *   scan_append/scan_replay — the default path (r9's numbers);
    *   manifest_bootstrap — first manifest call on a pre-manifest
    *     store: one O(store) bloom pass, paid once;
    *   manifest_append — a fresh (monotonic-id) batch: membership
    *     decided by the manifest alone, zero postings reads — the
    *     number that must stay FLAT as the store grows;
    *   manifest_replay — an all-duplicate batch: bloom says maybe,
    *     the exact anti-join confirms (the unavoidable worst case —
    *     expected to track scan_replay).
    */
  private def manifestMode(spark: SparkSession,
      sizes: Seq[Long], batch: Long): Unit = {
    val cells = sizes.map { s =>
      val dir = java.nio.file.Files.createTempDirectory("ingestman")
      try {
        operators.AnnIndex.build(spark, dir.toString,
          corpus(spark, 0L, s), lloydRounds = 0)
        // build() maintains a manifest by default now — drop it so the
        // scan arms measure the PURE legacy path and the boot arm is a
        // genuine first-manifest-call on a pre-manifest store
        Bench.rm(java.nio.file.Paths.get(dir.toString, "manifest"))
        def timed(f: => Unit): Double = {
          val t0 = System.nanoTime(); f
          (System.nanoTime() - t0) / 1e9
        }
        val f1 = corpus(spark, s, s + batch)
        // the LEGACY scan path is now behind the compatibility flag
        // (manifest is the default since r11) — probe it explicitly
        val scanAppend = timed(operators.AnnIndex.update(
          spark, dir.toString, f1, useManifest = false))
        val scanReplay = timed(operators.AnnIndex.update(
          spark, dir.toString, f1, useManifest = false))
        val f2 = corpus(spark, s + batch, s + 2 * batch)
        val boot = timed(operators.AnnIndex.update(spark, dir.toString,
          f2, useManifest = true))
        val f3 = corpus(spark, s + 2 * batch, s + 3 * batch)
        val manAppend = timed(operators.AnnIndex.update(spark,
          dir.toString, f3, useManifest = true))
        val manReplay = timed(operators.AnnIndex.update(spark,
          dir.toString, f3, useManifest = true))
        System.err.println(f"[ingest-manifest] size=$s scan_append=" +
          f"$scanAppend%.2f scan_replay=$scanReplay%.2f boot=$boot%.2f " +
          f"manifest_append=$manAppend%.2f manifest_replay=$manReplay%.2f")
        s""""$s":{"scan_append":${"%.3f".format(scanAppend)},""" +
          s""""scan_replay":${"%.3f".format(scanReplay)},""" +
          s""""manifest_bootstrap":${"%.3f".format(boot)},""" +
          s""""manifest_append":${"%.3f".format(manAppend)},""" +
          s""""manifest_replay":${"%.3f".format(manReplay)}}"""
      } finally Bench.rm(dir)
    }
    println(s"""{"probe":"ann_ingest_manifest","batch":$batch,"sizes":${
      cells.mkString("{", ",", "}")},"cpus":${
      Runtime.getRuntime.availableProcessors}}""")
  }

  def main(args: Array[String]): Unit = {
    val manifest = args.headOption.contains("manifest")
    val rest = if (manifest) args.drop(1).toSeq else args.toSeq
    val sizes =
      if (rest.nonEmpty) rest.map(_.toLong)
      else if (manifest) Seq(160000L, 640000L, 2500000L, 5000000L)
      else Seq(10000L, 40000L, 160000L)
    val batch = 5000L
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (manifest) {
      manifestMode(spark, sizes, batch)
      spark.stop()
      return
    }
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

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.SyntheticFs
import graft.operators.FsOps

/** Incremental-vs-recompute rollup cost probe: the scale claim behind
  * `fs_dir_rollup_incremental` is that patching the stored snapshot
  * with a bounded change feed beats re-aggregating the corpus — this
  * main MEASURES it on k× replicas of sf0.1 (the ScaleProbe recipe).
  * At each k it times
  *   - `recompute`: the full O(files × depth) ancestor aggregate
  *     (what the reference does every scan, directory_size.py:39-60),
  *   - `fold`: [[FsOps.dirRollupFoldDelta]] of a FIXED-size feed (the
  *     copy-0 slice, identical rows at every k) into the stored prior —
  *     the delta explode is O(|Δ| × depth) flat; the remaining cost is
  *     the snapshot scan/rewrite, linear in |dirs| with no file-scan
  *     term,
  *   - `touched`: the fold restricted to directories the feed actually
  *     touches — the changed-dirs upsert a partitioned snapshot store
  *     serves (write ∝ touched partitions).
  *
  * usage: `graft.RollupProbe [factors...]` (defaults 1 4 10); prints
  * one JSON line per factor.
  */
object RollupProbe {

  def main(args: Array[String]): Unit = {
    val factors =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 4, 10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // the feed slice must be the SAME rows at every k: copy 0 is the
    // keys at or below the source corpus's max order key
    val baseMax = spark.read.parquet(s"$src/orders.parquet")
      .agg(max("o_orderkey")).head().getLong(0)

    factors.foreach { k =>
      val dir = ScaleProbe.scaled(spark, src, k)
      val tmp = Files.createTempDirectory(s"rollupprobe$k")
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val recompute = timed {
        FsOps.dirRollupPrior(spark, dir)
          .write.mode("overwrite").parquet(s"$tmp/prior")
      }
      val files0 = SyntheticFs.files(spark, dir)
        .filter(col("l_orderkey") <= baseMax)
      val slice = files0
        .filter(col("l_orderkey") % 11 === 0 || col("l_orderkey") % 7 === 0)
        .select(col("filepath"),
          when(col("l_orderkey") % 11 === 0, -col("size_bytes"))
            .otherwise(lit(777L)).as("delta_size"),
          when(col("l_orderkey") % 11 === 0, lit(-1L)).otherwise(lit(0L))
            .as("delta_count"))
        .unionByName(files0.filter(col("l_orderkey") % 13 === 0)
          .select(concat(col("filepath"), lit(".new")).as("filepath"),
            (col("size_bytes") + 13).cast("long").as("delta_size"),
            lit(1L).as("delta_count")))
        .localCheckpoint()
      val nDelta = slice.count()
      val fold = timed {
        FsOps.dirRollupFoldDelta(
            spark.read.parquet(s"$tmp/prior"), slice)
          .write.mode("overwrite").parquet(s"$tmp/next")
      }
      val touched = timed {
        // changed-dirs upsert, modeled end-to-end (r13 ADVICE: the
        // old shape folded the ENTIRE prior before the semi-join, so
        // touched_sec included the whole-snapshot fold and couldn't
        // isolate the write-∝-touched claim): derive the touched
        // ancestor set from the delta, restrict the PRIOR to those
        // keys first, and fold only that slice — the work a
        // directory_path-partitioned snapshot store actually does.
        val touchedDirs = slice
          .select(col("filepath"))
          .distinct()
          // same d >= 2 guard as ancestorSizePairs: sequence(2, 1)
          // DESCENDS in Spark and would mint bogus ancestors
          .filter(size(split(col("filepath"), "/")) - 1 >= 2)
          .select(explode(expr(
            "transform(sequence(2, size(split(filepath, '/')) - 1), " +
              "k -> substring_index(filepath, '/', k))"))
            .as("directory_path"))
          .distinct()
        val priorTouched = spark.read.parquet(s"$tmp/prior")
          .join(touchedDirs, Seq("directory_path"), "left_semi")
        FsOps.dirRollupFoldDelta(priorTouched, slice)
          .write.mode("overwrite").parquet(s"$tmp/touched")
      }
      val touchedRows = spark.read.parquet(s"$tmp/touched").count()
      val priorRows = spark.read.parquet(s"$tmp/prior").count()
      println(s"""{"k":$k,"recompute_sec":${f"$recompute%.3f"},""" +
        s""""fold_sec":${f"$fold%.3f"},"touched_sec":${f"$touched%.3f"},""" +
        s""""delta_rows":$nDelta,"snapshot_dirs":$priorRows,""" +
        s""""touched_dirs":$touchedRows}""")
      Bench.rm(tmp)
      Bench.rm(java.nio.file.Paths.get(dir))
    }
    spark.stop()
  }
}

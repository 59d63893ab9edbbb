package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout: co-clusters TWO numeric columns
  * into the same files so parquet min/max statistics prune reads for
  * predicates on EITHER column — the layout-level complement of
  * [[ParquetIndex]]'s first-segment partition pruning (which serves one
  * key; this serves two with one copy of the data).
  *
  * A linear sort on column A gives perfect A-spans but every file
  * carries the FULL range of B, so B-predicates scan everything.
  * Interleaving the bits of both columns' 16-bit quantized positions
  * makes each written file cover a small square of the (A, B) plane:
  * both columns' per-file spans shrink to ~sqrt(files) of the range,
  * and parquet row-group skipping (or a file-stats manifest at the
  * table level) turns either predicate into a pruned read. At 100 TB
  * this is the difference between "fast lookups on the sort key only"
  * and "fast lookups on both of size and mtime" for one storage cost.
  *
  * The z-value is a pure codegen'd column expression (shift/mask/or
  * chain — no UDF); the layout pass is one range repartition + local
  * sort on it, i.e. exactly the cost of a global sort on a single
  * derived key.
  */
object ZOrderLayout {

  /** Morton key of two columns quantized to 16-bit positions over
    * [aMin, aMax] × [bMin, bMax] (inclusive ranges, computed by the
    * caller — one tiny agg — so the expression stays literal-only and
    * whole-stage codegen'd). The interleave itself is the NATIVE
    * [[graft.functions.ZOrder2]] Catalyst expression (magic-number bit
    * spread with `doGenCode`), resolved from the function registry —
    * callers outside [[write]] must have run
    * `GraftFunctions.register(spark)` first.
    */
  def zValue(a: Column, b: Column, aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): Column = {
    def quant(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0)
      // 64-bit-safe linear scale to 0..65535 without overflow for any
      // long range: scale in double, clamp, floor
      else least(lit(65535L), greatest(lit(0L),
        floor((c.cast("double") - lit(lo.toDouble)) /
          lit((hi - lo).toDouble) * 65535.0).cast("long"))).cast("int")
    call_function("zorder2", quant(a, aMin, aMax), quant(b, bMin, bMax))
  }

  /** Write `df` to `dir` z-ordered on (`colA`, `colB`) into `files`
    * files: range-partition on the z-value (even file sizes under skew
    * via range sampling), sort within each partition, drop the helper
    * column at the writer.
    */
  def write(df: DataFrame, dir: String, colA: String, colB: String,
      files: Int): Unit = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val bounds = df.agg(
      min(col(colA)).cast("long").as("a_lo"),
      max(col(colA)).cast("long").as("a_hi"),
      min(col(colB)).cast("long").as("b_lo"),
      max(col(colB)).cast("long").as("b_hi")).collect()(0)
    if (bounds.isNullAt(0) || bounds.isNullAt(2)) {
      // empty input (or all-null cluster column): write the empty-but-
      // valid layout instead of NPEing on the null bounds
      df.write.mode("overwrite").parquet(dir)
      return
    }
    val z = zValue(col(colA), col(colB), bounds.getLong(0),
      bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file (min, max) spans of `c` in a written layout — the
    * fraction of files a point/range predicate on `c` must read, which
    * is what a table-level stats manifest (or parquet's own row-group
    * stats) prunes by. Diagnostic used by the spec and PERF probes.
    */
  def fileSpans(df: DataFrame, c: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(c)).cast("long").as("lo"),
        max(col(c)).cast("long").as("hi"))

  /** Materialize the per-file min/max manifest for `cols` at
    * `dir/_manifest` (underscore prefix = invisible to Spark's file
    * index, the `_delta_log` convention). One narrow scan at write
    * time buys file-level skipping for every later read.
    */
  def writeManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, cols: Seq[String]): Unit = {
    val base = spark.read.parquet(dir)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"${c}_lo"),
      max(col(c)).cast("long").as(s"${c}_hi")))
    base.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")
  }

  /** Read `dir` with FILE-LEVEL pruning from the manifest: only files
    * whose [lo, hi] span of `c` overlaps [lo, hi] are opened; the exact
    * row predicate is re-applied on top (span overlap is necessary, not
    * sufficient). The manifest is |files| rows — collecting the
    * surviving paths to the driver is the same plan Delta/Iceberg
    * readers run. Returns the same rows as
    * `read.parquet(dir).filter(c between lo and hi)`.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      c: String, lo: Long, hi: Long): DataFrame = {
    val files = spark.read.parquet(s"$dir/_manifest")
      .filter(col(s"${c}_hi") >= lo && col(s"${c}_lo") <= hi)
      .select("file").collect().map(_.getString(0))
    val base =
      if (files.isEmpty)
        spark.read.parquet(dir).limit(0) // schema-preserving empty
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col(c).cast("long").between(lo, hi))
  }
}

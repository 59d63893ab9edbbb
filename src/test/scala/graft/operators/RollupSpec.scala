package graft.operators

import graft.SparkSpecBase

/** The two J3 implementations must agree where their domains overlap:
  * the theta-join form computes depth-1 directories only, so the
  * ancestor-explode form restricted to depth-1 must match it row-for-row
  * (SURVEY.md §7.4 risk 2: recursive-LIKE semantics vs explode).
  */
class RollupSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("explode rollup restricted to depth-1 equals theta rollup") {
    val theta = FsOps.dirRollupTheta(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val explode = FsOps.dirRollupExplode(spark, sfDir)
      .filter("length(directory_path) - length(replace(directory_path, '/', '')) = 1")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(theta.nonEmpty)
    assert(theta == explode)
  }

  test("rollup totals equal the whole-tree file total at the root level") {
    val total = FsOps.totalSize(spark, sfDir).collect()(0).getLong(0)
    val depth1Sum = FsOps.dirRollupTheta(spark, sfDir).collect()
      .map(_.getLong(1)).sum
    // every file lives under exactly one depth-1 dir → sums must agree
    assert(depth1Sum == total)
  }

  test("incremental delta fold equals a from-scratch recompute of the " +
      "post-change corpus (add + resize + delete, delete wins over " +
      "resize)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq(
      ("/a/b/f1", 100L), ("/a/b/f2", 50L), ("/a/c/f3", 10L),
      ("/a/c/f4", 7L), ("/d/e/f5", 1L))
      .toDF("filepath", "size_bytes")
    val dirs = Seq("/a", "/a/b", "/a/c", "/d", "/d/e")
      .toDF("directory_path")
    val prior = FsOps.ancestorSizePairs(base)
      .groupBy("directory_path")
      .agg(sum("size_bytes").as("sz"), count(lit(1)).as("fc"))
    // f1 deleted; f3 resized 10 → 25; f6 added under /d/e; f5 deleted
    // AND "resized" — the delete must win (delta −old, count −1)
    val changes = Seq(
      ("/a/b/f1", -100L, -1L),
      ("/a/c/f3", 15L, 0L),
      ("/d/e/f6", 30L, 1L),
      ("/d/e/f5", -1L, -1L))
      .toDF("filepath", "delta_size", "delta_count")
    val post = Seq(
      ("/a/b/f2", 50L), ("/a/c/f3", 25L), ("/a/c/f4", 7L),
      ("/d/e/f6", 30L))
      .toDF("filepath", "size_bytes")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val incremental = FsOps.dirRollupApplyDelta(prior, dirs, changes)
    val recompute = dirs
      .join(FsOps.ancestorSizePairs(post).groupBy("directory_path")
        .agg(sum("size_bytes").as("sz"), count(lit(1)).as("fc")),
        Seq("directory_path"), "left")
      .select(col("directory_path"),
        coalesce(col("sz"), lit(0L)).cast("long").as("total_size"),
        coalesce(col("fc"), lit(0L)).cast("long").as("file_count"))
    assert(rows(incremental) == rows(recompute))
    // a fully-emptied dir reads (0, 0), it is not dropped
    assert(rows(incremental).exists(t => t._1 == "/a/b" && t._2 == 50L))
  }

  test("fs_dir_rollup_incremental equals the explode rollup over the " +
      "post-change corpus derived in Spark") {
    import org.apache.spark.sql.functions._
    val f = graft.model.SyntheticFs.files(spark, sfDir)
    val post = f.filter(col("l_orderkey") % 11 =!= 0)
      .select(col("filepath"),
        when(col("l_orderkey") % 7 === 0, col("size_bytes") + 777)
          .otherwise(col("size_bytes")).as("size_bytes"))
      .unionByName(f.filter(col("l_orderkey") % 13 === 0)
        .select(concat(col("filepath"), lit(".new")).as("filepath"),
          (col("size_bytes") + 13).as("size_bytes")))
    val dirs = graft.model.SyntheticFs.entries(spark, sfDir)
      .filter(col("type") === "directory")
      .select(col("filepath").as("directory_path"))
    val recompute = dirs
      .join(FsOps.ancestorSizePairs(post).groupBy("directory_path")
        .agg(sum("size_bytes").as("sz"), count(lit(1)).as("fc")),
        Seq("directory_path"), "left")
      .select(col("directory_path"),
        coalesce(col("sz"), lit(0L)).cast("long").as("total_size"),
        coalesce(col("fc"), lit(0L)).cast("long").as("file_count"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val incremental = FsOps.dirRollupIncremental(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(incremental.nonEmpty)
    assert(incremental == recompute)
  }
}

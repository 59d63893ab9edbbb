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
}

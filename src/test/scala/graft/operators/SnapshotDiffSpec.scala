package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.model.SyntheticFs

/** Algebraic check of the full-outer diff: each change class equals the
  * set the generation rules imply (removed = deleted keys, added = the
  * spawned `.new` siblings, modified = touched-but-kept keys), and the
  * classes partition the delta.
  */
class SnapshotDiffSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("diff classes match the generation arithmetic exactly") {
    val files = SyntheticFs.files(spark, sf)
    val byClass = FsOps.snapshotDiff(spark, sf).collect()
      .groupBy(_.getAs[String]("change"))
      .view.mapValues(_.map(_.getAs[String]("relative_path")).toSet).toMap

    val removed = files.filter(col("l_orderkey") % 11 === 0)
      .select("relative_path").collect().map(_.getString(0)).toSet
    val added = files.filter(col("l_orderkey") % 13 === 0)
      .select(concat(col("relative_path"), lit(".new")))
      .collect().map(_.getString(0)).toSet
    val modified = files
      .filter(col("l_orderkey") % 7 === 0 && col("l_orderkey") % 11 =!= 0)
      .select("relative_path").collect().map(_.getString(0)).toSet

    assert(byClass("removed") == removed)
    assert(byClass("added") == added)
    assert(byClass("modified") == modified)
    // the three classes are disjoint (added paths carry the .new suffix,
    // removed/modified split on the %11 carve)
    assert(removed.intersect(modified).isEmpty)
  }
}

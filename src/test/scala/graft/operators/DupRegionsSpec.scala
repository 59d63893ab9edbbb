package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase

/** Pins the region-merge semantics the oracle's hash can't localize:
  * overlapping 8-gram duplicate windows must fuse into ONE maximal
  * region (the report says "one 10-token boilerplate block", not
  * "three 8-gram matches"), and the corpus-wide first occurrence is
  * never reported as a region.
  */
class DupRegionsSpec extends SparkSpecBase {

  test("overlapping duplicate windows merge into one maximal region") {
    val dir = Files.createTempDirectory("dupregions").toString
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (0L, s"$run xa xb", "en", "src0", 60L),      // first occurrence
      (1L, s"ya yb $run", "en", "src0", 60L))      // duplicate, offset 2
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextOps.dupRegions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0 holds every gram's corpus-first occurrence — no regions;
    // doc 1's three overlapping scrubbed 8-gram windows (starts 3,4,5)
    // cover token positions 3..12 = ONE region of length 10
    assert(got.toSeq == Seq((1L, 3L, 12L, 10L)))
  }
}

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

  test("min-length scrub keeps incidental short matches the " +
    "window-granular scrub would cut") {
    val dir = Files.createTempDirectory("dupminlen").toString
    val long = (1 to 20).map(i => s"L$i").mkString(" ")  // 20-token dup
    val short = (1 to 9).map(i => s"S$i").mkString(" ")  // 9-token dup
    val rows = Seq(
      (0L, s"$long p1 p2 $short", "en", "src0", 60L),  // first occs
      (1L, s"q1 $long q2 q3 q4 q5 q6 q7", "en", "src0", 60L),
      (2L, s"r1 r2 r3 $short r4 r5 r6 r7 r8 r9 r10", "en", "src0", 60L))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def byDoc(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val full = byDoc(TextOps.spanScrub(spark, dir))
    val min16 = byDoc(TextOps.spanScrubMinLen(spark, dir))
    // doc 1's 20-token duplicated block: scrubbed by BOTH policies
    assert(full(1L) == 20L && min16(1L) == 20L)
    // doc 2's 9-token duplicated block: its two overlapping 8-gram
    // windows cover 9 positions — cut by the window-granular policy,
    // KEPT by the ≥16 policy (the incidental-idiom case)
    assert(full(2L) == 9L && min16(2L) == 0L)
    // the policy only ever scrubs a subset
    assert(min16.forall { case (d, n) => n <= full(d) })
  }
}

package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase

/** Pins [[MultimodalOps.byteHistogram]]'s byte-accuracy claim on input
  * the gate corpus never exercises: multi-byte UTF-8 text, where a
  * character-level substr would miscount (3 chars) while the hex-window
  * extraction must see the 6 underlying bytes.
  */
class ByteHistogramSpec extends SparkSpecBase {

  test("multi-byte characters are counted as bytes, not characters") {
    val dir = Files.createTempDirectory("bytehist").toString
    val rows = Seq(
      (0L, "ééé", "fr", "src0", 3L), // é é é = c3a9 ×3
      (1L, "abca", "en", "src0", 4L))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = MultimodalOps.byteHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq

    // doc 0: 6 BYTES (not 3 chars), two distinct byte values, and the
    // c3/a9 tie (3 each) breaks to the lexicographically lower "a9"
    // doc 1: 'a' dominates with 2 of 4 bytes
    assert(got == Seq(
      (0L, 6L, 2L, "a9", 3L),
      (1L, 4L, 3L, "61", 2L)))
  }
}

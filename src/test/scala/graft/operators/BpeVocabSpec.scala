package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase

/** Pins the [[TextOps.bpeVocab]] merge semantics a hash-compare alone
  * can't localize: greedy left-to-right application (overlapping
  * occurrences merge ONCE, adjacent occurrences BOTH merge — the two
  * cases where the shared-separator replace trick could silently
  * diverge from a real BPE trainer), the (count DESC, a ASC, b ASC)
  * tie-break, and dry termination when the corpus runs out of pairs
  * before the round budget does.
  */
class BpeVocabSpec extends SparkSpecBase {

  private def corpusDir(): String = {
    val dir = Files.createTempDirectory("bpevocab").toString
    val rows = Seq(
      (0L, "a b a b", "en", "src0", 7L), // adjacent (a,b) pairs
      (1L, "a a a", "en", "src0", 5L),   // overlapping (a,a) pairs
      (2L, "c d", "en", "src0", 3L))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("greedy merges, tie-breaks, and dry termination") {
    val dir = corpusDir()
    val rows = TextOps.bpeVocab(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

    // round 1: (a,a) and (a,b) both count 2 — tie breaks to (a,a);
    // count is 2 because "a a a" holds TWO overlapping occurrences
    // (counting sees both; application below merges only one)
    assert(rows(0) == ((1, "a", "a", "a a", 2L)))
    // round 2: "a a a" became [«a a», a] — ONE merge (greedy LTR on
    // overlap), so (a,b) in "a b a b" is now the top pair
    assert(rows(1) == ((2, "a", "b", "a b", 2L)))
    // round 3: "a b a b" became [«a b», «a b»] — BOTH adjacent pairs
    // merged (the shared-boundary-separator case); remaining count-1
    // pairs tie-break to («a a», a)
    assert(rows(2) == ((3, "a a", "a", "a a a", 1L)))
    assert(rows(3) == ((4, "a b", "a b", "a b a b", 1L)))
    assert(rows(4) == ((5, "c", "d", "c d", 1L)))
    // round 6 finds no pairs left: the loop terminates dry before
    // the 8-round budget
    assert(rows.length == 5)
  }

  test("tokenizer application: every doc compresses to one token here") {
    val dir = corpusDir()
    val rows = TextOps.bpeTokenize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the 5 learned merges fold each doc to a single token:
    // "a b a b"→[«a b a b»], "a a a"→[«a a a»], "c d"→[«c d»]
    assert(rows.toSeq == Seq(
      (0L, 4L, 1L, 3L), (1L, 3L, 1L, 2L), (2L, 2L, 1L, 1L)))
  }
}

package graft.operators

import graft.SparkSpecBase

/** [[TextOps.exactSubstrings]] claims the k-gram-anchored islands
  * reconstruct EXACTLY the maximal shared substrings a suffix-array /
  * dynamic-programming pass would find (for len ≥ the report floor and
  * anchors under the frequency cap). This pins that claim against a
  * literal O(n·m) DP over every doc pair: a maximal diagonal run of
  * equal tokens of length ≥ 16 must appear with the same
  * (doc_a, doc_b, a_start, b_start, len), and nothing else may.
  */
class ExactSubstringsSpec extends SparkSpecBase {

  /** All maximal common-substring runs (1-based starts) of len ≥ minL. */
  private def dpRuns(a: Array[String], b: Array[String], minL: Int)
      : Seq[(Long, Long, Long)] = {
    val n = a.length; val m = b.length
    val L = Array.ofDim[Int](n + 1, m + 1)
    val out = Seq.newBuilder[(Long, Long, Long)]
    for (i <- 1 to n; j <- 1 to m) {
      if (a(i - 1) == b(j - 1)) L(i)(j) = L(i - 1)(j - 1) + 1
      if (L(i)(j) > 0 &&
          (i == n || j == m || a.lift(i) != b.lift(j))) {
        val len = L(i)(j)
        if (len >= minL)
          out += (((i - len + 1).toLong, (j - len + 1).toLong, len.toLong))
      }
    }
    out.result()
  }

  test("anchored islands == DP maximal common substrings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("exsub").toString
    def rtoks(n: Int): Array[String] =
      Array.fill(n)("t" + rnd.nextInt(5000))
    val block20 = rtoks(20)
    val block16 = rtoks(16)
    val block40 = rtoks(40)
    val block10 = rtoks(10) // below the 16-token floor: must NOT appear
    // doc 0/1 share block20 (two copies in doc 1) and block10;
    // doc 0/2 share block16; doc 1/2 share block40; doc 3 is clean
    val docs = Seq(
      (0L, rtoks(30) ++ block20 ++ rtoks(15) ++ block16 ++ block10),
      (1L, block20 ++ rtoks(9) ++ block40 ++ rtoks(12) ++ block20
        ++ block10),
      (2L, rtoks(25) ++ block40 ++ rtoks(11) ++ block16),
      (3L, rtoks(60)))
    docs.map { case (id, ts) =>
      (id, ts.mkString(" "), "en", "src0", ts.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextOps.exactSubstrings(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val byId = docs.toMap
    val want = (for {
      ai <- docs.map(_._1); bi <- docs.map(_._1) if ai < bi
      (sa, sb, len) <- dpRuns(byId(ai), byId(bi), 16)
    } yield (ai, bi, sa, sb, len)).toSet

    assert(got == want,
      s"missing=${want -- got}\nextra=${got -- want}")
    // the planted shapes actually exercised the interesting cases
    assert(want.exists(_._5 == 20) && want.exists(_._5 == 40) &&
      want.exists(_._5 == 16))
    assert(!want.exists(_._5 < 16))
  }

  test("fuzz: phrase-built corpora match DP across seeds (organic " +
    "overlaps, adjacency-merged runs, repeated occurrences)") {
    import spark.implicits._
    var totalRuns = 0
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"exsubf$seed").toString
      // 15 phrases of 4-12 tokens over a large vocab; docs concatenate
      // 8 sampled phrases — shared phrases (and shared phrase RUNS)
      // create organic maximal substrings of many lengths, including
      // repeats within a doc and adjacent merges
      val phrases = Seq.fill(15)(
        Array.fill(4 + rnd.nextInt(9))("w" + rnd.nextInt(100000)))
      val docs = (0L until 12L).map { id =>
        (id, Array.fill(8)(phrases(rnd.nextInt(15))).flatten)
      }
      docs.map { case (id, ts) =>
        (id, ts.mkString(" "), "en", "src0", ts.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val got = TextOps.exactSubstrings(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val byId = docs.toMap
      val want = (for {
        ai <- docs.map(_._1); bi <- docs.map(_._1) if ai < bi
        (sa, sb, len) <- dpRuns(byId(ai), byId(bi), 16)
      } yield (ai, bi, sa, sb, len)).toSet
      assert(got == want, s"seed=$seed missing=${want -- got} " +
        s"extra=${got -- want}")
      totalRuns += want.size
    }
    assert(totalRuns > 20, s"fuzz corpora too sparse: $totalRuns runs")
  }
}

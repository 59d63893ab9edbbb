package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** EXHAUSTIVE proof of the BPE merge trick's core claim: applying pair
  * (a, b) via the double-separator literal replace
  * ([[TextOps.bpeApplyMerge]], the production expression) equals a
  * plain greedy left-to-right non-overlapping fold — for EVERY token
  * sequence up to length 5 over an alphabet chosen to stress the
  * corners (a prefix pair "a"/"aa" for boundary-match safety,
  * self-pairs for overlap, adjacent repeats for shared-boundary
  * separator consumption): 364 sequences × 9 merge pairs = 3276 cases,
  * enumerated, not sampled.
  */
class BpeMergeExhaustiveSpec extends SparkSpecBase {

  private val alphabet = Seq("a", "b", "aa")

  /** Reference semantics: greedy left-to-right fold. A freshly merged
    * token becomes the new "last" and can only re-merge if it literally
    * equals `a` (impossible within one round: merged is strictly
    * longer), so overlapping occurrences merge once.
    */
  private def greedy(toks: List[String], a: String,
      b: String): List[String] =
    toks.foldLeft(List.empty[String]) { (acc, x) =>
      acc match {
        case last :: rest if last == a && x == b => (a + " " + b) :: rest
        case _ => x :: acc
      }
    }.reverse

  private def seqsUpTo(n: Int): Seq[List[String]] =
    (0 to n).flatMap(len =>
      List.fill(len)(alphabet).foldLeft(Seq(List.empty[String])) {
        (acc, opts) => acc.flatMap(s => opts.map(s :+ _))
      })

  test("replace-representation merge == greedy fold, 3276 cases") {
    import spark.implicits._
    val seqs = seqsUpTo(5).filter(_.nonEmpty)
    val base = seqs.zipWithIndex
      .map { case (s, i) => (i.toLong, s.mkString(" ")) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.bpeRepr(col("text")).as("txt"))
      .localCheckpoint(true)
    for (a <- alphabet; b <- alphabet) {
      val got = base
        .select(col("doc_id"),
          TextOps.bpeToks(TextOps.bpeApplyMerge(col("txt"), a, b))
            .as("tk"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList)
        .toMap
      seqs.zipWithIndex.foreach { case (s, i) =>
        val want = greedy(s, a, b)
        assert(got(i.toLong) == want,
          s"pair ($a,$b) on $s: got ${got(i.toLong)}, want $want")
      }
    }
  }
}

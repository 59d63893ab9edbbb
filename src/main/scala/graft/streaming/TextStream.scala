package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.TextOps

/** Streaming near-duplicate detection — banded MinHash LSH over a
  * document STREAM (the ingestion-time twin of
  * [[TextOps.minhashNearDup]]): each arriving document is checked
  * against the corpus seen so far and candidate near-dup pairs are
  * emitted immediately, instead of waiting for a batch dedup pass.
  *
  * Same construction as the batch operator (3-token shingles, 12
  * seeded sha256 min-hashes, 4 bands × 3 rows, Jaccard ≥ 0.3 verify),
  * so a pair this stream emits is a pair the batch pass would find.
  * Differences forced by streaming, stated honestly:
  *  - signatures are computed per row (a stream can't build the batch
  *    path's distinct-shingle vocabulary join);
  *  - state per band bucket holds (doc_id, shingle set) of every doc
  *    that landed in the bucket — Jaccard is verified on arrival, and
  *    a pair matching in several bands is emitted once per matching
  *    band (the batch `distinct()` becomes a downstream concern, e.g.
  *    [[EventsStream.dedupStream]] keyed by the pair);
  *  - state grows with the corpus (bounded per bucket by LSH locality);
  *    production runs bound it with the same processing-time TTL knob
  *    as [[EventsStream.dedupStream]] — dedup-within-horizon semantics.
  */
object TextStream {

  private val nSeeds = 12
  private val rowsPerBand = 3
  private val nBands = nSeeds / rowsPerBand

  /** Per-row band keys, value-identical to the batch pipeline's
    * (TextOps affine family: seed `i` hashes shingle `v` as
    * `(Aᵢ·base(v) + Bᵢ) mod P` with base(v) the first 7 hex chars of
    * sha256(v); band key = band index + ':' + its 3 '_'-joined minima).
    */
  private[graft] val bandKeysExpr: String = {
    def minhash(seed: Int) = {
      val (a, b) = (graft.operators.TextOps.MinhashA(seed),
        graft.operators.TextOps.MinhashB(seed))
      s"array_min(transform(sh, v -> (${a}L * cast(conv(substring(" +
        s"sha2(v, 256), 1, 7), 16, 10) as bigint) + ${b}L) % " +
        s"${graft.operators.TextOps.MinhashP}L))"
    }
    val bandCols = (0 until nBands).map { b =>
      val mins = (0 until rowsPerBand)
        .map(r => minhash(b * rowsPerBand + r))
        .mkString(", '_', ")
      s"concat('$b', ':', $mins)"
    }
    s"array(${bandCols.mkString(", ")})"
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0
    else BigDecimal(inter.toDouble / union)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** docs = (doc_id, text) stream → (a_id, b_id, jac) candidate pairs
    * (a_id < b_id, jac ≥ `threshold`), emitted in the micro-batch the
    * SECOND document of the pair arrives in.
    */
  def neardupStream(spark: SparkSession, docs: Dataset[(Long, String)],
      threshold: Double = 0.3): Dataset[(Long, Long, Double)] = {
    import spark.implicits._
    val keyed = docs.toDF("doc_id", "text")
      .withColumn("sh", expr(TextOps.shingles))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        explode(expr(bandKeysExpr)).as("band_key"))
      .as[(Long, Seq[String], String)]
      .map { case (id, sh, key) => (key, id, sh) }
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Seq[String])],
            state: GroupState[List[(Long, Set[String])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[(Long, Long, Double)]
          // in-batch determinism: arrivals processed in doc_id order
          rows.toSeq.sortBy(_._2).foreach { case (_, id, shSeq) =>
            val sh = shSeq.toSet
            seen.foreach { case (prevId, prevSh) =>
              if (prevId != id) {
                val j = jaccard(sh, prevSh)
                if (j >= threshold)
                  out += ((math.min(id, prevId), math.max(id, prevId), j))
              }
            }
            seen = (id, sh) :: seen
          }
          state.update(seen)
          out.result().iterator
      }
  }
}

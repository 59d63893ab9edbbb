package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpecBase

/** Property check: [[Merge.merge]] equals a reference model computed in
  * plain Scala — per key, the row with max ts wins; on ts ties the side
  * chosen by `batchWinsTies` wins; within a side, ties cannot occur
  * (generator keeps (key, ts) unique per side, as real scan batches do).
  *
  * Two generator regimes mirror the operator's two modes (r14): the
  * DEFAULT join-form merge requires key-unique sides (the snapshot /
  * scan-listing contract every caller satisfies — and the shape that
  * lets it plan as one sort-free shuffled-hash join); `dedupSides =
  * true` admits several generations of a key within a side and must
  * still match the same model.
  */
class MergePropertySpec extends SparkSpecBase {

  private val ts0 = Timestamp.valueOf("2020-01-01 00:00:00").getTime
  private case class R(key: String, size: Long, ts: Timestamp)

  private val rowGen: Gen[R] = for {
    k <- Gen.chooseNum(0, 6).map(i => s"k$i")
    size <- Gen.chooseNum(0L, 999L)
    t <- Gen.chooseNum(0, 4).map(h => new Timestamp(ts0 + h * 3600000L))
  } yield R(k, size, t)

  /** Multiset side: several generations of a key allowed, (key, ts)
    * unique — the `dedupSides = true` regime.
    */
  private def side(rows: List[R]): List[R] =
    rows.groupBy(r => (r.key, r.ts)).values.map(_.head).toList

  /** Key-unique side: the default (join-form) contract. */
  private def uniqueSide(rows: List[R]): List[R] =
    rows.groupBy(_.key).values.map(_.head).toList

  private def model(existing: List[R], batch: List[R],
      batchWins: Boolean): Set[(String, Long, Timestamp)] = {
    val tagged = existing.map(r => (r, 0)) ++ batch.map(r => (r, 1))
    tagged.groupBy(_._1.key).values.map { rs =>
      val best = rs.maxBy { case (r, tag) =>
        (r.ts.getTime, if (batchWins) tag else -tag)
      }._1
      (best.key, best.size, best.ts)
    }.toSet
  }

  test("merge equals the per-key max-ts model for random KEY-UNIQUE " +
      "inputs (default join form)") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(
      Gen.listOf(rowGen), Gen.listOf(rowGen), Gen.oneOf(true, false)) {
      (e0: List[R], b0: List[R], batchWins: Boolean) =>
        val e = uniqueSide(e0)
        val b = uniqueSide(b0)
        (e.nonEmpty && b.nonEmpty) ==> {
          val got = Merge.merge(
            e.map(r => (r.key, r.size, r.ts)).toDF("key", "size", "ts"),
            b.map(r => (r.key, r.size, r.ts)).toDF("key", "size", "ts"),
            "key", "ts", batchWins)
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))
            .toSet
          got == model(e, b, batchWins)
        }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }

  test("merge with dedupSides equals the model for MULTISET inputs " +
      "(several generations of a key within a side)") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(
      Gen.listOf(rowGen), Gen.listOf(rowGen), Gen.oneOf(true, false)) {
      (e0: List[R], b0: List[R], batchWins: Boolean) =>
        val e = side(e0)
        val b = side(b0)
        (e.nonEmpty && b.nonEmpty) ==> {
          val got = Merge.merge(
            e.map(r => (r.key, r.size, r.ts)).toDF("key", "size", "ts"),
            b.map(r => (r.key, r.size, r.ts)).toDF("key", "size", "ts"),
            "key", "ts", batchWins, dedupSides = true)
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))
            .toSet
          got == model(e, b, batchWins)
        }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }

  test("mergeReconcile equals merge restricted to batch keys (model)") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(
      Gen.listOf(rowGen), Gen.listOf(rowGen), Gen.oneOf(true, false)) {
      (e0: List[R], b0: List[R], batchWins: Boolean) =>
        val e = uniqueSide(e0)
        val b = uniqueSide(b0)
        (e.nonEmpty && b.nonEmpty) ==> {
          val got = Merge.mergeReconcile(
            e.map(r => (r.key, r.size, r.ts)).toDF("key", "size", "ts"),
            b.map(r => (r.key, r.size, r.ts)).toDF("key", "size", "ts"),
            "key", "ts", batchWins)
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))
            .toSet
          val batchKeys = b.map(_.key).toSet
          got == model(e, b, batchWins).filter(batchKeys contains _._1)
        }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.plans.GroupTopK

/** Property check: the native operator equals a plain-Scala reference
  * model — per group, sort by (score desc, id asc), take k, rank 1..k —
  * across random inputs, group counts, k values and partitionings. The
  * ordering is total (id tiebreak), so expected output is unique.
  */
class GroupTopKPropertySpec extends SparkSpecBase {

  import spark.implicits._

  // (g, id, score) — id is the unique tiebreak
  private val rowsGen: Gen[List[(Int, Long, Int)]] = for {
    n <- Gen.chooseNum(0, 120)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0, 5)
      score <- Gen.chooseNum(-50, 50) // small range → many ties
    } yield (g, score))
  } yield rows.zipWithIndex.map { case ((g, s), i) => (g, i.toLong, s) }

  private def model(rows: List[(Int, Long, Int)],
      k: Int): Set[(Int, Long, Int, Int)] =
    rows.groupBy(_._1).toList.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
        .map { case (r, i) => (g, r._2, r._3, i + 1) }
    }.toSet

  test("native top-k equals the sorted-take model for random inputs") {
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 7),
      Gen.chooseNum(1, 6)) { (rows, k, parts) =>
      val df = rows.toDF("g", "id", "score").repartition(parts)
      val got = GroupTopK.topK(df, Seq("g"),
        Seq(("score", true), ("id", false)), k)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
      val want = model(rows, k)
      (got == want) :| s"k=$k parts=$parts got=$got want=$want"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft.operators

import graft.SparkSpecBase

/** Smoke + invariant checks for the TPC-H tail shapes (the DuckDB hash
  * gate at sf0.01 is the authoritative value check; these pin the
  * structural invariants at sf0.001 so `sbt test` catches shape
  * regressions without the oracle).
  */
class AnalyticsExtSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q2: every part appears with only its minimum cost") {
    val rows = AnalyticsExt.q2MinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // one cost value per part (ties may repeat the part across suppliers)
    val perPart = rows.groupBy(_.getAs[Long]("p_partkey"))
      .view.mapValues(_.map(_.getAs[Double]("cost")).distinct.size)
    assert(perPart.values.forall(_ == 1))
  }

  test("q7: only the two nation orientations appear") {
    val rows = AnalyticsExt.q7VolumeShipping(spark, sf).collect()
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_19", "NATION_15"),
      ("NATION_15", "NATION_19"))))
  }

  test("q8: market share is a fraction per year") {
    val rows = AnalyticsExt.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Any]("mkt_share")
      if (s != null) {
        val v = s.asInstanceOf[Double]
        assert(v >= 0.0 && v <= 1.0, s"share $v out of range")
      }
    }
  }

  test("q9: grouped by (nation, year), ordered nation asc / year desc") {
    val rows = AnalyticsExt.q9ProductProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("nation"),
      r.getAs[Int]("o_year")))
    assert(keys.distinct.length == keys.length)
    assert(keys.sortBy { case (n, y) => (n, -y) }.sameElements(keys))
  }

  test("q10: top-20 by revenue desc, returned lines only") {
    val rows = AnalyticsExt.q10ReturnedItems(spark, sf).collect()
    assert(rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q11: values positive, sorted desc, and above the fraction bar") {
    val rows = AnalyticsExt.q11ImportantStock(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.zip(vals.drop(1)).forall { case (a, b) => a >= b })
    // each survivor holds > 1/1000 of the full nation total, which is ≥
    // the survivors' own sum — so the bar must hold against that sum too
    assert(vals.forall(_ * 1000 > vals.min))
  }

  test("q13: distribution counts sum to the customer count") {
    val rows = AnalyticsExt.q13OrderDistribution(spark, sf).collect()
    val custCount = graft.Tables(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == custCount)
  }

  test("q15: all rows tie at the maximum revenue") {
    val rows = AnalyticsExt.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q16: negative-balance suppliers are excluded") {
    val rows = AnalyticsExt.q16SupplierCount(spark, sf).collect()
    assert(rows.nonEmpty)
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q19: single revenue row, deterministic across reruns") {
    val a = AnalyticsExt.q19DisjunctiveRevenue(spark, sf).collect()
    val b = AnalyticsExt.q19DisjunctiveRevenue(spark, sf).collect()
    assert(a.length == 1 && a.sameElements(b))
  }

  test("q20: suppliers all belong to the target nation") {
    val rows = AnalyticsExt.q20ExcessSuppliers(spark, sf).collect()
    val nat9 = graft.Tables(spark, sf, "supplier")
      .join(graft.Tables(spark, sf, "nation")
          .filter(org.apache.spark.sql.functions.col("n_name") === "NATION_15"),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).forall(nat9.contains))
  }

  test("q21: every counted order had >1 supplier and exactly 1 failing") {
    // invariant is enforced inside the plan; here: output is bounded and
    // ordered by numwait desc then name
    val rows = AnalyticsExt.q21WaitingSuppliers(spark, sf).collect()
    val w = rows.map(r => (r.getAs[Long]("numwait"), r.getAs[String]("s_name")))
    assert(w.sortBy { case (n, s) => (-n, s) }.sameElements(w))
  }

  test("all ext queries return non-empty results at smoke scale") {
    AnalyticsExt.queries.foreach { case (name, q) =>
      assert(q(spark, sf).limit(1).count() == 1, s"$name returned 0 rows")
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining TPC-H query shapes (q2 q7 q8 q9 q10 q11 q13 q15 q16 q19
  * q20 q21) — together with [[Analytics]] this completes all 22 TPC-H
  * plan shapes over the driver's trimmed star schema.
  *
  * The driver schema carries no `partsupp` table and no comment/phone/
  * date-triple columns, so the shapes that reference them are re-based on
  * existing columns (noted per query). As with q4/q12/q17 in
  * [[Analytics]], the PLAN SHAPE is what's under test — correlated-
  * subquery decorrelation, nation self-joins, outer-join count
  * distributions, disjunctive pushdown, nested semi/anti joins — not the
  * TPC-H spec constants.
  *
  * Scale policy (same as [[Analytics]]): only genuinely bounded frames are
  * broadcast — nation (25), region (5), and 1-row scalar aggregates.
  * customer/supplier/part grow with SF and are left to Catalyst/AQE.
  * Money math happens in DECIMAL(12,2) (order-independent), is rounded,
  * and only then cast to DOUBLE so both engines emit identical bits.
  */
object AnalyticsExt {

  private def dec(c: String): Column = col(c).cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")
  private def vol: Column = dec("l_extendedprice") * (one - dec("l_discount"))
  private val volSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** TPC-H Q2 shape — correlated MIN subquery, decorrelated: for each
    * STANDARD mid-size part, the EUROPE supplier(s) achieving the
    * minimum observed supply cost. No `partsupp` table exists, so supply
    * cost is the minimum lineitem price each (part, supplier) pair ever
    * charged — the correlated `cost = (SELECT min ...)` structure is
    * identical. Decorrelation: one per-(part,supplier) aggregate, a
    * per-part min over it, and an equi-join back on (part, cost) — each
    * leg shuffles once on the part key. region/nation are broadcast;
    * supplier is not (grows with SF).
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables(spark, sfDir, "nation")
    val reg = Tables(spark, sfDir, "region").filter(col("r_name") === "EUROPE")
    val eurSupp = Tables(spark, sfDir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val costs = Tables(spark, sfDir, "lineitem")
      .join(eurSupp.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec("l_extendedprice")).as("cost"))
    val minCost = costs.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min("cost").as("min_cost"))
    costs
      .join(minCost, col("l_partkey") === col("mc_partkey") &&
        col("cost") === col("min_cost"))
      .join(Tables(spark, sfDir, "part")
          .filter(col("p_size").between(10, 20) &&
            col("p_type") === "STANDARD").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
      .select(round(dec("s_acctbal"), 2).cast("double").as("s_acctbal"),
        col("s_name"), col("n_name"), col("p_partkey"),
        col("cost").cast("double").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH eur AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      |costs AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      |  FROM lineitem JOIN eur ON l_suppkey = s_suppkey
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT CAST(round(CAST(s_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS s_acctbal,
      |  s_name, n_name, p_partkey, CAST(cost AS DOUBLE) AS cost
      |FROM costs JOIN part ON l_partkey = p_partkey
      |JOIN eur ON l_suppkey = s_suppkey
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      |  AND cost = (SELECT min(c2.cost) FROM costs c2
      |              WHERE c2.l_partkey = costs.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** TPC-H Q7 shape — nation self-join pair (volume shipping): revenue
    * between two nations in both directions, by ship year. The nation
    * dimension joins TWICE under different roles (customer's vs
    * supplier's); both copies broadcast. The disjunctive pair filter
    * runs after both joins — exactly Q7's shape.
    */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(Tables(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .filter((col("supp_nation") === "NATION_19" &&
        col("cust_nation") === "NATION_15") ||
        (col("supp_nation") === "NATION_15" &&
          col("cust_nation") === "NATION_19"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(vol), 2).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  CAST(round(sum($volSql), 2) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND ((n2.n_name = 'NATION_19' AND n1.n_name = 'NATION_15')
       |    OR (n2.n_name = 'NATION_15' AND n1.n_name = 'NATION_19'))
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape — market share: one nation's fraction of a region's
    * PROMO-part order volume per year. The numerator is a conditional
    * sum over the SAME aggregation pass as the denominator (no second
    * scan/shuffle), and the final ratio divides the two exact DECIMAL
    * sums in DOUBLE with an identical expression in both engines (q14's
    * dtype rule).
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val nCust = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val reg = Tables(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val nSupp = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, sfDir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(Tables(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_19", vol)).cast("double") /
          sum(vol).cast("double"), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |  round(CAST(sum(CASE WHEN n2.n_name = 'NATION_19'
       |                      THEN $volSql END) AS DOUBLE)
       |    / CAST(sum($volSql) AS DOUBLE), 4) AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1995-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q9 shape — product profit by (supplier nation, order year).
    * No `partsupp.ps_supplycost`, so cost is the part's retail price ×
    * quantity (same arithmetic shape: a per-row DECIMAL product
    * subtracted from discounted revenue, summed per group). The name
    * filter (`%gear%`) prunes part BEFORE its join, exactly Q9's LIKE
    * pushdown.
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val nSupp = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
          .filter(col("p_name").like("%gear%"))
          .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(vol - dec("p_retailprice") * dec("l_quantity")), 2)
        .cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  CAST(round(sum($volSql
       |    - CAST(p_retailprice AS DECIMAL(12,2))
       |      * CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%gear%'
       |GROUP BY n_name, o_year
       |ORDER BY n_name, o_year DESC""".stripMargin

  /** TPC-H Q10 shape — returned-item report: top-20 customers by revenue
    * lost to returns in one quarter. Fact side prunes on BOTH pushed
    * filters (returnflag on lineitem, date range on orders) before the
    * joins; the top-20 compiles to TakeOrderedAndProject.
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables(spark, sfDir, "nation")
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(Tables(spark, sfDir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(round(sum(vol), 2).cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(dec("c_acctbal"), 2).cast("double").as("c_acctbal"),
        col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name,
       |  CAST(round(sum($volSql), 2) AS DOUBLE) AS revenue,
       |  CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS c_acctbal,
       |  n_name
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q11 shape — important stock: per-part value held by one
    * nation's suppliers, HAVING value above a fixed fraction of the
    * total (a scalar subquery over the SAME aggregate). The per-part
    * frame is computed once; the 1-row total broadcasts into the
    * HAVING filter. The fraction compare is divisionless
    * (`value × 1000 > total`) so both engines compare exact DECIMALs.
    */
  def q11ImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    val supp1 = Tables(spark, sfDir, "supplier")
      .join(broadcast(Tables(spark, sfDir, "nation")
          .filter(col("n_name") === "NATION_19")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables(spark, sfDir, "lineitem")
      .join(supp1, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec("l_extendedprice")).as("value_d"))
    val total = perPart.agg(sum("value_d").as("total_d"))
    perPart.join(broadcast(total))
      .filter(col("value_d") * 1000 > col("total_d"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("value_d"), 2).cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH pv AS (
      |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_19'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_partkey, CAST(round(v, 2) AS DOUBLE) AS value
      |FROM pv
      |WHERE v * 1000 > (SELECT sum(v) FROM pv)
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    * join (customers with zero orders survive with count 0) under a
    * join-side filter, then a second aggregation over the counts. Two
    * shuffles total: one on the customer key, one tiny one on the
    * count value. The priority filter stands in for Q13's
    * `o_comment NOT LIKE` (no comment column).
    */
  def q13OrderDistribution(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15 shape — top supplier vs a MAX-over-view scalar subquery:
    * the quarterly per-supplier revenue view is computed once, its 1-row
    * max broadcasts back into the filter (ties all surface, exactly
    * Q15's semantics). The equality compares exact DECIMAL sums — no
    * double-rounding hazard in the tie test.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).as("rev_d"))
    val maxRev = rev.agg(max("rev_d").as("max_rev"))
    rev.join(broadcast(maxRev))
      .filter(col("rev_d") === col("max_rev"))
      .join(Tables(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_d"), 2).cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, sum($volSql) AS rev_d
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(round(rev_d, 2) AS DOUBLE) AS total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_d = (SELECT max(rev_d) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape — supplier count per part attribute group, with a
    * NOT IN anti-join (suppliers "with complaints" → negative balance
    * stand-in) and a COUNT DISTINCT. The anti join runs on the fact
    * side BEFORE aggregation; count-distinct expands to Spark's
    * two-level partial aggregate (distinct keys shuffle once).
    */
  def q16SupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val bad = Tables(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q19 shape — disjunctive multi-branch predicate (brand × size
    * × quantity bundles OR-ed together) over the part join. Catalyst
    * extracts the common `l_quantity <= 30` / `p_size >= 1` bounds and
    * pushes per-table residuals below the join; the OR itself evaluates
    * post-join — exactly Q19's plan.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#9" && col("p_size").between(1, 25) &&
            col("l_quantity").between(20, 30)))
      .agg(round(sum(vol), 2).cast("double").as("revenue"))

  val q19Sql: String =
    s"""SELECT CAST(round(sum($volSql), 2) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |        AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 20
       |        AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 25
       |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q20 shape — nested IN chain (potential part promotion):
    * suppliers of 'red' parts whose 1996 shipped quantity exceeds half
    * their all-time quantity for that part. The correlated
    * `> 0.5 × (SELECT sum ...)` collapses into ONE conditional
    * aggregate per (part, supplier) — both the year slice and the
    * total come from the same pass, compared divisionless
    * (`2 × qty96 > total`). The qualifying supplier set then left-semi
    * joins supplier, Q20's outer IN.
    */
  def q20ExcessSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val redParts = Tables(spark, sfDir, "part")
      .filter(col("p_name").like("red%")).select("p_partkey")
    val qualifying = Tables(spark, sfDir, "lineitem")
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(when(year(col("l_shipdate")) === 1996, dec("l_quantity")))
        .as("qty96"),
        sum(dec("l_quantity")).as("qty_all"))
      .filter(col("qty96") * 2 > col("qty_all"))
      .select("l_suppkey").distinct()
    Tables(spark, sfDir, "supplier")
      .join(broadcast(Tables(spark, sfDir, "nation")
          .filter(col("n_name") === "NATION_15")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_15' AND s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |  GROUP BY l_partkey, l_suppkey
      |  HAVING sum(CASE WHEN year(l_shipdate) = 1996
      |               THEN CAST(l_quantity AS DECIMAL(12,2)) END) * 2
      |       > sum(CAST(l_quantity AS DECIMAL(12,2))))
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q21 shape — suppliers who kept orders waiting: the
    * EXISTS (another supplier in the order) + NOT EXISTS (another
    * FAILING supplier in the order) pair, decorrelated into ONE
    * per-order aggregate: `countDistinct(supplier)` ≥ 2 ∧
    * `countDistinct(supplier | returned)` = 1. Each correlated
    * subquery would rescan lineitem per row; the aggregate form scans
    * it once and shuffles once on the order key. `l_returnflag = 'R'`
    * on 'F'-status orders stands in for receipt-after-commit (no date
    * triple in the driver schema).
    */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE pass over lineitem⋈orders instead of two (guide §1.2 "remove
    // unnecessary passes"; the old shape joined lineitem to F-orders
    // once for the per-order stats and AGAIN for the R-line probe side,
    // then joined the two — three corpus-keyed exchanges). The EXISTS /
    // NOT-EXISTS pair collapses into the same per-order aggregate that
    // already computes nsupp: an order qualifies iff it has ≥2 distinct
    // suppliers and EXACTLY ONE distinct supplier among its R lines —
    // `min == max` over the R-line supplier keys (null-safe: no R lines
    // → both null → the === filter rejects, one Expand branch cheaper
    // than a second countDistinct). All of that order's R lines then
    // belong to that single supplier, so numwait per supplier is the
    // SUM of qualifying orders' R-line counts — no join back to the
    // line level at all.
    val fLines = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .join(Tables(spark, sfDir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
    val rSupp = when(col("l_returnflag") === "R", col("l_suppkey"))
    fLines
      .groupBy(col("l_orderkey"))
      // "≥2 distinct suppliers" ⟺ min(suppkey) ≠ max(suppkey) — exact,
      // and with it the aggregate has NO distinct function left, so the
      // planner's Expand (which doubled every joined row through the
      // order-key exchange) disappears entirely
      .agg(min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"),
        min(rSupp).as("r_min"), max(rSupp).as("r_max"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("r_lines"))
      .filter(col("s_min") =!= col("s_max") && col("r_min") === col("r_max"))
      .join(Tables(spark, sfDir, "supplier"),
        col("r_max") === col("s_suppkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")
          .filter(col("n_name") === "NATION_13")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("r_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_13'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q10_returned_items" -> q10ReturnedItems,
    "q11_important_stock" -> q11ImportantStock,
    "q13_order_distribution" -> q13OrderDistribution,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_supplier_count" -> q16SupplierCount,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q20_excess_suppliers" -> q20ExcessSuppliers,
    "q21_waiting_suppliers" -> q21WaitingSuppliers)

  def oracleSql: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q7_volume_shipping" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q9_product_profit" -> q9Sql,
    "q10_returned_items" -> q10Sql,
    "q11_important_stock" -> q11Sql,
    "q13_order_distribution" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_supplier_count" -> q16Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "q20_excess_suppliers" -> q20Sql,
    "q21_waiting_suppliers" -> q21Sql)
}

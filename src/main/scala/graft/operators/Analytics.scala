package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Headline relational analytics over the TPC-H-ish test tables.
  *
  * These exercise the engine's core agg/join surface (SURVEY.md §2.3/§2.4:
  * equi-joins J4/J8, group-by aggregates A1-A4) at bench scale. All money
  * aggregates are rounded to fixed decimals and every output is fully
  * ordered so the DuckDB-oracle hash compare is deterministic.
  *
  * Scale notes (100 TB): q1 is a pure map-side-combinable aggregation (6
  * groups — partial aggregation collapses each partition to ≤6 rows before
  * the 1-stage shuffle). q3/q5 join fact tables on their natural keys.
  * Only genuinely bounded dimensions (region = 5 rows, nation = 25 rows)
  * carry a broadcast hint; customer/supplier grow with scale factor, so
  * their join strategy is left to Catalyst/AQE (shuffle hash join on the
  * fact side at large SF, auto-broadcast at small SF).
  *
  * Money columns are DOUBLE in the parquet; double sums are
  * partition-order-dependent, so every money aggregate first casts to
  * DECIMAL(12,2) (exact, order-independent), then rounds, then casts the
  * final value back to DOUBLE so Spark and the DuckDB oracle emit the same
  * bits regardless of parallelism.
  */
object Analytics {

  private def dec(c: String): Column = col(c).cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")

  /** TPC-H Q1-style pricing summary (A1-A4). */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    val n = count(lit(1))
    li.filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"),
        round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(dec("l_extendedprice") * (one - dec("l_discount")) *
          (one + dec("l_tax"))), 2).cast("double").as("sum_charge"),
        round(sum(dec("l_quantity")).cast("double") / n, 4).as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / n, 4).as("avg_price"),
        round(sum(dec("l_discount")).cast("double") / n, 4).as("avg_disc"),
        n.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style top-k revenue orders (J4-style equi-join chain + top-k
    * W3 analog). customer is unbounded (grows with SF) so it gets no
    * broadcast hint — AQE picks the strategy; lineitem⋈orders shuffles
    * once on the order key and top-k compiles to TakeOrderedAndProject.
    */
  def q3TopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style local-supplier revenue by nation. Only the genuinely
    * bounded dimensions (nation = 25 rows, region = 5 rows) are broadcast;
    * customer/supplier scale with SF, so AQE chooses their join strategy.
    * The only guaranteed big shuffle is lineitem⋈orders on the order key.
    */
  def q5RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
    val ord = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables(spark, sfDir, "lineitem")
    val supp = Tables(spark, sfDir, "supplier")
    val nat = Tables(spark, sfDir, "nation")
    val reg = Tables(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q6-style forecast revenue change: a pure filter + scalar
    * aggregate — the canonical predicate-pushdown showcase (every
    * predicate reaches the parquet scan as PushedFilters; the agg is one
    * map-side-combinable sum, no shuffle beyond the final 1-row merge).
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(round(sum(dec("l_extendedprice") * dec("l_discount")), 2)
        .cast("double").as("revenue"))

  val q6Sql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q12-SHAPED priority counts: fact-fact equi-join + conditional
    * aggregation (CASE-sum, A4's shape on a join output). The driver's
    * trimmed lineitem has no shipmode/commitdate/receiptdate columns, so
    * the grouping key is `l_returnflag` — the operator shape (one
    * order-key shuffle, map-side partial CASE sums) is what's under
    * test, not the column names.
    */
  def q12PriorityLines(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
    li.join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |                  OR o_orderpriority = '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
      |                 AND o_orderpriority <> '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q14-style promo revenue share: fact⋈dim equi-join + a
    * conditional-over-total ratio. The driver's `p_type` is
    * single-valued (`PROMO`, not a `PROMO%` prefix), so the predicate is
    * equality. Both DECIMAL sums share one aggregation pass (map-side
    * partial CASE sum — no second scan, no second shuffle); the final
    * ratio divides the two exact decimals in double with an identical
    * `(100.0 * promo) / total` shape in both engines. `part` grows with
    * SF so its join strategy is AQE's choice, same policy as
    * customer/supplier in q3/q5.
    */
  def q14PromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    li.join(Tables(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .agg(round((lit(100.0) *
        sum(when(col("p_type") === "PROMO",
          dec("l_extendedprice") * (one - dec("l_discount"))))
          .cast("double")) /
        sum(dec("l_extendedprice") * (one - dec("l_discount")))
          .cast("double"),
        4).as("promo_revenue_pct"))
  }

  val q14Sql: String =
    """SELECT round((100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END) AS DOUBLE))
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
      |  4) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** TPC-H Q18-style large-quantity orders: a group-HAVING over the fact
    * table feeding a join + global top-k. Scale shape: the per-order
    * quantity rollup partial-aggregates map-side and shuffles once on
    * the order key; the HAVING filter collapses the fact side to the
    * rare heavy orders BEFORE the orders/customer joins (semi-join-like
    * reduction — the joins see ~1% of orders); the top-100 compiles to
    * TakeOrderedAndProject (per-partition heap, no global sort).
    * DECIMAL sum keeps the HAVING threshold exact across partition
    * orders; o_orderdate is emitted as a formatted string (dtype-drift
    * rule).
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(round(sum(dec("l_quantity")), 2).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables(spark, sfDir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(dec("o_totalprice"), 2).cast("double").as("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) > 250)
      |SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS o_totalprice,
      |  CAST(sum_qty AS DOUBLE) AS sum_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q4 shape — correlated EXISTS as a LEFT SEMI join: orders in a
    * quarter with at least one returned line. The semi join never
    * duplicates orders rows however many lines match, and at scale it
    * shuffles each side once on the order key (the lineitem side is
    * first pruned by the pushed returnflag filter). The driver schema
    * carries no commit/receipt dates, so "returned" (l_returnflag='R')
    * stands in for Q4's late-delivery predicate — the plan shape is the
    * point.
    */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val lateLines = Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(lateLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q22 shape — scalar subquery + NOT EXISTS anti join: well-funded
    * customers (balance above the positive-balance average) with no LARGE
    * order (none above 450k), counted per nation (the driver schema has no phone column,
    * so nation stands in for the country code). The average is a 1-row
    * aggregate broadcast into the filter; the anti join is the same
    * "in index but not in scan" shape as the pipeline's deletion pass
    * (J6), here on the customer key. DECIMAL sums keep the money exact.
    */
  def q22NoOrderCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec("c_acctbal")) / count(lit(1))).as("avg_bal"))
    cust
      .join(broadcast(avgBal))
      .filter(dec("c_acctbal") > col("avg_bal"))
      .join(Tables(spark, sfDir, "orders")
          .filter(col("o_totalprice") > 450000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("int").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(dec("c_acctbal")), 2).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22Sql: String =
    """SELECT CAST(c_nationkey AS INT) AS cntrycode, count(*) AS numcust,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) >
      |  (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) / count(*)
      |   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  /** TPC-H Q17 shape — CORRELATED scalar aggregate subquery (each
    * lineitem row compares against ITS part's average quantity): the
    * decorrelation every engine performs is explicit here — one
    * per-part aggregate of the brand-filtered lineitems, joined back to
    * the same rows. The threshold `qty < 0.2 × avg(qty)` is evaluated
    * divisionless as `5 × qty × cnt < sum_qty` so both engines compare
    * exact DECIMALs (no cross-engine division-rounding hazard). At
    * scale: the aggregate collapses the fact side per part before the
    * join, and both legs shuffle once on the part key.
    */
  def q17SmallQuantityRevenue(spark: SparkSession,
      sfDir: String): DataFrame = {
    val brandLines = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
    val perPart = brandLines
      .groupBy(col("l_partkey").as("agg_partkey"))
      .agg(sum(dec("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    brandLines
      .join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(dec("l_quantity") * 5 * col("cnt") < col("sum_qty"))
      .agg(round(sum(dec("l_extendedprice")) / 7, 2).cast("double")
        .as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))) / 7, 2) AS DOUBLE)
      |    AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
      |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 *
      |      (SELECT count(*) FROM lineitem l2, part p2
      |       WHERE p2.p_partkey = l2.l_partkey AND p2.p_brand = 'Brand#4'
      |         AND l2.l_partkey = lineitem.l_partkey)
      |    < (SELECT sum(CAST(l_quantity AS DECIMAL(12,2)))
      |       FROM lineitem l3, part p3
      |       WHERE p3.p_partkey = l3.l_partkey AND p3.p_brand = 'Brand#4'
      |         AND l3.l_partkey = lineitem.l_partkey)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_top_orders" -> q3TopOrders,
    "q5_region_revenue" -> q5RegionRevenue,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q12_priority_lines" -> q12PriorityLines,
    "q14_promo_revenue" -> q14PromoRevenue,
    "q18_large_orders" -> q18LargeOrders,
    "q4_order_priority" -> q4OrderPriority,
    "q22_no_order_customers" -> q22NoOrderCustomers,
    "q17_small_qty_revenue" -> q17SmallQuantityRevenue)

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_top_orders" -> q3Sql,
    "q5_region_revenue" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q12_priority_lines" -> q12Sql,
    "q14_promo_revenue" -> q14Sql,
    "q18_large_orders" -> q18Sql,
    "q4_order_priority" -> q4Sql,
    "q22_no_order_customers" -> q22Sql,
    "q17_small_qty_revenue" -> q17Sql)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k scale probe (the PERF.md "native whole-operator
  * tier" methodology, now that BOTH the `row_number` and the `rank()`
  * idioms rewrite to the native operator): generates `rows` synthetic
  * facts in `groups` groups, then times
  *
  *  1. `stock`     — rank() <= k on a VANILLA session (no graft
  *                   extensions): Spark's own plan, including its
  *                   built-in WindowGroupLimit pruning — the honest
  *                   upstream baseline;
  *  2. `rank`      — the same query on the extensions session, where
  *                   GroupTopKRewrite plans the native withTies heaps;
  *  3. `rownum`    — the row_number() idiom (native via the rewrite);
  *  4. `native`    — the direct GroupTopK.topK call.
  *
  * The ordering (score desc, id) is total, so all four checksums must
  * agree. usage: `graft.TopKProbe [rows] [groups] [k]`
  * (defaults 100M / 64 / 10, the PERF.md probe point).
  */
object TopKProbe {

  private def facts(spark: SparkSession, rows: Long,
      groups: Int): DataFrame =
    spark.range(rows).select(
      pmod(col("id"), lit(groups.toLong)).as("g"),
      pmod(xxhash64(col("id")), lit(1000000L)).as("score"),
      col("id"))

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000000L
    val groups = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    def rankQuery(spark: SparkSession): DataFrame = {
      val w = Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))
      facts(spark, rows, groups)
        .withColumn("rk", rank().over(w)).filter(col("rk") <= k)
    }

    // phase 1: vanilla Spark, no graft extensions — the stock plan
    val vanilla = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    vanilla.sparkContext.setLogLevel("ERROR")
    val (tStock, cStock, _, _) =
      Bench.timedMinOf2(() => Bench.checksum(rankQuery(vanilla)))
    vanilla.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // phase 2: the extensions session — rewritten idioms + direct call
    val spark = Bench.buildSession(cpus)
    val (tRank, cRank, _, _) =
      Bench.timedMinOf2(() => Bench.checksum(rankQuery(spark)))
    val (tRowNum, cRowNum, _, _) = Bench.timedMinOf2 { () =>
      val w = Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))
      Bench.checksum(facts(spark, rows, groups)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k))
    }
    val (tNative, cNative, _, _) = Bench.timedMinOf2 { () =>
      Bench.checksum(plans.GroupTopK.topK(facts(spark, rows, groups),
        groupCols = Seq("g"),
        orderKeys = Seq(("score", true), ("id", false)), k = k,
        rankName = "rk"))
    }
    require(Set(cStock, cRank, cRowNum, cNative).size == 1,
      s"checksum mismatch: $cStock $cRank $cRowNum $cNative")
    println(f"""{"rows":$rows,"groups":$groups,"k":$k,""" +
      f""""stock_sec":$tStock%.2f,"rank_rewritten_sec":$tRank%.2f,""" +
      f""""rownum_rewritten_sec":$tRowNum%.2f,"native_sec":$tNative%.2f}""")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.SyntheticFs

/** Skew mitigation patterns (SURVEY.md §4 / the 100 TB brief: "skewed
  * keys → salting or AQE skew-join").
  *
  * [[saltedTypeCounts]] is the two-phase salted aggregation: `type` has
  * only 2 values — the worst-case skewed grouping key, where a naive
  * groupBy funnels every row through 2 reducers. Phase 1 groups by
  * (key, salt) spreading each hot key over `salts` reducers; phase 2
  * combines the per-salt partials. Results are identical to the plain
  * groupBy, so it shares `fs_type_counts`' oracle — the correctness
  * gate proves the rewrite sound.
  *
  * (For joins the analogous trick is salt-replicating the small side;
  * AQE's skew-join handles the sort-merge case automatically.)
  */
object SkewOps {

  /** The one salting scheme both patterns share: a uniform hash of the
    * row identity, NOT of the hot key (hashing the key would put every
    * row of a hot key in the same salt again).
    */
  private def saltCol(salts: Int) =
    pmod(xxhash64(col("relative_path")), lit(salts))

  def saltedTypeCounts(spark: SparkSession, sfDir: String,
      salts: Int = 16): DataFrame = {
    val phase1 = SyntheticFs.entries(spark, sfDir)
      .withColumn("salt", saltCol(salts))
      .groupBy("type", "salt")
      .agg(count(lit(1)).as("pn"), sum("size_bytes").as("pbytes"))
    phase1
      .groupBy("type")
      .agg(sum("pn").as("n"), sum("pbytes").as("bytes"))
      .orderBy("type")
  }

  /** The JOIN-side salting pattern: entries ⋈ a per-type dimension on
    * `type` — a 2-value key, so an unsalted shuffle join funnels all
    * 76k rows through 2 reducers. The big side takes
    * `salt = hash(row) % salts`; the small side is replicated once per
    * salt; the join key becomes (type, salt), spreading each hot key
    * over `salts` reducers. A `merge` hint forces the shuffle join the
    * pattern exists for (a broadcast-able dim wouldn't need salting —
    * the pattern applies when the dim side is too big to broadcast).
    * Shares result shape with the trivially-derivable oracle, proving
    * the rewrite sound.
    */
  def saltedDimJoin(spark: SparkSession, sfDir: String,
      salts: Int = 8): DataFrame = {
    val dim = spark.createDataFrame(Seq(
      ("file", "F"), ("directory", "D"))).toDF("type", "code")
    val dimRep = dim
      .withColumn("salt", explode(expr(s"sequence(0, ${salts - 1})")))
      .withColumn("salt", col("salt").cast("long"))
    val big = SyntheticFs.entries(spark, sfDir)
      .withColumn("salt", saltCol(salts))
    big.join(dimRep.hint("merge"), Seq("type", "salt"))
      .groupBy("code")
      .agg(count(lit(1)).as("n"),
        sum("size_bytes").cast("long").as("bytes"))
      .orderBy("code")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fs_type_counts_salted" -> ((s, d) => saltedTypeCounts(s, d)),
    "fs_salted_dim_join" -> ((s, d) => saltedDimJoin(s, d)))

  /** Same oracles as the unsalted forms — salting must not change
    * results.
    */
  val saltedDimJoinSql: String = SyntheticFs.withCtes(
    """SELECT CASE type WHEN 'file' THEN 'F' WHEN 'directory' THEN 'D' END
      |    AS code,
      |  count(*) AS n, CAST(sum(size_bytes) AS BIGINT) AS bytes
      |FROM fs_entries
      |WHERE type IN ('file', 'directory') -- mirror the inner join: an
      |  -- unknown type is DROPPED, not bucketed into 'D'
      |GROUP BY code ORDER BY code""".stripMargin)

  def oracleSql: Map[String, String] = Map(
    "fs_type_counts_salted" -> FsOps.typeCountsSql,
    "fs_salted_dim_join" -> saltedDimJoinSql)
}

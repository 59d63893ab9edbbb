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

  def saltedTypeCounts(spark: SparkSession, sfDir: String,
      salts: Int = 16): DataFrame = {
    val phase1 = SyntheticFs.entries(spark, sfDir)
      .withColumn("salt", pmod(xxhash64(col("relative_path")), lit(salts)))
      .groupBy("type", "salt")
      .agg(count(lit(1)).as("pn"), sum("size_bytes").as("pbytes"))
    phase1
      .groupBy("type")
      .agg(sum("pn").as("n"), sum("pbytes").as("bytes"))
      .orderBy("type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fs_type_counts_salted" -> ((s, d) => saltedTypeCounts(s, d)))

  /** Same oracle as the unsalted groupBy — salting must not change
    * results.
    */
  def oracleSql: Map[String, String] = Map(
    "fs_type_counts_salted" -> FsOps.typeCountsSql)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.SyntheticFs
import graft.operators.FsOps

/** `fs_es_docs` floor decomposition (r14 verdict #3: the quiet floor
  * rose 1.2 → 1.5 → 1.85 s across rounds while the r14 plan surgery
  * HALVED the moved bytes — name the cause). The r14 narrowing made
  * the links join key derivable (`sha2(filepath,256)`) so the
  * exchanges carry ~80 B/row instead of ~190; the open question is
  * whether the per-row sha256 (one per probe-side row, evaluated
  * before the exchange) costs more wall time at sf0.1 — where the
  * whole corpus is page-cached and bytes are nearly free — than the
  * byte savings buy back. At the k=1000 gate the tradeoff inverts
  * (tens of GB of exchange vs seconds of hashing); this probe pins
  * BOTH costs so the choice is recorded, not guessed.
  *
  * Variants (identical output, checksum-verified):
  *  - `head`:        the shipped shape (derived key + final sort)
  *  - `carried_id`:  exchange carries the stored 64-hex id; no sha256
  *  - `head_nosort`: shipped shape minus the trailing orderBy (the
  *                   scale gate strips it anyway — digest compare)
  *  - `carried_nosort`: both
  *
  * usage: `graft.EsDocsProbe [sfDir]` — one JSON line.
  */
object EsDocsProbe {

  private def variant(spark: SparkSession, sfDir: String,
      carryId: Boolean, sort: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e0 = SyntheticFs.entries(spark, sfDir)
    val e =
      if (carryId) e0.select(col("id"), col("filepath"), col("type"),
        col("size_bytes"), col("modified_time"))
      else e0.select(col("filepath"), col("type"), col("size_bytes"),
        col("modified_time"))
    val links = SyntheticFs.directLinks(spark, sfDir)
      .select(col("file_id"), col("direct_link").as("dl"))
    val sizes = FsOps.dirRollupExplode(spark, sfDir)
      .select(col("directory_path"), col("total_size"))
    val key = if (carryId) col("id") else sha2(col("filepath"), 256)
    val joined = e.join(links.hint("shuffle_hash"),
        key === col("file_id"), "left")
      .join(sizes.hint("shuffle_hash"),
        col("filepath") === col("directory_path"), "left")
      .select(
        expr("substring(filepath, 2)").as("relative_path"),
        expr("substring_index(filepath, '/', -1)").as("name"),
        col("type"),
        when(col("type") === "directory",
          coalesce(col("total_size"), lit(0L)))
          .otherwise(col("size_bytes")).as("size_final"),
        coalesce(col("dl"), lit("")).as("direct_link"),
        date_format(col("modified_time"), "yyyy-MM-dd'T'HH:mm:ss")
          .as("modified_iso"))
      .withColumn("size_h", expr("format_size(size_final)"))
    if (sort) joined.orderBy("relative_path") else joined
  }

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = Bench.stageResharded(spark, sfDir)._1
    val shapes = Seq(
      ("head", false, true), ("carried_id", true, true),
      ("head_nosort", false, false), ("carried_nosort", true, false))
    val rows = shapes.map { case (name, carry, sort) =>
      val (sec, chk, runs, moved) = Bench.timedMinOf2(
        () => Bench.checksum(variant(spark, dir, carry, sort)))
      (name, sec, chk, runs, moved.map(_ / 1048576.0))
    }
    // sorted and unsorted variants hash identically (checksum is
    // order-insensitive), so ANY checksum divergence is a real bug
    require(rows.map(_._3).distinct.size == 1,
      s"variant checksums diverge: ${rows.map(r => r._1 -> r._3)}")
    val qj = rows.map { case (n, sec, _, runs, mv) =>
      s""""$n":{"sec":${"%.3f".format(sec)},""" +
        s""""runs":${runs.map("%.3f".format(_)).mkString("[", ",", "]")},""" +
        s""""move_mb":${mv.map("%.1f".format(_)).mkString("[", ",", "]")}}"""
    }.mkString(",")
    println(s"""{"probe":"es_docs_floor","variants":{$qj},"sf":"$sfDir"}""")
    Bench.rm(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}

/** k-replica scale CORRECTNESS gate (VERDICT r9 item #1): the driver's
  * DuckDB compare runs at sf0.01, the bench at sf0.1, and
  * [[ScaleProbe]] *times* the heaviest queries at k× — but parity at
  * scale was never *hash-checked*, and the r8 sf0.1 sweep proved that
  * knife-edge classes (a `round(avg(...))` landing on .5 exactly) only
  * surface once the data is big enough to hit them. This main dumps
  * the five heaviest queries' results on the k× replica of sf0.1
  * (~6M lineitem rows / 50k docs at the default k=10) so
  * `tools/scalegate.py` can replay their oracles in DuckDB over the
  * SAME replica and hash-compare — the sf0.01 gate's exact discipline,
  * one decade up. Run once per round (PERF.md records the table).
  *
  * usage: `graft.ScaleGate [k] [srcDir] [outRoot]`
  * (defaults: 10, $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1,
  * target/scalegate) — writes `outRoot/data/` (the replica, other
  * tables symlinked) and `outRoot/verify/<query>/` + oracle_sql.json.
  */
object ScaleGate {

  /** The gate set (widened to 10 per the r10 verdict): the five
    * heaviest/scale-riskiest fs/merge rows from r9 — the publish join
    * whose output is the corpus, the one-exchange merge, the
    * ancestor-explode rollup, the banded MinHash pair join, the
    * anchored substring-dedup join — plus the five heaviest rows of
    * the knife-edge classes the fs set missed: the components
    * clustering over the pair graph, the sharded pack manifest, the
    * percentile-cut curriculum order (its band boundaries are exactly
    * the round()/percentile-sensitive shape the r8 sweep caught), the
    * gap-based sessionizer over the now-replicated events, and TPC-H
    * q21's 4-way lineitem self-join.
    */
  val gated: Seq[String] = Seq(
    "fs_es_docs", "fs_merge_upsert", "fs_dir_rollup_explode",
    "docs_minhash_neardup", "docs_exact_substrings",
    "docs_neardup_clusters", "docs_pack_segments_sharded",
    "docs_curriculum_order_ranged", "events_sessionize",
    "q21_waiting_suppliers")

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val src =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outRoot = if (args.length > 2) args(2) else "target/scalegate"
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val root = Paths.get(outRoot)
    Bench.rm(root) // NOFOLLOW-safe: symlinked source tables survive
    val data = root.resolve("data")
    Files.createDirectories(data)
    val t0 = System.nanoTime()
    ScaleProbe.materialize(spark, src, k, data)
    System.err.println(
      f"[scalegate] k=$k replica of $src in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val out = root.resolve("verify")
    Files.createDirectories(out)
    val qs = SparkEntry.queries
    // SPARK_GRAFT_GATED=a,b,c restricts the gate set — the k=100
    // (~sf10) decade runs only the three heaviest rows, where dumping
    // all ten would cost an hour to re-prove the same classes.
    // VALIDATED: the override must be a non-empty subset of the gate
    // set (a typo'd name would otherwise throw a raw
    // NoSuchElementException from qs(name) mid-run), and the active
    // subset is recorded in gate_meta.json beside the oracles so a
    // three-row decade artifact can never masquerade as full coverage.
    val run = sys.env.get("SPARK_GRAFT_GATED")
      .map { s =>
        val names = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(names.nonEmpty,
          "SPARK_GRAFT_GATED is set but names no queries")
        val unknown = names.filterNot(gated.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_GATED names queries outside the gate set: " +
            s"${unknown.mkString(", ")} — valid: ${gated.mkString(", ")}")
        names
      }
      .getOrElse(gated)
    run.foreach { name =>
      val t1 = System.nanoTime()
      qs(name)(spark, data.toString).coalesce(1)
        .write.mode("overwrite").parquet(out.resolve(name).toString)
      System.err.println(
        f"[scalegate] $name dumped in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    def q(s: String): String =
      "\"" + graft.functions.JsonText.esc(s) + "\""
    val json = SparkEntry.oracleSql
      .filter { case (n, _) => run.contains(n) }
      .map { case (n, v) => s"${q(n)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(out.resolve("oracle_sql.json"), json)
    // record what this artifact actually covers: k, the active subset,
    // and whether an override narrowed it — downstream checks can tell
    // a 3-row k=100 run from the full gate without inference
    val meta = Seq(
      s"${q("k")}: $k",
      s"${q("override")}: ${sys.env.contains("SPARK_GRAFT_GATED")}",
      s"${q("gated")}: [${run.map(q).mkString(", ")}]",
      s"${q("gate_full")}: [${gated.map(q).mkString(", ")}]")
      .mkString("{", ", ", "}")
    Files.writeString(out.resolve("gate_meta.json"), meta)
    spark.stop()
  }
}

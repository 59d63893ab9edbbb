package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale spot-probe (VERDICT r8 "Next round" #6): the driver ships
  * sf0.1 as its largest corpus, so every per-round bench number is a
  * ~60k-file / 5k-doc measurement — this probe pins how the five
  * heaviest operators actually SCALE by synthesizing k× replicas of
  * sf0.1 (k ∈ 1, 4, 10 by default) and fitting each query's exponent
  * `ln(t_k/t_1)/ln(k)`. Anything meaningfully superlinear is a 100 TB
  * risk no single-scale second can show.
  *
  * Replication preserves the workload's SHAPE, not just its row count:
  * - `lineitem`/`orders` copies shift their order keys past the
  *   original max, so the synthetic fs gains k× files in k× distinct
  *   order directories under the same nation/customer fanout (the
  *   modulo-carved hidden/recent/tmp classes keep their density).
  * - `documents` copies shift doc_id AND tag every token with the copy
  *   ordinal: each replica reproduces sf0.1's internal duplicate
  *   families but shares no shingles across replicas — family COUNT
  *   grows k×, family SIZE stays constant, which is how a genuinely
  *   larger corpus behaves. Naive replication would instead merge
  *   every family across copies and the banded join's per-family
  *   quadratic term would masquerade as engine superlinearity.
  * - `customer`/`nation` are symlinked verbatim (broadcast dims).
  * All copies (including k=1) are written `repartition(32)` so input
  * parallelism is identical across scales — the raw-vs-resharded
  * file-shape effect (PERF.md) never pollutes the curve.
  *
  * usage: `graft.ScaleProbe [factors...]` (defaults 1 4 10)
  */
object ScaleProbe {

  val headline: Seq[String] = Seq(
    "fs_es_docs", "fs_merge_upsert", "fs_dir_rollup_explode",
    "docs_minhash_neardup", "docs_neardup_clusters",
    // round-9 rows whose joins a reviewer would probe at scale: the
    // anchored substring pair join and the cover anti-join scrub
    "docs_exact_substrings", "docs_span_scrub_minlen")

  /** Write the k× replica of `src` into `dst`: lineitem / orders /
    * documents replicate with shifted keys (and per-copy token tags,
    * per the header's family-shape argument); EVERY other table is
    * symlinked verbatim (broadcast dims for the probe; and the
    * [[ScaleGate]] DuckDB harness registers all ten views, so they
    * must all resolve). Shared by the timing probe and the per-round
    * scale correctness gate — one replica recipe, two consumers.
    */
  private[graft] def materialize(spark: SparkSession, src: String,
      k: Int, dst: java.nio.file.Path): Unit = {
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val shift = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val docShift = docs.agg(max("doc_id")).head().getLong(0) + 1

    // ONE scan × a broadcast range(k), not a k-way union: at k=1000
    // the union form is a 1000-branch plan (minutes of planning, k
    // scans of the same file); the cross-join form emits the identical
    // row multiset (ScaleProbeSpec pins it against the union shape).
    // The SOURCE repartitions to 32 BEFORE the fan-out — the sf0.1
    // tables are single-file/single-split, so exploding first would
    // serialize k× the corpus through one task (measured: a lone map
    // task emitting a 26+ GB shuffle at k=1000) — and the write then
    // inherits those 32 partitions with NO post-explode shuffle at all.
    def copies(df: DataFrame,
        f: (DataFrame, Column) => DataFrame): DataFrame = {
      val tagged = df.repartition(32).crossJoin(
        broadcast(spark.range(k).select(col("id").as("copy_i"))))
      f(tagged, col("copy_i")).drop("copy_i")
    }

    copies(li, (d, i) => d.withColumn("l_orderkey",
        col("l_orderkey") + i * lit(shift)))
      .write.parquet(s"$dst/lineitem.parquet")
    copies(ord, (d, i) => d.withColumn("o_orderkey",
        col("o_orderkey") + i * lit(shift)))
      .write.parquet(s"$dst/orders.parquet")
    // copy 0 keeps the ORIGINAL text: prefixing every token kept the
    // copies' shingle/anchor spaces pairwise disjoint (the dedup rows
    // must not mint cross-copy pairs), but it also renamed every term,
    // so a term-addressed serving row (docs_bm25_indexed's fixed query
    // terms) matched nothing on the replica. An unprefixed copy 0 is
    // still disjoint from every prefixed copy i>0, within-copy
    // semantics are unchanged, and the BM25 gate row gets real hits
    // whose df/n/avgdl run over the FULL replica corpus.
    copies(docs, (d, i) => d
        .withColumn("doc_id", col("doc_id") + i * lit(docShift))
        .withColumn("text", when(i === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(lit("c"), i.cast("string"), lit("_"), t)), " ")))
        .withColumn("n_chars", length(col("text"))))
      .write.parquet(s"$dst/documents.parquet")
    // events replicate with disjoint users AND event ids, so the
    // sessionize/window gate rows scale in session COUNT (the way real
    // traffic grows) rather than stretching one user's history
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evShift = ev.agg(max("event_id")).head().getLong(0) + 1
    val userShift = ev.agg(max("user_id")).head().getLong(0) + 1
    copies(ev, (d, i) => d
        .withColumn("event_id", col("event_id") + i * lit(evShift))
        .withColumn("user_id", col("user_id") + i * lit(userShift)))
      .write.parquet(s"$dst/events.parquet")
    val scaledTables = Set("lineitem", "orders", "documents", "events")
    val s = Files.list(Paths.get(src))
    try {
      s.forEach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".parquet") &&
            !scaledTables.contains(n.stripSuffix(".parquet")))
          Files.createSymbolicLink(dst.resolve(n), p.toAbsolutePath): Unit
      }
    } finally s.close()
  }

  /** Write the k× replica of `src` into a temp dir and return it. */
  private[graft] def scaled(spark: SparkSession, src: String,
      k: Int): String = {
    val dst = Files.createTempDirectory(s"scaleprobe$k")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try Bench.rm(dst) catch { case _: Throwable => () }))
    materialize(spark, src, k, dst)
    dst.toString
  }

  def main(args: Array[String]): Unit = {
    val factors =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 4, 10)
    require(factors.headOption.contains(1),
      "first factor must be 1 (the exponent fit's baseline)")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = SparkEntry.queries

    // rows: factor -> (query -> sec)
    val times = factors.map { k =>
      val dir = scaled(spark, src, k)
      val row = headline.map { name =>
        val (sec, _, _, _) =
          Bench.timedMinOf2(() => Bench.checksum(qs(name)(spark, dir)))
        System.err.println(f"[scaleprobe] k=$k $name ${sec}%.3f s")
        name -> sec
      }.toMap
      Bench.rm(Paths.get(dir))
      k -> row
    }.toMap

    val base = times(factors.head)
    val cells = headline.map { name =>
      val per = factors.map(k =>
        s""""$k":${"%.3f".format(times(k)(name))}""").mkString(",")
      // exponent from the largest factor vs baseline
      val kMax = factors.last
      val e = math.log(times(kMax)(name) / base(name)) / math.log(kMax)
      s""""$name":{$per,"exp":${"%.2f".format(e)}}"""
    }
    println(s"""{"probe":"scale","factors":[${factors.mkString(",")}],"queries":${cells.mkString("{", ",", "}")},"src":"$src","cpus":${Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}

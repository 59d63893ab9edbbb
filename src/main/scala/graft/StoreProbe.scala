package graft

import org.apache.spark.sql.functions._

/** Durable-store timing harness: `graft.StoreProbe <term|ann|neardup>
  * [sfDir] [batches]` — builds the store incrementally in `batches`
  * updates and times BUILD and SERVE separately ([[Bench]]'s session;
  * serve is warmup+min-of-2 like QueryTime), so PERF.md can state the
  * amortization point of each index: a from-scratch batch query pays
  * its full cost per run, the store pays build once and serves reads
  * after.
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.StoreProbe <term|ann|annadc|batchserve|batchtext|" +
        "neardup|zorder|mor> [sfDir] [batches] [replicate]")
    val kind = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = if (args.length > 2) args(2).toInt else 4
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-probe-$kind").toString

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val (buildSec, serve): (Double, () => Long) = kind match {
      case "term" =>
        // optional 4th arg: corpus replication factor — the
        // amortization probe (unique ids, one-token suffix difference;
        // batch-query cost grows with the corpus, store serving
        // shouldn't)
        val replicate = if (args.length > 3) args(3).toInt else 1
        val base = Tables(spark, sfDir, "documents")
          .select("doc_id", "text")
        val docs =
          if (replicate == 1) base
          else base
            .withColumn("r",
              explode(sequence(lit(0), lit(replicate - 1))))
            .select((col("doc_id") * replicate + col("r")).as("doc_id"),
              concat(col("text"), lit(" rep"), col("r")).as("text"))
            .localCheckpoint(true) // probe the ops, not the replication
        val (bq1, nHits) = time(
          operators.TextOps.bm25TopkOf(docs).collect().length)
        val (bq2, _) = time(
          operators.TextOps.bm25TopkOf(docs).collect().length)
        System.err.println(
          f"term from-scratch batch query at ${replicate}x: " +
            f"${math.min(bq1, bq2)}%.3f s ($nHits rows, min of 2)")
        val (b, _) = time((0 until batches).foreach { i =>
          operators.TermIndex.update(spark, dir,
            docs.filter(pmod(col("doc_id"), lit(batches)) === i))
        })
        (b, () => operators.TermIndex
          .search(spark, dir, operators.TextOps.bmTerms, k = 20).count())
      case "ann" | "annadc" =>
        // ONE build recipe for both serving probes — "annadc" times the
        // compressed-domain path (probed cells' PQ code columns only,
        // never the vectors) against the SAME store shape "ann" serves
        // exact cosine from; a drifted recipe would invalidate the
        // PERF.md ADC-vs-exact comparison
        val emb = Tables(spark, sfDir, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0)
        val (b, _) = time {
          operators.AnnIndex.build(spark, dir, emb.filter(
            col("vec_id").between(1, 8) ||
              pmod(col("vec_id"), lit(batches)) === 0))
          (1 until batches).foreach { i =>
            operators.AnnIndex.update(spark, dir, emb.filter(
              !col("vec_id").between(1, 8) &&
                pmod(col("vec_id"), lit(batches)) === i))
          }
        }
        val serve: () => Long =
          if (kind == "ann")
            () => operators.AnnIndex
              .search(spark, dir, q, k = 10, nprobe = 2).count()
          else
            () => operators.AnnIndex
              .searchAdc(spark, dir, q, k = 10, nprobe = 2).count()
        (b, serve)
      case "batchserve" =>
        // batch-vs-single serving amortization at the COMPRESSED tiers:
        // Q single-query plans each pay centroid probe + pruned scan +
        // top-k; one searchAllAdc/searchAllHamming plan answers all Q —
        // the offline-inference shape the batch tiers exist for.
        // Per-query ms for both arms go to stderr for PERF.md.
        val emb = Tables(spark, sfDir, "embeddings")
        val (b, _) = time(operators.AnnIndex.build(spark, dir, emb))
        val queries = emb.filter(col("vec_id").between(0, 15))
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
          .localCheckpoint(true)
        val qvecs = queries.collect()
          .map(r => r.getSeq[Float](1)).toSeq
        val nq = qvecs.length
        def arm(name: String, f: () => Long): Double = {
          val (sec, _, _, _) = Bench.timedMinOf2(f)
          System.err.println(
            f"batchserve $name: $sec%.3f s (${sec * 1000 / nq}%.1f ms/query)")
          sec
        }
        val sAdc = arm("adc-single-x" + nq, () => qvecs.map(q =>
          operators.AnnIndex.searchAdc(spark, dir, q, 10, 2).count()).sum)
        val bAdc = arm("adc-batch", () => operators.AnnIndex
          .searchAllAdc(spark, dir, queries, 10, 2).count())
        val sHam = arm("hamming-single-x" + nq, () => qvecs.map(q =>
          operators.AnnIndex.searchHamming(spark, dir, q, 10, 2).count())
          .sum)
        val bHam = arm("hamming-batch", () => operators.AnnIndex
          .searchAllHamming(spark, dir, queries, 10, 2).count())
        val sMrl = arm("mrl-single-x" + nq, () => qvecs.map(q =>
          operators.AnnIndex.searchMatryoshka(spark, dir, q, 10, 2).count())
          .sum)
        val bMrl = arm("mrl-batch", () => operators.AnnIndex
          .searchAllMatryoshka(spark, dir, queries, 10, 2).count())
        System.err.println(
          f"batchserve speedup: adc ${sAdc / bAdc}%.1fx, " +
            f"hamming ${sHam / bHam}%.1fx, mrl ${sMrl / bMrl}%.1fx at Q=$nq")
        (b, () => operators.AnnIndex
          .searchAllAdc(spark, dir, queries, 10, 2).count())
      case "batchtext" =>
        // batch-vs-single serving amortization at the TEXT and HYBRID
        // tiers — the term-index twin of "batchserve": Q single-query
        // plans each pay a pruned postings scan + scoring + top-k (and
        // the hybrid form pays BOTH stores per query); one
        // searchAll / hybridServeAll plan answers all Q. Per-query ms
        // for all four arms go to stderr for PERF.md.
        import spark.implicits._
        val docs = Tables(spark, sfDir, "documents")
          .select("doc_id", "text")
        val emb = Tables(spark, sfDir, "embeddings")
        val termDir = s"$dir/term"
        val annDir = s"$dir/ann"
        val (b, _) = time {
          (0 until batches).foreach { i =>
            operators.TermIndex.update(spark, termDir,
              docs.filter(pmod(col("doc_id"), lit(batches)) === i))
          }
          operators.AnnIndex.build(spark, annDir, emb)
        }
        // 16 deterministic term queries from the corpus itself (first
        // three tokens of docs 1..16 — distinct vocab, so the batch
        // bucket union is a real multi-term workload, not one query
        // replicated)
        // q_id = doc_id so the vector leg (vec_id 0..15, aligned with
        // doc_id in the corpus) queries the SAME document as the text
        // leg — the earlier doc_id-1 shift paired doc q+1's terms with
        // doc q's embedding, skewing per-leg overlap in the fusion
        val termSets = docs.filter(col("doc_id").between(0, 15))
          .select(col("doc_id"),
            slice(split(col("text"), " "), 1, 3).as("terms"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
        val tq = termSets.toDF("q_id", "terms").localCheckpoint(true)
        val vq = emb.filter(col("vec_id").between(0, 15))
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
          .localCheckpoint(true)
        val nq = termSets.length
        def arm(name: String, f: () => Long): Double = {
          val (sec, _, _, _) = Bench.timedMinOf2(f)
          System.err.println(
            f"batchtext $name: $sec%.3f s (${sec * 1000 / nq}%.1f ms/query)")
          sec
        }
        val sText = arm("text-single-x" + nq, () => termSets.map {
          case (_, ts) =>
            operators.TermIndex.search(spark, termDir, ts, k = 20).count()
        }.sum)
        val bText = arm("text-batch", () => operators.TermIndex
          .searchAll(spark, tq, termDir, k = 20).count())
        val sHyb = arm("hybrid-single-x" + nq, () => termSets.map {
          case (qid, ts) =>
            operators.VectorOps.hybridServeAll(spark,
              Seq((qid, ts)).toDF("q_id", "terms"),
              vq.filter(col("q_id") === qid),
              termDir, annDir, legK = 50, k = 10).count()
        }.sum)
        val bHyb = arm("hybrid-batch", () => operators.VectorOps
          .hybridServeAll(spark, tq, vq, termDir, annDir,
            legK = 50, k = 10).count())
        System.err.println(
          f"batchtext speedup: text ${sText / bText}%.1fx, " +
            f"hybrid ${sHyb / bHyb}%.1fx at Q=$nq")
        (b, () => operators.TermIndex
          .searchAll(spark, tq, termDir, k = 20).count())
      case "neardup" =>
        val docs = Tables(spark, sfDir, "documents")
          .select("doc_id", "text")
        var pairs = 0L
        val (b, _) = time((0 until batches).foreach { i =>
          pairs += operators.NearDupIndex.update(spark, dir,
            docs.filter(pmod(col("doc_id"), lit(batches)) === i)).count()
        })
        val probeHalf = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        (b, () => operators.NearDupIndex
          .probe(spark, dir, probeHalf).count())
      case "mor" =>
        // write-amplification probe: the same 1% batch upserted into a
        // copy-on-write index (full snapshot rewrite) vs appended to
        // the MOR log (write ∝ batch); read legs show the MOR read tax
        val orders = Tables(spark, sfDir, "orders")
        val idxC = new sinks.ParquetIndex(s"$dir/cow")
        val idxM = new sinks.ParquetIndex(s"$dir/mor")
        val (b, _) = time {
          idxC.write(orders): Unit
          idxM.appendDelta(spark, orders): Unit
        }
        val batch = orders.filter(col("o_orderkey") % 97 === 0)
        val (tCow, _) = time(idxC.upsert(spark, batch, "o_orderkey",
          "o_orderdate", batchWinsTies = true))
        val (tMor, _) = time(idxM.appendDelta(spark, batch))
        val (rCow, _) = time(idxC.read(spark).get.count())
        val (rMor, _) = time(idxM.readMor(spark, "o_orderkey",
          "o_orderdate", batchWinsTies = true).get.count())
        System.err.println(
          f"mor probe: batch=${batch.count()} of ${orders.count()} " +
            f"rows; write cow=$tCow%.3f s vs mor=$tMor%.3f s " +
            f"(${tCow / tMor}%.1fx); read cow=$rCow%.3f s vs " +
            f"mor=$rMor%.3f s")
        (b, () => idxM.readMor(spark, "o_orderkey", "o_orderdate",
          batchWinsTies = true).get.count())
      case "zorder" =>
        // layout "store": build = the z-order write + manifest; serve =
        // a manifest-pruned 10% range read on the SECOND clustered
        // column (the one a linear sort cannot serve). Span fractions
        // for both layouts go to stderr for PERF.md.
        val li = Tables(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val (b, _) = time {
          sinks.ZOrderLayout.write(li, dir, "l_orderkey", "l_partkey", 16)
          sinks.ZOrderLayout.writeManifest(spark, dir,
            Seq("l_orderkey", "l_partkey"))
        }
        def meanFrac(d: String, c: String): Double = {
          val sp = sinks.ZOrderLayout.fileSpans(spark.read.parquet(d), c)
            .collect().map(r => (r.getLong(1), r.getLong(2)))
          val (lo, hi) = (sp.map(_._1).min, sp.map(_._2).max)
          sp.map(s => (s._2 - s._1).toDouble / (hi - lo)).sum / sp.length
        }
        val linDir = s"$dir-linear"
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey")
          .write.mode("overwrite").parquet(linDir)
        System.err.println(
          f"zorder spans: orderkey=${meanFrac(dir, "l_orderkey")}%.3f " +
            f"partkey=${meanFrac(dir, "l_partkey")}%.3f; linear: " +
            f"orderkey=${meanFrac(linDir, "l_orderkey")}%.3f " +
            f"partkey=${meanFrac(linDir, "l_partkey")}%.3f")
        val Array(pLo, pHi) = li
          .agg(min(col("l_partkey")).cast("long"),
            max(col("l_partkey")).cast("long")).collect()(0) match {
          case r => Array(r.getLong(0), r.getLong(1))
        }
        val qLo = pLo + (pHi - pLo) / 2
        val qHi = qLo + (pHi - pLo) / 10
        (b, () => sinks.ZOrderLayout
          .prunedRead(spark, dir, "l_partkey", qLo, qHi).count())
      case other => sys.error(s"unknown store kind: $other")
    }

    val (serveSec, n, _, _) = Bench.timedMinOf2(serve)
    println(f"""{"store":"$kind","build_sec":$buildSec%.3f,"batches":$batches,"serve_sec":$serveSec%.3f,"serve_rows":$n,"sf":"$sfDir"}""")
    spark.stop()
  }
}

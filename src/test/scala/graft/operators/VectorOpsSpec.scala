package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Semantic bounds the oracle's value-equality can't express: the int8
  * quantizer must actually compress into int8 range and reconstruct
  * within one quantization step.
  */
class VectorOpsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  test("int8 quantization: codes in range, error under one quant step") {
    val steps = graft.Tables(spark, sf, "embeddings")
      .withColumn("mx", expr(
        """aggregate(transform(embedding, v -> cast(v AS double)),
          |  cast(0.0 AS double), (a, v) -> greatest(a, abs(v)))"""
          .stripMargin))
      .select(col("vec_id"), (col("mx") / 127.0).as("step"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = VectorOps.scalarQuant(spark, sf).collect()
    assert(rows.length == steps.size)
    rows.foreach { r =>
      val (id, qMax, maxErr, mse) =
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))
      assert(qMax <= 128, s"vec $id code $qMax out of int8 magnitude")
      // floor quantization: |x - q/s| < 1/s = step (+ rounding slack)
      assert(maxErr <= steps(id) + 1e-6, s"vec $id err $maxErr > step")
      assert(mse <= maxErr * maxErr + 1e-12, s"vec $id mse $mse")
    }
  }

  test("kmeans step: full K x d grid, members conserved, means in hull") {
    val rows = VectorOps.kmeansStep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 8 * 64, s"${rows.length} cells x dims")
    // every cell has the same member count across dims, and the counts
    // sum to the corpus size
    val byCell = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct)
    byCell.foreach { case (c, ns) => assert(ns.length == 1, s"cell $c") }
    assert(byCell.values.map(_.head).sum == 500)
    // a mean in micro-units stays inside the member hull; embeddings
    // are small floats, so |centroid| must stay well under 10 units
    rows.foreach { case (_, _, _, micro) =>
      assert(math.abs(micro) < 10L * 1000000L, s"centroid $micro")
    }
  }

  test("PQ codes: in range, reconstruction error sane, ADC beats chance") {
    val codes = VectorOps.pqCodes(spark, sf).collect()
    assert(codes.length == graft.Tables(spark, sf, "embeddings").count())
    codes.foreach { r =>
      (1 to 4).foreach(i => assert(r.getInt(i) >= 0 && r.getInt(i) <= 7,
        s"code out of range: $r"))
      assert(r.getDouble(5) >= 0.0, s"negative recon error: $r")
    }
    // the 8 seed vectors quantize to themselves in every subspace:
    // their reconstruction error is exactly 0
    codes.filter(r => r.getLong(0) >= 1 && r.getLong(0) <= 8)
      .foreach(r => assert(r.getDouble(5) == 0.0, s"seed not exact: $r"))
    // ADC serving: the compressed-domain top-10 must overlap the exact
    // brute-force top-10 better than chance (500 candidates — chance
    // overlap ~0.2 ids; require at least 3: PQ with 4×8 codes is
    // coarse, but not useless)
    val adc = VectorOps.pqAdcTopk(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val brute = VectorOps.topkBrute(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(adc.size == 10)
    assert((adc & brute).size >= 3,
      s"ADC top-10 overlaps brute top-10 only ${(adc & brute).size}")
    // the composed IVF-PQ results are a SUBSET of full-corpus ADC
    // semantics: every returned id carries the same ADC score the
    // uncomposed query assigns it (cell pruning changes the candidate
    // set, never a survivor's score)
    val adcScores = VectorOps.pqAdcTopk(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivfpq = VectorOps.ivfPqTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivfpq.length == 10)
    ivfpq.foreach { case (id, d) =>
      adcScores.get(id).foreach(expected =>
        assert(expected == d, s"score drift for $id: $d vs $expected"))
    }
  }

  test("hybrid fusion head converges under leg truncation (the scale shape)") {
    // production serving truncates each index-served leg to top-N and
    // accepts the fusion-tail approximation. This runs the validation
    // any deployment should run when picking its N — and documents
    // BOTH sides of it on this corpus: N=400 reproduces the full
    // fusion's top-20 exactly, while N=200 measurably does not (a
    // tail-rank contribution 1/(60+r) still reorders the head when
    // top-20 is 4% of a 500-doc corpus). The threshold is corpus-
    // relative; what transfers to 1e9 docs is the convergence check,
    // not the constant.
    def fusion(legK: Int) =
      VectorOps.hybridIndexedK(spark, sf, legK).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val full = fusion(100000)
    assert(fusion(400) == full, "N=400 should already be converged")
    // the divergent side is a CORPUS property, not a code property —
    // report it rather than gate on it (a testdata regeneration could
    // legitimately make N=200 coincide without any product bug)
    if (fusion(200) == full)
      info("N=200 also converged on this corpus — the documented " +
        "divergence example no longer holds; consider refreshing it")
  }

  test("hybrid fusion converges under the COMPRESSED (ADC) vector leg") {
    // the 100 TB serving shape: the vector leg scored from nprobe-pruned
    // PQ codes, never the raw embedding column. Same convergence
    // discipline as the raw-leg test — the fusion head must stabilize
    // once legK covers the head's support — plus the full-probe anchor:
    // at nprobe = 8 (all cells) the ADC leg ranks every vector, so
    // further raising legK changes nothing.
    def fusion(legK: Int, nprobe: Int) =
      VectorOps.hybridIndexedAdcK(spark, sf, legK, nprobe).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val full = fusion(100000, 8)
    assert(full.length == 20)
    assert(fusion(400, 8) == full,
      "legK=400 should already be converged under the ADC leg")
    // nprobe truncation is the OTHER serving knob: fewer probed cells
    // only drop tail candidates once legK is head-covering; on this
    // corpus nprobe=4 keeps the head. As with N=200 above, the exact
    // constant is a corpus property — report drift, don't gate on it.
    if (fusion(400, 4) != full)
      info("nprobe=4 no longer reproduces the full-probe ADC head on " +
        "this corpus — refresh the documented example")
    // the compressed leg is an approximation of the exact-cosine leg:
    // the heads may LEGITIMATELY differ (ADC ranks != cosine ranks).
    // What must hold is that both fusions rank from the same text leg
    // and a well-formed vector leg: every row carries at least one rank
    full.foreach { case (id, rrf) =>
      assert(rrf > 0.0, s"doc $id fused with no contributing leg")
    }
  }

  test("semdedup: removals point at a smaller same-cluster keeper") {
    val rows = VectorOps.semDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val removed = rows.map(_.getLong(0))
    assert(removed.distinct.length == removed.length,
      "a vector may be removed only once")
    rows.foreach { r =>
      val (rid, dupOf, n) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(dupOf < rid, s"$rid kept a LARGER id $dupOf")
      assert(n >= 1)
    }
    // the survivor set must be duplicate-free at the same threshold:
    // every removed row's keeper must itself survive OR chain to a
    // survivor (min-id grouping guarantees the cluster minimum survives)
    val rm = removed.toSet
    val dupOf = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      var k = r.getLong(2)
      var hops = 0
      while (rm.contains(k) && hops < rows.length) {
        k = dupOf(k); hops += 1
      }
      assert(!rm.contains(k), s"keeper chain of ${r.getLong(0)} never exits")
    }
  }

  test("hard negatives: cross-label only, similarity-ranked, 5 per query") {
    val qLabels = graft.Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < 5).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = VectorOps.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.length == qLabels.size * 5)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to 5), s"query $q ranks")
      // a negative never shares the query's label — that's the point
      sorted.foreach { case (_, v, lbl, _, _) =>
        assert(lbl != qLabels(q), s"query $q negative $v has own label")
      }
      val sims = sorted.map(_._4)
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b },
        s"query $q not similarity-descending")
    }
  }

  test("label outliers: own-label members, distance-ranked, 5 per label") {
    val labelOf = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = VectorOps.labelOutliers(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val labels = labelOf.values.toSet
    assert(rows.length == labels.size * 5)
    rows.groupBy(_._1).foreach { case (lbl, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5), s"label $lbl ranks")
      sorted.foreach { case (_, v, _, _) =>
        assert(labelOf(v) == lbl, s"outlier $v reported under $lbl") }
      val d = sorted.map(_._3)
      assert(d.zip(d.drop(1)).forall { case (a, b) => a >= b },
        s"label $lbl not distance-descending")
      assert(d.forall(_ >= 0L))
    }
  }

  test("nprobe sweep: recall non-decreasing, all-cells row exact") {
    // The ladder's invariants: widening the probe can only add
    // candidates (recall monotone), and nprobe=8 scans every cell, so
    // its top-10 IS the exact top-10 — recall exactly 1.0, the row
    // that proves the sweep's candidate plumbing drops nothing.
    val rows = VectorOps.nprobeSweep(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getDouble(2)).toSeq
    assert(recalls.sliding(2).forall(p => p.head <= p.last),
      s"recall not monotone: $recalls")
    assert(recalls.last == 1.0, s"all-cells recall ${recalls.last} != 1")
  }

  test("store-served hamming re-rank: stage-1 scan never reads vectors") {
    // The two-stage discipline's scale contract: stage 1 (Hamming
    // shortlist) must scan ONLY the 16-byte sketch columns of the
    // postings — raw `embedding` bytes are decoded solely by the
    // stage-2 shortlist join. Two postings scans in the plan: exactly
    // one carries `embedding` in its ReadSchema (stage 2), and the
    // sketch scan must not.
    val df = VectorOps.hammingIndexedRerank(spark, "/root/testdata/sf0.001")
    val schemas = "ReadSchema: [^\\n]*".r
      .findAllIn(df.queryExecution.executedPlan.toString)
      .toList.filter(s => s.contains("b_lo") || s.contains("embedding"))
    val sketchScans = schemas.filter(s =>
      s.contains("b_lo") && !s.contains("embedding"))
    val rawScans = schemas.filter(_.contains("embedding"))
    assert(sketchScans.nonEmpty,
      s"no pruned sketch-only postings scan found in: $schemas")
    assert(rawScans.forall(!_.contains("b_lo")),
      s"a raw-vector scan also reads sketch words: $schemas")
  }

  test("batch hybrid serving matches per-query single fusion bit-for-bit") {
    import spark.implicits._
    val termDir = TextOps.termIndexFor(spark, sf)
    val annDir = VectorOps.annIndexFor(spark, sf)
    val emb = graft.Tables(spark, sf, "embeddings")
    val termSets = Seq(
      (0L, Seq("spark", "hash", "window")),
      (1L, Seq("spark", "window")),
      (2L, Seq("hash")))
    val vids = Map(0L -> 0L, 1L -> 100L, 2L -> 200L)
    val tq = termSets.toDF("q_id", "terms")
    val vq = emb.filter(col("vec_id").isin(vids.values.toSeq: _*))
      .select(col("vec_id"), col("embedding").as("qe"))
      .withColumn("q_id",
        when(col("vec_id") === 0L, 0L)
          .when(col("vec_id") === 100L, 1L).otherwise(2L))
      .select("q_id", "qe")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), r.getDouble(4)))
      .sortBy(t => (t._1, -t._5, t._2)).toSeq
    val batch = rows(VectorOps.hybridServeAll(spark, tq, vq,
      termDir, annDir, legK = 100, k = 10))
    val singles = termSets.flatMap { case (qid, ts) =>
      rows(VectorOps.hybridServeAll(spark,
        Seq((qid, ts)).toDF("q_id", "terms"),
        vq.filter(col("q_id") === qid),
        termDir, annDir, legK = 100, k = 10))
    }.sortBy(t => (t._1, -t._5, t._2))
    assert(batch == singles)

    // per-leg serving observability: each store reports its own pruned
    // -scan breadth through the hybrid plan (the two legs page
    // different on-call surfaces)
    val tObs = org.apache.spark.sql.Observation("hybrid_text")
    val vObs = org.apache.spark.sql.Observation("hybrid_vec")
    VectorOps.hybridServeAll(spark, tq, vq, termDir, annDir,
      legK = 100, k = 10, textObs = Some(tObs), vecObs = Some(vObs))
      .collect()
    val tm = tObs.get
    assert(tm("postings_rows_read").asInstanceOf[Long] > 0L &&
      tm("buckets_probed").asInstanceOf[Int] <=
        tm("buckets_total").asInstanceOf[Int], s"text leg: $tm")
    val vm = vObs.get
    assert(vm("postings_rows_read").asInstanceOf[Long] > 0L &&
      vm("queries_served") == termSets.length.toLong, s"vec leg: $vm")
  }

  test("store-served matryoshka re-rank equals the batch form; its " +
    "stage-1 scan reads only the prefix column") {
    val batch = VectorOps.matryoshkaRerank(spark, sf)
      .collect().map(_.toString).toSeq
    val df = VectorOps.matryoshkaIndexed(spark, sf)
    val served = df.collect().map(_.toString).toSeq
    assert(served == batch)
    val schemas = "ReadSchema: [^\\n]*".r
      .findAllIn(df.queryExecution.executedPlan.toString)
      .toList.filter(s => s.contains("m16") || s.contains("embedding"))
    val prefixScans = schemas.filter(s =>
      s.contains("m16") && !s.contains("embedding"))
    val rawScans = schemas.filter(_.contains("embedding"))
    assert(prefixScans.nonEmpty,
      s"no prefix-only postings scan found in: $schemas")
    assert(rawScans.forall(!_.contains("m16")),
      s"a raw-vector scan also reads the prefix column: $schemas")
  }

  test("ADC re-rank: true distances, and refinement beats raw ADC order") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    // ground truth: exact d2 top-10 over the whole corpus
    val exactTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr("vec_dist2(embedding, qe)"), 4).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val rerank = VectorOps.pqAdcRerank(spark, sf).collect()
    assert(rerank.length == 10)
    // the emitted exact_d2 IS the true distance (independent recompute)
    val trueD2 = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr("vec_dist2(embedding, qe)"), 4).as("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rerank.foreach { r =>
      assert(r.getDouble(2) == trueD2(r.getLong(0)),
        s"exact_d2 drifted for vec ${r.getLong(0)}")
    }
    // monotone in exact_d2, and refinement recall >= raw ADC recall
    val ds = rerank.map(_.getDouble(2))
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a <= b })
    val adcTop = VectorOps.pqAdcTopk(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val rerankIds = rerank.map(_.getLong(0)).toSet
    assert((rerankIds & exactTop).size >= (adcTop & exactTop).size,
      s"re-rank recall ${(rerankIds & exactTop).size} < " +
        s"ADC recall ${(adcTop & exactTop).size}")
  }
}

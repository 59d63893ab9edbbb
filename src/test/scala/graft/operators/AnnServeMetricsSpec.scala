package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Serving observability on the store-backed ANN tiers: the metrics a
  * production vector service alarms on — postings rows actually read,
  * cells probed vs cells in the store — must match what the pruned
  * plan promises: exactly the nprobe nearest cells' postings, never
  * the whole store.
  */
class AnnServeMetricsSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("hamming + ADC serving report pruned-scan metrics that match " +
    "an independent count of the probed cells' postings") {
    val dir = Files.createTempDirectory("annobs").toString
    val emb = graft.Tables(spark, sf, "embeddings")
    AnnIndex.build(spark, dir, emb)
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0)

    // independent expectation: the 2 nearest cells by the store's own
    // assignment rule, and the postings row count inside them
    graft.functions.GraftFunctions.register(spark)
    val cells = spark.read.parquet(s"$dir/centroids")
      .withColumn("qe", typedLit(q))
      .withColumn("d2", round(
        expr("vec_dot(ce, ce) - 2 * vec_dot(ce, qe) + vec_dot(qe, qe)"),
        4))
      .orderBy(col("d2"), col("c_id"))
      .limit(2)
      .select(col("c_id").cast("int")).collect().map(_.getInt(0))
    val postings = spark.read.parquet(s"$dir/postings")
    val expRows = postings
      .filter(col("c_id").isin(cells.toIndexedSeq: _*)).count()
    val allRows = postings.count()
    assert(expRows > 0 && expRows < allRows,
      s"probe not selective: $expRows of $allRows")

    val hObs = Observation("hamming_serve")
    AnnIndex.searchHamming(spark, dir, q, k = 5, nprobe = 2,
      obs = Some(hObs)).collect()
    val hm = hObs.get
    assert(hm("postings_rows_read") == expRows, s"hamming: $hm")
    assert(hm("cells_probed") == 2, s"hamming: $hm")
    assert(hm("cells_total") == 8L, s"hamming: $hm")

    val aObs = Observation("adc_serve")
    AnnIndex.searchAdc(spark, dir, q, k = 5, nprobe = 2,
      obs = Some(aObs)).collect()
    val am = aObs.get
    assert(am("postings_rows_read") == expRows, s"adc: $am")
    assert(am("cells_probed") == 2, s"adc: $am")
    assert(am("cells_total") == 8L, s"adc: $am")

    // matryoshka tier symmetry: the observation sits on the STAGE-1
    // prefix scan, so rows_read is the probed cells' postings (the
    // corpus-∝ scan), not the 50-row re-rank
    val mObs = Observation("mrl_serve")
    AnnIndex.searchMatryoshka(spark, dir, q, k = 5, nprobe = 2,
      obs = Some(mObs)).collect()
    val mm = mObs.get
    assert(mm("postings_rows_read") == expRows, s"mrl: $mm")
    assert(mm("cells_probed") == 2, s"mrl: $mm")
    assert(mm("cells_total") == 8L, s"mrl: $mm")
  }

  test("BATCH serving tiers report per-frame metrics that match an " +
    "independent count over every query's probed cells") {
    val dir = Files.createTempDirectory("annobsb").toString
    val emb = graft.Tables(spark, sf, "embeddings")
    AnnIndex.build(spark, dir, emb)
    val qids = Seq(0L, 50L, 100L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .localCheckpoint(true)

    // independent expectation: each query's 2 nearest cells by the
    // store's assignment rule; candidate rows = Σ_q postings in q's cells
    graft.functions.GraftFunctions.register(spark)
    val postings = spark.read.parquet(s"$dir/postings")
    val perCell = postings.groupBy("c_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cents = spark.read.parquet(s"$dir/centroids")
    val probedPairs = qids.flatMap { qid =>
      val q = emb.filter(col("vec_id") === qid)
        .select("embedding").collect()(0).getSeq[Float](0)
      cents.withColumn("qe", typedLit(q))
        .withColumn("d2", round(expr(
          "vec_dot(ce, ce) - 2 * vec_dot(ce, qe) + vec_dot(qe, qe)"), 4))
        .orderBy(col("d2"), col("c_id")).limit(2)
        .select(col("c_id").cast("int")).collect().map(_.getInt(0))
        .map(qid -> _)
    }
    val expRows = probedPairs.map { case (_, c) => perCell(c) }.sum

    // all four batch tiers share the post-cell-join observation point;
    // the tiny cardinalities here sit well inside HLL++'s exact range
    def check(name: String,
        run: Observation => org.apache.spark.sql.DataFrame): Unit = {
      val o = Observation(name)
      run(o).collect()
      val m = o.get
      assert(m("postings_rows_read") == expRows, s"$name: $m")
      assert(m("queries_served") == qids.length.toLong, s"$name: $m")
      assert(m("cells_probed") == probedPairs.length.toLong, s"$name: $m")
    }
    check("b_exact", o => AnnIndex.searchAll(spark, dir, queries,
      k = 5, nprobe = 2, obs = Some(o)))
    check("b_adc", o => AnnIndex.searchAllAdc(spark, dir, queries,
      k = 5, nprobe = 2, obs = Some(o)))
    check("b_ham", o => AnnIndex.searchAllHamming(spark, dir, queries,
      k = 5, nprobe = 2, obs = Some(o)))
    check("b_mrl", o => AnnIndex.searchAllMatryoshka(spark, dir, queries,
      k = 5, nprobe = 2, obs = Some(o)))
  }
}

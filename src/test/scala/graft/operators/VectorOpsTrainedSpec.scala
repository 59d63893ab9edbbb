package graft.operators

import graft.SparkSpecBase

/** `ann_pq_trained`'s load-bearing claims, pinned in-JVM (the DuckDB
  * gate checks the row's values; this checks the REASONS they matter):
  * one per-subspace Lloyd refinement must strictly reduce the corpus
  * PQ reconstruction error (Lloyd monotonicity: re-assignment then
  * per-cell means never increases within-cell d2, and on real data the
  * drop is strict), and must not lose ADC top-10 accuracy over the
  * fixed 64-query audit sample.
  */
class VectorOpsTrainedSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("trained PQ codebooks: recon error strictly drops, ADC overlap " +
    "does not") {
    val r = VectorOps.pqTrained(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val errSeeded = row.getAs[Long]("err_seeded_q4")
    val errTrained = row.getAs[Long]("err_trained_q4")
    val hitsSeeded = row.getAs[Long]("adc_hits_seeded")
    val hitsTrained = row.getAs[Long]("adc_hits_trained")
    assert(row.getAs[Long]("n_queries") == 64L)
    assert(errTrained < errSeeded,
      s"Lloyd round did not reduce recon error: $errTrained vs $errSeeded")
    assert(hitsTrained >= hitsSeeded,
      s"training lost ADC accuracy: $hitsTrained vs $hitsSeeded")
  }

  test("cold-path training: codebooks move off their seeds and keep " +
    "shape (exercised directly, bypassing the memoized store)") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables(spark, sf, "embeddings")
    val seeds = emb.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("c_id"), expr(
        "transform(embedding, x -> cast(x AS double))").as("ce"))
    val trained = VectorOps.pqTrainCodebooks(emb, seeds).collect()
    assert(trained.length == 8)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    trained.foreach(r =>
      assert(r.getSeq[Double](r.fieldIndex("ce")).length == dim))
    // Lloyd moved at least one codebook away from its seed
    val seedMap = seeds.collect()
      .map(r => r.getAs[Long]("c_id") -> r.getSeq[Double](r.fieldIndex("ce")).toList).toMap
    assert(trained.exists(r =>
      seedMap(r.getAs[Long]("c_id")).toList != r.getSeq[Double](r.fieldIndex("ce")).toList))
  }
}

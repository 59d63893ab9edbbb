package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The stream-fed ANN store must be a real STREAMING ingestion — many
  * micro-batches through foreachBatch → AnnIndex.update — not one big
  * batch that happens to pass the shared oracle, and replaying a batch
  * into the store must append nothing (the checkpoint-recovery
  * guarantee the foreachBatch sink leans on).
  */
class AnnStreamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("ingestion ran as multiple micro-batches and replay is a no-op") {
    val rows = StreamOps.annStreamIndexed(spark, sf).collect()
    assert(rows.nonEmpty)

    val root = StreamOps.annStreamStoreDir(sf)
      .getOrElse(fail("no cached stream store"))
    // the streaming checkpoint committed one offset per staged file —
    // derive the expectation from what was actually staged rather than
    // hard-wiring the partition count (an empty hash partition or a
    // writer change would shift the file count with no regression),
    // and require ≥ 2 so this still proves MULTIPLE micro-batches
    val staged = new java.io.File(s"$root/in")
      .listFiles.count(_.getName.endsWith(".parquet"))
    val commits = new java.io.File(s"$root/ckpt/commits")
      .listFiles.count(f => f.getName.forall(_.isDigit))
    assert(commits == staged && commits >= 2,
      s"expected one commit per staged file ($staged) and ≥ 2, got $commits")

    // every corpus vector landed exactly once across the batches
    val emb = graft.Tables(spark, sf, "embeddings")
    val post = spark.read.parquet(s"$root/store/postings")
    assert(post.count() == emb.count())
    assert(post.select("vec_id").distinct().count() == emb.count())

    // replaying an already-ingested batch appends nothing
    AnnIndex.update(spark, s"$root/store",
      emb.filter(col("vec_id") > 8).limit(50))
    assert(spark.read.parquet(s"$root/store/postings").count()
      == emb.count())
  }
}

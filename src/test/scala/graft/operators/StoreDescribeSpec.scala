package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The store trio's DESCRIBE rows report the truth: counts match
  * independent recomputations, the live/indexed gap equals the
  * tombstone debt, and compaction zeroes it.
  */
class StoreDescribeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("TermIndex.describe reflects deletes and compaction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tidx_desc").toString
    val docs = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    TermIndex.update(spark, dir, docs)
    val n = docs.count()
    val d1 = TermIndex.describe(spark, dir).collect()(0)
    assert(d1.getAs[Long]("indexed_docs") == n)
    assert(d1.getAs[Long]("live_docs") == n)
    assert(d1.getAs[Long]("tombstones") == 0L)
    assert(d1.getAs[Long]("buckets_occupied") <=
      d1.getAs[Long]("buckets_total"))
    assert(d1.getAs[Long]("postings_rows") > 0)

    val nDel = docs.filter(col("doc_id") % 7 === 3).count()
    TermIndex.delete(spark, dir,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val d2 = TermIndex.describe(spark, dir).collect()(0)
    assert(d2.getAs[Long]("indexed_docs") == n)
    assert(d2.getAs[Long]("live_docs") == n - nDel)
    assert(d2.getAs[Long]("tombstones") == nDel)
    // the live avgdl is the post-delete corpus's, not the physical one
    val expAvg = docs.filter(!(col("doc_id") % 7 === 3))
      .select(avg(size(split(col("text"), " ")).cast("double")))
      .head().getDouble(0)
    assert(math.abs(d2.getAs[Double]("live_avgdl") - expAvg) < 1e-9)

    TermIndex.compact(spark, dir)
    val d3 = TermIndex.describe(spark, dir).collect()(0)
    assert(d3.getAs[Long]("indexed_docs") == n - nDel)
    assert(d3.getAs[Long]("live_docs") == n - nDel)
    assert(d3.getAs[Long]("tombstones") == 0L)
  }

  test("AnnIndex.describe reflects deletes, the manifest and the " +
    "metadata era") {
    import spark.implicits._
    val dir = Files.createTempDirectory("aidx_desc").toString
    val emb = graft.Tables(spark, sf, "embeddings")
    val n = emb.filter(col("vec_id") > 0).count()
    AnnIndex.build(spark, dir, emb.filter(col("vec_id") > 0))
    val d1 = AnnIndex.describe(spark, dir).collect()(0)
    assert(d1.getAs[Long]("postings_rows") == n)
    assert(d1.getAs[Long]("live_rows") == n)
    assert(d1.getAs[Long]("cells_total") == 8L)
    assert(d1.getAs[Long]("cells_occupied") <= 8L)
    assert(d1.getAs[Long]("manifest_rows") >= 1L)
    assert(d1.getAs[Long]("manifest_ids") == n)
    assert(d1.getAs[String]("meta_columns") == "label")

    AnnIndex.delete(spark, dir, Seq(9L, 10L).toDF("vec_id"))
    val d2 = AnnIndex.describe(spark, dir).collect()(0)
    assert(d2.getAs[Long]("live_rows") == n - 2)
    assert(d2.getAs[Long]("tombstones") == 2L)

    AnnIndex.compact(spark, dir)
    // a later era adds a column; describe reports the union
    AnnIndex.update(spark, dir,
      emb.filter(col("vec_id") === 9)
        .withColumn("source", lit("s1")))
    val d3 = AnnIndex.describe(spark, dir).collect()(0)
    assert(d3.getAs[Long]("postings_rows") == n - 1)
    assert(d3.getAs[Long]("tombstones") == 0L)
    assert(d3.getAs[String]("meta_columns") == "label,source")
  }

  test("NearDupIndex.describe reflects deletes and compaction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ndidx_desc").toString
    val docs = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    NearDupIndex.update(spark, dir, docs).count()
    val indexed = spark.read.parquet(s"$dir/shingles").count()
    val d1 = NearDupIndex.describe(spark, dir).collect()(0)
    assert(d1.getAs[Long]("indexed_docs") == indexed)
    assert(d1.getAs[Long]("live_docs") == indexed)
    assert(d1.getAs[Long]("band_rows") > 0)

    // delete an id that IS in the store (a shingle-less doc would not
    // move live_docs)
    val victim = spark.read.parquet(s"$dir/shingles")
      .select("doc_id").head().getLong(0)
    NearDupIndex.delete(spark, dir, Seq(victim).toDF("doc_id"))
    val d2 = NearDupIndex.describe(spark, dir).collect()(0)
    assert(d2.getAs[Long]("live_docs") == indexed - 1)
    assert(d2.getAs[Long]("tombstones") == 1L)

    NearDupIndex.compact(spark, dir)
    val d3 = NearDupIndex.describe(spark, dir).collect()(0)
    assert(d3.getAs[Long]("indexed_docs") == indexed - 1)
    assert(d3.getAs[Long]("tombstones") == 0L)
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Self-enforcing tombstone hygiene: ratio-triggered auto-fold, the
  * one-file-per-delete merge, the broadcast size guard, and the
  * generation counter surviving compaction.
  */
class TombstoneHygieneSpec extends SparkSpecBase {

  import spark.implicits._

  private def tinyDocs(n: Int) =
    (1 to n).map(i => (i.toLong, s"tok$i alpha beta"))
      .toDF("doc_id", "text")

  test("ratio-triggered auto-fold: a delete-heavy sequence compacts " +
      "itself once debt crosses the threshold; serving matches a " +
      "from-scratch post-delete store") {
    val dir = Files.createTempDirectory("tomb_autofold").toString
    TermIndex.update(spark, dir, tinyDocs(140))
    // 2/7 of the corpus: below the 0.5 default — tombstones remain
    TermIndex.delete(spark, dir,
      tinyDocs(140).filter(col("doc_id") % 7 < 2).select("doc_id"))
    assert(StoreUtil.exists(spark, s"$dir/tombstones"))
    // two more sevenths: 4/7 ≈ 0.57 crosses the threshold — the
    // delete call itself compacts and clears the debt
    TermIndex.delete(spark, dir,
      tinyDocs(140).filter(col("doc_id") % 7 === 2 ||
        col("doc_id") % 7 === 3).select("doc_id"))
    assert(!StoreUtil.exists(spark, s"$dir/tombstones"))
    val ref = Files.createTempDirectory("tomb_autofold_ref").toString
    TermIndex.update(spark, ref,
      tinyDocs(140).filter(col("doc_id") % 7 >= 4))
    def res(d: String) = TermIndex.search(spark, d,
      Seq("alpha", "beta"), 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res(dir) == res(ref))
    // opting out (PositiveInfinity) leaves even a 100% debt pending
    val dir2 = Files.createTempDirectory("tomb_autofold2").toString
    TermIndex.update(spark, dir2, tinyDocs(20))
    TermIndex.delete(spark, dir2, tinyDocs(20).select("doc_id"),
      autoFoldAt = Double.PositiveInfinity)
    assert(StoreUtil.exists(spark, s"$dir2/tombstones"))
  }

  test("the ANN store auto-folds on the same debt ratio") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = Files.createTempDirectory("tomb_autofold_ann").toString
    AnnIndex.build(spark, dir, emb.filter(col("vec_id") > 0),
      lloydRounds = 0)
    // delete well past half the store in one call — the call compacts
    AnnIndex.delete(spark, dir,
      emb.filter(col("vec_id") > 8 && col("vec_id") % 3 =!= 0)
        .select("vec_id"))
    assert(!StoreUtil.exists(spark, s"$dir/tombstones"))
    val live = spark.read.parquet(s"$dir/postings")
      .select("vec_id").as[Long].collect().toSet
    assert(live.forall(v => v <= 8 || v % 3 == 0))
  }

  test("tombstone appends merge back toward one file past the count " +
      "threshold, hide-set intact") {
    val dir = Files.createTempDirectory("tomb_merge").toString
    TermIndex.update(spark, dir, tinyDocs(100))
    (1 to 20).foreach { i =>
      TermIndex.delete(spark, dir, Seq(i.toLong).toDF("doc_id"),
        autoFoldAt = Double.PositiveInfinity)
    }
    val files = new java.io.File(s"$dir/tombstones").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.endsWith(".crc"))
    // 20 appends would be 20 files unmerged; the merge at >16 folds
    // them (a few post-merge appends may follow)
    assert(files.length <= 5, s"${files.length} tombstone files")
    val served = TermIndex.search(spark, dir, Seq("alpha"), 10000)
      .collect().map(_.getLong(0)).toSet
    assert((1 to 20).forall(i => !served.contains(i.toLong)))
    assert(served.size == 80)
  }

  test("a tombstone set past the broadcast ceiling plans a " +
      "non-broadcast anti-join with identical results") {
    val dir = Files.createTempDirectory("tomb_guard").toString
    TermIndex.update(spark, dir, tinyDocs(200))
    TermIndex.delete(spark, dir,
      tinyDocs(200).filter(col("doc_id") % 2 === 0).select("doc_id"),
      autoFoldAt = Double.PositiveInfinity)
    val doclen = spark.read.parquet(s"$dir/doclen")
    val hinted = Tombstones.minus(spark, dir, doclen, "doc_id",
      genCol = Some("gen"))
    assert(hinted.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"))
    spark.conf.set("spark.graft.tombstone.broadcastBytes", "1")
    try {
      val plain = Tombstones.minus(spark, dir, doclen, "doc_id",
        genCol = Some("gen"))
      assert(!plain.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"))
      assert(plain.collect().map(_.getLong(0)).sorted.toSeq ==
        hinted.collect().map(_.getLong(0)).sorted.toSeq)
    } finally spark.conf.unset("spark.graft.tombstone.broadcastBytes")
  }

  test("the generation counter survives compaction (a post-compact " +
      "delete must still out-threshold pre-compact upserts)") {
    val dir = Files.createTempDirectory("tomb_genmeta").toString
    TermIndex.update(spark, dir, tinyDocs(10))
    TermIndex.upsert(spark, dir, Seq((1L, "gamma gamma"))
      .toDF("doc_id", "text"))
    assert(GenMeta.current(spark, dir) == 1L)
    TermIndex.compact(spark, dir)
    // consolidated, not reset
    assert(GenMeta.current(spark, dir) == 1L)
    // delete doc 1 (its live row is generation 1): a reset counter
    // would tombstone at 0 and miss it
    TermIndex.delete(spark, dir, Seq(1L).toDF("doc_id"),
      autoFoldAt = Double.PositiveInfinity)
    val served = TermIndex.search(spark, dir, Seq("gamma"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(served.isEmpty)
    // and the next upsert still lands ABOVE the delete threshold
    TermIndex.upsert(spark, dir, Seq((1L, "delta delta"))
      .toDF("doc_id", "text"))
    assert(GenMeta.current(spark, dir) == 2L)
    val again = TermIndex.search(spark, dir, Seq("delta"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == Set(1L))
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The incremental-vs-batch equivalence proof: feeding the corpus to the
  * durable index in chunks surfaces exactly the batch pass's pair set,
  * each pair exactly once, in the update that completes it.
  */
class NearDupIndexSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "b_id", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("two incremental updates equal the full-corpus batch pass") {
    val dir = Files.createTempDirectory("ndidx").toString
    val docs = graft.Tables(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)

    val p1 = pairSet(NearDupIndex.update(spark, dir, half1))
    val p2 = pairSet(NearDupIndex.update(spark, dir, half2))
    val batch = pairSet(TextOps.minhashNearDup(spark, sf))

    assert(p1.intersect(p2).isEmpty, "a pair surfaced twice")
    assert(p1.union(p2) == batch,
      s"incremental ${p1.size}+${p2.size} != batch ${batch.size}")
    // update 1 can only contain even-even pairs (half2 not yet indexed)
    assert(p1.forall { case (a, b, _) => a % 2 == 0 && b % 2 == 0 })
  }

  test("an empty update finds nothing and leaves the store intact") {
    val dir = Files.createTempDirectory("ndidx2").toString
    val docs = graft.Tables(spark, sf, "documents")
    assert(NearDupIndex.update(spark, dir, docs).count() ==
      TextOps.minhashNearDup(spark, sf).count())
    val empty = docs.filter(lit(false))
    assert(NearDupIndex.update(spark, dir, empty).count() == 0)
    // re-sending the SAME corpus: colliding doc_ids must never emit
    // self-pairs (the probe join excludes identical ids); duplicate-id
    // hygiene beyond that is the caller's concern
    val again = NearDupIndex.update(spark, dir, docs)
    assert(again.filter(col("a_id") === col("b_id")).count() == 0)
  }

  test("a re-sent (retried) batch appends nothing and reports nothing") {
    val dir = Files.createTempDirectory("ndidx5").toString
    val docs = graft.Tables(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val p1 = pairSet(NearDupIndex.update(spark, dir, half1))
    val bandsBefore = spark.read.parquet(s"$dir/bands").count()
    val shBefore = spark.read.parquet(s"$dir/shingles").count()
    // the retry: same batch again — idempotent, no duplicate shingle
    // rows (which would multiply the verify join), no re-reported pairs
    assert(NearDupIndex.update(spark, dir, half1).count() == 0)
    assert(spark.read.parquet(s"$dir/bands").count() == bandsBefore)
    assert(spark.read.parquet(s"$dir/shingles").count() == shBefore)
    // and history continues correctly after the retry: the second half
    // still completes exactly the batch pass's pair set
    val p2 = pairSet(NearDupIndex.update(spark, dir,
      docs.filter(col("doc_id") % 2 === 1)))
    assert(p1.union(p2) == pairSet(TextOps.minhashNearDup(spark, sf)))
  }

  test("probe() finds the same pairs as update() but mutates nothing") {
    val dir = Files.createTempDirectory("ndidx4").toString
    val docs = graft.Tables(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    NearDupIndex.update(spark, dir, half1): Unit
    val probed = pairSet(NearDupIndex.probe(spark, dir, half2))
    // probing again: identical (the store didn't grow)
    assert(pairSet(NearDupIndex.probe(spark, dir, half2)) == probed)
    // committing the same batch surfaces exactly the probed pairs
    assert(pairSet(NearDupIndex.update(spark, dir, half2)) == probed)
  }

  test("a document STREAM drained through foreachBatch builds the index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("ndidx3").toString
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val found = scala.collection.mutable.Set[(Long, Long, Double)]()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        found ++= NearDupIndex.update(spark, dir, batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        (): Unit
      }
      .start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      ms.addData(h1.toIndexedSeq); q.processAllAvailable()
      ms.addData(h2.toIndexedSeq); q.processAllAvailable()
      assert(found.toSet == pairSet(TextOps.minhashNearDup(spark, sf)))
    } finally q.stop()
  }

  test("delete lifecycle: a tombstoned doc stops pairing in probe and " +
      "update, compact folds it to a from-scratch post-delete store, " +
      "and the folded id can re-index") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ndidx_del").toString
    val docs = graft.Tables(spark, sf, "documents")
    val batch = pairSet(NearDupIndex.update(spark, dir, docs))
    assert(batch.nonEmpty)
    // delete one member of a known pair — the strongest absence test
    val (aKeep, bDel, _) = batch.head
    NearDupIndex.delete(spark, dir, Seq(bDel).toDF("doc_id"))
    // probing the kept member's text must no longer pair it with the
    // deleted doc (but may still pair with other live near-dups)
    val aDocs = docs.filter(col("doc_id") === aKeep)
      .select(col("doc_id") + 1000000L as "doc_id", col("text"))
    val probed = pairSet(NearDupIndex.probe(spark, dir, aDocs))
    assert(!probed.exists { case (a, b, _) => a == bDel || b == bDel })
    assert(probed.exists { case (a, b, _) =>
      a == aKeep || b == aKeep || a == aKeep + 1000000L ||
        b == aKeep + 1000000L })
    // a tombstoned id cannot re-index before the fold
    val re = NearDupIndex.update(spark, dir,
      docs.filter(col("doc_id") === bDel))
    assert(re.isEmpty)
    // compact: physical fold, equal to a from-scratch store on the
    // post-delete corpus, and the id can re-index afterwards
    NearDupIndex.compact(spark, dir)
    assert(!StoreUtil.exists(spark, s"$dir/tombstones"))
    val ref = Files.createTempDirectory("ndidx_delref").toString
    NearDupIndex.update(spark, ref,
      docs.filter(col("doc_id") =!= bDel)).count()
    def rows(d: String, sub: String) =
      spark.read.parquet(s"$d/$sub").collect()
        .map(_.toString).sorted.toSeq
    assert(rows(dir, "bands") == rows(ref, "bands"))
    assert(rows(dir, "shingles") == rows(ref, "shingles"))
    val back = pairSet(NearDupIndex.update(spark, dir,
      docs.filter(col("doc_id") === bDel)))
    assert(back.exists { case (a, b, _) => a == bDel || b == bDel })
  }

  test("upsert lifecycle: delete -> re-add -> overwrite; a probe " +
      "against the store matches a fresh store on the modified " +
      "corpus, with no compact; compact folds generations physically") {
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text")
    val del = col("doc_id") % 7 === 3
    val readd = del && col("doc_id") % 2 === 1
    val upd = col("doc_id") % 11 === 5 && !del
    def doubled(p: org.apache.spark.sql.Column) = docs.filter(p)
      .select(col("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    val dir = Files.createTempDirectory("ndidx_up").toString
    NearDupIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 0))
    NearDupIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    NearDupIndex.delete(spark, dir, docs.filter(del).select("doc_id"))
    // the upsert's returned pairs must never pair a doc's old text
    // against its own replacement (self-id pairs are impossible by
    // contract; the gen-1 tombstone hides the batch's old rows from
    // this call's own candidate probe)
    val up1 = pairSet(NearDupIndex.upsert(spark, dir, doubled(readd)))
    assert(!up1.exists { case (a, b, _) => a == b })
    NearDupIndex.upsert(spark, dir, doubled(upd))
    assert(StoreUtil.exists(spark, s"$dir/tombstones"))
    // reference: a fresh store on the final corpus
    val ref = Files.createTempDirectory("ndidx_upref").toString
    val finalCorpus = docs.filter(!del || readd)
      .select(col("doc_id"),
        when(readd || upd, concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
    NearDupIndex.update(spark, ref, finalCorpus)
    // disjoint probe ids: every probe answer reflects the LIVE store
    val q = docs.filter(col("doc_id") % 5 === 2)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    def probed(d: String) = pairSet(NearDupIndex.probe(spark, d, q))
    val expected = probed(ref)
    assert(probed(dir) == expected)
    // compact folds the upsert history; probing is unchanged and
    // exactly one shingle row per live doc remains
    NearDupIndex.compact(spark, dir)
    assert(!StoreUtil.exists(spark, s"$dir/tombstones"))
    assert(probed(dir) == expected)
    val sh = spark.read.parquet(s"$dir/shingles")
    assert(sh.count() == sh.select("doc_id").distinct().count())
  }
}

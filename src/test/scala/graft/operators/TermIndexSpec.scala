package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Durable inverted index: incremental build serves the exact batch
  * BM25 result, re-sent batches are no-ops, and a search's term filter
  * prunes store PARTITIONS.
  */
class TermIndexSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.Tables(spark, sf, "documents")
    .select("doc_id", "text")

  test("two-half incremental build serves bit-identical batch BM25") {
    val dir = Files.createTempDirectory("termidx").toString
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 0))
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    val served = TermIndex.search(spark, dir, TextOps.bmTerms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = TextOps.bm25Topk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == batch)
  }

  test("re-sending an already-indexed batch changes nothing") {
    val dir = Files.createTempDirectory("termidx2").toString
    TermIndex.update(spark, dir, docs)
    val before = TermIndex.search(spark, dir, TextOps.bmTerms, k = 20)
      .collect().toSeq
    TermIndex.update(spark, dir, docs) // dup batch: anti-joined away
    val after = TermIndex.search(spark, dir, TextOps.bmTerms, k = 20)
      .collect().toSeq
    assert(after == before)
    // membership list did not grow either
    assert(spark.read.parquet(s"$dir/doclen").count() == docs.count())
  }

  test("a document STREAM drained through foreachBatch builds the index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("termidx4").toString
    val rows = docs.as[(Long, String)].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TermIndex.update(spark, dir, batch)
        (): Unit
      }
      .start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      ms.addData(h1.toIndexedSeq); q.processAllAvailable()
      ms.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val served = TermIndex.search(spark, dir, TextOps.bmTerms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = TextOps.bm25Topk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == batch)
  }

  test("store compaction leaves search results identical") {
    val dir = Files.createTempDirectory("termidx5").toString
    // many tiny appends → fragmented bucket dirs
    (0L until 8L).foreach { i =>
      TermIndex.update(spark, dir, docs.filter(col("doc_id") % 8 === i))
    }
    val before = TermIndex.search(spark, dir, TextOps.bmTerms, k = 20)
      .collect().toSeq
    graft.sinks.DirCompaction.compact(spark, dir)
    val after = TermIndex.search(spark, dir, TextOps.bmTerms, k = 20)
      .collect().toSeq
    assert(after == before)
  }

  test("batch searchAll matches per-query search bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("termidx7").toString
    TermIndex.update(spark, dir, docs)
    val queryFrame = Seq(
      (1L, Seq("spark", "hash", "window")),
      (2L, Seq("hash")),
      (3L, Seq("window", "spark")),
      (4L, Seq("zzz_absent_term", "spark"))).toDF("q_id", "terms")
    val batch = TermIndex.searchAll(spark, queryFrame, dir, k = 10)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    queryFrame.collect().foreach { q =>
      val qid = q.getLong(0)
      val ts = q.getSeq[String](1)
      val single = TermIndex.search(spark, dir, ts, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.getOrElse(qid, Nil) == single, s"q=$qid terms=$ts")
    }
  }

  test("positional phrase serving matches the batch phrase query") {
    val dir = Files.createTempDirectory("termidx6").toString
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 0))
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    val served = TermIndex.phraseSearch(spark, dir, "order", "order")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = TextOps.phraseSearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == batch)
  }

  test("search prunes postings partitions to the query terms' buckets") {
    val dir = Files.createTempDirectory("termidx3").toString
    TermIndex.update(spark, dir, docs)
    val df = TermIndex.search(spark, dir, Seq("spark"), k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(t_b"), plan)
    // driver-side bucket function agrees with the stored layout: the
    // pruned single-term search still finds every doc the full batch
    // tf computation says contains the term
    val expect = docs
      .filter(expr("size(filter(split(text, ' '), x -> x = 'spark'))") > 0)
      .count()
    val all = TermIndex.search(spark, dir, Seq("spark"), k = Int.MaxValue)
    assert(all.count() == expect)
  }

  test("serving metrics report the pruned postings scan (the AnnIndex " +
    "observability symmetry)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("termidx4").toString
    TermIndex.update(spark, dir, docs)
    val terms = Seq("spark", "data")
    val obs = new org.apache.spark.sql.Observation("bm25_serve")
    TermIndex.searchAll(spark,
      Seq((0L, terms)).toDF("q_id", "terms"), dir, k = 5,
      obs = Some(obs)).collect()
    val m = obs.get
    // independent expectation: postings rows for exactly these terms
    val expRows = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(terms: _*)).count()
    val allRows = spark.read.parquet(s"$dir/postings").count()
    assert(expRows > 0 && expRows < allRows)
    assert(m("postings_rows_read") == expRows, s"$m")
    assert(m("buckets_probed") ==
      terms.map(TermIndex.bucketOf).distinct.length, s"$m")
    assert(m("buckets_total") == TermIndex.NBuckets, s"$m")
  }

  test("delete lifecycle: tombstoned docs stop serving everywhere, " +
      "compact folds them to a from-scratch post-delete store, and a " +
      "folded id can re-index") {
    val dir = Files.createTempDirectory("termidx_del").toString
    TermIndex.update(spark, dir, docs)
    TermIndex.delete(spark, dir,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    // the oracle: a from-scratch store on the post-delete corpus
    val ref = Files.createTempDirectory("termidx_delref").toString
    TermIndex.update(spark, ref, docs.filter(!(col("doc_id") % 7 === 3)))
    def res(d: String) = TermIndex.search(spark, d, TextOps.bmTerms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def phrase(d: String) = TermIndex.phraseSearch(spark, d,
      "order", "order", k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = res(ref)
    // tombstone-subtracted read path: scores AND corpus stats match the
    // post-delete rebuild; phrase serving subtracts too
    assert(res(dir) == expected)
    assert(phrase(dir) == phrase(ref))
    assert(!phrase(dir).exists(_._1 % 7 == 3))
    // compact: physical fold — row sets equal the from-scratch build,
    // tombstones cleared, serving unchanged
    TermIndex.compact(spark, dir)
    assert(!StoreUtil.exists(spark, s"$dir/tombstones"))
    assert(res(dir) == expected)
    def rows(d: String, sub: String) =
      spark.read.parquet(s"$d/$sub").collect()
        .map(_.toString).sorted.toSeq
    assert(rows(dir, "doclen") == rows(ref, "doclen"))
    assert(rows(dir, "postings") == rows(ref, "postings"))
    // after the fold the membership list no longer knows the deleted
    // ids, so they can re-index — back to the full-corpus result
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 7 === 3))
    val full = TextOps.bm25Topk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res(dir) == full)
  }

  test("a tombstoned id cannot re-index before compact folds it out") {
    val dir = Files.createTempDirectory("termidx_del2").toString
    TermIndex.update(spark, dir, docs)
    val victim = docs.limit(1).collect()(0).getLong(0)
    TermIndex.delete(spark, dir,
      docs.filter(col("doc_id") === victim).select("doc_id"))
    // the doclen membership list still carries the id: re-sending it
    // is a no-op and it stays hidden (hide-then-remove)
    TermIndex.update(spark, dir, docs.filter(col("doc_id") === victim))
    val served = TermIndex.search(spark, dir, TextOps.bmTerms, 1000)
      .collect().map(_.getLong(0))
    assert(!served.contains(victim))
  }

  test("n-token phrase serving: overlap semantics, repeated tokens, " +
      "and the 2-token overload agreement") {
    import spark.implicits._
    val dir = Files.createTempDirectory("termidx_ph").toString
    TermIndex.update(spark, dir, Seq(
      (1L, "w w w x y z"),
      (2L, "a w w b w w w"),
      (3L, "x y z x y z x y")).toDF("doc_id", "text"))
    def occ(terms: Seq[String]) =
      TermIndex.phraseSearch(spark, dir, terms, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "w w w" holds 2 overlapping "w w" matches and 1 "w w w"
    assert(occ(Seq("w", "w")) == Map(1L -> 2L, 2L -> 3L))
    assert(occ(Seq("w", "w", "w")) == Map(1L -> 1L, 2L -> 1L))
    // 3-token distinct-term chain
    assert(occ(Seq("x", "y", "z")) == Map(1L -> 1L, 3L -> 2L))
    // 4 tokens with a repeated term: "x y z x" anchors at 0 and 3
    assert(occ(Seq("x", "y", "z", "x")) == Map(3L -> 2L))
    // the 2-arg overload is the Seq form
    val legacy = TermIndex.phraseSearch(spark, dir, "w", "w", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(legacy == occ(Seq("w", "w")))
    // tombstoned docs vanish from phrase results too
    TermIndex.delete(spark, dir, Seq(1L).toDF("doc_id"))
    assert(occ(Seq("w", "w")) == Map(2L -> 3L))
  }

  test("upsert lifecycle: delete -> re-add -> live overwrite serves a " +
      "from-scratch-identical result with NO compact in between") {
    val dir = Files.createTempDirectory("termidx_up").toString
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 0))
    TermIndex.update(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    val del = col("doc_id") % 7 === 3
    val readd = del && col("doc_id") % 2 === 1
    val upd = col("doc_id") % 11 === 5 && !del
    def doubled(p: org.apache.spark.sql.Column) = docs.filter(p)
      .select(col("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    TermIndex.delete(spark, dir, docs.filter(del).select("doc_id"))
    TermIndex.upsert(spark, dir, doubled(readd))
    TermIndex.upsert(spark, dir, doubled(upd))
    // deliberately NO compact: generations must subtract at read
    assert(StoreUtil.exists(spark, s"$dir/tombstones"))
    // oracle: a from-scratch store on the final corpus
    val finalCorpus = docs.filter(!del || readd)
      .select(col("doc_id"),
        when(readd || upd, concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
    val ref = Files.createTempDirectory("termidx_upref").toString
    TermIndex.update(spark, ref, finalCorpus)
    def res(d: String) = TermIndex.search(spark, d, TextOps.bmTerms, 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def phrase(d: String) = TermIndex.phraseSearch(spark, d,
      "order", "order", k = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(res(dir) == res(ref))
    // phrase serving subtracts superseded generations too (doubling a
    // doc changes its adjacency counts — a stale generation would show)
    assert(phrase(dir) == phrase(ref))
    // compact folds the upsert history physically; serving unchanged;
    // exactly one doclen row per live doc remains
    val expected = res(dir)
    TermIndex.compact(spark, dir)
    assert(!StoreUtil.exists(spark, s"$dir/tombstones"))
    assert(res(dir) == expected)
    val dl = spark.read.parquet(s"$dir/doclen")
    assert(dl.count() == dl.select("doc_id").distinct().count())
    assert(dl.count() == finalCorpus.count())
  }

  test("upsert inserts absent ids, overwrites present ones, and " +
      "re-adds deleted ones; update stays insert-if-absent beside it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("termidx_up2").toString
    TermIndex.update(spark, dir,
      Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text"))
    // overwrite 1, insert 3, in one call
    TermIndex.upsert(spark, dir,
      Seq((1L, "delta delta"), (3L, "alpha alpha")).toDF("doc_id", "text"))
    // update of a present id must NOT downgrade the upserted text
    TermIndex.update(spark, dir, Seq((1L, "stale text")).toDF("doc_id", "text"))
    def hits(term: String) = TermIndex.search(spark, dir, Seq(term), 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits("delta") == Set(1L))
    assert(hits("alpha") == Set(3L)) // doc 1's old alpha is superseded
    assert(hits("beta") == Set(2L))
    assert(hits("stale").isEmpty)
    // delete then upsert re-adds IMMEDIATELY — no compact between
    TermIndex.delete(spark, dir, Seq(2L).toDF("doc_id"))
    assert(hits("gamma").isEmpty)
    TermIndex.upsert(spark, dir, Seq((2L, "epsilon")).toDF("doc_id", "text"))
    assert(hits("epsilon") == Set(2L))
    assert(hits("gamma").isEmpty) // the pre-delete generation stays hidden
  }

  test("a DELETE stream drained through foreachBatch tombstones " +
      "incrementally; serving tracks the post-delete corpus per batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("termidx_delstream").toString
    TermIndex.update(spark, dir, docs)
    val delIds = docs.filter(col("doc_id") % 7 === 3)
      .select("doc_id").as[Long].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = ms.toDF().toDF("doc_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TermIndex.delete(spark, dir, batch)
        (): Unit
      }
      .start()
    try {
      val (h1, h2) = delIds.splitAt(delIds.length / 2)
      ms.addData(h1.toIndexedSeq); q.processAllAvailable()
      // mid-stream: the first half is already gone from serving
      val mid = TermIndex.search(spark, dir, TextOps.bmTerms, 10000)
        .collect().map(_.getLong(0)).toSet
      assert(h1.forall(!mid.contains(_)))
      ms.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // drained: serving equals a from-scratch build on the post-delete
    // corpus (the docs_bm25_indexed_deleted discipline, stream-fed)
    val ref = Files.createTempDirectory("termidx_delstream_ref").toString
    TermIndex.update(spark, ref, docs.filter(!(col("doc_id") % 7 === 3)))
    def res(d: String) = TermIndex.search(spark, d, TextOps.bmTerms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res(dir) == res(ref))
  }
}

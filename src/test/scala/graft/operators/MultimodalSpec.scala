package graft.operators

import graft.SparkSpecBase

/** Multimodal plumbing: typed-metadata stub decode (expression and
  * batched mapPartitions forms agree), frame sampling bounds.
  */
class MultimodalSpec extends SparkSpecBase {

  test("batched decode yields typed rows consistent with blob size") {
    import spark.implicits._
    val df = Seq((1L, "abcdef".getBytes), (2L, "xyz".getBytes))
      .toDF("doc_id", "blob")
    val out = MultimodalOps.decodeBatched(df, "doc_id", "blob")
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).n_bytes == 6 && out(1L).codec == "rgb8")
    assert(out(2L).n_bytes == 3 && out(2L).codec == "yuv420")
    assert(out(1L).width >= 1 && out(1L).width <= 1920)
    assert(out(1L).height >= 1 && out(1L).height <= 1080)
  }

  test("frame sampling: stride count and empty-safety") {
    import spark.implicits._
    val df = Seq(("x" * 100), "short").toDF("text")
      .withColumn("blob", org.apache.spark.sql.functions.col("text")
        .cast("binary"))
    val counts = df
      .select(org.apache.spark.sql.functions
        .size(MultimodalOps.frameSample("blob", 32, 8)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(counts == Seq(3, 0)) // 100/32 = 3 frames; 5 bytes → none
  }

  test("frame index: short and empty docs yield 0 frames and null bounds") {
    import spark.implicits._
    // sub-32-byte and empty docs are absent from the synthetic corpus,
    // so the oracle gate never exercises this branch — this spec does
    // (even try_element_at throws on the index-0 an empty array implies)
    val docs = Seq((1L, "x" * 100), (2L, "short"), (3L, ""))
      .toDF("doc_id", "text")
    val out = MultimodalOps.frameIndexOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    assert(out.head == ((1L, 3,
      Some("78" * 8), Some("78" * 8)))) // 'x' = 0x78
    assert(out(1) == ((2L, 0, None, None)))
    assert(out(2) == ((3L, 0, None, None)))
  }

  test("dynamic inference batching: budget respected, order kept, " +
      "all rows covered") {
    import spark.implicits._
    val budget = 100L
    // sizes exercise: packing several, exact fit, and one oversized row
    val sizes = Seq(40, 40, 30, 100, 250, 10, 95, 10)
    val rows = sizes.zipWithIndex.map { case (s, i) =>
      (i.toLong, Array.fill[Byte](s)(1)) }
    val df = rows.toDF("doc_id", "blob").repartition(2, $"doc_id")
    val batches = MultimodalOps
      .inferenceBatches(df, "doc_id", "blob", budget)
      .collect()
    // every row lands exactly once
    assert(batches.flatMap(_.doc_ids).sorted.toSeq ==
      rows.map(_._1).sorted)
    batches.foreach { b =>
      assert(b.n_rows == b.doc_ids.size)
      // within budget, unless it's a single oversized row
      assert(b.n_bytes <= budget || b.n_rows == 1, b)
    }
    // batch ordinals are consecutive per partition and rows keep their
    // partition order across batch boundaries
    batches.groupBy(_.part_id).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.batch_ord)
      assert(sorted.map(_.batch_ord).toSeq == sorted.indices.toSeq)
      val flat = sorted.flatMap(_.doc_ids).toSeq
      // order within the partition is whatever the partition iterator
      // yielded — verify NO interleaving: re-batching the flat list
      // greedily reproduces the same boundaries
      var acc = 0L; var cur = Seq.empty[Long]; var rebuilt = Seq.empty[Seq[Long]]
      flat.foreach { id =>
        val s = sizes(id.toInt).toLong
        if (cur.nonEmpty && acc + s > budget) {
          rebuilt :+= cur; cur = Seq(id); acc = s
        } else { cur :+= id; acc += s
          if (acc >= budget) { rebuilt :+= cur; cur = Seq.empty; acc = 0 }
        }
      }
      if (cur.nonEmpty) rebuilt :+= cur
      assert(sorted.map(_.doc_ids.toSeq).toSeq == rebuilt)
    }
  }

  test("decode metadata stub is deterministic") {
    import spark.implicits._
    val df = Seq(("payload")).toDF("text")
      .withColumn("blob", org.apache.spark.sql.functions.col("text")
        .cast("binary"))
    val a = df.select(MultimodalOps.decodeMetaStub(
      org.apache.spark.sql.functions.col("blob"))).collect()(0)
    val b = df.select(MultimodalOps.decodeMetaStub(
      org.apache.spark.sql.functions.col("blob"))).collect()(0)
    assert(a == b)
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("frame near-dup: shared frames pair regardless of position, " +
    "a single shared frame does not") {
    val dir = java.nio.file.Files.createTempDirectory("mmnd").toString
    // 32-byte chunks: first 8 bytes are the frame value on the stride
    // grid, the tail is per-doc padding that never matches
    def chunk(frame: String, pad: Char) =
      frame + pad.toString * 24
    val F1 = "AAAABBBB"; val F2 = "CCCCDDDD"
    writeDocs(dir, Seq(
      (0L, chunk(F1, 'a') + chunk(F2, 'b') + chunk("EEEE0000", 'c')),
      // shares F1 and F2 with doc 0, at DIFFERENT grid slots
      (1L, chunk(F2, 'd') + chunk(F1, 'e') + chunk("FFFF1111", 'f')),
      // exactly one shared frame: below the >= 2 floor, no pair
      (2L, chunk(F1, 'g') + chunk("GGGG2222", 'h') + chunk("HHHH3333", 'i')),
      (3L, chunk("IIII4444", 'j') + chunk("JJJJ5555", 'k'))))
    val got = MultimodalOps.frameNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq((0L, 1L, 2L, 3L, 3L, 0.6667)), got.mkString(";"))
  }

  test("thumbnail: fixed 64-byte target for large assets, passthrough " +
    "for small, unsampled-byte changes invisible (the downsampling " +
    "contract)") {
    val dir = java.nio.file.Files.createTempDirectory("mmth").toString
    val big = "0123456789abcde" * 64 // 960 bytes → stride 15
    // differs ONLY at offset 1 — not on the stride-15 grid {0,15,30,…}
    val bigTweaked = big.updated(1, 'X')
    // differs at offset 15 — ON the grid: digest must change
    val bigOnGrid = big.updated(15, 'X')
    writeDocs(dir, Seq((0L, big), (1L, bigTweaked), (2L, bigOnGrid),
      (3L, "tiny"), (4L, "x" * 64)))
    val r = MultimodalOps.thumbnail(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(3) == 64 && r(0L).getLong(2) == 15) // bytes, stride
    assert(r(3L).getLong(3) == 4 && r(3L).getLong(2) == 1)
    assert(r(4L).getLong(3) == 64 && r(4L).getLong(2) == 1)
    assert(r(0L).getString(4) == r(1L).getString(4),
      "off-grid byte change leaked into the thumbnail")
    assert(r(0L).getString(4) != r(2L).getString(4),
      "on-grid byte change must change the thumbnail")
  }
}

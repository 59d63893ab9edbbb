package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Randomized cross-check of [[TextOps.packSegments]] against a pure
  * Scala reference packer: for arbitrary document-length profiles
  * (including docs far longer than a pack, exactly pack-sized, and
  * 1-token), the offset-arithmetic segments must equal the segments a
  * straightforward sequential cut produces. Deterministic seed — the
  * same 40 profiles every run.
  */
class PackSegmentsPropertySpec extends SparkSpecBase {

  private val B = 2048L

  /** Reference: walk docs in order, cutting at every multiple of B. */
  private def reference(nts: Seq[(Long, Long)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    var s = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    nts.foreach { case (doc, nt) =>
      var from = 0L
      while (from < nt) {
        val pack = (s + from) / B
        val len = math.min(nt - from, (pack + 1) * B - (s + from))
        out += ((pack, doc, from, len, (s + from) - pack * B))
        from += len
      }
      s += nt
    }
    out.result()
  }

  test("offset-arithmetic segments == sequential-cut reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dir = java.nio.file.Files.createTempDirectory("packprop").toString
    // 40 docs with adversarial lengths: tiny, huge, exactly B, B±1
    val lens = Seq.tabulate(40) { i =>
      i % 5 match {
        case 0 => 1L
        case 1 => B
        case 2 => B - 1
        case 3 => B + 1
        case _ => 1L + rnd.nextInt(3 * B.toInt).toLong
      }
    }
    lens.zipWithIndex
      .map { case (n, i) =>
        (i.toLong, Seq.fill(n.toInt)("w").mkString(" "),
          "en", "src0", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextOps.packSegments(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
      .sortBy(t => (t._1, t._5))
      .toSeq
    val want = reference(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, n) })
      .sortBy(t => (t._1, t._5))
    assert(got == want)
  }

  test("sharded segments == per-shard sequential-cut reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val dir = java.nio.file.Files.createTempDirectory("packprops").toString
    val lens = Seq.tabulate(40) { i =>
      i % 5 match {
        case 0 => 1L
        case 1 => B
        case 2 => B - 1
        case 3 => B + 1
        case _ => 1L + rnd.nextInt(3 * B.toInt).toLong
      }
    }
    lens.zipWithIndex
      .map { case (n, i) =>
        (i.toLong, Seq.fill(n.toInt)("w").mkString(" "),
          "en", "src0", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // (shard, pack_id, doc_id, doc_from, seg_len, pack_off)
    val got = TextOps.packSegmentsSharded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .groupBy(_._1)
      .map { case (sh, rows) =>
        sh -> rows.map(t => (t._2, t._3, t._4, t._5, t._6))
          .sortBy(t => (t._1, t._5)).toSeq
      }
    // each shard independently IS the global algorithm over its docs
    val want = (0L until 8L).map { sh =>
      sh -> reference(lens.zipWithIndex.collect {
        case (n, i) if i.toLong % 8 == sh => (i.toLong, n)
      }).sortBy(t => (t._1, t._5))
    }.toMap.filter(_._2.nonEmpty)
    assert(got == want)
    // and the shards jointly cover every token exactly once
    val totalTokens = got.values.flatten.map(_._4).sum
    assert(totalTokens == lens.sum)
  }
}

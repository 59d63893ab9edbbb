package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Streaming banded-LSH near-dup: pairs emit in the batch the second
  * doc arrives; cross-batch state works; unrelated docs stay silent;
  * the verified Jaccard matches the definitional set computation.
  */
class TextStreamSpec extends SparkSpecBase {

  import spark.implicits._

  // near-identical docs: 11 tokens, one substitution → shingle overlap
  // well above 0.3; docC shares nothing
  private val docA = (1L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11")
  private val docB = (2L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 zz")
  private val docC = (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11")
  private val docD = (4L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11") // = A

  test("pairs emit when the second doc arrives; state spans batches") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = TextStream.neardupStream(spark, ms.toDS())
      .writeStream.format("memory").queryName("nd")
      .outputMode("append").start()
    try {
      ms.addData(docA, docC)
      q.processAllAvailable()
      assert(spark.table("nd").count() === 0) // nothing similar yet
      ms.addData(docB) // near-dup of A, arrives one batch later
      q.processAllAvailable()
      val got = spark.table("nd").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).distinct
      assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
      // definitional check of the verified score: 9 shared 3-gram
      // shingles of 9∪9... computed from the actual sets
      val sh = (t: String) => t.split(" ").sliding(3).map(_.mkString(" "))
        .toSet
      val (a, b) = (sh(docA._2), sh(docB._2))
      val expect = BigDecimal(a.intersect(b).size.toDouble /
        a.union(b).size).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(got.head._3 === expect)
      // an exact duplicate later still pairs with BOTH prior copies
      ms.addData(docD)
      q.processAllAvailable()
      val pairs = spark.table("nd").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
      assert(pairs === Set((1L, 2L), (1L, 4L), (2L, 4L)))
      // the exact-dup pair verifies at jaccard 1.0
      val j14 = spark.table("nd").collect()
        .filter(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
        .map(_.getDouble(2))
      assert(j14.nonEmpty && j14.forall(_ === 1.0))
    } finally q.stop()
  }

  test("band keys are value-identical to the batch construction") {
    // same doc through the streaming per-row expression and a direct
    // computation of the batch formula (seed-hash minima per band)
    val df = Seq((7L, docA._2)).toDF("doc_id", "text")
      .withColumn("sh", expr(graft.operators.TextOps.shingles))
      .withColumn("bands", expr(TextStream.bandKeysExpr))
    val bands = df.select(explode(col("bands"))).as[String].collect()
    assert(bands.length === 4)
    val shingles = docA._2.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def h(seed: Int, v: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(v.getBytes("UTF-8"))
      val base = java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 7), 16)
      (graft.operators.TextOps.MinhashA(seed) * base +
        graft.operators.TextOps.MinhashB(seed)) %
        graft.operators.TextOps.MinhashP
    }
    val expected = (0 until 4).map { b =>
      val mins = (0 until 3).map(r =>
        shingles.map(v => h(b * 3 + r, v)).min).mkString("_")
      s"$b:$mins"
    }
    assert(bands.toSeq === expected)
  }
}

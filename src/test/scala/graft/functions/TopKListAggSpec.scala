package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** topk_list: the custom TypedImperativeAggregate — SQL surface,
  * multiset determinism across partitionings, null handling, k > group,
  * string ordering, and the serialized partial-merge path.
  */
class TopKListAggSpec extends SparkSpecBase {

  import spark.implicits._

  test("SQL surface: top-k doubles per group, descending") {
    Seq(("a", 1.5), ("a", 9.25), ("a", 3.0), ("a", 7.125), ("a", 2.0),
      ("b", 4.0), ("b", 6.5))
      .toDF("g", "v").createOrReplaceTempView("tk")
    val got = spark.sql(
      "SELECT g, topk_list(v, 3) AS top FROM tk GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") === Seq(9.25, 7.125, 3.0))
    assert(got("b") === Seq(6.5, 4.0))
  }

  test("multiset-deterministic across partitionings; merge path covered") {
    val vals = (1 to 500).map(i => ((i % 7).toString, (i * 37 % 101).toLong))
    val expected = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.reverse.take(5)
    }
    for (parts <- Seq(1, 3, 13)) {
      val df = vals.toDF("g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(expr("topk_list(v, 5)").as("top"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("nulls are ignored; all-null group yields empty array") {
    val df = Seq(("a", Some(3L)), ("a", None), ("b", None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(expr("topk_list(v, 2)").as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(3L))
    assert(got("b") === Seq.empty)
  }

  test("strings order lexicographically and copy out of reused buffers") {
    val df = Seq("pear", "apple", "quince", "fig", "plum").toDF("v")
    val got = df.agg(expr("topk_list(v, 3)")).collect()(0).getSeq[String](0)
    assert(got === Seq("quince", "plum", "pear"))
  }

  test("duplicate values survive as a multiset (not a set)") {
    val df = Seq(5L, 5L, 5L, 1L).toDF("v")
    val got = df.agg(expr("topk_list(v, 3)")).collect()(0).getSeq[Long](0)
    assert(got === Seq(5L, 5L, 5L))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins that the cross-join replica builder emits EXACTLY the row
  * multiset the original k-way-union form produced — the k=10/k=100
  * decade history (PERF.md tables) stays comparable after the k=1000
  * rewrite. The union form lives here as the reference shape.
  */
class ScaleProbeSpec extends SparkSpecBase {

  private val src = "/root/testdata/sf0.001"
  private val k = 3

  private def unionCopies(df: DataFrame,
      f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(i => f(df, i)).reduce(_.unionAll(_))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("cross-join replica == union replica for every scaled table") {
    val dst = Files.createTempDirectory("scaleprobespec")
    ScaleProbe.materialize(spark, src, k, dst)

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val shift = spark.read.parquet(s"$src/orders.parquet")
      .agg(max("o_orderkey")).head().getLong(0) + 1
    assert(sortedRows(spark.read.parquet(s"$dst/lineitem.parquet")) ==
      sortedRows(unionCopies(li, (d, i) => d.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * shift)))))

    // orders went through the same copies() rewrite as lineitem and
    // shares its shift (disjoint o_orderkey ranges per copy)
    val ord = spark.read.parquet(s"$src/orders.parquet")
    assert(sortedRows(spark.read.parquet(s"$dst/orders.parquet")) ==
      sortedRows(unionCopies(ord, (d, i) => d.withColumn("o_orderkey",
        col("o_orderkey") + lit(i * shift)))))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docShift = docs.agg(max("doc_id")).head().getLong(0) + 1
    // copy 0 unprefixed (term-addressed serving rows need real hits);
    // prefixed copies i>0 keep the shingle spaces pairwise disjoint
    assert(sortedRows(spark.read.parquet(s"$dst/documents.parquet")) ==
      sortedRows(unionCopies(docs, (d, i) => d
        .withColumn("doc_id", col("doc_id") + lit(i * docShift))
        .withColumn("text", if (i == 0) col("text") else array_join(
          transform(split(col("text"), " "),
            t => concat(lit(s"c${i}_"), t)), " "))
        .withColumn("n_chars", length(col("text"))))))

    val ev = spark.read.parquet(s"$src/events.parquet")
    val evShift = ev.agg(max("event_id")).head().getLong(0) + 1
    val userShift = ev.agg(max("user_id")).head().getLong(0) + 1
    assert(sortedRows(spark.read.parquet(s"$dst/events.parquet")) ==
      sortedRows(unionCopies(ev, (d, i) => d
        .withColumn("event_id", col("event_id") + lit(i * evShift))
        .withColumn("user_id", col("user_id") + lit(i * userShift)))))

    Bench.rm(dst)
  }
}

package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The store's DESCRIBE DETAIL surface: pure-metadata, one row per
  * committed snapshot, log accounting on the current base only, and
  * the read-amplification figure the ratio policy bounds.
  */
class DescribeSpec extends SparkSpecBase {

  test("describe reflects snapshots, schema width, log state and " +
    "read amplification across writes, deltas, evolution and folds") {
    import spark.implicits._
    val idx = new ParquetIndex(
      Files.createTempDirectory("desc").toString, keep = 3, writeFiles = 1)
    // empty store: no rows
    assert(idx.describe(spark).count() == 0)

    val v1 = idx.write(Seq(("a", 1L, 1L), ("b", 1L, 1L))
      .toDF("k", "ts", "v"))
    val d1 = idx.describe(spark).collect()
    assert(d1.length == 1)
    val r1 = d1(0)
    assert(r1.getAs[String]("snapshot_id") == v1 &&
      r1.getAs[Boolean]("is_current") &&
      r1.getAs[Long]("data_files") == 1L &&
      r1.getAs[Long]("bytes") > 0L &&
      r1.getAs[Int]("schema_cols") == 3 &&
      r1.getAs[Long]("log_entries") == 0L &&
      r1.getAs[Double]("read_amplification") == 1.0)

    // an EVOLVED delta: log entries/bytes appear, amplification > 1
    idx.appendDelta(spark,
      Seq(("a", 2L, 2L, "x")).toDF("k", "ts", "v", "tag"),
      evolveSchema = true)
    val r2 = idx.describe(spark).collect()(0)
    assert(r2.getAs[Long]("log_entries") == 1L &&
      r2.getAs[Long]("log_bytes") > 0L &&
      r2.getAs[Double]("read_amplification") > 1.0)

    // fold: a second snapshot, current carries the evolved width,
    // the superseded base keeps ITS written width, logs are clear
    idx.checkpointMor(spark, "k", "ts")
    val d3 = idx.describe(spark).collect()
    assert(d3.length == 2)
    val byId = d3.map(r => r.getAs[String]("snapshot_id") -> r).toMap
    assert(!byId(v1).getAs[Boolean]("is_current") &&
      byId(v1).getAs[Int]("schema_cols") == 3)
    val cur = d3.filter(_.getAs[Boolean]("is_current"))
    assert(cur.length == 1 && cur(0).getAs[Int]("schema_cols") == 4 &&
      cur(0).getAs[Long]("log_entries") == 0L &&
      cur(0).getAs[Double]("read_amplification") == 1.0)

    // the amplification figure is the same quantity the ratio policy
    // gates on: a log pushed past the ratio folds, describe returns to 1
    idx.appendDelta(spark,
      (1 to 200).map(i => (s"k$i", 1L, i.toLong, "y"))
        .toDF("k", "ts", "v", "tag"))
    assert(idx.describe(spark).collect()
      .filter(_.getAs[Boolean]("is_current"))(0)
      .getAs[Double]("read_amplification") > 1.3)
    idx.checkpointMorIfNeeded(spark, "k", "ts", maxLogRatio = 0.3)
    assert(idx.describe(spark).collect()
      .filter(_.getAs[Boolean]("is_current"))(0)
      .getAs[Double]("read_amplification") == 1.0)
  }
}

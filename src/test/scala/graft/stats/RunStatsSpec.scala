package graft.stats

import graft.SparkSpecBase

class RunStatsSpec extends SparkSpecBase {

  test("observe collects files/dirs/bytes in one pass (A8)") {
    import spark.implicits._
    val df = Seq(
      ("file", 10L), ("file", 20L), ("directory", 0L))
      .toDF("entry_type", "size_bytes")
    val (observed, obs) = RunStats.observed(df)
    observed.count() // any action materializes the metrics
    val s = RunStats.collect(obs, elapsedSec = 2.0)
    assert(s.files == 2 && s.dirs == 1 && s.bytes == 30L)
    assert(s.filesPerSec == 1.0)
    assert(s.summary.contains("30 B"))
  }
}

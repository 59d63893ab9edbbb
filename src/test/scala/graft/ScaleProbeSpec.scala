package graft

import org.apache.spark.sql.functions._

/** The scale probe's exponents are only meaningful if the k-replica
  * generator preserves workload SHAPE — the load-bearing property is
  * that replicas reproduce sf's internal duplicate families without
  * merging across copies (naive replication would merge every family
  * k-ways and the banded join's per-family quadratic term would read
  * as engine superlinearity). Pinned: row counts scale exactly k×,
  * near-dup family COUNT scales k×, family SIZE does not.
  */
class ScaleProbeSpec extends SparkSpecBase {

  private val base = "/root/testdata/sf0.001"

  test("2x replica: rows double, dup family count doubles, family " +
    "size constant") {
    val dir2 = ScaleProbe.scaled(spark, base, 2)
    try {
      for (t <- Seq("documents", "lineitem", "orders"))
        assert(
          spark.read.parquet(s"$dir2/$t.parquet").count() ==
            2 * spark.read.parquet(s"$base/$t.parquet").count(), t)

      def clusterStats(d: String): (Long, Long) = {
        val r = operators.TextOps.neardupClusters(spark, d)
          .groupBy("cluster_rep").agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)), max("sz")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (nBase, maxBase) = clusterStats(base)
      val (nScaled, maxScaled) = clusterStats(dir2)
      assert(nBase > 0, "fixture has no near-dup families")
      assert(nScaled == 2 * nBase,
        s"family count $nScaled != 2 x $nBase — copies merged or lost")
      assert(maxScaled == maxBase,
        s"max family size drifted: $maxScaled vs $maxBase")
    } finally Bench.rm(java.nio.file.Paths.get(dir2))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate is only as strong as the registry
  * wiring: an oracle registered under a typo'd name silently downgrades
  * its query to a rows-only check and the gate reports green anyway.
  * Every declared query currently carries a value-for-value oracle —
  * pin that as an exact keyset equality so a drifted key fails the
  * suite, not the audit trail.
  */
class RegistrySpec extends AnyFunSuite {

  test("queries and oracles are the same keyset — no silent " +
    "rows-only downgrades, no orphaned oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles naming no query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries with no oracle: ${(q -- o).toSeq.sorted}")
  }

  test("no operator map shadows another's query name (Map ++ would " +
    "silently keep only the last)") {
    import graft.operators._
    val subMaps = Seq(
      "Analytics" -> Analytics.queries.keySet,
      "AnalyticsExt" -> AnalyticsExt.queries.keySet,
      "FsOps" -> FsOps.queries.keySet,
      "EventsOps" -> EventsOps.queries.keySet,
      "TextOps" -> TextOps.queries.keySet,
      "VectorOps" -> VectorOps.queries.keySet,
      "IngestOps" -> IngestOps.queries.keySet,
      "MultimodalOps" -> MultimodalOps.queries.keySet,
      "SkewOps" -> SkewOps.queries.keySet,
      "TemporalJoins" -> TemporalJoins.queries.keySet,
      "StreamOps" -> StreamOps.queries.keySet,
      "StoreOps" -> StoreOps.queries.keySet)
    val dupes = subMaps.flatMap { case (m, ks) => ks.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
    assert(dupes.isEmpty, s"shadowed names: $dupes")
    assert(subMaps.map(_._2.size).sum == SparkEntry.queries.size)
    SparkEntry.queries.keys
      .foreach(n => assert(n.matches("[a-z0-9_]+"), n))
  }
}

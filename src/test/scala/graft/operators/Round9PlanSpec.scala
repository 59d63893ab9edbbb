package graft.operators

import graft.SparkSpecBase

/** Plan pins for the round-9 operators — the scale claims their
  * scaladocs make, held as assertions on the physical plan rather than
  * prose: the sharded pack manifest must window behind a SHARD hash
  * exchange (never a single-partition global sort), and the
  * exact-substring anchor join must meet through the gram-hash
  * equi-join (never a cartesian).
  */
class Round9PlanSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("packSegmentsSharded: windows run behind a shard hash " +
    "exchange, no single-partition global sort") {
    val plan = TextOps.packSegmentsSharded(spark, sf)
      .queryExecution.executedPlan.toString
    // the running sum's exchange partitions BY shard...
    assert(plan.contains("hashpartitioning(shard"),
      s"no shard hash exchange in:\n$plan")
    // ...and no stage collapses to a single partition before the
    // final presentation sort (SinglePartition appears only in a
    // global-window plan; the output orderBy is rangepartitioning)
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in:\n$plan")
  }

  test("packSegments: the r17 ranged running-sum core left NO " +
    "single-partition exchange — the global cumsum window is gone " +
    "and only the partitioned per-pack window remains") {
    val plan = TextOps.packSegments(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in:\n$plan")
    // the per-pack seg_idx window survives, PARTITIONED by pack_id
    // (bounded state), never an empty partition spec
    assert(plan.contains("windowspecdefinition(pack_id"),
      s"no per-pack window in:\n$plan")
    // the running sum itself rode the ranged core's checkpointed
    // frame (its range exchange ran eagerly at construction, so the
    // visible plan starts from the materialized scan)
    assert(plan.contains("Scan ExistingRDD"),
      s"no checkpointed ranged frame in:\n$plan")
  }

  test("exactSubstrings: anchors meet through the gram-hash equi-join," +
    " never a cartesian") {
    val plan = TextOps.exactSubstrings(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in:\n$plan")
  }
}

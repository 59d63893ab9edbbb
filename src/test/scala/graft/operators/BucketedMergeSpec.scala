package graft.operators

import graft.SparkSpecBase

/** The 100 TB co-location story: when both sides of the merge key are
  * bucketed+sorted on that key, the join (and therefore [[Merge]]'s
  * window) runs with NO shuffle exchange — this spec pins that plan
  * shape so a regression reintroducing the exchange fails loudly.
  */
class BucketedMergeSpec extends SparkSpecBase {

  test("bucketed-by-key tables equi-join without a shuffle exchange") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: bucketing matters exactly when the
      // sides are too big to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = (1 to 1000).map(i => (s"k$i", i.toLong)).toDF("key", "v")
      df.write.bucketBy(8, "key").sortBy("key").mode("overwrite")
        .saveAsTable("bucketed_a")
      df.write.bucketBy(8, "key").sortBy("key").mode("overwrite")
        .saveAsTable("bucketed_b")
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), "key")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("unbucketed control does shuffle (sanity for the assertion)") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (s"k$i", i.toLong)).toDF("key", "v")
    val b = (1 to 1000).map(i => (s"k$i", i.toLong)).toDF("key", "w")
    // disable auto-broadcast so the control actually shuffles
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = a.join(b, "key")
      joined.count()
      assert(joined.queryExecution.executedPlan.toString
        .contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

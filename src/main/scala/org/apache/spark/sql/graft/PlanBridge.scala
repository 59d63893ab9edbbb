package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  SparkSession => ClassicSession}

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * wrapping a hand-built [[LogicalPlan]] back into a user-facing
  * [[DataFrame]]. Custom logical operators (graft.plans.*) need exactly
  * this and nothing else from the internal API, so the bridge is kept to
  * a single method in a single file under the `org.apache.spark.sql`
  * package (the standard technique for libraries shipping their own plan
  * nodes — the same access path Spark's own `Dataset` transformations
  * use).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}

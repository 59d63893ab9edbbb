package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, Descending, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.IntegerType

/** Native per-group top-k — the whole-operator tier of the extension
  * ladder (SURVEY.md §4.3 step (c)): a custom `LogicalPlan` node planned
  * by a custom `SparkStrategy` into a partial/final pair of physical
  * operators, registered through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]) or lazily via
  * `experimental.extraStrategies`.
  *
  * Why the built-ins don't cut it at 100 TB: the declarative shape
  * (`row_number() OVER (PARTITION BY g ORDER BY s) <= k`, W1/W3 and the
  * reference's per-group result caps) makes Spark shuffle EVERY row to
  * its group's reducer and sort full groups there — the filter prunes
  * after the exchange. This operator holds a bounded k-row heap per group
  * on the MAP side, so the exchange moves at most `partitions × groups ×
  * k` candidate rows no matter how large the input is (the same
  * partial/final contract as Spark's own aggregates, applied to top-k),
  * then re-heaps per group and emits `rk = 1..k` in sort order. The
  * reduction is observable in the partial operator's `numOutputRows`
  * metric and pinned by GroupTopKSpec's plan assertions.
  *
  * Semantics = `row_number` by default: ties are broken by the
  * caller-supplied order (callers must pass a total order — append a key
  * column — for deterministic output, exactly as the window form
  * requires). With `withTies = true` the semantics are `rank()`: every
  * row whose gap-rank is ≤ k survives (tied rows share a rank, so a tie
  * crossing the boundary emits MORE than k rows, exactly as the window
  * form would); the map-side state then is k rows plus the current
  * boundary tie-run — still bounded unless one order key value
  * dominates a group.
  */
object GroupTopK {

  /** Keep the first `k` rows of each group under `orderKeys`
    * (`(column, descending?)`), appending a 1-based `rankName` column.
    * Resolution is by column name against `df`'s analyzed output.
    */
  def topK(df: DataFrame, groupCols: Seq[String],
      orderKeys: Seq[(String, Boolean)], k: Int,
      rankName: String = "rk", withTies: Boolean = false): DataFrame = {
    require(k > 0, s"topK needs k > 0, got $k")
    require(orderKeys.nonEmpty, "topK needs at least one order key")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"topK: no column '$n' in [${plan.output.map(_.name).mkString(", ")}]"))
    val order = orderKeys.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType,
      nullable = false)()
    PlanBridge.ofRows(spark,
      GroupTopKNode(groupCols.map(attr), order, k, rankAttr, plan,
        withTies))
  }

  /** Idempotently register the planner strategy on a live session —
    * covers sessions built without `spark.sql.extensions` (the
    * extensions path in [[graft.functions.GraftExtensions]] is the
    * canonical wiring).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(GroupTopKStrategy))
      exp.extraStrategies = GroupTopKStrategy +: exp.extraStrategies
  }
}

/** Logical node: `child` plus a rank column, at most `k` rows per
  * distinct value of `groupExprs`. `rankAttr` lives in the constructor so
  * its exprId survives tree copies.
  */
case class GroupTopKNode(
    groupExprs: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan,
    withTies: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupTopKNode = copy(child = newChild)
}

/** Plans [[GroupTopKNode]] as partial-heap → (exchange inserted by
  * EnsureRequirements) → final-heap. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(groups, order, k, rankAttr, child, ties) =>
      GroupTopKFinalExec(groups, order, k, rankAttr,
        GroupTopKPartialExec(groups, order, k, planLater(child), ties),
        ties) :: Nil
    case _ => Nil
  }
}

private[plans] object GroupTopKHeaps {

  /** Per-group retained state: the k-row heap, plus (rank semantics
    * only) the rows tied with the heap's current max — those may still
    * have gap-rank ≤ k even though the heap is full.
    */
  final class Keep(val pq: mutable.PriorityQueue[UnsafeRow]) {
    var ties: mutable.ArrayBuffer[UnsafeRow] = null
    def addTie(r: UnsafeRow): Unit = {
      if (ties == null) ties = mutable.ArrayBuffer.empty[UnsafeRow]
      ties += r
    }
    def size: Int = pq.size + (if (ties == null) 0 else ties.size)
    def iterator: Iterator[UnsafeRow] =
      if (ties == null) pq.iterator else pq.iterator ++ ties.iterator
  }

  /** One pass over a partition: bounded k-row heap per group key.
    * The heap's max (head) is the row sorting LAST under `order`, so a
    * better row evicts it in O(log k); group keys and retained rows are
    * copied out of the scan's reused buffers.
    *
    * `withTies` (rank semantics) additionally retains every row EQUAL
    * to the heap max: a row r must survive the partial iff fewer than k
    * local rows sort strictly before it, and rows tied with the max
    * satisfy that while rows strictly above it cannot. When an eviction
    * pushes the max strictly down, the stale tie-run (now above the
    * max) is dropped wholesale — so state is k + current-boundary-ties.
    */
  def build(iter: Iterator[InternalRow], schema: Seq[Attribute],
      groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
      withTies: Boolean = false)
      : (mutable.HashMap[UnsafeRow, Keep], Ordering[InternalRow]) = {
    val keyProj = UnsafeProjection.create(groupExprs, schema)
    val toUnsafe = UnsafeProjection.create(schema, schema)
    val ord: Ordering[InternalRow] = RowOrdering.create(order, schema)
    val uOrd: Ordering[UnsafeRow] = ord.on(identity[UnsafeRow])
    val heaps = mutable.HashMap.empty[UnsafeRow, Keep]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row) // reused buffer: safe for lookup only
      val keep = heaps.getOrElse(key, {
        val fresh = new Keep(mutable.PriorityQueue.empty[UnsafeRow](uOrd))
        heaps.put(key.copy(), fresh)
        fresh
      })
      val pq = keep.pq
      if (pq.size < k) pq.enqueue(toUnsafe(row).copy())
      else {
        val c = ord.compare(row, pq.head)
        if (c < 0) {
          val evicted = pq.dequeue()
          pq.enqueue(toUnsafe(row).copy())
          if (withTies) {
            if (uOrd.compare(evicted, pq.head) == 0) keep.addTie(evicted)
            else if (keep.ties != null) keep.ties.clear()
          }
        } else if (c == 0 && withTies) keep.addTie(toUnsafe(row).copy())
      }
    }
    (heaps, ord)
  }
}

/** Map-side half: emits each partition's per-group top-k candidates
  * (unranked, arbitrary order). Memory is bounded by `groups-per-
  * partition × k` rows — the same envelope as a partial hash aggregate.
  */
case class GroupTopKPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    withTies: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val (schema, g, o, kk, ties) =
      (child.output, groupExprs, order, k, withTies)
    child.execute().mapPartitions({ iter =>
      val (heaps, _) = GroupTopKHeaps.build(iter, schema, g, o, kk, ties)
      heaps.valuesIterator.flatMap { keep =>
        numOut += keep.size
        keep.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupTopKPartialExec = copy(child = newChild)
}

/** Reduce-side half: declares `ClusteredDistribution(groupExprs)` AND
  * `requiredChildOrdering(group, order)`, so EnsureRequirements plans
  * the exchange plus an EXTERNAL (spill-safe) sort of the surviving
  * candidates — the final pass is then a streaming rank emit with O(1)
  * state: no per-partition map of groups, no memory envelope at any
  * group cardinality. The sorted input is small by construction (the
  * partial bounded it to ≤ partitions × groups × k rows).
  */
case class GroupTopKFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan,
    withTies: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(SortOrder(_, Ascending)) ++ order)
  override def outputOrdering: Seq[SortOrder] =
    groupExprs.map(SortOrder(_, Ascending)) ++ order

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val (schema, g, o, kk, ties) =
      (child.output, groupExprs, order, k, withTies)
    val out = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, schema)
      val toUnsafe = UnsafeProjection.create(schema, schema)
      val proj = UnsafeProjection.create(out, out)
      val ord: Ordering[InternalRow] = RowOrdering.create(o, schema)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var pos = 0
      var rank = 0
      var prevRow: UnsafeRow = null // rank mode: head of the equal-run
      iter.flatMap { row =>
        val key = keyProj(row)
        if (curKey == null || key != curKey) {
          curKey = key.copy()
          pos = 0
          rank = 0
          prevRow = null
        }
        pos += 1
        if (ties) {
          // rank(): tied rows share the run-head's 1-based position
          if (prevRow == null || ord.compare(row, prevRow) != 0) {
            rank = pos
            prevRow = toUnsafe(row).copy()
          }
        } else rank = pos
        if (rank <= kk) {
          numOut += 1
          rankRow.update(0, rank)
          Iterator.single[InternalRow](proj(joined(row, rankRow)))
        } else Iterator.empty
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupTopKFinalExec = copy(child = newChild)
}

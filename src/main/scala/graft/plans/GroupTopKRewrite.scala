package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, CurrentRow, Expression, IntegerLiteral, LessThan,
  LessThanOrEqual, RangeFrame, Rank, RowFrame, RowNumber, SortOrder,
  SpecifiedWindowFrame, UnboundedPreceding, UnspecifiedFrame,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (`Rule[LogicalPlan]` tier of SURVEY §4.3): rewrites the
  * declarative per-group top-k idiom
  *
  * {{{ Filter(rk <= k, Window(row_number() AS rk OVER (PARTITION BY g ORDER BY s), ...)) }}}
  *
  * into the native [[GroupTopKNode]], so users (and existing queries)
  * keep writing the window form and still get bounded map-side heaps
  * instead of a shuffle-everything window sort. Registered through
  * [[graft.functions.GraftExtensions]] alongside the planner strategy.
  *
  * Also rewrites the `rank()` form of the idiom: [[GroupTopKNode]]'s
  * `withTies` mode reproduces rank's gap-rank tie semantics exactly
  * (tied rows share a rank; a tie crossing k emits them all), so the
  * rewrite is sound with or without a total ordering — and when the
  * ordering IS total (the common trailing-id-column discipline) rank ≡
  * row_number and the plans coincide. `dense_rank` stays unrewritten
  * (its boundary is "k distinct key values", a different retention
  * bound).
  *
  * Deliberately conservative — the rewrite fires only when ALL hold:
  *  - the Window computes exactly ONE expression, a `row_number()` over
  *    the default running ROWS frame or a `rank()` over its default
  *    running RANGE frame (multi-expression windows need the full
  *    operator);
  *  - the filter bounds that rank from above with an integer literal
  *    (`rk <= k` or `rk < k`); `rk = 1` idioms (e.g. the merge winner)
  *    are left alone so their pinned plans don't churn;
  *  - partition keys are attributes and every order reference resolves
  *    in the window's child.
  * Residual conjuncts (including further rank predicates — pagination's
  * `rk >= lo`) stay in a Filter ABOVE the rewritten node, which is
  * exactly row_number-filter semantics because the node emits the same
  * rank attribute (same exprId) in rank order.
  */
object GroupTopKRewrite extends Rule[LogicalPlan] {

  /** Splits `cond` into (top-k bound on `rk`, residual predicates). */
  private def bound(cond: Expression,
      rk: Attribute): (Option[Int], Seq[Expression]) = {
    val conjuncts = splitConjuncts(cond)
    val (bounds, rest) = conjuncts.partition {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(_))
        if a.semanticEquals(rk) => true
      case LessThan(a: Attribute, IntegerLiteral(_))
        if a.semanticEquals(rk) => true
      case _ => false
    }
    val ks = bounds.collect {
      case LessThanOrEqual(_, IntegerLiteral(k)) => k
      case LessThan(_, IntegerLiteral(k)) => k - 1
    }
    (ks.reduceOption(math.min), rest)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A running frame (UNBOUNDED PRECEDING .. CURRENT ROW, rows or
    * range) — the default every rank-family function resolves to; any
    * other frame means the user asked for something else. */
  private def isRunningFrame(frame: Expression): Boolean = frame match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
      true
    case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding,
      CurrentRow) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  /** Is this window expression a rewritable rank function, and does it
    * need tie (rank) semantics? */
  private def rankKind(we: WindowExpression): Option[Boolean] = we match {
    case WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, frame))
      if isRunningFrame(frame) => Some(false)
    case WindowExpression(Rank(_),
        WindowSpecDefinition(_, _, frame))
      if isRunningFrame(frame) => Some(true)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(we: WindowExpression, _)),
        partSpec, orderSpec, child, _))
        if rankKind(we).isDefined &&
          partSpec.forall(_.isInstanceOf[Attribute]) &&
          orderSpec.nonEmpty &&
          orderSpec.forall(_.references.subsetOf(child.outputSet)) =>
      val rk = alias.toAttribute
      bound(cond, rk) match {
        case (Some(k), rest) if k > 0 =>
          val rankAttr = AttributeReference(alias.name, IntegerType,
            nullable = false)(exprId = alias.exprId)
          val topk = GroupTopKNode(
            partSpec.map(_.asInstanceOf[Attribute]),
            orderSpec, k, rankAttr, child,
            withTies = rankKind(we).get)
          rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
        case _ => f
      }
  }

  /** Register rule + strategy on a live session (the
    * `spark.sql.extensions` path wires both at build time).
    */
  def ensure(spark: SparkSession): Unit = {
    GroupTopK.ensureStrategy(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(GroupTopKRewrite))
      exp.extraOptimizations = GroupTopKRewrite +: exp.extraOptimizations
  }
}

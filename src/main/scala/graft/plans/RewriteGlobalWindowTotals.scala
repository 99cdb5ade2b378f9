package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite UNPARTITIONED whole-frame window aggregates —
  * `SUM(x) OVER ()`, the percent-of-total idiom — into a broadcast
  * one-row aggregate joined back to the input.
  *
  * Why: a window with no PARTITION BY funnels the ENTIRE dataset through
  * one task (single `WindowExec` partition) — the classic 100 TB
  * scale-killer that `ScalableWindow.withGlobalShare` avoids by hand.
  * This rule applies the same rewrite automatically, so naive user SQL
  * (`SELECT x / SUM(x) OVER () FROM t`) gets the scale-safe plan: the
  * global total becomes `Aggregate(Nil, …)` (partial+final, fully
  * parallel) cross-joined back with a broadcast hint (one row), and the
  * original rows never move. The trade is a second scan of the child
  * subtree instead of a serialized single partition — at scale two
  * parallel passes always beat one sequential one (and exchange/subtree
  * reuse often elides the rescan).
  *
  * Fires only when EVERY window expression in the node is an aggregate
  * over the whole unpartitioned frame: no PARTITION BY, no ORDER BY,
  * unbounded-to-unbounded frame. Ranking/running/partitioned windows
  * pass through untouched. Output attribute ids are preserved, so
  * downstream operators (and the analyzer's resolved references) are
  * unaffected.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object RewriteGlobalWindowTotals extends Rule[LogicalPlan] {

  // tree-pattern pruned: subtrees without a Window skip in O(1) via the
  // cached pattern bits (this runs inside the fixed-point operator
  // optimization batch — several times per query)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.WINDOW)) {
    case w: Window if w.partitionSpec.isEmpty && w.orderSpec.isEmpty &&
        w.windowExpressions.nonEmpty &&
        w.windowExpressions.forall(isWholeFrameAggregate) &&
        // the rewrite evaluates w.child TWICE (row leg + total leg); a
        // nondeterministic subtree (rand(), uuid(), …) would aggregate
        // a DIFFERENT sample than the emitted rows — the Window form's
        // same-rows guarantee must win there, so the rule stands down
        w.child.find(n => !n.expressions.forall(_.deterministic)).isEmpty =>
      val aggAliases: Seq[Alias] = w.windowExpressions.map {
        case a @ Alias(WindowExpression(agg: AggregateExpression, _), _) =>
          Alias(agg, a.name + "__global")()
      }
      val globalAgg = Aggregate(Nil, aggAliases, w.child)
      val joined = Join(w.child, globalAgg, Cross, None,
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      // rebind the window output names to their ORIGINAL expr ids so
      // parents keep resolving
      val restored = w.windowExpressions.zip(aggAliases).map {
        case (orig: Alias, computed) =>
          Alias(computed.toAttribute, orig.name)(exprId = orig.exprId)
      }
      Project(w.child.output ++ restored, joined)
  }

  private def isWholeFrameAggregate(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(_: AggregateExpression, spec), _) =>
      spec.frameSpecification match {
        case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
        case _ => false
      }
    case _ => false
  }
}

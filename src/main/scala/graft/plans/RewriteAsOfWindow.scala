package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First, Last}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Analyzer (post-hoc resolution) rule: detect the union-sort-backfill
  * as-of idiom and plan the custom one-pass operator instead.
  *
  * The idiom (what `graft.operators.AsOfJoin` emits, and what a user
  * hand-writing the pattern produces):
  *
  * {{{
  *   Project [probe cols..., _asof.v AS asof_v ...]
  *   +- Filter (_side = probeLit)
  *      +- Window [last(_r, ignoreNulls) OVER (PARTITION BY keys
  *                 ORDER BY _ts, _side, _r ROWS UNBOUNDED PRECEDING..CURRENT) AS _asof]
  *         +- Union
  *            :- probe branch   (_side = probeLit, _r = NULL literal)
  *            +- reference branch (_side = refLit,  _r = never-null struct)
  * }}}
  *
  * (forward direction: `first(_r, ignoreNulls)` over the mirrored
  * CURRENT..UNBOUNDED FOLLOWING frame, probe sorting BEFORE reference.)
  *
  * That plan works but funnels |probe|+|reference| rows through ONE
  * window per key and recomputes the sort below it; [[AsOfJoinExec]]
  * answers the same question with two exchanges and a single merge pass
  * holding ONE buffered row — measured ~30% faster with the gap widening
  * in data size. Like [[RewriteGlobalWindowTotals]] for `SUM() OVER ()`,
  * this rule gives naive plans the scale-safe operator automatically:
  * x02/x08/x12's declared window-form queries plan the custom exec with
  * oracle rows unchanged.
  *
  * The rewrite is exactly semantics-preserving — including on null keys
  * and timestamps — because the node is planned in `nullParity` mode,
  * which reproduces the window form's null behavior (null keys group
  * like values; a null timestamp orders as -infinity). Spec-asserted
  * equal on nulled fixtures (RewriteAsOfWindowSpec).
  *
  * Matching is structural, not name-based: side-marker literals, the
  * null/struct `_r` origins, frame direction vs filter literal ordering,
  * and the three-column NULLS FIRST sort (the `_r` tiebreak is required —
  * without it the window form is nondeterministic on (key, ts) ties and
  * no hash-stable rewrite exists). A TTL'd shape rewrites too: the gap
  * guard lives in the outer projection, which the rewrite preserves
  * verbatim — only the backfill machinery is swapped.
  *
  * Registered by [[graft.GraftExtensions]] via
  * `injectPostHocResolutionRule`; disable per-session with
  * `SET spark.graft.asof.rewrite=false` (specs use this to build
  * genuine window-form baselines).
  */
object RewriteAsOfWindow extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.asof.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    // tree-pattern pruned: this rule runs on EVERY analysis pass (and
    // classic Datasets re-analyze the whole tree per transformation), so
    // subtrees without a Window/Filter pair skip in O(1) via the cached
    // pattern bits instead of paying a full transformUp visit
    else plan.transformUpWithPruning(t => t.containsAllPatterns(
        org.apache.spark.sql.catalyst.trees.TreePattern.WINDOW,
        org.apache.spark.sql.catalyst.trees.TreePattern.FILTER)) {
      case p @ Project(_, _: Filter) => rewrite(p).getOrElse(p)
    }

  /** Run `body` with the rewrite disabled on `spark` (restores the
    * previous setting) — for specs that need the raw window form. */
  def disabled[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  // same comparable set AsOfJoinNode validates — bail instead of letting
  // the node's require throw mid-analysis
  private def comparableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | DoubleType | FloatType |
         DateType | TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }

  /** Strip pure-attribute pass-through Projects (withColumn / window
    * extraction insert them between the structural nodes) and
    * SubqueryAliases (SQL-authored forms wrap every nesting level). */
  @annotation.tailrec
  private def stripAttrProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripAttrProjects(child)
    case SubqueryAlias(_, child) => stripAttrProjects(child)
    case other => other
  }

  /** The defining expression of attribute `id` inside `plan`, chasing
    * attribute/alias chains down through Projects/SubqueryAliases. */
  @annotation.tailrec
  private def origin(plan: LogicalPlan, id: ExprId): Option[Expression] =
    plan match {
      case SubqueryAlias(_, child) => origin(child, id)
      case Project(pl, child) =>
        pl.find(_.exprId == id) match {
          case Some(a: AttributeReference) => origin(child, a.exprId)
          case Some(Alias(ar: AttributeReference, _)) => origin(child, ar.exprId)
          case Some(Alias(e, _)) => Some(e)
          case _ => None
        }
      case _ => None
    }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  private def rewrite(outer: Project): Option[LogicalPlan] = {
    val f = outer.child.asInstanceOf[Filter]
    // 1. the side filter: `_side = <int literal>` (either operand order)
    val (sideRef, probeLit) = f.condition match {
      case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType)) => (a, v)
      case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference) => (a, v)
      case _ => return None
    }
    // 2. exactly one window expression: last/first(_r, ignoreNulls) over
    //    the direction's unbounded one-sided row frame
    val w = stripAttrProjects(f.child) match {
      case win: Window => win
      case _ => return None
    }
    val (asofAlias, aggExpr, spec) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(ae: AggregateExpression, sp), _)) =>
        (a, ae, sp)
      case _ => return None
    }
    if (aggExpr.isDistinct || aggExpr.filter.isDefined) return None
    val (rRef, forwardDir) = aggExpr.aggregateFunction match {
      case l: Last if l.ignoreNulls => l.child match {
        case a: AttributeReference => (a, false)
        case _ => return None
      }
      case fi: First if fi.ignoreNulls => fi.child match {
        case a: AttributeReference => (a, true)
        case _ => return None
      }
      case _ => return None
    }
    val frameOk = spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        !forwardDir
      case SpecifiedWindowFrame(RowFrame, CurrentRow, UnboundedFollowing) =>
        forwardDir
      case _ => false
    }
    if (!frameOk) return None
    // 3. ORDER BY (_ts, _side, _r) ASC NULLS FIRST — the _r tiebreak is
    //    what makes the window form deterministic on (key, ts) ties
    val (tsRef, sideRef2, rRef2) = w.orderSpec match {
      case Seq(SortOrder(t: AttributeReference, Ascending, NullsFirst, _),
               SortOrder(s: AttributeReference, Ascending, NullsFirst, _),
               SortOrder(r: AttributeReference, Ascending, NullsFirst, _)) =>
        (t, s, r)
      case _ => return None
    }
    if (sideRef2.exprId != sideRef.exprId || rRef2.exprId != rRef.exprId)
      return None
    val partKeys = w.partitionSpec.collect { case a: AttributeReference => a }
    if (partKeys.isEmpty || partKeys.size != w.partitionSpec.size) return None
    if (!comparableType(tsRef.dataType) ||
      partKeys.exists(k => !comparableType(k.dataType))) return None
    // 4. the two-branch union beneath
    val u = stripAttrProjects(w.child) match {
      case un: Union if un.children.size == 2 => un
      case _ => return None
    }
    val Seq(probeBranch, refBranch) = u.children
    val uOut = u.output
    def idxOf(a: Attribute): Int = uOut.indexWhere(_.exprId == a.exprId)
    val keyIdx = partKeys.map(idxOf)
    val tsIdx = idxOf(tsRef)
    val sideIdx = idxOf(sideRef)
    val rIdx = idxOf(rRef)
    if ((keyIdx :+ tsIdx :+ sideIdx :+ rIdx).exists(_ < 0)) return None
    // union output attrs must be the FIRST branch's (they are, by
    // Union.output's construction) — i.e. the probe is the first branch,
    // so everything the parent references flows from node.left unchanged
    val pOut = probeBranch.output
    val rOut = refBranch.output
    if (pOut.size != uOut.size || rOut.size != uOut.size) return None
    if (uOut(sideIdx).exprId != pOut(sideIdx).exprId) return None
    // 5. side markers: probe branch carries the filter's literal, the
    //    reference branch a DIFFERENT literal whose sort position
    //    matches the frame direction (backward: reference first at
    //    equal ts → inclusive ≤; forward: probe first → inclusive ≥)
    val pSide = origin(probeBranch, pOut(sideIdx).exprId).flatMap(intLit)
      .getOrElse(return None)
    val rSide = origin(refBranch, rOut(sideIdx).exprId).flatMap(intLit)
      .getOrElse(return None)
    if (pSide != probeLit || rSide == pSide) return None
    if (if (forwardDir) pSide > rSide else pSide < rSide) return None
    // 6. _r: NULL literal on the probe branch (probe rows must never
    //    become backfill candidates), never-null struct on the reference
    val pR = origin(probeBranch, pOut(rIdx).exprId).getOrElse(return None)
    if (!(pR.foldable && pR.eval(null) == null)) return None
    val rR = origin(refBranch, rOut(rIdx).exprId).getOrElse(return None)
    if (rR.nullable) return None
    val fields = rRef.dataType match {
      case StructType(fs) if fs.nonEmpty => fs.toSeq
      case _ => return None
    }
    // 7. rebuild: the outer projection must consume _asof only through
    //    GetStructField — each access becomes the matching output column
    val asofId = asofAlias.exprId
    val outAttrs = fields.map(sf =>
      AttributeReference("asof_" + sf.name, sf.dataType, nullable = true)())
    val newProj = outer.projectList.map { ne =>
      ne.transformUp {
        case GetStructField(a: AttributeReference, ord, _)
            if a.exprId == asofId => outAttrs(ord)
      } match {
        case n: NamedExpression => n
        case _ => return None
      }
    }
    if (newProj.exists(_.references.exists(_.exprId == asofId))) return None
    // 8. the node: probe branch as the left child verbatim; reference
    //    branch wrapped in a Project unpacking the struct fields
    val rStructAttr = rOut(rIdx)
    val valAliases = fields.zipWithIndex.map { case (sf, i) =>
      Alias(GetStructField(rStructAttr, i, Some(sf.name)), sf.name)()
    }
    val rightPlan = Project(
      keyIdx.map(rOut(_)) ++ Seq(rOut(tsIdx)) ++ valAliases, refBranch)
    val node = AsOfJoinNode(
      probeBranch, rightPlan,
      leftKeys = keyIdx.map(pOut(_)), rightKeys = keyIdx.map(rOut(_)),
      leftTs = pOut(tsIdx), rightTs = rOut(tsIdx),
      rightVals = valAliases.map(_.toAttribute), outAttrs = outAttrs,
      forwardDir = forwardDir, maxGap = None, nullParity = true)
    Some(Project(newProj, node))
  }
}

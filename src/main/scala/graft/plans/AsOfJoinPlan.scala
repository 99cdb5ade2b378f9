package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical backward as-of join — a first-class operator node, planned by
  * [[AsOfJoinStrategy]] into the custom [[AsOfJoinExec]] physical
  * operator (the (c)-tier extension path: LogicalPlan + SparkStrategy +
  * SparkPlan, registered through SparkSessionExtensions).
  *
  * Semantics (identical to `graft.operators.AsOfJoin.backward` on
  * null-free keys/timestamps, spec-asserted equal): every left row
  * keeps, per equi-key, the value columns of the LATEST right row with
  * `rightTs` ≤ `leftTs` — ties on (key, ts) resolve to the greatest
  * value tuple — or nulls when no such row exists. Null keys or
  * timestamps never match (SQL ASOF semantics — see the null-contract
  * note on [[AsOfJoinExec]]; the window form backfills null-ts
  * reference rows instead).
  *
  * `outAttrs` (the `asof_`-prefixed nullable output attributes) are
  * fixed at construction: computing them inside `output` would mint
  * fresh exprIds on every call and break plan resolution.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute],
    outAttrs: Seq[AttributeReference],
    forwardDir: Boolean = false,
    maxGap: Option[Long] = None,
    nullParity: Boolean = false,
    broadcastHint: Option[Boolean] = None) extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key on both sides")

  // nullParity reproduces the union-window form's null semantics (null
  // keys group like values, null timestamps order as -infinity) so the
  // RewriteAsOfWindow rule is exactly semantics-preserving. A TTL needs
  // integer gap arithmetic on the timestamps, which -infinity breaks.
  require(!(nullParity && maxGap.isDefined),
    "as-of nullParity and maxGap cannot be combined")

  // Key/timestamp types are validated HERE so an unsupported or
  // mismatched column fails at plan construction with a clear message,
  // not per-row inside doExecute as a mid-job task failure.
  {
    import org.apache.spark.sql.types._
    def comparable(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | DoubleType | FloatType |
           DateType | TimestampType | TimestampNTZType | StringType => true
      case _ => false
    }
    leftKeys.zip(rightKeys).foreach { case (l, r) =>
      require(comparable(l.dataType) && l.dataType == r.dataType,
        s"as-of join key type not supported or mismatched: " +
          s"${l.name}: ${l.dataType.simpleString} vs ${r.name}: ${r.dataType.simpleString}")
    }
    require(comparable(leftTs.dataType) && leftTs.dataType == rightTs.dataType,
      s"as-of timestamp type not supported or mismatched: " +
        s"${leftTs.dataType.simpleString} vs ${rightTs.dataType.simpleString}")
    // a TTL needs integer time arithmetic (micros / days / raw longs)
    maxGap.foreach { g =>
      require(g >= 0, s"as-of maxGap must be non-negative, got $g")
      require(leftTs.dataType match {
        case LongType | IntegerType | ShortType | DateType |
             TimestampType | TimestampNTZType => true
        case _ => false
      }, s"as-of maxGap needs an integer-unit timestamp type, " +
        s"got ${leftTs.dataType.simpleString}")
    }
  }

  override def output: Seq[Attribute] = left.output ++ outAttrs

  // the asof_* attributes originate HERE, not in a child — without this
  // CheckAnalysis reports them "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {

  private def resolve(plan: LogicalPlan, name: String): Attribute =
    plan.output.filter(_.name == name) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"column $name not found among ${plan.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        // mirror the analyzer's ambiguity error instead of silently
        // binding the first occurrence
        s"ambiguous column $name: ${many.size} matches " +
          s"(${many.map(_.exprId).mkString(", ")})")
    }

  /** Backward as-of join through the custom operator. The session must
    * have [[AsOfJoinStrategy]] available — via `GraftExtensions`
    * (injectPlannerStrategy) or `spark.experimental.extraStrategies`.
    *
    * `broadcast`: Some(true) forces [[BroadcastAsOfJoinExec]] (reference
    * side collected + broadcast, probe side never moves), Some(false)
    * forces the co-partitioned merge [[AsOfJoinExec]], None (default)
    * lets the strategy decide from the reference side's size estimate —
    * the join-hint contract, applied to the as-of operator.
    *
    * The right side is re-aliased to FRESH columns before the node is
    * built: when both sides derive from the same base relation, their
    * analyzed plans share exprIds, and the analyzer's
    * DeduplicateRelations renumbers the right subtree without being
    * able to remap a custom node's (ambiguous) attribute fields — the
    * aliases give the node's right-side references unique, stable ids
    * that survive deduplication. */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      maxGap: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    build(left, right, key, leftTs, rightTs, rightVals, forwardDir = false,
      maxGap, broadcast)

  /** Forward as-of join (earliest right row with ts ≥ the left's; ties
    * at equal (key, ts) resolve to the least value tuple) through the
    * custom operator. */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      maxGap: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    build(left, right, key, leftTs, rightTs, rightVals, forwardDir = true,
      maxGap, broadcast)

  private def build(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      forwardDir: Boolean, maxGap: Option[Long],
      broadcast: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val rPrepped = right.select(
      key.map(k => col(k).as(s"__asof_k_$k")) ++
        Seq(col(rightTs).as("__asof_ts")) ++
        rightVals.map(v => col(v).as(s"__asof_v_$v")): _*)
    val lp = GraftShims.analyzed(left)
    val rp = GraftShims.analyzed(rPrepped)
    val rv = rightVals.map(v => resolve(rp, s"__asof_v_$v"))
    val out = rightVals.zip(rv).map { case (name, a) =>
      AttributeReference(s"asof_$name", a.dataType, nullable = true)()
    }
    GraftShims.ofRows(left.sparkSession,
      AsOfJoinNode(lp, rp,
        key.map(resolve(lp, _)), key.map(k => resolve(rp, s"__asof_k_$k")),
        resolve(lp, leftTs), resolve(rp, "__asof_ts"), rv, out, forwardDir,
        maxGap, broadcastHint = broadcast))
  }
}

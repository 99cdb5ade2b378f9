package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar comparison for the as-of operators (merge + broadcast). */
private[plans] object AsOfOrd {
  def cmpValue(dt: DataType, a: Any, b: Any): Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case StringType =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other => throw new UnsupportedOperationException(
      s"as-of join key/ts type not supported: ${other.simpleString}")
  }

  /** ts comparison with NULLS FIRST ordering (null = -infinity). */
  def cmpTs(dt: DataType, a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else cmpValue(dt, a, b)

  /** A TTL'd timestamp in its integer units (micros / days / raw —
    * the node validated integrality at build). */
  def tsLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case other => throw new IllegalStateException(
      s"non-integral as-of ts under maxGap: $other") // unreachable: node validates
  }
}

/** Planner strategy for [[AsOfJoinNode]]: [[BroadcastAsOfJoinExec]] when
  * the reference side's estimated size fits under the broadcast
  * threshold (`spark.graft.asof.broadcastThreshold`, defaulting to
  * `spark.sql.autoBroadcastJoinThreshold`; set -1 to disable), else the
  * co-partitioned merge [[AsOfJoinExec]] — the BroadcastHashJoin vs
  * SortMergeJoin decision, applied to the as-of operator. Register with
  * `GraftExtensions` (injectPlannerStrategy) or ad hoc via
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  val ThresholdKey = "spark.graft.asof.broadcastThreshold"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      val sqlConf = org.apache.spark.sql.internal.SQLConf.get
      val threshold = sqlConf.getConfString(ThresholdKey, "") match {
        case "" => sqlConf.autoBroadcastJoinThreshold
        case s => s.toLong
      }
      val useBroadcast = n.broadcastHint.getOrElse(
        threshold > 0 && n.right.stats.sizeInBytes <= threshold)
      val exec =
        if (useBroadcast)
          BroadcastAsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
            n.rightVals, n.outAttrs, n.forwardDir, n.maxGap, n.nullParity,
            planLater(n.left), planLater(n.right))
        else
          AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
            n.rightVals, n.outAttrs, n.forwardDir, n.maxGap, n.nullParity,
            planLater(n.left), planLater(n.right))
      exec :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: a single merge pass over co-partitioned,
  * co-sorted children — the one-pass form of the point-in-time lookup.
  *
  * Physics: `requiredChildDistribution` hash-clusters both sides on the
  * equi-keys (EnsureRequirements inserts the two exchanges and keeps
  * them compatible) and `requiredChildOrdering` sorts each partition by
  * (keys, ts) — the right side additionally by the value columns, which
  * bakes the deterministic tie rule (greatest value tuple wins at equal
  * (key, ts)) into the sort instead of a runtime comparison. doExecute
  * then zips partitions and streams BOTH sides once: O(|L| + |R|) per
  * partition, ONE buffered right row, no window state, no row
  * amplification — at 100 TB this is the floor for this operator's
  * cost, and it plans exactly two exchanges (spec-asserted).
  *
  * Null contract (default, SQL ASOF semantics, matching the DuckDB
  * oracle where `p.ts >= c.ts` over a NULL is unknown → no match): rows
  * with a null key or null timestamp on the right NEVER match, and a
  * left row with a null key or timestamp gets null as-of values. NOTE
  * this is deliberately STRICTER than the union-window form, which
  * backfills a null-ts reference row (nulls sort first,
  * `last(ignoreNulls)` still sees its value struct) and groups null
  * keys together — on null-free keys/timestamps the two forms are
  * spec-asserted equal; on nulls the exec follows the SQL standard and
  * the window form does not.
  *
  * `nullParity = true` switches to EXACT window-form semantics: null
  * keys join each other like values (the window's PARTITION BY groups
  * nulls), and a null timestamp orders as -infinity (nulls-first sort:
  * a null-ts reference row is the earliest candidate; a null-ts probe
  * matches only null-ts reference rows). [[graft.plans.RewriteAsOfWindow]]
  * plans THIS mode, which is what makes the automatic rewrite
  * semantics-preserving on any data.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute],
    outAttrs: Seq[AttributeReference],
    forwardDir: Boolean,
    maxGap: Option[Long],
    nullParity: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightVals)).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  // streaming the probe iterator preserves its sort (keys, ts) — declare
  // it so a downstream sort on the same prefix is elided
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def cmpValue(dt: DataType, a: Any, b: Any): Int =
    AsOfOrd.cmpValue(dt, a, b)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyRefs = leftKeys.map(a =>
      BoundReference(left.output.indexWhere(_.exprId == a.exprId), a.dataType, a.nullable))
    val rKeyRefs = rightKeys.map(a =>
      BoundReference(right.output.indexWhere(_.exprId == a.exprId), a.dataType, a.nullable))
    val lTsRef = BoundReference(
      left.output.indexWhere(_.exprId == leftTs.exprId), leftTs.dataType, leftTs.nullable)
    val rTsRef = BoundReference(
      right.output.indexWhere(_.exprId == rightTs.exprId), rightTs.dataType, rightTs.nullable)
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    require(tsType == rightTs.dataType, "as-of timestamp types must match")
    val valsExprs = rightVals
    val rightOut = right.output
    val leftOutSize = left.output.size
    val nVals = rightVals.size
    val outSchema = output
    // TTL: gap measured in the ts type's integer units (micros for
    // timestamps, days for dates — node validated integral at build)
    val ttlOn = maxGap.isDefined
    val gapLimit = maxGap.getOrElse(Long.MaxValue)
    def tsLong(v: Any): Long = AsOfOrd.tsLong(v)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valsProj = UnsafeProjection.create(valsExprs, rightOut)
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(nVals)

      // one-row lookahead over the sorted right side
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // latest consumed right row's key (copied) + projected values + ts
      var heldKey: Array[Any] = null
      var heldVals: InternalRow = null
      var heldTs: Long = 0L

      def keyOf(row: InternalRow, refs: Seq[BoundReference]): Array[Any] = {
        val k = new Array[Any](refs.size)
        var i = 0
        while (i < refs.size) { k(i) = refs(i).eval(row); i += 1 }
        k
      }
      // <0 / 0 / >0 for key a vs key b. Nulls order FIRST (matching the
      // children's NULLS FIRST sort, so the merge advances in step). In
      // SQL mode a null key never equals anything — two nulls compare
      // "unequal but stably ordered"; in nullParity mode null == null
      // (the window's PARTITION BY groups null keys like values).
      def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < a.length) {
          val (x, y) = (a(i), b(i))
          if (x == null || y == null) {
            if (x == null && y == null) {
              if (!nullParity) return -1 // unequal; order stable (nulls first)
              // parity: equal on this component — compare the rest
            } else return if (x == null) -1 else 1
          } else {
            val c = cmpValue(keyTypes(i), x, y)
            if (c != 0) return c
          }
          i += 1
        }
        0
      }
      // ts comparison with NULLS FIRST ordering (AsOfOrd.cmpTs): a null
      // ts sorts before every value. In nullParity mode that makes null
      // a real -infinity (null == null matches); in SQL mode the
      // callers additionally keep null-ts rows out of matching.
      def cmpTs(a: Any, b: Any): Int = AsOfOrd.cmpTs(tsType, a, b)

      if (forwardDir) {
        // forward: pure lookahead — discard right rows strictly before
        // (lKey, lTs); the next remaining row IS the earliest-≥ match
        // (and the least value tuple among equal-ts rows, by the sort).
        // Nothing consumed can serve a later left row: left is sorted
        // ascending, so later probes only ever need later right rows.
        lIter.map { lRow =>
          val lKey = keyOf(lRow, lKeyRefs)
          val lTsV = lTsRef.eval(lRow)
          val keyUsable = nullParity || (!lKey.contains(null) && lTsV != null)
          if (keyUsable) {
            var advance = rRow != null
            while (advance) {
              val rKey = keyOf(rRow, rKeyRefs)
              val rTsV = rTsRef.eval(rRow)
              val kc = cmpKeys(rKey, lKey)
              val before = kc < 0 || (kc == 0 && cmpTs(rTsV, lTsV) < 0)
              if (before) {
                rRow = if (rIter.hasNext) rIter.next() else null
                advance = rRow != null
              } else advance = false
            }
          }
          val matches = keyUsable && rRow != null && {
            val rKey = keyOf(rRow, rKeyRefs)
            val rTsV = rTsRef.eval(rRow)
            cmpKeys(rKey, lKey) == 0 &&
              (nullParity || (!rKey.contains(null) && rTsV != null)) &&
              (!ttlOn || tsLong(rTsV) - tsLong(lTsV) <= gapLimit)
          }
          joined(lRow, if (matches) valsProj(rRow) else nullVals)
          resultProj(joined)
        }
      } else lIter.map { lRow =>
        val lKey = keyOf(lRow, lKeyRefs)
        val lTsV = lTsRef.eval(lRow)
        val keyUsable = nullParity || (!lKey.contains(null) && lTsV != null)
        if (keyUsable) {
          // consume right rows ordered ≤ (lKey, lTs)
          var advance = rRow != null
          while (advance) {
            val rKey = keyOf(rRow, rKeyRefs)
            val rTsV = rTsRef.eval(rRow)
            val kc = cmpKeys(rKey, lKey)
            // a null right ts sorts before every value (asc, nulls
            // first) — consume it, or it would block its key's merge
            val takes = kc < 0 || (kc == 0 && cmpTs(rTsV, lTsV) <= 0)
            if (takes) {
              // only a usable row can become the held as-of candidate
              // (in parity mode every row is usable).
              // Deep-copy the key: UTF8String values point into the sort
              // iterator's reused buffer — held uncopied, a spill would
              // silently overwrite them (the vals projection copies).
              if (nullParity || (!rKey.contains(null) && rTsV != null)) {
                heldKey = rKey.map {
                  case s: UTF8String => s.copy()
                  case v => v
                }
                heldVals = valsProj(rRow).copy()
                if (ttlOn) heldTs = tsLong(rTsV)
              }
              rRow = if (rIter.hasNext) rIter.next() else null
              advance = rRow != null
            } else advance = false
          }
        }
        val matches = keyUsable && heldKey != null &&
          cmpKeys(heldKey, lKey) == 0 &&
          (!ttlOn || tsLong(lTsV) - heldTs <= gapLimit)
        joined(lRow, if (matches) heldVals else nullVals)
        resultProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

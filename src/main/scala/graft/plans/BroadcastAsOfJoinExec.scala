package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast as-of join: the [[AsOfJoinExec]] semantics with a SMALL
  * reference side, executed with ZERO data movement on the probe side —
  * the BroadcastHashJoin-to-SortMergeJoin relationship, applied to the
  * point-in-time operator.
  *
  * Physics: the reference side is collected, grouped by key, and each
  * group sorted by (ts, value columns) — the SAME total order the merge
  * exec's `requiredChildOrdering` bakes the tie rule into — then
  * broadcast. Each probe task binary-searches its rows against the
  * broadcast index: backward takes the last entry ordered ≤ (ts), i.e.
  * the latest at-or-before match with greatest-value tie rule; forward
  * the first entry ordered ≥. No exchange, no sort, no window state on
  * the probe side — at 100 TB the merge exec's dominant cost IS the
  * probe-side shuffle+sort, and a feature-store reference table (the
  * Feast point-in-time case this operator models) is routinely
  * broadcast-sized. Probe partitioning and ordering are preserved, so
  * downstream operators keep whatever physical properties the scan or a
  * previous stage established.
  *
  * Chosen automatically by [[AsOfJoinStrategy]] when the reference
  * side's estimated size fits `spark.graft.asof.broadcastThreshold`
  * (default: `spark.sql.autoBroadcastJoinThreshold`; -1 disables).
  * Null contract and `nullParity` mode are identical to
  * [[AsOfJoinExec]] — spec-asserted output-equal to both the merge exec
  * and the union-window form, including on null keys/timestamps.
  */
case class BroadcastAsOfJoinExec(
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

  // the whole point: probe-side physical properties pass through
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Per-key reference entries: timestamps and projected value rows,
    * parallel arrays sorted by (ts, vals) ascending nulls-first. */
  private type Index = mutable.HashMap[Seq[Any], (Array[Any], Array[UnsafeRow])]

  private def buildIndex(): Index = {
    val rOut = right.output
    val rKeyRefs = rightKeys.map(a =>
      BoundReference(rOut.indexWhere(_.exprId == a.exprId), a.dataType, a.nullable))
    val rTsRef = BoundReference(
      rOut.indexWhere(_.exprId == rightTs.exprId), rightTs.dataType, rightTs.nullable)
    val valsProj = UnsafeProjection.create(rightVals, rOut)
    // tie rule: among equal (key, ts), backward keeps the GREATEST value
    // tuple, forward the LEAST — sorting vals ascending makes both a
    // plain boundary pick, exactly like the merge exec's child sort
    val valsOrdering = new InterpretedOrdering(
      rightVals.zipWithIndex.map { case (a, i) =>
        SortOrder(BoundReference(i, a.dataType, a.nullable), Ascending)
      })
    val tsType = rightTs.dataType
    val grouped = new mutable.HashMap[Seq[Any], mutable.ArrayBuffer[(Any, UnsafeRow)]]
    right.executeCollect().foreach { row =>
      val key = new Array[Any](rKeyRefs.size)
      var i = 0
      while (i < rKeyRefs.size) {
        key(i) = rKeyRefs(i).eval(row) match {
          case s: UTF8String => s.copy() // detach from the collected buffer
          case v => v
        }
        i += 1
      }
      val ts = rTsRef.eval(row)
      // SQL mode: null-keyed or null-ts reference rows never match —
      // leave them out of the index; parity mode indexes them (null key
      // groups like a value, null ts = -infinity)
      if (nullParity || (!key.contains(null) && ts != null)) {
        grouped.getOrElseUpdate(key.toSeq, new mutable.ArrayBuffer)
          .append((ts, valsProj(row).copy()))
      }
    }
    grouped.map { case (k, buf) =>
      val sorted = buf.sortWith { case ((ts1, v1), (ts2, v2)) =>
        val c = AsOfOrd.cmpTs(tsType, ts1, ts2)
        if (c != 0) c < 0 else valsOrdering.compare(v1, v2) < 0
      }
      k -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val index = sparkContext.broadcast(buildIndex())
    val lOut = left.output
    val lKeyRefs = leftKeys.map(a =>
      BoundReference(lOut.indexWhere(_.exprId == a.exprId), a.dataType, a.nullable))
    val lTsRef = BoundReference(
      lOut.indexWhere(_.exprId == leftTs.exprId), leftTs.dataType, leftTs.nullable)
    val tsType = leftTs.dataType
    val nVals = rightVals.size
    val outSchema = output
    val fwd = forwardDir
    val parity = nullParity
    val ttlOn = maxGap.isDefined
    val gapLimit = maxGap.getOrElse(Long.MaxValue)
    def tsLong(v: Any): Long = AsOfOrd.tsLong(v)

    left.execute().mapPartitions { lIter =>
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(nVals)
      val idx = index.value
      lIter.map { lRow =>
        val key = new Array[Any](lKeyRefs.size)
        var i = 0
        while (i < lKeyRefs.size) { key(i) = lKeyRefs(i).eval(lRow); i += 1 }
        val lTsV = lTsRef.eval(lRow)
        val usable = parity || (!key.contains(null) && lTsV != null)
        val matched: UnsafeRow =
          if (!usable) null
          else idx.get(key.toSeq) match {
            case None => null
            case Some((tss, vals)) =>
              // boundary search over the (ts, vals)-sorted entries:
              // backward → last index with ts <= lTs; forward → first
              // index with ts >= lTs (ties resolved by the sort itself)
              var lo = 0
              var hi = tss.length
              while (lo < hi) { // invariant: lo..hi brackets the boundary
                val mid = (lo + hi) >>> 1
                val c = AsOfOrd.cmpTs(tsType, tss(mid), lTsV)
                if (if (fwd) c < 0 else c <= 0) lo = mid + 1 else hi = mid
              }
              val pick = if (fwd) lo else lo - 1
              if (pick < 0 || pick >= tss.length) null
              else if (ttlOn && {
                val gap =
                  if (fwd) tsLong(tss(pick)) - tsLong(lTsV)
                  else tsLong(lTsV) - tsLong(tss(pick))
                gap > gapLimit
              }) null
              else vals(pick)
          }
        joined(lRow, if (matched != null) matched else nullVals)
        resultProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs — the scale-safe
  * finisher for per-group top-k ranking.
  *
  * Why this exists: the idiomatic finisher,
  * `row_number() OVER (PARTITION BY group ORDER BY score DESC)` then
  * `rank <= k`, shuffles EVERY scored row to the group's single reducer
  * partition before any row is discarded. When the group cardinality is
  * small (an ANN query set is ~10 ids), that is the textbook pathological
  * shuffle: a 100 TB corpus of scored candidates funnels through 10
  * tasks, and the job runs at the speed of one straggler regardless of
  * cluster size.
  *
  * This aggregate keeps a bounded k-element heap per group INSIDE the
  * partial (map-side) aggregation — Spark plans a TypedImperativeAggregate
  * as ObjectHashAggregate with partial merge — so each map task emits at
  * most k rows per group and the shuffle volume drops from |scored rows|
  * to k · |groups| · |map partitions|, independent of corpus size.
  *
  * Ordering contract (must match the window form it replaces): higher
  * score first; ties broken by LOWER id first. Null scores/ids are
  * ignored. Result: `array<struct<score:double, id:bigint>>` sorted
  * best-first — `posexplode` it and add `pos + 1` as the rank.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_pairs requires (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  /** Best-first total order: score DESC, id ASC. A TreeSet under this
    * ordering keeps the k best at the head and the evictable worst at
    * the tail; (score, id) duplicates collapse, which is harmless here
    * because id is a key in every caller. */
  private object BestFirst extends Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](BestFirst)

  override def update(buf: java.util.TreeSet[(Double, Long)], input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.add((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)], other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var n = 0
    while (it.hasNext) {
      val (s, i) = it.next()
      out(n) = InternalRow(s, i)
      n += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      out.writeDouble(s)
      out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {
  /** Column API: bounded best-first top-k of (score, id) per group. */
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    GraftShims.column(
      TopKPairs(GraftShims.expression(score), GraftShims.expression(id), k)
        .toAggregateExpression())
}

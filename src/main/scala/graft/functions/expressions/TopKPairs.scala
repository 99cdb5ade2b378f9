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
  * score first; ties broken by LOWER id first. Duplicate (score, id)
  * pairs are counted with MULTIPLICITY — an input containing the same
  * pair twice yields it twice, exactly as `row_number()` would — so the
  * function is safe for non-key ids fed through its public SQL
  * registration, not just the unique-id ANN callers. Null scores/ids are
  * ignored. Result: `array<struct<score:double, id:bigint>>` sorted
  * best-first — `posexplode` it and add `pos + 1` as the rank.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.Buffer] {

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

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k)

  override def update(buf: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long], 1)
    buf
  }

  override def merge(buf: TopKPairs.Buffer, other: TopKPairs.Buffer): TopKPairs.Buffer = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey._1, e.getKey._2, e.getValue)
    }
    buf
  }

  override def eval(buf: TopKPairs.Buffer): Any = {
    val out = new Array[Any](buf.n)
    val it = buf.m.entrySet().iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) {
        out(n) = InternalRow(e.getKey._1, e.getKey._2)
        n += 1
        c -= 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKPairs.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size())
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.getKey._1)
      out.writeLong(e.getKey._2)
      out.writeInt(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val entries = in.readInt()
    var j = 0
    while (j < entries) {
      buf.add(in.readDouble(), in.readLong(), in.readInt())
      j += 1
    }
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

  /** Best-first total order: score DESC, id ASC. */
  private object BestFirst extends Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Bounded multiset of (score, id) pairs under the best-first order:
    * a TreeMap of occurrence counts (so duplicate pairs rank with
    * multiplicity, like the window form) capped at k total occurrences —
    * the worst occurrence is evicted when a better one arrives. */
  final class Buffer(k: Int) {
    val m = new java.util.TreeMap[(Double, Long), Int](BestFirst)
    var n: Int = 0

    def add(score: Double, id: Long, count: Int): Unit = {
      var c = count
      val key = (score, id)
      // take occurrences while capacity remains
      if (n < k) {
        val take = math.min(c, k - n)
        m.put(key, m.getOrDefault(key, 0) + take)
        n += take
        c -= take
      }
      // replace worst occurrences while strictly better than the worst
      while (c > 0 && BestFirst.compare(key, m.lastKey()) < 0) {
        m.put(key, m.getOrDefault(key, 0) + 1)
        val worst = m.lastKey()
        val wc = m.get(worst)
        if (wc == 1) m.remove(worst) else m.put(worst, wc - 1)
        c -= 1
      }
    }
  }

  /** Column API: bounded best-first top-k of (score, id) per group. */
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    GraftShims.column(
      TopKPairs(GraftShims.expression(score), GraftShims.expression(id), k)
        .toAggregateExpression())
}

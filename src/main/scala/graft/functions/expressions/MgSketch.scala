package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary: at most `k - 1` (item, counter)
  * pairs maintained single-pass — the deterministic-memory answer to
  * "which keys exceed an n/k frequency share" over data whose key
  * cardinality is too large (or too streaming) for per-key state.
  *
  * Guarantees (the classical MG bounds, spec-asserted):
  *   - NO FALSE NEGATIVES: every item with true count > n/k is in the
  *     summary — the summary is a candidate superset of the heavy set;
  *   - counter bounds: `true - n/k <= est <= true` for surviving items;
  *   - if the group's distinct-key count is at most k-1, no eviction
  *     ever fires and the summary IS the exact per-key count, for any
  *     partitioning.
  *
  * Merge follows Agarwal et al., "Mergeable Summaries" (PODS'12):
  * counters add pointwise; if more than k-1 survive, the k-th largest
  * counter value is subtracted from all (dropping non-positive) — this
  * preserves both bounds under arbitrary merge trees, which is what
  * makes the aggregate safe as a map-side partial: the shuffle carries
  * at most k-1 pairs per map partition per group, never the key
  * cardinality. Counter VALUES (not the guarantee) depend on the merge
  * order, so the intended pattern is two-pass: sketch → candidate set →
  * exact recount of candidates only (see x21) — the final answer is
  * then partitioning-independent and oracle-exact.
  *
  * Result: `array<struct<item:string, est:bigint>>` sorted est DESC,
  * item ASC (deterministic presentation for a given summary state).
  */
case class MgSketch(
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 2, s"k must be >= 2, got $k")

  private def capacity: Int = k - 1

  override def children: Seq[Expression] = Seq(valueExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "mg_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    valueExpr.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mg_sketch requires a string value column (cast keys first), " +
            s"got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < capacity) buf.put(s, 1L)
      else {
        // classic MG step: the incoming singleton annihilates one unit
        // of every resident counter. Each unit removed here was paid
        // for by one prior insert, so total decrement work is O(n).
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > capacity) {
      // subtract the k-th largest counter from all; at most k-1 values
      // can be strictly greater, so at most capacity counters survive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val err = counts(counts.length - capacity - 1)
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= err) es.remove() else e.setValue(e.getValue - err)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortWith { case ((ia, ea), (ib, eb)) =>
      if (ea != eb) ea > eb else ia < ib
    }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est): Any
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8, not writeUTF: writeUTF throws on keys
      // over 65535 bytes, and a tracked key can be an arbitrary token
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgSketch =
    copy(valueExpr = newChildren(0))
}

object MgSketch {

  /** Column API: Misra-Gries k-heavy-hitters candidate summary. */
  def mg_sketch(value: Column, k: Int): Column =
    GraftShims.column(
      MgSketch(GraftShims.expression(value), k).toAggregateExpression())
}

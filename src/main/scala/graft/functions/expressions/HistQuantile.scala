package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic, mergeable quantile sketch: a fixed-boundary equi-width
  * histogram plus within-bucket linear interpolation.
  *
  * Why this exists next to `percentile_approx`: the built-in GK-style
  * sketch is the right 100 TB answer (single pass, mergeable, fixed
  * memory) but its internals are engine-native, so its output can only
  * get a weak rows-only correctness check (x09). This sketch keeps every
  * scale property — the buffer is a fixed `Array[Long]` of bucket counts,
  * `merge` is element-wise add, the shuffle carries `nBuckets` longs per
  * group regardless of input size — while its construction is plain
  * arithmetic (`floor((v - lo) / width)`, cumulative counts, linear
  * interpolation at rank `pct * n`), so a SQL engine can replay it
  * exactly and the result gets a true hash oracle (x13), the same upgrade
  * d05 gave the SimHash family.
  *
  * Accuracy contract: error is bounded by the bucket width (value-space),
  * unlike GK's rank-space bound — choose `lo`/`width`/`nBuckets` from the
  * domain (they are plan-time constants, as fixed boundaries must be for
  * partial aggregates to merge). Out-of-range values clamp into the edge
  * buckets.
  *
  * Estimate definition (replayed verbatim by the x13 oracle SQL): with
  * per-bucket counts `c_b`, cumulative counts `cum_b`, total `n`, target
  * rank `r = pct * n`, and `b` the first bucket with `cum_b >= r`:
  * `estimate = lo + width * (b + (r - (cum_b - c_b)) / c_b)`.
  */
case class HistQuantile(
    valueExpr: Expression,
    lo: Double,
    width: Double,
    nBuckets: Int,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
  require(width > 0, s"width must be positive, got $width")
  require(percentages.nonEmpty && percentages.forall(p => p > 0 && p <= 1),
    s"percentages must be in (0, 1], got $percentages")

  override def children: Seq[Expression] = Seq(valueExpr)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "hist_quantile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    valueExpr.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hist_quantile requires a double value column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val raw = math.floor((v.asInstanceOf[Double] - lo) / width).toLong
      val b = math.min(math.max(raw, 0L), (nBuckets - 1).toLong).toInt
      buf(b) += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBuckets) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < nBuckets) { n += buf(i); i += 1 }
    if (n == 0L) return null
    val out = new Array[Any](percentages.length)
    var p = 0
    while (p < percentages.length) {
      val r = percentages(p) * n
      // First bucket whose cumulative count reaches rank r; minimality
      // guarantees that bucket is non-empty (cum only grows at non-empty
      // buckets and r > 0), mirroring the oracle's GROUP BY over observed
      // buckets.
      var b = 0
      var cum = buf(0)
      while (cum < r && b < nBuckets - 1) { b += 1; cum += buf(b) }
      val c = buf(b)
      out(p) = lo + width * (b + (r - (cum - c)) / c)
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantile =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantile =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistQuantile =
    copy(valueExpr = newChildren(0))
}

object HistQuantile {
  /** Column API: deterministic histogram-sketch quantiles. Returns
    * `array<double>` aligned with `pcts`. */
  def hist_quantile(value: Column, lo: Double, width: Double, nBuckets: Int,
      pcts: Seq[Double]): Column =
    GraftShims.column(
      HistQuantile(GraftShims.expression(value), lo, width, nBuckets, pcts)
        .toAggregateExpression())
}

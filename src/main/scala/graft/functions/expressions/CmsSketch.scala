package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic count-min sketch: `depth × width` counters, row `d`
  * bucketing each value by an md5-derived hash — the single-pass,
  * mergeable, fixed-memory answer to "how often does key X occur" over
  * data too large (or too streaming) to hold per-key state.
  *
  * Scale contract: the aggregation buffer is a fixed `Array[Long]` of
  * `depth * width` counters regardless of input size or key cardinality
  * — partial aggregation combines map-side, the shuffle carries one
  * 16 KB-ish array per group, and `merge` is element-wise addition,
  * which makes the result independent of partitioning and merge order
  * (spec-asserted). Point estimates are one-sided: `est >= exact`
  * always (a counter only ever over-counts via collisions), with the
  * standard CMS bound `est - exact <= 2n/width` per hash row w.h.p.
  *
  * Why md5 and not a faster engine-native hash: the same reason d05
  * (SimHash) and x13 (histogram quantiles) exist — the construction is
  * replayable VERBATIM in another SQL engine
  * (`('0x' || substr(md5(v || '#' || d), 1, 15))::BIGINT % width`), so
  * the sketch gets a true hash oracle (x15) instead of a rows-only
  * check. Hash row `d` uses the top 60 bits of `md5(value + "#" + d)`,
  * exactly `conv(substr(md5(concat(v, '#', d)), 1, 15), 16, 10)`.
  *
  * Buffer layout: counter for hash row `d`, bucket `w` lives at
  * `d * width + w`; `eval` returns the flat array (1-indexed via SQL
  * `element_at`), and the estimate is `min` over the `depth` probed
  * cells — composable with built-in functions, no custom scalar
  * expression needed on the read side.
  */
case class CmsSketch(
    valueExpr: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width > 1, s"width must be > 1, got $width")

  override def children: Seq[Expression] = Seq(valueExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    valueExpr.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_sketch requires a string value column (cast keys first so " +
            s"the hash input is unambiguous), got ${other.simpleString}")
    }

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  /** Top 60 bits of md5(s + "#" + d) — the value of
    * `conv(substr(md5(concat(s, '#', d)), 1, 15), 16, 10)`, always
    * non-negative. */
  private def bucket(s: UTF8String, d: Int): Int = {
    md5.reset()
    md5.update(s.getBytes)
    md5.update('#'.toByte)
    md5.update(String.valueOf(d).getBytes("UTF-8"))
    val h = md5.digest()
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (h(i) & 0xffL); i += 1 }
    ((be >>> 4) % width).toInt
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) { buf(d * width + bucket(s, d)) += 1; d += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(l => l: Any))

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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(valueExpr = newChildren(0))
}

object CmsSketch {
  /** Column API: the flat `depth × width` counter array. */
  def cms_sketch(value: Column, depth: Int, width: Int): Column =
    GraftShims.column(
      CmsSketch(GraftShims.expression(value), depth, width)
        .toAggregateExpression())

  /** Column API: the min-over-rows point estimate for `key` against a
    * sketch column built with the same (depth, width) — built-in
    * functions only, so the probe composes into any plan. */
  def cms_estimate(sketch: Column, key: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { d =>
      element_at(sketch,
        (lit(d * width) +
          pmod(conv(substring(md5(concat(key, lit("#"), lit(d.toString))),
            1, 15), 16, 10).cast("long"), lit(width)) + 1).cast("int"))
    }.reduce(least(_, _))
  }
}

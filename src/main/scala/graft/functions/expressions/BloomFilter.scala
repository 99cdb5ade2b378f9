package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter: `numBits` bits, `numHashes` md5-derived
  * positions per value — the fixed-memory, mergeable membership sketch
  * behind semi-join prefilters: build it over a small key set, ship it
  * broadcast, and drop non-matching rows of a huge table BEFORE the
  * shuffle a real join would pay. One-sided by construction: a present
  * key always answers true (no false negatives, spec-asserted); an
  * absent key answers true with probability ~(1-e^(-kn/m))^k.
  *
  * Scale contract: the aggregation buffer is `ceil(numBits/64)` longs
  * regardless of input size or key cardinality — partial aggregation
  * combines map-side, the shuffle carries one word array per group, and
  * `merge` is bitwise OR, making the result independent of partitioning
  * and merge order (spec-asserted). A 1M-key set at 10 bits/key is a
  * ~1.2 MB broadcast — the runtime-filter economics Spark's own AQE
  * bloom pushdown uses, here as a deterministic, SQL-callable value.
  *
  * Why md5 and not a faster engine-native hash: same reason as
  * [[CmsSketch]] (x15) and SimHash-md5 (d05) — position `i` of value
  * `v` is `conv(substr(md5(concat(v, '#', i)), 1, 15), 16, 10) %
  * numBits`, replayable VERBATIM in another SQL engine, so membership
  * answers get a true hash oracle (x16) instead of a rows-only check.
  *
  * Buffer layout: bit `p` lives in word `p / 64` at bit `p % 64`
  * (LSB-first); `eval` returns the word array (1-indexed via SQL
  * `element_at`), and [[BloomFilter.bloom_might_contain]] composes the
  * probe from built-in functions only.
  */
case class BloomFilter(
    valueExpr: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 63, s"numBits must be > 63, got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(valueExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    valueExpr.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_build requires a string value column (cast keys first so " +
            s"the hash input is unambiguous), got ${other.simpleString}")
    }

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  /** Bit position `i` for value `s` — the value of
    * `conv(substr(md5(concat(s, '#', i)), 1, 15), 16, 10) % numBits`,
    * always non-negative (top 60 bits of the digest). */
  private def position(s: UTF8String, i: Int): Int = {
    md5.reset()
    md5.update(s.getBytes)
    md5.update('#'.toByte)
    md5.update(String.valueOf(i).getBytes("UTF-8"))
    val h = md5.digest()
    var be = 0L
    var j = 0
    while (j < 8) { be = (be << 8) | (h(j) & 0xffL); j += 1 }
    ((be >>> 4) % numBits).toInt
  }

  private def words: Int = (numBits + 63) / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val p = position(s, i)
        buf(p >>> 6) |= (1L << (p & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilter =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilter =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilter =
    copy(valueExpr = newChildren(0))
}

object BloomFilter {
  import org.apache.spark.sql.functions._

  /** Column API: the bit-set word array. */
  def bloom_build(value: Column, numBits: Int, numHashes: Int): Column =
    GraftShims.column(
      BloomFilter(GraftShims.expression(value), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: membership probe against a filter built with the same
    * (numBits, numHashes) — built-in functions only (`call_function`
    * reaches the expression-argument form of shiftleft the Scala DSL
    * doesn't expose), so the probe composes into any plan and stays
    * inside whole-stage codegen. */
  def bloom_might_contain(bloom: Column, key: Column,
      numBits: Int, numHashes: Int): Column =
    (0 until numHashes).map { i =>
      val pos = pmod(
        conv(substring(md5(concat(key, lit("#"), lit(i.toString))), 1, 15),
          16, 10).cast("long"),
        lit(numBits.toLong))
      val word = element_at(bloom, ((pos / 64) + 1).cast("int"))
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)

  /** JVM-side mirror of the expression's md5 bit positions, for
    * consumers that probe a PERSISTED word array without running a
    * Spark plan — e.g. the versioned table's per-file manifest blooms,
    * where the probe happens at planning time on the driver. Must stay
    * bit-identical to [[BloomFilter.position]] (spec-asserted). */
  def positions(value: String, numBits: Int, numHashes: Int): Array[Int] = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      md5.reset()
      md5.update(value.getBytes("UTF-8"))
      md5.update('#'.toByte)
      md5.update(String.valueOf(i).getBytes("UTF-8"))
      val h = md5.digest()
      var be = 0L
      var j = 0
      while (j < 8) { be = (be << 8) | (h(j) & 0xffL); j += 1 }
      out(i) = ((be >>> 4) % numBits).toInt
      i += 1
    }
    out
  }

  /** Driver-side membership probe over a persisted word array. */
  def mightContain(words: IndexedSeq[Long], value: String,
      numBits: Int, numHashes: Int): Boolean =
    positions(value, numBits, numHashes).forall { p =>
      (words(p >>> 6) & (1L << (p & 63))) != 0L
    }

  /** The semi-join prefilter: keep only `large` rows whose `largeKey`
    * MIGHT be in `small`'s `smallKey` set. The filter aggregate runs
    * over the small side, broadcasts as one row, and the probe is a
    * map-only predicate on the large side — no shuffle of `large`
    * happens here at all. False positives pass through (the exact join
    * downstream removes them); false negatives cannot occur, so
    * `prefilter(large) ⋈ small ≡ large ⋈ small` (spec-asserted).
    * Null keys never match a bloom of non-null keys and are dropped,
    * matching inner-join semantics. */
  def semiFilter(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = small.select(col(smallKey).cast("string").as("_k"))
      .where(col("_k").isNotNull)
      .agg(bloom_build(col("_k"), numBits, numHashes).as("_bloom"))
    large.join(broadcast(bloom))
      .where(bloom_might_contain(col("_bloom"),
        col(largeKey).cast("string"), numBits, numHashes))
      .drop("_bloom")
  }
}

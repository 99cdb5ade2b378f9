package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Winnowing document fingerprint via Rabin-Karp rolling hashes.
  *
  * Slides a `window`-byte window over the text computing the polynomial
  * rolling hash h = Σ b_i·B^(w-1-i) (mod 2^61-1) in O(1) per step, then
  * keeps the minimum hash of every sliding run of `stride` consecutive
  * windows — the classic winnowing selection (Schleimer/Wilkerson/Aiken), which
  * guarantees any shared substring of length ≥ window+stride-1 yields a
  * shared fingerprint. Output: the distinct selected hashes, sorted —
  * compare documents by fingerprint overlap.
  */
case class RollingFingerprint(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_fingerprint requires a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hashes = RollingFingerprint.windowHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window)
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Any])
    val nWindows = hashes.length
    // Winnowing: min of EVERY run of `stride` consecutive hashes (the
    // window slides by 1 — tumbling runs would lose the shared-substring
    // guarantee, since run boundaries are offset-dependent per document).
    val selected = new java.util.TreeSet[java.lang.Long]()
    val lastStart = math.max(0, nWindows - stride)
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + stride, nWindows)
      var mn = Long.MaxValue
      var j = start
      while (j < end) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      selected.add(mn)
      start += 1
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private val M = (1L << 61) - 1 // Mersenne prime; mulmod stays exact below
  private val B = 257L

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit Mersenne modular multiply via 128-bit split (Math.multiplyHigh).
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi·2^64 + lo) mod 2^61-1: fold 2^64 ≡ 2^3 (mod M)
    val folded = ((hi << 3) | (lo >>> 61)) + (lo & M)
    val r = (folded & M) + (folded >>> 61)
    if (r >= M) r - M else r
  }

  /** All `window`-byte Rabin-Karp hashes of `text`, one per start offset
    * (empty when the text is shorter than the window). Shared by the
    * fingerprint-set and fingerprint-position expressions so both select
    * from bit-identical hash streams. */
  private[expressions] def windowHashes(
      text: org.apache.spark.unsafe.types.UTF8String, window: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < window) return Array.emptyLongArray
    // Precompute B^(window-1) mod M for the roll-out term.
    var bPow = 1L
    var p = 0
    while (p < window - 1) { bPow = mulmod(bPow, B); p += 1 }
    val nWindows = n - window + 1
    val hashes = new Array[Long](nWindows)
    var h = 0L
    var i = 0
    while (i < window) { h = (mulmod(h, B) + (bytes(i) & 0xffL)) % M; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nWindows) {
      val out = mulmod(bytes(i - 1) & 0xffL, bPow)
      h = h - out
      if (h < 0) h += M
      h = (mulmod(h, B) + (bytes(i + window - 1) & 0xffL)) % M
      hashes(i) = h
      i += 1
    }
    hashes
  }

  /** Column API: rolling_fingerprint(text, window, stride). */
  def rolling_fingerprint(text: Column, window: Int = 16, stride: Int = 8): Column =
    GraftShims.column(RollingFingerprint(GraftShims.expression(text), window, stride))

  /** Column API: rolling_fingerprint_pos(text, window, stride) —
    * array<struct<fp:long, pos:int>>, 0-based byte offsets. */
  def rolling_fingerprint_pos(text: Column, window: Int = 16, stride: Int = 8): Column =
    GraftShims.column(RollingFingerprintPos(GraftShims.expression(text), window, stride))
}

/** [[RollingFingerprint]] with POSITIONS: the winnowing selection keeps,
  * per run of `stride` consecutive windows, the minimum hash AND the
  * leftmost window offset achieving it (0-based bytes). Output is the
  * distinct (fp, pos) pairs sorted by (fp, pos) — the alignment-capable
  * form of the fingerprint: joining on fp across documents and diffing
  * positions recovers the SHARED SUBSTRING SPANS, not just an overlap
  * count (the Lee et al. 2022 dedup primitive, winnowed instead of
  * suffix-array'd so it stays one scan + one keyed join at corpus scale).
  * The leftmost-of-min rule is offset-free, so both documents of a shared
  * substring select the same relative position — and it is replayed
  * verbatim by the DuckDB oracle (d09).
  */
case class RollingFingerprintPos(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "rolling_fingerprint_pos"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_fingerprint_pos requires a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hashes = RollingFingerprint.windowHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window)
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Any])
    val nWindows = hashes.length
    // (fp, pos) pairs ordered by (fp, pos); pos determines fp, so the
    // encoded TreeSet key only needs a total order consistent with it.
    val selected = new java.util.TreeSet[Array[Long]](
      new java.util.Comparator[Array[Long]] {
        def compare(a: Array[Long], b: Array[Long]): Int = {
          val c = java.lang.Long.compare(a(0), b(0))
          if (c != 0) c else java.lang.Long.compare(a(1), b(1))
        }
      })
    val lastStart = math.max(0, nWindows - stride)
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + stride, nWindows)
      var mn = Long.MaxValue
      var at = -1
      var j = start
      while (j < end) {
        if (hashes(j) < mn) { mn = hashes(j); at = j } // leftmost: strict <
        j += 1
      }
      selected.add(Array(mn, at.toLong))
      start += 1
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(e(0), e(1).toInt)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintPos =
    copy(child = newChild)
}

package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash over PRECOMPUTED token hashes (`array<long>`), `width` bits.
  *
  * The companion to [[SimHash64]]: that one fuses engine-native xxhash64
  * hashing into the pass (fast, but not reproducible outside Spark);
  * this one takes the hash values as input, so callers can feed
  * md5-derived hashes that any engine — including the DuckDB oracle —
  * computes identically. Width ≤ 60 keeps every intermediate inside a
  * signed 64-bit int in both engines (DuckDB BIGINT overflows, Spark
  * wraps — neither is acceptable silently).
  *
  * Bit rule mirrors SimHash64: bit b set iff strictly more hashes have
  * bit b set than clear (ties → 0).
  */
case class SimHashBits(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width > 0 && width <= 60, s"width must be in 1..60, got $width")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](width)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val h = arr.getLong(t)
        var b = 0
        while (b < width) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < width) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  /** Column-level API: simhash_bits(hashes: array<bigint>, width). */
  def simhash_bits(hashes: Column, width: Int = 60): Column =
    GraftShims.column(SimHashBits(GraftShims.expression(hashes), width))
}

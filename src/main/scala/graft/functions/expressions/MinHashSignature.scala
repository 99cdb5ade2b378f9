package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature from an array of md5 hex digests in one pass.
  *
  * Implements Kirsch-Mitzenmacher double hashing: h1/h2 are the first
  * two 10-hex-char (40-bit) halves of each digest and hash i is
  * h1 + i·h2; the expression folds the per-seed minima in a single loop
  * with two long[] buffers — the composed aggregate/zip_with form
  * allocated a fresh 16-element array per shingle per doc, which
  * dominated the LSH dedup bench. Numerically identical to the SQL
  * `('0x'||substr(h,1,10))::BIGINT + i * ('0x'||substr(h,11,10))::BIGINT`
  * the DuckDB oracle uses.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string> of hex digests, got ${other.simpleString}")
    }

  /** Parse `len` hex chars starting at `from` (0-based) — same value as
    * conv(substr(s, from+1, len), 16, 10). */
  private def hex(bytes: Array[Byte], from: Int, len: Int): Long = {
    var v = 0L
    var i = from
    val end = from + len
    while (i < end) {
      v = (v << 4) | Character.digit(bytes(i).toChar, 16).toLong
      i += 1
    }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val minima = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val digest = arr.getUTF8String(t).getBytes
        val h1 = hex(digest, 0, 10)
        val h2 = hex(digest, 10, 10)
        var i = 0
        var h = h1
        while (i < numHashes) {
          if (h < minima(i)) minima(i) = h
          h += h2
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(minima)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column API: minhash_signature(md5_hashes, n). */
  def minhash_signature(hashes: Column, n: Int): Column =
    GraftShims.column(MinHashSignature(GraftShims.expression(hashes), n))
}

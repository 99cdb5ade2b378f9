package graft.sources

import org.apache.spark.sql.types.Decimal
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** A zero-copy LIVE-ROW view over a decoded parquet column vector:
  * `mapping(i)` is the physical batch row serving logical row `i`, so a
  * batch of these vectors sized to the live count exposes exactly the
  * rows the file's deletion vector did NOT delete — whole-stage codegen
  * reads through the indirection untouched and no column data is ever
  * copied (the Iceberg vectorized position-delete architecture: apply
  * deletes as a row-id mapping over the batch, keep the scan columnar).
  *
  * The mapping array is OWNED by the partition reader and REFILLED in
  * place per batch (vectors are rebuilt per file chunk), so the view
  * must never be read after the next `nextBatch()` — the same lifetime
  * contract every `ColumnarBatch` already carries. The delegate's
  * reader owns the underlying memory; `close()` here is a no-op.
  *
  * Null accounting: `isNullAt` is authoritative per row; `hasNull` is
  * the delegate's (a safe over-approximation — deleted rows may hold
  * the only nulls); `numNulls` counts exactly over the live mapping,
  * lazily (no consumer on the scan path calls it per batch). */
private[sources] final class GraftSelectedVector(
    delegate: ColumnVector, mapping: Array[Int], liveCount: () => Int)
    extends ColumnVector(delegate.dataType) {

  @inline private def m(i: Int): Int = mapping(i)

  override def close(): Unit = ()

  override def hasNull: Boolean = delegate.hasNull

  override def numNulls: Int = {
    var n = 0; var i = 0; val live = liveCount()
    while (i < live) {
      if (delegate.isNullAt(mapping(i))) n += 1
      i += 1
    }
    n
  }

  override def isNullAt(rowId: Int): Boolean = delegate.isNullAt(m(rowId))
  override def getBoolean(rowId: Int): Boolean = delegate.getBoolean(m(rowId))
  override def getByte(rowId: Int): Byte = delegate.getByte(m(rowId))
  override def getShort(rowId: Int): Short = delegate.getShort(m(rowId))
  override def getInt(rowId: Int): Int = delegate.getInt(m(rowId))
  override def getLong(rowId: Int): Long = delegate.getLong(m(rowId))
  override def getFloat(rowId: Int): Float = delegate.getFloat(m(rowId))
  override def getDouble(rowId: Int): Double = delegate.getDouble(m(rowId))
  override def getArray(rowId: Int): ColumnarArray = delegate.getArray(m(rowId))
  override def getMap(rowId: Int): ColumnarMap = delegate.getMap(m(rowId))
  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    delegate.getDecimal(m(rowId), precision, scale)
  override def getUTF8String(rowId: Int): UTF8String =
    delegate.getUTF8String(m(rowId))
  override def getBinary(rowId: Int): Array[Byte] = delegate.getBinary(m(rowId))

  // struct fields read child vectors at the TOP-level row id, so
  // children carry the same mapping (rebuilt per chunk with the
  // vectors, cached per ordinal — the mapping reference is shared)
  private var children: Array[ColumnVector] = _
  override def getChild(ordinal: Int): ColumnVector = {
    if (children == null)
      children = new Array[ColumnVector](
        delegate.dataType match {
          case s: org.apache.spark.sql.types.StructType => s.length
          case _ => ordinal + 1
        })
    if (ordinal >= children.length)
      children = java.util.Arrays.copyOf(children, ordinal + 1)
    if (children(ordinal) == null)
      children(ordinal) =
        new GraftSelectedVector(delegate.getChild(ordinal), mapping, liveCount)
    children(ordinal)
  }
}

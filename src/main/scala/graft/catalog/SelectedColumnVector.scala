package graft.catalog

import org.apache.spark.sql.types.Decimal
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** A zero-copy SELECTION view over a reader-owned column vector: row
  * `i` of this vector is row `sel(i)` of the delegate. This is how the
  * native batch scan keeps merge-on-read tables VECTORIZED (Iceberg's
  * vectorized-delete shape, `ColumnVectorWithFilter`): instead of
  * degrading a delete-vector-covered file to row-at-a-time reads, the
  * reader computes the surviving ordinals per `ColumnarBatch` once and
  * re-exposes the SAME parquet-decoded vectors through the selection
  * map — whole-stage codegen reads them exactly as it reads the
  * unmasked batch, no value is copied, and a batch with no deleted
  * rows in its range bypasses the wrapper entirely.
  *
  * Struct children remap with the SAME map (struct fields are
  * row-aligned with their parent); array/map element children are
  * reached through `getArray`/`getMap`, which delegate whole-row and
  * therefore return the delegate's own (correctly-offset) views.
  * `close()` is a no-op — vector lifecycle belongs to the file reader
  * that allocated them (it closes on the task-completion listener).
  * `hasNull`/`numNulls` delegate, which may OVER-report for the
  * selection (a deleted row's null is counted); callers use them only
  * as may-contain-null hints, so over-reporting is safe, never wrong.
  */
final class SelectedColumnVector(delegate: ColumnVector, sel: Array[Int])
    extends ColumnVector(delegate.dataType) {

  private[this] var children: Array[ColumnVector] = _

  override def close(): Unit = ()
  override def hasNull: Boolean = delegate.hasNull
  override def numNulls: Int = delegate.numNulls

  override def isNullAt(i: Int): Boolean = delegate.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = delegate.getBoolean(sel(i))
  override def getByte(i: Int): Byte = delegate.getByte(sel(i))
  override def getShort(i: Int): Short = delegate.getShort(sel(i))
  override def getInt(i: Int): Int = delegate.getInt(sel(i))
  override def getLong(i: Int): Long = delegate.getLong(sel(i))
  override def getFloat(i: Int): Float = delegate.getFloat(sel(i))
  override def getDouble(i: Int): Double = delegate.getDouble(sel(i))
  override def getArray(i: Int): ColumnarArray = delegate.getArray(sel(i))
  override def getMap(i: Int): ColumnarMap = delegate.getMap(sel(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    delegate.getDecimal(sel(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String =
    delegate.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = delegate.getBinary(sel(i))

  override def getChild(ordinal: Int): ColumnVector = {
    if (children == null) {
      children = new Array[ColumnVector](ordinal + 1)
    } else if (children.length <= ordinal) {
      children = java.util.Arrays.copyOf(children, ordinal + 1)
    }
    if (children(ordinal) == null) {
      children(ordinal) =
        new SelectedColumnVector(delegate.getChild(ordinal), sel)
    }
    children(ordinal)
  }
}

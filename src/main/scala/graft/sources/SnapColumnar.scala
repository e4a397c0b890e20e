package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Row→columnar bridge for the native snapshot batch (VERDICT r8 #4):
  * a scan mixing clean and MOR/evolution-affected files must present
  * ONE output format to Spark's exec node, and before this bridge the
  * whole scan fell back to rows — one pending delete de-vectorized
  * every clean file in the same scan. Now the scan reports COLUMNAR:
  * clean partitions serve the delegate's vectorized parquet batches
  * untouched (the majority path at scale), while affected partitions
  * — the bounded MOR debt — convert their folded rows into columnar
  * batches task-side. The conversion costs one value copy per cell of
  * the affected minority; the clean majority pays nothing and keeps
  * whole-stage codegen over vectorized input.
  */
private[sources] object SnapColumnar {

  private def atomicSupported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | BinaryType | DateType |
        TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Can every field fill a writable column vector (and ride the
    * delegate's vectorized parquet reader)? Atomic types plus
    * single-level arrays of them — the embedding-column shape
    * (`array<float>`) a training-data table carries. Deeper nesting
    * falls back to the row-based scan. Partitions the delegate's
    * vectorized reader declines (e.g. nested reads disabled by conf)
    * bridge through [[SnapRowToColumnarReader]] instead.
    */
  def supported(schema: StructType): Boolean = schema.fields.forall { f =>
    f.dataType match {
      case ArrayType(et, _) => atomicSupported(et)
      case dt => atomicSupported(dt)
    }
  }
}

/** Drains a row [[PartitionReader]] into reused on-heap column
  * vectors, `batchSize` rows at a time. Values are copied into the
  * vectors, so reader-buffer aliasing (UTF8String views into
  * vectorized pages) is safe.
  */
private[sources] final class SnapRowToColumnarReader(
    inner: PartitionReader[InternalRow],
    schema: StructType,
    batchSize: Int = 4096) extends PartitionReader[ColumnarBatch] {

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, schema)
  private val batch =
    new ColumnarBatch(vectors.map(v => v: ColumnVector))

  /** Appends one element of a catalyst array into an array column's
    * child vector (append-based — the child tracks its own length).
    */
  private def elemAppender(et: DataType):
      (WritableColumnVector, org.apache.spark.sql.catalyst.util.ArrayData,
        Int) => Unit = et match {
    case BooleanType => (c, a, j) => { c.appendBoolean(a.getBoolean(j)); () }
    case ByteType => (c, a, j) => { c.appendByte(a.getByte(j)); () }
    case ShortType => (c, a, j) => { c.appendShort(a.getShort(j)); () }
    case IntegerType | DateType => (c, a, j) => { c.appendInt(a.getInt(j)); () }
    case LongType | TimestampType | TimestampNTZType =>
      (c, a, j) => { c.appendLong(a.getLong(j)); () }
    case FloatType => (c, a, j) => { c.appendFloat(a.getFloat(j)); () }
    case DoubleType => (c, a, j) => { c.appendDouble(a.getDouble(j)); () }
    case StringType => (c, a, j) => {
      val b = a.getUTF8String(j).getBytes
      c.appendByteArray(b, 0, b.length); ()
    }
    case BinaryType => (c, a, j) => {
      val b = a.getBinary(j)
      c.appendByteArray(b, 0, b.length); ()
    }
    case dt: DecimalType => (c, a, j) => {
      val ord = c.getElementsAppended
      c.appendNull() // reserve the slot, then overwrite in place
      c.putDecimal(ord, a.getDecimal(j, dt.precision, dt.scale),
        dt.precision)
      c.putNotNull(ord); ()
    }
    case other => throw new IllegalStateException(
      s"unsupported array element type $other (guarded by " +
        "SnapColumnar.supported)")
  }

  private val fillers:
      Array[(WritableColumnVector, Int, InternalRow, Int) => Unit] =
    schema.fields.map { f =>
      f.dataType match {
        case BooleanType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putBoolean(n, r.getBoolean(i))
        case ByteType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putByte(n, r.getByte(i))
        case ShortType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putShort(n, r.getShort(i))
        case IntegerType | DateType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putInt(n, r.getInt(i))
        case LongType | TimestampType | TimestampNTZType =>
          (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putLong(n, r.getLong(i))
        case FloatType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putFloat(n, r.getFloat(i))
        case DoubleType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => v.putDouble(n, r.getDouble(i))
        case StringType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => {
          val b = r.getUTF8String(i).getBytes
          v.putByteArray(n, b, 0, b.length); ()
        }
        case BinaryType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) => {
          val b = r.getBinary(i)
          v.putByteArray(n, b, 0, b.length); ()
        }
        case dt: DecimalType => (v: WritableColumnVector, n: Int,
            r: InternalRow, i: Int) =>
          v.putDecimal(n, r.getDecimal(i, dt.precision, dt.scale),
            dt.precision)
        case ArrayType(et, _) =>
          val append = elemAppender(et)
          (v: WritableColumnVector, n: Int, r: InternalRow, i: Int) => {
            val arr = r.getArray(i)
            val child = v.arrayData()
            val offset = child.getElementsAppended
            var j = 0
            while (j < arr.numElements()) {
              if (arr.isNullAt(j)) child.appendNull()
              else append(child, arr, j)
              j += 1
            }
            v.putArray(n, offset, arr.numElements()); ()
          }
        case other => throw new IllegalStateException(
          s"unsupported columnar type $other (guarded by " +
            "SnapColumnar.supported)")
      }
    }

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    while (n < batchSize && inner.next()) {
      val row = inner.get()
      var c = 0
      while (c < fillers.length) {
        if (row.isNullAt(c)) vectors(c).putNull(n)
        else fillers(c)(vectors(c), n, row, c)
        c += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    inner.close()
    batch.close()
  }
}

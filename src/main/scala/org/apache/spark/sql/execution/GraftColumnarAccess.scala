package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Package-injection accessor for Spark's `private[sql]`
  * [[RowToColumnConverter]] — the exact generic row→vector copier
  * `RowToColumnarExec` uses, reused by the lakehouse merge-on-read
  * columnar reader's survivor-copy path (graft.lakehouse
  * MaskingColumnarReader). Version-pinned to the bundled Spark; a
  * signature change fails loudly at compile time, not at runtime.
  */
object GraftColumnarAccess {
  final class Converter(schema: StructType) extends Serializable {
    private val conv = new RowToColumnConverter(schema)
    def convert(row: InternalRow, vectors: Array[WritableColumnVector]): Unit =
      conv.convert(row, vectors)
  }
  def converter(schema: StructType): Converter = new Converter(schema)
}

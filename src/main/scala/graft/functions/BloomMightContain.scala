package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloom_bytes, hash)`: probe a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the public spark-sketch
  * format `DataFrameStatFunctions.bloomFilter` emits) for a BIGINT key.
  *
  * The scale role: a broadcastable PRE-FILTER for membership joins whose
  * build side is too large to ship as an exact hash relation. At 10
  * bits/key a billion-gram eval set is ~1.2 GB of bloom bits where the
  * exact gram set would be tens of GB — the probe prunes the corpus-side
  * stream MAP-SIDE (no false negatives, so correctness never depends on
  * it; an exact confirm join downstream removes the false positives).
  *
  * The bloom argument must be FOLDABLE (a literal produced by building
  * the sketch on the eval side): the filter deserializes ONCE per
  * executor via a transient lazy val, and the probe runs inside
  * whole-stage codegen through a reference-object call — never a
  * per-row deserialization.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires a foldable (literal) bloom argument")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires (binary, bigint), got " +
            Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bloom: Any, value: Any): Any =
    compute(value.asInstanceOf[Long])

  /** Public for the codegen reference-object call. */
  def compute(value: Long): Boolean = filter.mightContainLong(value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

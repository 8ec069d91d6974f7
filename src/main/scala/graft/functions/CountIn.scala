package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `count_in(tokens, keys)`: how many elements of `tokens` appear in
  * `keys` — exactly `size(filter(toks, t -> t IN (k1, ..., kn)))`
  * (null tokens never match, mirroring IN's null semantics under
  * filter).
  *
  * Exists for THROUGHPUT (the `ngram_hashes`/`bow_score` rationale):
  * Catalyst evaluates the filter lambda interpreted, one boxed
  * expression-tree walk per token — and the language-ID / stopword
  * scorers run SEVERAL such filters over the same token array (q46
  * walks it 12×). This runs one membership loop per call against a
  * key set hashed once per eval (keys are small literal lists), inside
  * whole-stage codegen via a reference-object call.
  *
  * Portability: pure equality counting — the DuckDB twins keep their
  * `list_filter(...) IN (...)` form and values match exactly.
  */
case class CountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "count_in requires (array<string>, array<string>), got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in"

  override protected def nullSafeEval(toks: Any, keys: Any): Any =
    compute(toks.asInstanceOf[ArrayData], keys.asInstanceOf[ArrayData])

  /** Public for the codegen reference-object call. */
  def compute(arr: ArrayData, keys: ArrayData): Int = {
    val k = keys.numElements()
    val set = new java.util.HashSet[UTF8String](k * 2)
    var j = 0
    while (j < k) {
      val s = keys.getUTF8String(j)
      if (s != null) set.add(s)
      j += 1
    }
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && set.contains(t)) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countIn", this, classOf[CountIn].getName)
    nullSafeCodeGen(ctx, ev, (t, ks) => s"${ev.value} = $ref.compute($t, $ks);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)
}

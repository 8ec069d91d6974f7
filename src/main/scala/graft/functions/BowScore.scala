package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bow_score(tokens, weights)`: the hashed bag-of-words linear score —
  * exactly
  * `aggregate(transform(toks, w -> element_at(weights,
  *    CAST(pmod(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT),
  *              size(weights)) AS INT) + 1)), 0L, (acc, x) -> acc + x)`
  * with the bucket count fixed to `size(weights)`.
  *
  * Exists for THROUGHPUT, the `ngram_hashes` rationale applied to the
  * q81 classifier: the HOF formulation walks an interpreted lambda per
  * token with a hex-string md5 round-trip, making tokenization-and-
  * score the whole query cost. This runs the loop in one eval with a
  * thread-local MessageDigest and the bit-sliced 60-bit prefix, and
  * stays inside whole-stage codegen via a reference-object call.
  *
  * Portability: the md5-prefix bucket is the SAME value DuckDB computes
  * from `substr(md5(w), 1, 15)`, and the accumulation is exact BIGINT —
  * order-free, so any partitioning yields the identical score.
  * Null tokens contribute 0 (a null md5 selects no weight in the HOF
  * form); a null weights cell at the selected bucket likewise adds 0
  * (element_at null + acc semantics differ — the library's weight
  * tables are literal and null-free, checked at type level by the
  * containsNull=false literals the queries pass).
  */
case class BowScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType | LongType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bow_score requires (array<string>, array<int|bigint>), got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bow_score"

  private val weightsAreLong = right.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(toks: Any, weights: Any): Any =
    compute(toks.asInstanceOf[ArrayData], weights.asInstanceOf[ArrayData])

  /** Public for the codegen reference-object call. */
  def compute(arr: ArrayData, weights: ArrayData): Long = {
    val n = arr.numElements()
    val d = weights.numElements()
    if (d == 0) return 0L
    val md = BowScore.md5.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        md.update(s.getBytes)
        val dig = md.digest()
        // first 15 hex chars = bytes 0..6 (56 bits) + high nibble of
        // byte 7 — the same 60-bit non-negative prefix as ngram_hashes,
        // so % d == pmod
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
        h = (h << 4) | ((dig(7) & 0xF0L) >>> 4)
        val bucket = (h % d).toInt
        if (!weights.isNullAt(bucket))
          acc += (if (weightsAreLong) weights.getLong(bucket)
                  else weights.getInt(bucket).toLong)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bowScore", this, classOf[BowScore].getName)
    nullSafeCodeGen(ctx, ev, (t, w) => s"${ev.value} = $ref.compute($t, $w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BowScore =
    copy(left = newLeft, right = newRight)
}

object BowScore {
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

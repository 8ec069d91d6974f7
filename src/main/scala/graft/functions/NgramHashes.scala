package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `ngram_hashes(tokens, n, mod)`: the DISTINCT 60-bit md5-prefix
  * hashes of a document's word n-grams — i.e. exactly
  * `array_distinct(transform(sequence(0, size(toks) - n),
  *    i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i+1, n))), 1, 15), 16, 10) AS BIGINT) [% mod]))`
  * (`mod <= 0` disables the modulus), value- and order-identical
  * (first occurrence wins, ascending window index).
  *
  * Exists for THROUGHPUT: Catalyst evaluates higher-order-function
  * lambdas interpreted, one boxed expression-tree walk per element —
  * measured ~1.3 µs per shingle on the sf0.1 corpus, which made
  * shingle construction the dominant cost of every n-gram operator
  * (q47/q52/q54). This expression runs the whole window loop in one
  * eval with a thread-local MessageDigest, byte-level UTF-8 joins and
  * a bit-sliced 60-bit prefix (no hex-string round-trip) — and stays
  * inside whole-stage codegen via a reference-object call, so the
  * surrounding projection still fuses.
  *
  * The md5 base keeps every hash ENGINE-PORTABLE: the DuckDB oracle
  * twins compute the same `substr(md5(...), 1, 15)` prefix, so results
  * hash-match exactly (collisions included).
  */
case class NgramHashes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, LongType | IntegerType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ngram_hashes requires (array<string>, int, bigint), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(toks: Any, n: Any, mod: Any): Any =
    compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int],
      mod match { case i: Int => i.toLong; case l: Long => l })

  /** Public for the codegen reference-object call. */
  def compute(arr: ArrayData, n: Int, mod: Long): ArrayData = {
    val sz = arr.numElements()
    if (n <= 0 || sz < n) return new GenericArrayData(Array.emptyLongArray)
    val md = NgramHashes.md5.get()
    val out = new Array[Long](sz - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](math.min(sz * 2, 1 << 16))
    var cnt = 0
    var i = 0
    while (i <= sz - n) {
      md.reset()
      var j = 0
      var firstTok = true
      while (j < n) {
        val s = arr.getUTF8String(i + j)
        // concat_ws semantics: null elements vanish, separator included
        if (s != null) {
          if (!firstTok) md.update(' '.toByte)
          md.update(s.getBytes)
          firstTok = false
        }
        j += 1
      }
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 (56 bits) + high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >>> 4)
      if (mod > 0) h = h % mod
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashes", this, classOf[NgramHashes].getName)
    nullSafeCodeGen(ctx, ev, (t, n, m) =>
      s"${ev.value} = $ref.compute($t, $n, (long) $m);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NgramHashes =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NgramHashes {
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms '05) over
  * BIGINT keys: `depth` rows of `width` counters; update adds 1 to one
  * counter per row, estimate takes the min — so every estimate is an
  * OVER-count (`estimate(k) >= true_count(k)` always; collisions only
  * inflate).
  *
  * The scale role mirrors `bloom_might_contain`'s: a fixed-size,
  * broadcastable PRE-FILTER that turns a full-vocabulary frequency
  * aggregation into a candidate-only one. A heavy-hitter query
  * (`count >= T`) over 100 TB of tokens would otherwise shuffle
  * Heaps-law O(vocab) partial rows per map partition; with the sketch
  * the stream is pruned MAP-SIDE to keys whose estimate clears T —
  * heavy keys are never dropped (no false negatives, by the overcount
  * invariant), and the light keys that collide their way through are
  * removed by the exact confirm aggregation downstream, so the final
  * answer is EXACT. The sketch itself is O(depth·width) no matter the
  * key cardinality (64 KB at the 4×2048 default), cheap to merge
  * (element-wise add, order-free) and cheap to ship.
  *
  * Part of the beyond-reference training-pipeline surface (the
  * bloom/minhash/simhash sketch family): a Spark typed `Aggregator`
  * builds the sketch, a codegen'd probe expression consumes it.
  */
object Cms {
  val DefaultDepth = 4
  val DefaultWidth = 2048

  // fixed odd 64-bit seeds, one per row (public splitmix64 constants)
  private[functions] val Seeds: Array[Long] = Array(
    0x9E3779B97F4A7C15L, 0xBF58476D1CE4E5B9L, 0x94D049BB133111EBL, 0xFF51AFD7ED558CCDL)

  /** splitmix64 finalizer — a full-avalanche public-domain mix. */
  @inline private[functions] def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Counter index of key `k` in sketch row `d` (width a power of 2). */
  @inline private[functions] def idx(k: Long, d: Int, width: Int): Int =
    (mix(k ^ Seeds(d)) & (width - 1)).toInt

  def serialize(depth: Int, width: Int, counts: Array[Long]): Array[Byte] = {
    require(counts.length == depth * width, "counter array size mismatch")
    val bb = ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    // cms_estimate is SQL-registered, so arbitrary binary can reach
    // here: validate the full header before allocating, or a hostile
    // depth surfaces as AIOOBE/NegativeArraySize deep in an executor
    require(bytes.length >= 8, "CMS sketch truncated (needs 8-byte header)")
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt
    val width = bb.getInt
    require(depth >= 1 && depth <= Seeds.length, s"depth must be in 1..${Seeds.length}")
    require(width > 0 && (width & (width - 1)) == 0, "width must be a power of 2")
    require(bytes.length == 8 + depth.toLong * width * 8,
      s"CMS sketch length ${bytes.length} != ${8 + depth.toLong * width * 8} for ${depth}x$width")
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    (depth, width, counts)
  }

  def estimate(depth: Int, width: Int, counts: Array[Long], k: Long): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + idx(k, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }
}

/** Order-free CMS build: the buffer is the flat counter grid, reduce
  * bumps one counter per row, merge is element-wise add — map-side
  * partial aggregation gives one 64 KB buffer per partition and the
  * shuffle carries sketches, never keys.
  */
final class CmsAgg(width: Int = Cms.DefaultWidth, depth: Int = Cms.DefaultDepth)
    extends Aggregator[Long, Array[Long], Array[Byte]] {
  require(depth > 0 && depth <= Cms.Seeds.length, s"depth must be in 1..${Cms.Seeds.length}")
  require(width > 0 && (width & (width - 1)) == 0, "width must be a power of 2")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(acc: Array[Long], k: Long): Array[Long] = {
    var d = 0
    while (d < depth) { acc(d * width + Cms.idx(k, d, width)) += 1; d += 1 }
    acc
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(acc: Array[Long]): Array[Byte] =
    Cms.serialize(depth, width, acc)

  override def bufferEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEncoder
  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** `cms_estimate(sketch_bytes, key)`: the sketch's frequency estimate
  * for a BIGINT key. The sketch argument must be FOLDABLE (a literal
  * built by `cms_sketch`): it deserializes ONCE via a transient lazy
  * val and the probe runs inside whole-stage codegen through a
  * reference-object call — same contract as `bloom_might_contain`.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "cms_estimate requires a foldable (literal) sketch argument")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "cms_estimate requires (binary, bigint), got " +
            Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private lazy val sketch: (Int, Int, Array[Long]) =
    Cms.deserialize(left.eval().asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(bytes: Any, key: Any): Any =
    compute(key.asInstanceOf[Long])

  /** Public for the codegen reference-object call. */
  def compute(key: Long): Long = {
    val (depth, width, counts) = sketch
    Cms.estimate(depth, width, counts, key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEst", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (_, k) => s"${ev.value} = $ref.compute($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

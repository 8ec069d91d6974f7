package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass SimHash aggregator: folds each token hash into `bits`
  * running ±1 counters, finishing to the fingerprint whose bit b is
  * set iff more input hashes had bit b set than clear.
  *
  * Versus the explode formulation (cross join with a 0..31 bit table →
  * 32× the rows → two grouped aggregations): the map side emits ONE
  * 32-int buffer per (doc, partition), so shuffle volume drops from
  * O(tokens·bits) rows to O(docs·bits) ints, with map-side partial
  * aggregation. Results are identical (per-bit counts are
  * associative/commutative; `count > 0` ⇔ the old `sum(±1) > 0`).
  */
final class SimHashAgg(bits: Int = 32)
    extends Aggregator[Long, Array[Int], Long] {
  // 64 is legal: the fingerprint then uses the sign bit, which xor /
  // bit_count / shiftrightunsigned all handle — consumers slicing
  // blocks out of a full-width signature must use UNSIGNED shifts
  // (the production 4×16-bit geometry does; see ScaleDesignSpec)
  require(bits > 0 && bits <= 64, "bits must be in 1..64")

  override def zero: Array[Int] = new Array[Int](bits)

  override def reduce(acc: Array[Int], h: Long): Array[Int] = {
    var i = 0
    while (i < bits) {
      if (((h >> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
      i += 1
    }
    acc
  }

  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(acc: Array[Int]): Long = {
    var s = 0L
    var i = 0
    while (i < bits) { if (acc(i) > 0) s |= 1L << i; i += 1 }
    s
  }

  override def bufferEncoder: Encoder[Array[Int]] = SimHashAgg.intArrayEncoder
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object SimHashAgg {
  private[functions] val intArrayEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}

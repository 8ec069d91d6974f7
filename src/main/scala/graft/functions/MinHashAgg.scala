package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass MinHash signature aggregator (SURVEY.md §4 "custom
  * Aggregator for MinHash"): folds each shingle hash through the whole
  * (aᵢ·h + bᵢ) mod p family at once, keeping k running minima.
  *
  * Versus the explode-formulation (cross join with the family table →
  * k× the rows → groupBy min): the map side emits ONE k-long array per
  * (doc, partition) instead of k rows per shingle, so shuffle volume
  * drops from O(shingles·k) rows to O(docs·k) longs — the difference
  * that matters when the corpus is 100 TB. Results are identical
  * (min is associative/commutative; same hash family).
  */
final class MinHashAgg(as: Array[Long], bs: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(as.length == bs.length, "hash family arrays must align")
  private val k = as.length

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(acc: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (as(i) * h + bs(i)) % p
      if (v < acc(i)) acc(i) = v
      i += 1
    }
    acc
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(acc: Array[Long]): Array[Long] = acc
  override def bufferEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEncoder
}

object MinHashAgg {
  private[functions] val longArrayEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

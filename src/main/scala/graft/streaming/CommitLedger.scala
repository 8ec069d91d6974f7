package graft.streaming

/** Min-watermark commit ledger — the exactly-once core (SURVEY.md §2.4 A2).
  *
  * Algebra pinned by the reference (`pipeline/runner.py:355-383`,
  * `tests/unit/test_pipeline_runner.py:229-341`):
  *  - each sink reports max-flushed offset per (topic, partition);
  *  - a partition is committable only when EVERY registered sink has
  *    flushed it (a sink missing the partition contributes -1 and
  *    suppresses the commit);
  *  - the committed offset is the MINIMUM across sinks of those maxima;
  *  - a (partition → offset) pair is committed at most once (strictly
  *    monotone: only offsets above the last committed value go out);
  *  - partitions commit independently;
  *  - the value handed to the source transport is offset + 1
  *    ("next-to-fetch", `streaming/consumer.py:267-276`).
  *
  * Driver-side state: sits inside `foreachBatch` when several sinks
  * share one streaming query. (With one query per sink, Spark's own
  * checkpoint subsumes this — this ledger exists for the shared
  * single-pass fan-out.) Methods are synchronized: the micro-batch
  * thread mutates while the health endpoint reads [[committedSoFar]]
  * from the HTTP dispatcher thread.
  */
final class CommitLedger(sinkIds: Seq[String]) {
  require(sinkIds.nonEmpty, "ledger needs at least one sink")

  type TP = (String, Int) // (topic, partition)

  private val flushed =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[TP, Long]]
  sinkIds.foreach(id => flushed(id) = scala.collection.mutable.Map.empty)
  private val lastCommitted = scala.collection.mutable.Map.empty[TP, Long]

  /** A sink durably flushed through `offset` on `tp` (monotone max,
    * mirroring `sinks/postgres.py:168-171`: only advance, never regress).
    */
  def recordFlush(sinkId: String, tp: TP, offset: Long): Unit = synchronized {
    val m = flushed.getOrElse(
      sinkId, throw new IllegalArgumentException(s"unknown sink $sinkId"))
    if (offset > m.getOrElse(tp, -1L)) m(tp) = offset
  }

  /** Offsets safe to commit now: min across sinks, suppressed while any
    * sink lags, strictly above what was already committed. Calling this
    * ADVANCES the ledger (the returned map is considered committed).
    */
  def commitable(): Map[TP, Long] = synchronized {
    val allPartitions = flushed.values.flatMap(_.keys).toSet
    val out = Map.newBuilder[TP, Long]
    allPartitions.foreach { tp =>
      val minOffset = flushed.values.map(_.getOrElse(tp, -1L)).min
      if (minOffset >= 0 && minOffset > lastCommitted.getOrElse(tp, -1L))
        out += tp -> minOffset
    }
    val result = out.result()
    result.foreach { case (tp, off) => lastCommitted(tp) = off }
    result
  }

  /** Next-to-fetch form (committed offset + 1) for the transport. */
  def commitableNextToFetch(): Map[TP, Long] =
    commitable().map { case (tp, off) => tp -> (off + 1L) }

  def committedSoFar: Map[TP, Long] = synchronized { lastCommitted.toMap }
}

package graft.lakehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental micro-batch consumer over the snapshot change feed — the
  * streaming-read half of the Delta CDF analogy (`changesBetween` is the
  * batch half; the CLI `changes` subcommand exposes one-shot diffs).
  * Reference scope: the iceberg sink's downstream consumers subscribe to
  * table changes; here the subscription surface is a cursor the caller
  * polls, exactly the shape Structured Streaming's `latestOffset` /
  * `getBatch` contract wants (snapshot id = offset, `poll()` = one
  * micro-batch).
  *
  * Semantics per batch:
  *  - first `poll()` with no start cursor = the INITIAL SNAPSHOT: every
  *    current row tagged `insert` (Delta's startingVersion=earliest
  *    behavior) — a consumer can bootstrap state from the feed alone;
  *  - each later `poll()` = `changesBetween(cursor, head)`: inserts +
  *    deletes for exactly the files that changed, so a batch costs the
  *    CHANGE volume, never the table size — compaction-only ranges diff
  *    to zero rows;
  *  - `poll()` returns None when the cursor is already at the head
  *    (nothing to emit, cursor unmoved), so an idle poller does one
  *    manifest listing and no Spark job.
  *
  * Delivery is TWO-PHASE (the Structured Streaming `Source` contract):
  * `poll(autoCommit = false)` emits a batch but leaves the cursor at
  * its pre-batch position until `commit(id)` — so an in-process
  * consumer that fails mid-batch just polls again and gets the SAME
  * range (no reader reconstruction needed). The default `poll()`
  * commits eagerly — the at-least-once-on-restart convenience form the
  * CLI's `changes --follow` loop uses. A consumer that saves
  * `cursorAfter` alongside its output gets replayable exactly-once
  * delivery on restart (same ledger shape as the CDC pipeline's
  * commit log). Single-threaded like every Spark streaming reader.
  */
final class ChangeFeedReader(table: LakehouseTable, startAfter: Option[Long] = None) {

  /** Snapshot id the consumer has durably CONSUMED; None = nothing yet. */
  @volatile private var committed: Option[Long] = startAfter
  /** Head emitted by an uncommitted poll, awaiting [[commit]]. */
  @volatile private var pending: Option[Long] = None

  def cursor: Option[Long] = committed

  /** One micro-batch of changes (`_change` ∈ insert|delete) plus the
    * cursor position it covers up to; None when already caught up.
    * With `autoCommit = false` the same range re-emits on every poll
    * until `commit` — phase one of the two-phase contract.
    */
  def poll(autoCommit: Boolean = true): Option[(DataFrame, Long)] = {
    val head = table.currentSnapshot().map(_.snapshotId).getOrElse(return None)
    val out = committed match {
      case Some(seen) if seen >= head => None
      case Some(seen) =>
        Some((table.changesBetween(seen, head), head))
      case None =>
        Some((table.scanAtSnapshot(head).withColumn("_change", lit("insert")), head))
    }
    out.foreach { case (_, id) =>
      // an auto-commit poll supersedes any uncommitted batch — leaving
      // the old pending edge live would let a later commit(oldEdge)
      // silently move the cursor BACKWARDS past this newer commit
      if (autoCommit) { committed = Some(id); pending = None }
      else pending = Some(id)
    }
    out
  }

  /** Phase two: mark everything up to `id` durably consumed. `id` must
    * be the batch edge the matching `poll` returned — committing an
    * unseen or stale edge is a consumer bug and fails loudly.
    */
  def commit(id: Long): Unit = {
    require(pending.contains(id) || committed.contains(id),
      s"commit($id) does not match a polled batch (pending=$pending, committed=$committed)")
    require(committed.forall(_ <= id),
      s"commit($id) would move the cursor backwards past committed=$committed")
    if (pending.contains(id)) { committed = Some(id); pending = None }
  }

  /** Drain everything currently unseen into `sink`, one micro-batch per
    * head advance (a poll loop, not a daemon — callers own scheduling,
    * same as the CLI `changes --follow` loop). Returns batches emitted.
    */
  def drainTo(sink: (DataFrame, Long) => Unit): Int = {
    var n = 0
    var more = true
    while (more) poll() match {
      case Some((df, id)) => sink(df, id); n += 1
      case None => more = false
    }
    n
  }
}

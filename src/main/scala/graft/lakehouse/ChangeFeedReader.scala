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
  * The cursor only advances on emit, and a consumer that saves
  * `cursorAfter` alongside its output gets replayable exactly-once
  * delivery on restart (same ledger shape as the CDC pipeline's
  * commit log). Single-threaded like every Spark streaming reader.
  */
final class ChangeFeedReader(table: LakehouseTable, startAfter: Option[Long] = None) {

  /** Snapshot id the consumer has fully seen; None = nothing yet. */
  @volatile private var lastSeen: Option[Long] = startAfter

  def cursor: Option[Long] = lastSeen

  /** One micro-batch of changes (`_change` ∈ insert|delete) plus the
    * cursor position it advances to; None when already caught up.
    */
  def poll(): Option[(DataFrame, Long)] = {
    val head = table.currentSnapshot().map(_.snapshotId).getOrElse(return None)
    lastSeen match {
      case Some(seen) if seen >= head => None
      case Some(seen) =>
        lastSeen = Some(head)
        Some((table.changesBetween(seen, head), head))
      case None =>
        lastSeen = Some(head)
        Some((table.scanAtSnapshot(head).withColumn("_change", lit("insert")), head))
    }
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

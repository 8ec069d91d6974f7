package graft.lakehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Append-only DSv2 micro-batch stream over a lakehouse table — the
  * `spark.readStream.table("graft.db.t")` face (the Delta
  * `skipChangeCommits` shape):
  *
  *  - Offset = snapshot id; the FIRST batch (from offset 0) is the
  *    stream-start snapshot's full state (the bootstrap), read through
  *    the native scan (MoR masks included).
  *  - Every later batch delivers exactly the files ADDED by its
  *    snapshot range — partition-hostable, which is why the DSv2 face
  *    exists for the ingest-tail case while CHANGEFEED semantics (diff
  *    batches = a shuffle, not fixed partitions) stay with the V1
  *    `format("graft-changefeed")` source.
  *  - A change-shaped commit in the range — files removed (rewrite/
  *    delete/compact) or tombstones changed (MoR apply) — fails the
  *    stream LOUDLY, or is skipped entirely under
  *    `.option("skipChangeCommits", true)` (its added files are NOT
  *    delivered, mirroring Delta). Schema-only alters add no files and
  *    pass through silently.
  *
  * Each batch plans through a snapshot-pinned [[LakehouseBatchScan]]
  * restricted to the batch's file slice, so the vectorized readers,
  * layout grouping, and rename-epoch handling are the SAME code the
  * batch face runs; [[LakehouseReaderFactory]] dispatches on the spec
  * each partition carries, so one factory serves every batch.
  */
private[lakehouse] final class LakehouseMicroBatchStream(
    options: Map[String, String],
    required: StructType,
    accepted: Array[Filter]) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  @transient private lazy val spark = SparkSession.active
  @transient private lazy val table =
    new LakehouseTable(spark, LakehouseSource.rootOf(options))

  private val skipChangeCommits = LakehouseSource.boolOpt(options, "skipChangeCommits")

  /** Admission control (the changefeed caps, in this face's natural
    * unit): `maxSnapshotsPerTrigger` clamps each batch to N snapshots
    * past the committed offset — a cold start then bootstraps from the
    * EARLIEST retained snapshot's state and drains forward N at a
    * time; `maxBytesPerTrigger` additionally stops the range where the
    * cumulative ADDED-file bytes (manifest sizes, zero I/O) cross the
    * cap, always making one snapshot of progress.
    */
  private val maxSnapshotsPerTrigger =
    LakehouseSource.longOptOf(options, "maxSnapshotsPerTrigger")
  private val maxBytesPerTrigger =
    LakehouseSource.longOptOf(options, "maxBytesPerTrigger")
  require(maxSnapshotsPerTrigger.forall(_ > 0),
    s"maxSnapshotsPerTrigger must be positive, got $maxSnapshotsPerTrigger")
  require(maxBytesPerTrigger.forall(_ > 0),
    s"maxBytesPerTrigger must be positive, got $maxBytesPerTrigger")

  /** Clamped range end past offset `s` toward `head`. */
  private def clampedEnd(s: Long, head: Long): Long = {
    val from =
      if (s > 0L) s
      else maxSnapshotsPerTrigger.fold(head)(_ =>
        // bounded cold start: begin at the earliest retained snapshot
        // (its state is the first batch) instead of one head-sized one
        table.listSnapshots().headOption.map(_.snapshotId - 1).getOrElse(head))
    val bySnaps = maxSnapshotsPerTrigger.fold(head)(n => math.min(head, from + n))
    maxBytesPerTrigger match {
      case Some(cap) if bySnaps > from && s > 0L =>
        // byte-clamp INCREMENTAL ranges from manifest sizes (the
        // bootstrap batch is snapshot-state-shaped; the snapshot cap
        // bounds it instead)
        val snaps = table.listSnapshots()
        val byId = snaps.map(x => x.snapshotId -> x).toMap
        var e = from
        var acc = 0L
        snaps.filter(x => x.snapshotId > from && x.snapshotId <= bySnaps)
          .takeWhile { sn =>
            val pf = sn.parentId.flatMap(byId.get).map(_.files.toSet)
              .getOrElse(Set.empty[String])
            val bytes = sn.files.filterNot(pf).map(f => table.fileSizeOf(sn, f)).sum
            val fits = e == from || acc + bytes <= cap
            if (fits) { acc += bytes; e = sn.snapshotId }
            fits
          }
        e
      case _ => bySnaps
    }
  }

  // Trigger.AvailableNow: pin the head at prepare time and cycle
  // batches until the stream reaches it (without the trait Spark
  // falls back to single-batch execution, and a WAL-replayed batch
  // would consume the whole run)
  @volatile private var availableNowHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = table.currentSnapshot().map(_.snapshotId)

  override def initialOffset(): Offset = LongOffset(0L)

  override def latestOffset(): Offset =
    availableNowHead.orElse(table.currentSnapshot().map(_.snapshotId))
      .map(LongOffset(_)).orNull

  /** SupportsAdmissionControl face (required by the AvailableNow
    * trait): honors the source-option caps; the engine-side ReadLimit
    * arg is unused (Delta's shape — caps are source options).
    */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val head = availableNowHead.orElse(table.currentSnapshot().map(_.snapshotId))
      .getOrElse(return null)
    if (maxSnapshotsPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      return LongOffset(head)
    val s = Option(start).map(_.json.trim.toLong).getOrElse(0L)
    LongOffset(math.max(clampedEnd(s, head), s))
  }

  override def deserializeOffset(json: String): Offset =
    LongOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  /** Files to deliver for (start, end]: the bootstrap state when
    * start = 0, otherwise the per-snapshot added files under the
    * append-only contract.
    */
  private def deliveredFiles(start: Long, end: Long): Set[String] = {
    if (start == 0L) return table.snapshotOrThrow(end).files.toSet
    val snaps = table.listSnapshots()
    val byId = snaps.map(s => s.snapshotId -> s).toMap
    snaps.filter(s => s.snapshotId > start && s.snapshotId <= end).flatMap { s =>
      s.parentId.flatMap(byId.get) match {
        case None if s.parentId.isDefined =>
          // the parent expired out of retention: the diff is
          // unreconstructable — a stale checkpoint must fail loudly
          throw new IllegalStateException(
            s"snapshot ${s.snapshotId}'s parent ${s.parentId.get} has been " +
              "expired: the stream's checkpoint is older than the table's " +
              "retention — restart from a fresh checkpoint")
        case parent =>
          val pf = parent.map(_.files.toSet).getOrElse(Set.empty[String])
          val pt = parent.map(_.tombstones.toSet).getOrElse(Set.empty[String])
          val removed = pf.diff(s.files.toSet)
          val changeShaped = removed.nonEmpty || s.tombstones.toSet != pt
          if (!changeShaped) s.files.filterNot(pf)
          else if (skipChangeCommits) Nil
          else throw new UnsupportedOperationException(
            s"snapshot ${s.snapshotId} (${s.operation}) rewrites or deletes " +
              "data: readStream.table serves APPEND-ONLY lineages — set " +
              ".option(\"skipChangeCommits\", true) to skip such commits, or " +
              "consume row-level changes via format(\"graft-changefeed\")")
      }
    }.toSet
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // handles both live LongOffsets and checkpoint-restored serialized
    // forms (plain long json either way)
    val s = start.json.trim.toLong
    val e = end.json.trim.toLong
    if (e <= s) return Array.empty
    val files = deliveredFiles(s, e)
    if (files.isEmpty) return Array.empty
    // snapshot-pinned per-batch scan over exactly this slice: replays
    // after a crash read the identical immutable range
    val batchScan = new LakehouseBatchScan(
      options + ("snapshotId" -> e.toString), required, accepted,
      fileSubset = Some(files))
    batchScan.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakehouseReaderFactory
}

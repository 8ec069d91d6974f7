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

  private val skipChangeCommits = options.exists { case (k, v) =>
    k.equalsIgnoreCase("skipChangeCommits") && v.trim.equalsIgnoreCase("true") }

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
    * trait): no read limits here — admission-controlled consumption
    * belongs to the changefeed source's snapshot/file/byte caps.
    */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

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

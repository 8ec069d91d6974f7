package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Structured Streaming V1 `Source` over a lakehouse table's change
  * feed — `spark.readStream.format("graft-changefeed").option("path",
  * root).load()` yields the Delta CDF-style stream (`_change` ∈
  * insert|delete) with the engine's own checkpointed exactly-once
  * offset tracking (reference scope: the iceberg sink's downstream
  * subscribers; `ChangeFeedReader` is the in-process poll form of the
  * same contract).
  *
  * Offset = snapshot id. The engine drives the two-phase cycle the
  * reader exposes manually: `getOffset` lists the manifest head (no
  * Spark job), `getBatch(start, end)` is a pure function of the
  * snapshot range — `changesBetween` for a committed start, the
  * initial snapshot as inserts for a cold start — so a batch REPLAYS
  * identically after a crash (files are immutable, the range is
  * pinned in the checkpoint); `commit` is the durably-consumed
  * signal. A batch costs the change volume, never the table size.
  *
  * `getBatch`'s plan must be flagged `isStreaming`; the DataFrame is
  * rebuilt from the batch plan's `toRdd` via the engine's
  * internal-streaming constructor (reflective — the one hop the
  * public API doesn't expose), which also severs the batch plan so
  * the micro-batch optimizer never re-touches manifest state.
  *
  * `.option("maxSnapshotsPerTrigger", N)` bounds each micro-batch to
  * N snapshots of backlog (admission control — the Delta
  * maxFilesPerTrigger analogue); unset, a batch takes everything up
  * to the head.
  */
final class ChangeFeedSource(sqlContext: SQLContext, root: String,
    maxSnapshotsPerTrigger: Option[Long] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  require(maxSnapshotsPerTrigger.forall(_ > 0),
    s"maxSnapshotsPerTrigger must be positive, got $maxSnapshotsPerTrigger")

  private val table = new LakehouseTable(sqlContext.sparkSession, root)

  override val schema: StructType = ChangeFeedSource.feedSchema(table)

  // Trigger.AvailableNow: pin the head at prepare time so the run
  // drains exactly the snapshots that existed when it started, then
  // stops — a mid-run append belongs to the NEXT invocation. Without
  // this the engine falls back to single-batch execution (the
  // wrapper is off by default), which happens to coincide here but
  // loses the pinned-endpoint contract.
  @volatile private var availableNowHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = table.currentSnapshot().map(_.snapshotId)

  /** Admission control (the Delta maxFilesPerTrigger analogue, in this
    * source's natural unit): `maxSnapshotsPerTrigger` clamps each
    * micro-batch to at most N snapshots past the committed offset, so
    * a long-downtime backlog drains as MANY checkpointed batches — a
    * failure mid-drain replays one clamped batch, not the whole
    * backlog — and a cold-start bootstrap begins from the EARLIEST
    * retained snapshot's state instead of materializing the whole
    * head in one batch. The offset-is-snapshot-id design keeps every
    * clamped batch a pure function of its range, so the exactly-once
    * replay contract is untouched. Under Trigger.AvailableNow the
    * engine keeps cycling batches until the clamped offset reaches
    * the head pinned at prepare time.
    */
  private def clampedHead(
      start: Option[Long]): Option[Long] = {
    val head = availableNowHead.orElse(table.currentSnapshot().map(_.snapshotId))
    (head, maxSnapshotsPerTrigger) match {
      case (Some(h), Some(n)) =>
        val from = start.getOrElse {
          // cold start: bootstrap from the earliest retained snapshot,
          // then drain forward N at a time
          table.listSnapshots().headOption.map(_.snapshotId - 1).getOrElse(h)
        }
        Some(math.min(h, from + n))
      case _ => head
    }
  }

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    clampedHead(Option(start).map(_.json.trim.toLong)).map(LongOffset(_)).orNull

  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    table.currentSnapshot().map(s => LongOffset(s.snapshotId)).orNull

  override def getOffset: Option[Offset] =
    table.currentSnapshot().map(s => LongOffset(s.snapshotId))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = ChangeFeedSource.offsetId(end)
    val batch = start.map(ChangeFeedSource.offsetId) match {
      case Some(s) if s >= endId =>
        table.read().filter(lit(false)).withColumn("_change", lit(""))
      case Some(s) => table.changesBetween(s, endId)
      case None => table.scanAtSnapshot(endId).withColumn("_change", lit("insert"))
    }
    // conform to the declared stream schema (widen-only evolution may
    // have grown the table since the stream started; late columns
    // surface when the consumer restarts with a fresh checkpoint)
    val have = batch.columns.toSet
    val conformed = schema.fields.foldLeft(batch) { (d, f) =>
      if (have(f.name)) d else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(schema.fieldNames.map(col): _*)
    ChangeFeedSource.asStreaming(conformed)
  }

  /** The engine checkpoint has durably recorded everything ≤ `end` —
    * nothing to persist here (offsets are snapshot ids, reproducible
    * from the manifest), which is exactly why replay is safe.
    */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

object ChangeFeedSource {
  /** Table schema + the `_change` tag, fixed at stream start. */
  private[lakehouse] def feedSchema(table: LakehouseTable): StructType = {
    val snap = table.currentSnapshot().getOrElse(throw new IllegalStateException(
      "change-feed stream requires a table with at least one snapshot"))
    val base = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    StructType(base.fields :+ StructField("_change", StringType, nullable = false))
  }

  /** Restart hands back the checkpointed JSON as a `SerializedOffset`;
    * a live cycle hands `LongOffset` — `json` is the long either way.
    */
  private def offsetId(o: Offset): Long = o.json.trim.toLong

  /** Rebuild `df` as an isStreaming DataFrame: evaluate its plan to an
    * InternalRow RDD and wrap it through the session's internal
    * streaming constructor (private[sql], hence the single reflective
    * call — the same path every V1 file/socket source takes).
    *
    * Why this source stays V1 rather than a DSv2 `MicroBatchStream`:
    * a change batch is a DataFrame-level computation (`changesBetween`
    * is a multiset diff — a shuffle), while DSv2 `planInputPartitions`
    * must hand Spark fixed partition readers, which would force either
    * a driver-side collect of the batch or a staging double-write.
    * Delta Lake's own streaming source makes the same call and remains
    * a V1 `Source` for the same reason. The reflective hop is pinned
    * by [[reflectionHealthy]], asserted at spec setup, so a Spark
    * upgrade that removes the method fails loudly, not silently.
    */
  private[graft] def reflectionHealthy(spark: org.apache.spark.sql.SparkSession): Boolean = {
    spark.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType], java.lang.Boolean.TYPE)
    true
  }

  private def asStreaming(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val m = ss.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType], java.lang.Boolean.TYPE)
    m.invoke(ss, df.queryExecution.toRdd, df.schema, java.lang.Boolean.TRUE)
      .asInstanceOf[DataFrame]
  }
}

/** `format("graft-changefeed")` registration (service-loaded via
  * DataSourceRegister; the fully-qualified class name works too).
  *
  * Also the BATCH change-data-feed face (the Delta `table_changes`
  * analogue):
  *
  * {{{
  *   spark.read.format("graft-changefeed").load(root)            // head state as inserts
  *     .option("startingSnapshot", 2)                            // changes AFTER snapshot 2
  *     .option("endingSnapshot", 5)                              // ... up to snapshot 5
  * }}}
  *
  * Semantics match the streaming source batch-for-batch: with a
  * starting snapshot, rows are `changesBetween(start, end)` (an
  * upsert shows delete(old)+insert(new), compaction cancels to
  * nothing); without one, the ending state arrives as pure inserts
  * (the bootstrap shape). Cost is the change volume, never the table
  * size.
  */
final class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister
    with org.apache.spark.sql.sources.RelationProvider {

  override def shortName(): String = "graft-changefeed"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changefeed requires .option(\"path\", <table root>)"))

  private def longOpt(parameters: Map[String, String], name: String): Option[Long] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v.toLong }

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): org.apache.spark.sql.sources.BaseRelation = {
    val t = new LakehouseTable(sqlContext.sparkSession, rootOf(parameters))
    val endId = longOpt(parameters, "endingSnapshot")
      .orElse(t.currentSnapshot().map(_.snapshotId))
      .getOrElse(throw new IllegalStateException(
        s"change-feed read requires a table with at least one snapshot"))
    val changes = longOpt(parameters, "startingSnapshot") match {
      case Some(s) if s >= endId =>
        t.scanAtSnapshot(endId).filter(lit(false)).withColumn("_change", lit(""))
      case Some(s) => t.changesBetween(s, endId)
      case None => t.scanAtSnapshot(endId).withColumn("_change", lit("insert"))
    }
    val ctx = sqlContext
    new org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = changes.schema
      override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
        changes.rdd
    }
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.feedSchema(
      new LakehouseTable(sqlContext.sparkSession, rootOf(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext, rootOf(parameters),
      maxSnapshotsPerTrigger = longOpt(parameters, "maxSnapshotsPerTrigger"))
}

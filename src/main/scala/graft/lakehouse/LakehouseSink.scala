package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.types.StructType

/** Exactly-once V1 streaming Sink for the lakehouse —
  *
  * {{{
  *   df.writeStream.format("graft-lakehouse")
  *     .option("path", root)
  *     .option("keys", "id")          // optional: keyed modes
  *     .option("txnAppId", "my-job")  // optional: ledger namespace
  *     .option("checkpointLocation", ckpt).start()
  * }}}
  *
  * ROUND 15: this sink serves ONLY snapshot-less roots (batch 1
  * auto-creates the table; every later epoch — and every stream over
  * an existing table — plans through [[LakehouseDsv2Write]]'s
  * executor-side writers, keyed shapes included). The batch dispatch
  * below remains the semantic REFERENCE the DSv2 keyed commits mirror.
  *
  * Every micro-batch commits through the table's transaction ledger
  * ([[TxnMark]]) under `(txnAppId, batchId)`, so a batch that wrote
  * but crashed before the engine checkpoint committed is absorbed on
  * replay — the end-to-end exactly-once contract
  * (`pipeline/runner.py:355-383`) with NO foreachBatch plumbing. With
  * this sink, changefeed→lakehouse replication is one line:
  * `readStream.format("graft-changefeed") … writeStream
  * .format("graft-lakehouse").option("keys", …)`.
  *
  * Batch dispatch:
  *  - input carries a `_change` column AND `keys` is set → CDC apply
  *    ([[LakehouseTable.applyChanges]]): updates replace in place,
  *    bare deletes remove the key;
  *  - `keys` set, no `_change` → idempotent upsert (latest-by-key
  *    materialization);
  *  - no `keys` → idempotent append (fact-stream shape; honors the
  *    writer's `partitionBy`).
  *
  * `txnAppId` defaults to a root-scoped constant — two DIFFERENT
  * streams writing the same table must set distinct ids or their
  * batchId sequences would collide in the ledger.
  */
final class LakehouseSink(
    sqlContext: SQLContext, root: String, keys: Seq[String],
    appId: String, partitionCols: Seq[String],
    mergeOnRead: Boolean = false,
    optimizeWrite: Boolean = false,
    optimizeWriteTargetBytes: Option[Long] = None) extends Sink {

  private lazy val table =
    new LakehouseTable(sqlContext.sparkSession, root, optimizeWrite = optimizeWrite,
      optimizeWriteTargetBytes = optimizeWriteTargetBytes)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine hands a frame bound to this batch's INCREMENTAL
    // execution, which supports exactly one action; re-wrap its RDD as
    // a plain batch frame so the keyed merge can run its several jobs
    // (semi/anti probes + two writes). Re-evaluation across those jobs
    // is deterministic because source batches are pure functions of
    // their checkpointed offset range.
    val fresh0 = LakehouseSink.asBatch(data)
    // schema-history channel (source option emitSchemaChanges): apply
    // the batch's DDL records — ordered by their seq stamps — BEFORE
    // the data rows, so a rename/widen/drop upstream lands downstream
    // with no manual DDL. Application is idempotent (a crash-replayed
    // batch skips already-applied records structurally), so
    // exactly-once holds without the records entering the txn ledger.
    // The record collect is a COLUMN-PRUNED extra pass over the batch
    // (two tiny columns): this replaces the former whole-batch
    // `.cache()` — at scale, pinning a full micro-batch in executor
    // memory to save one narrow pass was the wrong trade, and the
    // keyed apply below caches its own input for its multi-job merge
    // anyway. (Keyless DDL streams don't reach this sink at all any
    // more — the DSv2 face diverts the records through its commit
    // messages in ONE pass; see [[LakehouseDsv2Write]].)
    // DDL mode needs BOTH channel markers — the `_ddl` record column
    // AND the `_change` tag its rows are stamped with — so an ordinary
    // stream that merely has a user column named `_ddl` is not
    // misrouted into schema application
    val ddlMode = fresh0.columns.contains("_ddl") && fresh0.columns.contains("_change")
    val fresh =
      if (!ddlMode) fresh0
      else {
        import org.apache.spark.sql.functions.col
        val ddl = fresh0
          .select("_change", "_ddl")
          .filter(col("_change") === "schema" && col("_ddl").isNotNull)
          .select("_ddl").collect().map(_.getString(0))
          .sortBy(DdlRecord.seqOf)
        ddl.foreach(table.applySchemaChange)
        // null-safe: only rows POSITIVELY tagged 'schema' are records
        val data0 = fresh0.filter(
          org.apache.spark.sql.functions.not(col("_change") <=> "schema")).drop("_ddl")
        // under the channel the TARGET SCHEMA is authoritative: a
        // batch column the target doesn't declare is a column the
        // DDL history dropped (the pinned upstream stream keeps
        // sending it as NULL — even after a downstream compaction
        // cleared the dropped registry, it must NOT re-enter as an
        // additive column and diverge the replica's schema)
        table.currentSnapshot() match {
          case Some(snap) =>
            val declared = org.apache.spark.sql.types.DataType
              .fromJson(snap.schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType]
              .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
            val aliases = snap.aliases.flatMap { case (_, olds) =>
              olds.map(_.name.toLowerCase(java.util.Locale.ROOT)) }.toSet
            data0.columns
              .filterNot(c => c == "_change" ||
                declared(c.toLowerCase(java.util.Locale.ROOT)) ||
                aliases(c.toLowerCase(java.util.Locale.ROOT)))
              .foldLeft(data0)((d, c) => d.drop(c))
          case None => data0 // first batch auto-creates the target
        }
      }
    addBatchInner(batchId, fresh)
  }

  private def addBatchInner(batchId: Long, fresh: DataFrame): Unit = {
    // a None result = the ledger absorbed a replayed batch — the
    // intended no-op for a crash-replay of the LAST batch. Absorption
    // far below the ledger head is a different animal: it means the
    // CHECKPOINT restarted from scratch (deleted/moved) while the
    // ledger kept its versions, and every "replayed" batch is really
    // new data being silently skipped — warn loudly (the operator
    // must restore the checkpoint or write under a fresh txnAppId).
    val applied =
      if (keys.nonEmpty && fresh.columns.contains("_change"))
        table.applyChanges(fresh, keys, txn = Some((appId, batchId)),
          mergeOnRead = mergeOnRead)
      else if (keys.nonEmpty && mergeOnRead)
        // an upsert is an all-inserts change batch: MoR lands it as a
        // pure append (tombstone + data), zero existing-file work
        table.applyChanges(
          fresh.withColumn("_change", org.apache.spark.sql.functions.lit("insert")),
          keys, txn = Some((appId, batchId)), mergeOnRead = true)
      else if (keys.nonEmpty)
        table.upsertIdempotent(fresh, keys, appId, batchId)
      else
        table.appendIdempotent(fresh, appId, batchId, partitionBy = partitionCols)
    if (applied.isEmpty)
      table.lastTxnVersion(appId).filter(_ > batchId + 1).foreach { last =>
        System.err.println(
          s"[graft-lakehouse sink] WARNING: batch $batchId absorbed but ledger for " +
            s"'$appId' is at version $last — this looks like a RESET CHECKPOINT " +
            s"over a live ledger; data in skipped batches does NOT reach $root. " +
            "Restore the original checkpointLocation or use a fresh txnAppId.")
      }
  }

  override def toString: String = s"LakehouseSink[$root]"
}

object LakehouseSink {
  /** Wrap a streaming micro-batch frame's evaluated RDD as a plain
    * batch DataFrame (the mirror of the source's asStreaming hop; same
    * pinned private API, see [[ChangeFeedSource.reflectionHealthy]]).
    */
  private[lakehouse] def asBatch(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val m = ss.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType], java.lang.Boolean.TYPE)
    m.invoke(ss, df.queryExecution.toRdd, df.schema, java.lang.Boolean.FALSE)
      .asInstanceOf[DataFrame]
  }
}

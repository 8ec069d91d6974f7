package graft.lakehouse

import scala.collection.mutable

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, UnsafeProjection, XxHash64Function}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** One task's contribution to a DSv2 lakehouse write: the root-relative
  * parquet files it produced (written EXECUTOR-SIDE, straight into the
  * table's claimed data dir) plus any schema-channel DDL records its
  * rows carried (`_change = 'schema'` rows — a handful per batch, never
  * data volume). KEYED STREAMS (round 15) additionally ship two
  * executor-written KEY file sets: `tombFiles` (the distinct key tuples
  * of every touched row — the MoR tombstone / CoW probe side) and
  * `delFiles` (the delete-tagged keys alone — commit transport for the
  * rare DDL-epoch driver fallback, never referenced by a manifest).
  */
final case class LakehouseWriteMessage(files: Seq[String], ddl: Seq[String],
    tombFiles: Seq[String] = Nil, delFiles: Seq[String] = Nil)
    extends WriterCommitMessage

/** One query column's canonical landing spot in the table: input
  * ordinal, canonical (declared-case / alias-resolved) name, the
  * query-side type and the declared type it casts UP to (lossless
  * widening only), and the head-confirmed field id to stamp
  * (`parquet.field.id`) — the same rules [[LakehouseTable]]'s
  * DataFrame-level canonicalization applies, expressed as a plan the
  * executors can run without a DataFrame.
  */
final case class WriteColPlan(inputIdx: Int, name: String,
    from: DataType, to: DataType, fieldId: Option[Int])

/** A partition-spec entry resolved against the column plan: identity
  * (`col=value` dir, column stripped from the file) or bucket
  * (`col_bucket=<pmod(xxhash64(col),n)>` dir, source column kept).
  */
final case class WritePartCol(planIdx: Int, bucketN: Option[Int])

/** How a DSv2 write's executor-written files land in the table. */
sealed trait Dsv2CommitMode
object Dsv2CommitMode {
  /** Plain append: files add, rebase past racing commits. */
  case object Append extends Dsv2CommitMode
  /** Full INSERT OVERWRITE: files REPLACE the table content. */
  case object Truncate extends Dsv2CommitMode
  /** INSERT OVERWRITE ... PARTITION / filter overwrite: matching rows
    * out (pruned candidates rewrite), files in — one snapshot.
    */
  final case class OverwriteBy(filters: Seq[org.apache.spark.sql.sources.Filter])
      extends Dsv2CommitMode
  /** Keyed upsert (writeTo .option("keys", ...)): the staged files ARE
    * the added side; touched existing files rewrite (copy-on-write) or
    * a key tombstone masks them (merge-on-read).
    */
  final case class Keyed(keys: Seq[String], mergeOnRead: Boolean)
      extends Dsv2CommitMode
}

/** The DSv2 WRITE FACE (round 14): executor-side parquet writers + a
  * metadata-only driver commit — replacing the V1Write bridge for the
  * append shapes.
  *
  *  - BATCH (`INSERT INTO` a catalog table, `df.writeTo(...).append()`):
  *    [[createBatchWriterFactory]] claims a data dir against the head,
  *    each task writes its partitions' rows DIRECTLY as parquet (Spark's
  *    own `ParquetWriteSupport`, so files are byte-compatible with the
  *    `df.write` path — field-id stamps included), and
  *    [[commit(Array*]] publishes ONE snapshot referencing the
  *    executor-written files, with the same cross-process rebase loop
  *    as every other append. N partitions = N writers in parallel, one
  *    commit; the driver never touches row data.
  *  - STREAMING (`writeStream.format("graft-lakehouse")`, keyless):
  *    the same writers per epoch; [[commit(Long*]] is OFFSET-AWARE —
  *    the epoch id lands as the snapshot's `(txnAppId, epochId)`
  *    transaction mark, so a crash-replayed epoch is absorbed (its
  *    files discarded) exactly like the V1 sink's ledger contract.
  *    The schema-history channel (`_change='schema'` rows carrying
  *    `_ddl` records) rides the COMMIT MESSAGES: writers divert the
  *    handful of DDL rows instead of caching the whole batch for a
  *    second driver pass (the round-11 trade this face retires), the
  *    driver applies them idempotently before the data commit, and a
  *    DDL-carrying epoch's data lands through the driver-side append
  *    (re-canonicalized against the POST-DDL schema — see the commit
  *    doc), so era resolution stays exact whichever side of a rename
  *    the batch's names speak.
  *
  * KEYED STREAMS (round 15) ride the same executor writers with a
  * per-task SPLIT: data rows to the data files, every touched row's
  * deduped key tuple to a `-tomb` key file, delete-tagged keys to a
  * `-del` file. The epoch commit
  * ([[LakehouseTable.commitApplyStagedFiles]]) is then pure metadata
  * for merge-on-read (data files add, the tomb files ARE the
  * tombstone — the V1 path wrote them driver-side) and a probe +
  * touched-file rewrite for copy-on-write; semantics are the V1
  * applyChanges/upsert contract exactly (tag validation, strictly-
  * older masking, txn absorption). Only a DDL-CARRYING keyed epoch
  * reconstructs the batch driver-side — the same bounded trade as the
  * keyless face. The V1 sink remains solely for snapshot-less roots
  * (batch 1 auto-creates; restarts ride this face).
  */
private[lakehouse] final class LakehouseDsv2Write(
    root: String, writeOpts: Map[String, String], querySchema: StructType,
    mode: Dsv2CommitMode = Dsv2CommitMode.Append)
    extends Write with BatchWrite with StreamingWrite
    with RequiresDistributionAndOrdering {

  override def description(): String = s"graft-lakehouse $mode $root"
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = {
    require(mode == Dsv2CommitMode.Append ||
      mode.isInstanceOf[Dsv2CommitMode.Keyed],
      s"graft-lakehouse streaming writes are append- or keyed-shaped, got $mode")
    this
  }

  // both parents default it true; Scala requires the diamond resolved
  // explicitly — and true is what we want (exactly one commit message
  // per partition, speculative duplicates aborted)
  override def useCommitCoordinator(): Boolean = true

  private def spark = SparkSession.active

  private def table() = new LakehouseTable(spark, root,
    optimizeWrite = LakehouseSource.boolOpt(writeOpts, "optimizeWrite"),
    optimizeWriteTargetBytes =
      LakehouseSource.longOptOf(writeOpts, "optimizeWriteTargetBytes"))

  private val partSpec: Seq[String] =
    LakehouseSource.colListOf(writeOpts, "partitionBy")

  /** Schema-channel detection, from the QUERY schema (both marker
    * columns present — same rule as the V1 sink). Effective ONLY on the
    * streaming face: a BATCH write carrying `_ddl`+`_change` columns
    * (e.g. materializing a raw changefeed) writes them as ordinary data
    * — the batch commit has no DDL channel, so diverting rows there
    * would silently drop them (ADVICE r14).
    */
  private val schemaChannel =
    querySchema.fieldNames.exists(_.equalsIgnoreCase("_ddl")) &&
      querySchema.fieldNames.exists(_.equalsIgnoreCase("_change"))

  /** optimize-write as a DSv2 required distribution: cluster the write
    * by its partition columns (bucket entries cluster by their SOURCE
    * column) so each partition value lands from one task — the
    * declarative form of the V1 path's repartition.
    */
  override def requiredDistribution(): Distribution =
    if (LakehouseSource.boolOpt(writeOpts, "optimizeWrite") && partSpec.nonEmpty)
      Distributions.clustered(partSpec.map {
        case LakehouseTable.BucketSpecRe(_, c) => Expressions.identity(c)
        case c => Expressions.identity(c)
      }.toArray)
    else Distributions.unspecified()

  override def requiredOrdering(): Array[SortOrder] = Array.empty

  /** (claimed snapshot id, the batch's canonical logical schema) of the
    * factory most recently created — commit consumes it. Streaming
    * creates one factory per epoch and the engine serializes epochs,
    * so the slot is never contended.
    */
  @volatile private var staged: (Long, StructType) = _

  private def makeFactory(streaming: Boolean): LakehouseWriterFactory = {
    val ddlMode = schemaChannel && streaming
    val keyedStream = streaming && mode.isInstanceOf[Dsv2CommitMode.Keyed]
    val t = table()
    // round 16: the DSv2 face serves EVERY stream epoch, the FIRST
    // included — a snapshot-less root seeds an empty table from the
    // query schema before the epoch plans (channel columns stripped
    // exactly as the writers strip them from files: keyed drops
    // `_change`/`_ddl`, the keyless schema channel drops `_ddl` and
    // keeps `_change` declared — the round-14 bootstrap rule). This
    // retires the V1 sink's auto-create: one write path, one set of
    // semantics, for batch 1 and every batch after.
    if (streaming && t.currentSnapshot().isEmpty) {
      val keyed = mode.isInstanceOf[Dsv2CommitMode.Keyed]
      val seed = StructType(querySchema.fields.toSeq
        .filterNot(f => f.name.equalsIgnoreCase("_ddl") && (ddlMode || keyed))
        .filterNot(f => f.name.equalsIgnoreCase("_change") && keyed)
        .map(_.copy(nullable = true)))
      require(seed.nonEmpty, "cannot auto-create a table with no data columns")
      t.createEmpty(seed)
      ()
    }
    // declare the op column at KEYLESS stream BOOTSTRAP so its
    // declaration never depends on which commit path the first epochs
    // take: executor-file epochs pin the target schema (additions
    // invisible) while a DDL-carrying epoch's driver-side append
    // evolves additively — without this, `_change` became readable
    // only after the first unrelated DDL epoch (round-14 what's-wrong
    // #2). KEYED streams never declare it: the apply drops the op
    // column before writing (the V1 applyChanges contract).
    if (ddlMode && !keyedStream) t.currentSnapshot().foreach { s =>
      val declared = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
      if (!declared.fieldNames.exists(_.equalsIgnoreCase("_change")))
        t.addColumns(Seq(StructField("_change", StringType, nullable = true)))
    }
    val head = t.currentSnapshot()
    val plan = mode match {
      case Dsv2CommitMode.Truncate =>
        // a full overwrite REPLACES content and schema — the batch is
        // written verbatim (no declared-type casts, no alias
        // canonicalization), inheriting field ids by name like the V1
        // overwrite (the Iceberg REPLACE TABLE identity rule)
        val ids = head.flatMap(_.fieldIds).map(_.ids.map { case (n, i) =>
          n.toLowerCase(java.util.Locale.ROOT) -> i }).getOrElse(Map.empty)
        querySchema.fields.toSeq.zipWithIndex.map { case (f, i) =>
          WriteColPlan(i, f.name, f.dataType, f.dataType,
            ids.get(f.name.toLowerCase(java.util.Locale.ROOT)))
        }
      case _ =>
        t.writeColumnPlan(head, querySchema,
          // DDL-mode files skip id stamps: a drop-then-re-add DDL in
          // the SAME epoch would leave this batch's files stamped with
          // the retired id — name-resolution handles them; stale
          // stamps would poison a future stamped-id read
          stampIds = !ddlMode)
    }
    val batchSchema = StructType(plan.map(p =>
      StructField(p.name, p.to, nullable = true)))
    mode match {
      case Dsv2CommitMode.Truncate => () // replace: any schema is legal
      case Dsv2CommitMode.OverwriteBy(_) =>
        // a row-set overwrite keeps the snapshot schema, so the batch
        // must CONFORM exactly (the V1 requireDeclaredTypes rule; the
        // SQL analyzer always casts, this guards programmatic writeTo)
        head.foreach { cur =>
          val declared = DataType.fromJson(cur.schemaJson)
            .asInstanceOf[StructType].fields.map(f =>
              f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
          plan.foreach { p =>
            declared.get(p.name.toLowerCase(java.util.Locale.ROOT)).foreach { dt =>
              require(dt == p.to, s"overwrite batch column '${p.name}' is " +
                s"${p.to.simpleString} but the table declares ${dt.simpleString}" +
                " — cast the batch (partial overwrites never evolve the schema)")
            }
          }
        }
      case _ =>
        t.requireCompatibleSchemaFor(head, batchSchema) // fail at job start, not commit
    }
    val (claimed, dirName) = t.claimWriteDir("dsv2")
    staged = (claimed, batchSchema)
    def keyOf(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val byKey = plan.zipWithIndex.map { case (p, i) => keyOf(p.name) -> i }.toMap
    val partCols = partSpec.map {
      case LakehouseTable.BucketSpecRe(n, c) =>
        WritePartCol(byKey.getOrElse(keyOf(c), throw new IllegalArgumentException(
          s"bucket source column '$c' not in the write schema")), Some(n.toInt))
      case c =>
        WritePartCol(byKey.getOrElse(keyOf(c), throw new IllegalArgumentException(
          s"partition column '$c' not in the write schema")), None)
    }
    val conf = spark.sessionState.conf
    val parquetConf = Map(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key ->
        conf.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key ->
        conf.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key -> "true",
      // the write-side schema converter asserts this one too
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key ->
        conf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString,
      SQLConf.SESSION_LOCAL_TIMEZONE.key -> conf.sessionLocalTimeZone)
    def idxOf(n: String): Int =
      querySchema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
    // keyed STREAMING (round 15): the writers split — data rows to data
    // files, key tuples to a -tomb key file, delete keys to -del — so
    // the epoch commit is pure metadata (MoR) or probe+rewrite (CoW)
    // over executor-written halves. The `_change` slot index routes
    // delete tags even without the full schema channel.
    val keyIdxs: Seq[Int] =
      if (!keyedStream) Nil
      else mode match {
        case Dsv2CommitMode.Keyed(keys, _) => keys.map { k =>
          val i = plan.indexWhere(_.name.equalsIgnoreCase(k))
          require(i >= 0, s"keys column '$k' not in the write schema " +
            querySchema.simpleString)
          i
        }
        case _ => Nil
      }
    val cdcStream = keyedStream &&
      querySchema.fieldNames.exists(_.equalsIgnoreCase("_change"))
    new LakehouseWriterFactory(t.rootAbsPath, dirName, plan, partCols,
      conf.sessionLocalTimeZone, parquetConf,
      conf.getConfString("spark.sql.parquet.compression.codec", "snappy"),
      ddlMode, if (ddlMode || cdcStream) idxOf("_change") else -1,
      if (ddlMode) idxOf("_ddl") else -1,
      // size-targeted optimize-write: roll files at ≈targetBytes
      maxRecordsPerFile = t.writeBinRecordsPerFile,
      keyIdxs = keyIdxs)
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    makeFactory(streaming = false)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    makeFactory(streaming = true)

  private def filesOf(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.collect { case m: LakehouseWriteMessage => m.files }
      .flatten.sorted

  private def ddlOf(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.collect { case m: LakehouseWriteMessage => m.ddl }
      .flatten.distinct.sortBy(DdlRecord.seqOf)

  /** BATCH commit: one snapshot over the executor-written files, shaped
    * by the mode — append (rebase loop inside: a racing writer costs a
    * metadata retry, the files are written once), full overwrite,
    * filter overwrite (candidates rewrite, files land), or keyed upsert
    * (the staged files are the added side). An all-empty append still
    * commits, so `INSERT INTO t SELECT ... WHERE false` records a
    * version like the V1 path did.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (claimed, batchSchema) = staged
    val files = filesOf(messages)
    val t = table()
    mode match {
      case Dsv2CommitMode.Append =>
        t.commitWrittenFiles(files, batchSchema, claimed,
          mark = None, targetAuthoritative = false)
      case Dsv2CommitMode.Truncate =>
        t.commitOverwriteFiles(files, batchSchema)
      case Dsv2CommitMode.OverwriteBy(filters) =>
        t.commitOverwriteWhereFiles(files, filters)
      case Dsv2CommitMode.Keyed(keys, mor) =>
        t.commitUpsertFiles(files, batchSchema, claimed, keys, mergeOnRead = mor)
    }
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    table().discardWrittenFiles(
      messages.toSeq.collect { case m: LakehouseWriteMessage => m.files }.flatten)
  }

  /** STREAMING commit — the offset-aware half: the data files commit
    * UNDER the epoch's transaction mark, an absorbed replay (crash
    * between the table commit and the checkpoint commit) discards its
    * files and warns on the reset-checkpoint shape — exactly the V1
    * sink's contract.
    *
    * A DDL-CARRYING epoch (the schema-channel records rode the commit
    * messages — one pass, no whole-batch cache) applies the records
    * first, idempotently, then lands its data through the DRIVER-side
    * append: the staged files re-read, re-canonicalized against the
    * POST-DDL schema (a rename record plus data still under the
    * stream's pinned OLD name must land in the renamed column — the
    * alias mapping only exists after the DDL applies, so the
    * executor-written files' names can be stale in either direction),
    * and written once more. DDL epochs are rare (schema changes, not
    * data volume), so the double-write is bounded by change frequency;
    * every DDL-free epoch commits the executor files directly.
    */
  /** The batch reconstructed from staged parquet halves (driver
    * fallback for DDL-carrying epochs): basePath restores identity-
    * partition columns, explicit casts pin path-inferred types to the
    * staged schema. Empty file sets read as an empty frame.
    */
  private def readStaged(t: LakehouseTable, fs: Seq[String],
      schema: StructType): org.apache.spark.sql.DataFrame =
    if (fs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val dir = fs.head.split('/').take(2).mkString("/")
      val df0 = spark.read
        .option("basePath", java.nio.file.Paths.get(t.rootAbsPath, dir).toString)
        .parquet(fs.map(f =>
          java.nio.file.Paths.get(t.rootAbsPath, f).toString): _*)
      val types = schema.fields.map(f =>
        f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
      df0.select(df0.columns.map { c =>
        types.get(c.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(f) => org.apache.spark.sql.functions.col(c)
            .cast(f.dataType).as(f.name)
          case None => org.apache.spark.sql.functions.col(c)
        }
      }.toSeq: _*)
    }

  /** Target-authoritative column drop (the V1 sink rule): a batch
    * column the post-DDL target doesn't declare — and no alias
    * explains — was dropped by the history; additive re-entry would
    * diverge the replica. `_change` always survives (op channel).
    */
  private def conformToTarget(t: LakehouseTable,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val keep: String => Boolean = t.currentSnapshot() match {
      case Some(s) =>
        val declared = org.apache.spark.sql.types.DataType
          .fromJson(s.schemaJson).asInstanceOf[StructType]
          .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        val aliases = s.aliases.flatMap { case (_, olds) =>
          olds.map(_.name.toLowerCase(java.util.Locale.ROOT)) }.toSet
        c => c == "_change" ||
          declared(c.toLowerCase(java.util.Locale.ROOT)) ||
          aliases(c.toLowerCase(java.util.Locale.ROOT))
      case None => _ => true
    }
    df.columns.filterNot(keep).foldLeft(df)((d, c) => d.drop(c))
  }

  /** Does any schema-channel record rename/drop/retype/add a column
    * name the staged files carry? When NOT (the common rename-
    * elsewhere case), the executor-written halves are already
    * post-DDL-correct and commit directly; a touching record sends the
    * epoch to the driver-side re-canonicalization. Conservative for
    * set_spec / future ops.
    */
  private def ddlTouches(ddl: Seq[String], batchSchema: StructType): Boolean = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val batchNames = batchSchema.fieldNames.map(lc).toSet
    ddl.map(DdlRecord.parse).exists { r =>
      r.op match {
        case "rename" => (r.from.toSeq ++ r.to.toSeq).exists(n => batchNames(lc(n)))
        case "drop" | "widen" | "add" => r.column.exists(n => batchNames(lc(n)))
        case _ => true
      }
    }
  }

  /** KEYED streaming epoch (round 15): the staged executor halves —
    * data files, deduped `-tomb` key files, `-del` delete keys —
    * commit through [[LakehouseTable.commitApplyStagedFiles]] under
    * the epoch's txn mark: MoR is a pure metadata commit (data files
    * add, tomb files become THE tombstone), CoW probes with the tomb
    * keys and rewrites only touched files. A DDL-carrying epoch falls
    * back to the driver-side apply (the batch reconstructed from the
    * staged halves, re-canonicalized post-DDL) — rare, bounded by
    * schema-change frequency, the same trade as the keyless face.
    */
  private def commitKeyedEpoch(t: LakehouseTable, keys: Seq[String],
      mor: Boolean, claimed: Long, batchSchema: StructType,
      ddl: Seq[String], files: Seq[String], tombs: Seq[String],
      dels: Seq[String], appId: String, epochId: Long): Option[Snapshot] = {
    val dataSchema0 = StructType(batchSchema.filterNot(f =>
      f.name.equalsIgnoreCase("_change") || f.name.equalsIgnoreCase("_ddl")))
    // under the SCHEMA CHANNEL the target is authoritative on DDL-free
    // epochs too: a batch column the target doesn't declare (and no
    // alias explains) was dropped by the history — the pinned upstream
    // keeps sending it as NULL, and even after a downstream compaction
    // cleared the dropped registry it must NOT re-enter additively and
    // diverge the replica (the V1 sink conformed every batch this way)
    val dataSchema =
      if (!schemaChannel) dataSchema0
      else t.currentSnapshot() match {
        case Some(s) =>
          val declared = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
            .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
          val aliases = s.aliases.flatMap { case (_, olds) =>
            olds.map(_.name.toLowerCase(java.util.Locale.ROOT)) }.toSet
          StructType(dataSchema0.filter(f =>
            declared(f.name.toLowerCase(java.util.Locale.ROOT)) ||
              aliases(f.name.toLowerCase(java.util.Locale.ROOT))))
        case None => dataSchema0
      }
    val cdcShape = querySchema.fieldNames.exists(_.equalsIgnoreCase("_change"))
    // ORTHOGONAL DDL epochs (no record touches a column the staged
    // halves carry) apply the records and commit the executor files
    // directly — the same one-write shortcut as the keyless face; the
    // pre-DDL dataSchema stays valid because orthogonal records can't
    // change a batch column's name, type, or conformance verdict
    if (ddl.isEmpty || !ddlTouches(ddl, batchSchema)) {
      ddl.foreach(t.applySchemaChange)
      val r = t.commitApplyStagedFiles(files, tombs, dataSchema, claimed,
        keys, mergeOnRead = mor, cdc = cdcShape,
        mark = Some(TxnMark(appId, epochId)))
      // -del files are commit transport only; CoW keeps no tomb either
      if (r.isDefined) t.discardWrittenFiles(dels ++ (if (mor) Nil else tombs))
      r
    } else {
      ddl.foreach(t.applySchemaChange)
      val keyFields = StructType(keys.map(k =>
        dataSchema.fields.find(_.name.equalsIgnoreCase(k)).getOrElse(
          throw new IllegalArgumentException(
            s"keys column '$k' not in the staged schema ${dataSchema.simpleString}"))))
      import org.apache.spark.sql.functions.lit
      val ch0 = readStaged(t, files, dataSchema)
        .withColumn("_change", lit("insert"))
        .unionByName(
          readStaged(t, dels, keyFields).withColumn("_change", lit("delete")),
          allowMissingColumns = true)
      val r = t.applyChanges(conformToTarget(t, ch0), keys,
        txn = Some((appId, epochId)), mergeOnRead = mor)
      t.discardWrittenFiles(files ++ tombs ++ dels)
      r
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val t = table()
    val (claimed, batchSchema) = staged
    val appId = writeOpts.collectFirst {
      case (k, v) if k.equalsIgnoreCase("txnAppId") => v
    }.getOrElse("graft-lakehouse-sink:" +
      java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString)
    val ddl = ddlOf(messages)
    val files = filesOf(messages)
    val tombs = messages.toSeq.collect {
      case m: LakehouseWriteMessage => m.tombFiles }.flatten.sorted
    val dels = messages.toSeq.collect {
      case m: LakehouseWriteMessage => m.delFiles }.flatten.sorted
    mode match {
      case Dsv2CommitMode.Keyed(keys, mor) =>
        val applied = commitKeyedEpoch(t, keys, mor, claimed, batchSchema,
          ddl, files, tombs, dels, appId, epochId)
        if (applied.isEmpty) {
          t.discardWrittenFiles(files ++ tombs ++ dels)
          warnOnResetCheckpoint(t, appId, epochId)
        }
        return
      case _ => ()
    }
    val applied =
      if (ddl.isEmpty)
        t.commitWrittenFiles(files, batchSchema, claimed,
          mark = Some(TxnMark(appId, epochId)), targetAuthoritative = schemaChannel)
      else {
        ddl.foreach(t.applySchemaChange)
        // ORTHOGONALITY ([[ddlTouches]]): a non-touching epoch commits
        // its executor files directly and skips the driver re-write
        val ddlTouchesBatch = ddlTouches(ddl, batchSchema)
        val out =
          if (files.isEmpty)
            t.commitWrittenFiles(Nil, batchSchema, claimed,
              mark = Some(TxnMark(appId, epochId)), targetAuthoritative = true)
          else if (!ddlTouchesBatch)
            t.commitWrittenFiles(files, batchSchema, claimed,
              mark = Some(TxnMark(appId, epochId)), targetAuthoritative = true)
          else {
            // readStaged pins path-inferred identity-partition types
            // back to the staged batch schema (a digit-only string
            // partition value re-infers numeric, and appendIdempotent's
            // compatibility check would then wedge the epoch on every
            // retry); conformToTarget applies the V1 sink's target-
            // authoritative column drop over the post-DDL head
            val conformed = conformToTarget(t, readStaged(t, files, batchSchema))
            val res = t.appendIdempotent(conformed, appId, epochId,
              partitionBy = partSpec)
            t.discardWrittenFiles(files)
            res
          }
        out
      }
    if (applied.isEmpty) {
      t.discardWrittenFiles(files)
      warnOnResetCheckpoint(t, appId, epochId)
    }
  }

  private def warnOnResetCheckpoint(t: LakehouseTable, appId: String,
      epochId: Long): Unit =
    t.lastTxnVersion(appId).filter(_ > epochId + 1).foreach { last =>
      System.err.println(
        s"[graft-lakehouse sink] WARNING: batch $epochId absorbed but ledger for " +
          s"'$appId' is at version $last — this looks like a RESET CHECKPOINT " +
          s"over a live ledger; data in skipped batches does NOT reach $root. " +
          "Restore the original checkpointLocation or use a fresh txnAppId.")
    }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    abort(messages)
}

/** Serializable task-side writer factory: everything a task needs to
  * write canonical parquet into the claimed dir with zero driver
  * round-trips.
  */
private[lakehouse] final class LakehouseWriterFactory(
    rootAbs: String, dirName: String,
    plan: Seq[WriteColPlan], partCols: Seq[WritePartCol],
    tz: String, parquetConf: Map[String, String], codec: String,
    ddlMode: Boolean, changeIdx: Int, ddlIdx: Int,
    maxRecordsPerFile: Option[Long] = None,
    keyIdxs: Seq[Int] = Nil)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    LakehouseWriteStats.writersCreated.incrementAndGet()
    new LakehouseDataWriter(rootAbs, dirName, plan, partCols, tz,
      parquetConf, codec, ddlMode, changeIdx, ddlIdx, partitionId, taskId,
      maxRecordsPerFile, keyIdxs)
  }

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = createWriter(partitionId, taskId)
}

/** Spec seam: counts executor-side writer instantiations (local-mode
  * tests share the JVM, so a static counter observes task-side work).
  */
object LakehouseWriteStats {
  val writersCreated = new java.util.concurrent.atomic.AtomicLong
}

/** The per-task writer: routes each row to its hive partition dir
  * (identity values rendered exactly as Spark's own file writer —
  * session-timezone string cast + path escaping, NULL to the default
  * partition name; bucket dirs via THE layout hash), projects the
  * canonical file columns (case-canonical names, widening casts,
  * field-id stamps), and streams them through Spark's
  * `ParquetWriteSupport` — the files are indistinguishable from the
  * V1 path's. DDL-channel rows divert into the commit message.
  */
private[lakehouse] final class LakehouseDataWriter(
    rootAbs: String, dirName: String,
    plan: Seq[WriteColPlan], partCols: Seq[WritePartCol],
    tz: String, parquetConf: Map[String, String], codec: String,
    ddlMode: Boolean, changeIdx: Int, ddlIdx: Int,
    partitionId: Int, taskId: Long,
    maxRecordsPerFile: Option[Long] = None,
    keyIdxs: Seq[Int] = Nil)
    extends DataWriter[InternalRow] {

  /** Keyed-stream split mode (round 15): data rows land in the data
    * files, every touched row's key tuple lands (deduped per task) in
    * a `-tomb` key file, and with a CDC `_change` column delete-tagged
    * rows land ONLY their keys (`-del` file too) — the executor-side
    * halves of [[LakehouseTable.commitApplyStagedFiles]].
    */
  private val keyed = keyIdxs.nonEmpty
  private val cdc = keyed && changeIdx >= 0

  private val identityPlanIdx: Set[Int] =
    partCols.collect { case WritePartCol(i, None) => i }.toSet

  /** Channel marker columns never enter KEYED data files — the V1
    * apply drops `_change` (and `_ddl`) before writing, and the keyed
    * commit's schema does the same.
    */
  private def isChannelCol(p: WriteColPlan): Boolean =
    keyed && (p.name.equalsIgnoreCase("_change") || p.name.equalsIgnoreCase("_ddl"))

  /** File columns = the plan minus identity partition columns (their
    * values live in the path, the hive layout writeDataFiles produces).
    */
  private val fileCols: Seq[WriteColPlan] =
    plan.zipWithIndex.collect {
      case (p, i) if !identityPlanIdx(i) && !isChannelCol(p) => p
    }
  require(fileCols.nonEmpty,
    "cannot write files with every column consumed by the partition spec")

  private val keySchema: StructType = StructType(keyIdxs.map { i =>
    StructField(plan(i).name, plan(i).to, nullable = true)
  })

  private lazy val keyProj: UnsafeProjection = UnsafeProjection.create(
    keyIdxs.map { i =>
      val p = plan(i)
      val br: Expression = BoundReference(p.inputIdx, p.from, nullable = true)
      if (p.from == p.to) br else Cast(br, p.to, Option(tz))
    })

  // per-task key dedup (insertion-ordered for deterministic files):
  // batch-sized key tuples — the same volume the V1 path's driver-side
  // `touchedKeys.distinct()` materializes
  private val tombKeys = mutable.LinkedHashSet.empty[InternalRow]
  private val delKeys = mutable.LinkedHashSet.empty[InternalRow]

  private val fileSchema: StructType = StructType(fileCols.map { p =>
    val md = p.fieldId.fold(org.apache.spark.sql.types.Metadata.empty) { id =>
      new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", id.toLong).build()
    }
    StructField(p.name, p.to, nullable = true, metadata = md)
  })

  private lazy val proj: UnsafeProjection = UnsafeProjection.create(
    fileCols.map { p =>
      val br: Expression = BoundReference(p.inputIdx, p.from, nullable = true)
      if (p.from == p.to) br else Cast(br, p.to, Option(tz))
    })

  /** Per-partition-column string renderers (identity) / bucket ids. */
  private lazy val partRender: Seq[InternalRow => String] = partCols.map {
    case WritePartCol(i, Some(n)) =>
      val p = plan(i)
      val dir = s"${p.name}_bucket"
      // CAST-then-hash, like the V1 layout: the input row holds the
      // QUERY type, so reading it with the widened declared type would
      // zero-extend negative ints (UnsafeRow) or throw (generic rows)
      // and land rows in the wrong bucket dir (ADVICE r14)
      val widen = UnsafeProjection.create(Seq[Expression]({
        val br = BoundReference(p.inputIdx, p.from, nullable = true)
        if (p.from == p.to) br else Cast(br, p.to, Option(tz))
      }))
      row => {
        // xxhash64(NULL) leaves the seed untouched — the exact
        // pmod(xxhash64(col), n) the V1 layout writes
        val w = widen(row)
        val h = if (w.isNullAt(0)) 42L
          else XxHash64Function.hash(w.get(0, p.to), p.to, 42L)
        ExternalCatalogUtils.getPartitionPathString(dir, (((h % n) + n) % n).toString)
      }
    case WritePartCol(i, None) =>
      val p = plan(i)
      val toStr = UnsafeProjection.create(Seq[Expression](
        Cast(BoundReference(p.inputIdx, p.from, nullable = true), StringType, Option(tz))))
      row => {
        val s = toStr(row)
        ExternalCatalogUtils.getPartitionPathString(p.name,
          if (s.isNullAt(0)) null else s.getUTF8String(0).toString)
      }
  }

  private val ddl = mutable.ArrayBuffer.empty[String]
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private var fileSeq = 0
  // files already rolled shut (size-targeted optimize-write)
  private val closed = mutable.ArrayBuffer.empty[String]
  // suffix -> (relative path, open record writer, rows written)
  private val open = mutable.LinkedHashMap.empty[String,
    (String, org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow], Long)]

  private def openWriter(suffix: String)
      : (String, org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow], Long) = {
    val rel = "data/" + dirName +
      (if (suffix.isEmpty) "" else "/" + suffix) +
      f"/part-$partitionId%05d-$taskId-$nonce-$fileSeq.parquet"
    fileSeq += 1
    (rel, openParquet(rel, fileSchema), 0L)
  }

  private def openParquet(rel: String, schema: StructType)
      : org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    parquetConf.foreach { case (k, v) => conf.set(k, v) }
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    val codecName =
      try CompressionCodecName.valueOf(codec.toUpperCase(java.util.Locale.ROOT))
      catch { case _: IllegalArgumentException => CompressionCodecName.SNAPPY }
    new ParquetOutputFormat[InternalRow]().getRecordWriter(
      conf, new HPath(rootAbs + "/" + rel), codecName)
  }

  /** Flush a deduped key set to ONE parquet key file in a SIBLING
    * claim dir (`<dirName>-<kind>` — same path-derived origin id as
    * the data files, so MoR masking stays strictly-older). None for
    * an empty set.
    */
  private def writeKeyFile(kind: String,
      rows: Iterable[InternalRow]): Option[String] = {
    if (rows.isEmpty) None
    else {
      val rel = s"data/$dirName-$kind" +
        f"/part-$partitionId%05d-$taskId-$nonce-k.parquet"
      val rw = openParquet(rel, keySchema)
      rows.foreach(rw.write(null, _))
      rw.close(null)
      Some(rel)
    }
  }

  override def write(row: InternalRow): Unit = {
    if (ddlMode && !row.isNullAt(changeIdx) &&
        row.getUTF8String(changeIdx).toString == "schema") {
      if (!row.isNullAt(ddlIdx)) ddl += row.getUTF8String(ddlIdx).toString
      return
    }
    if (cdc) {
      // the V1 applyChanges tag contract, enforced at the row: unknown
      // tags (a typo, another dialect's "update_postimage") and NULL
      // must fail LOUDLY — falling through would silently corrupt the
      // replica (this feed speaks insert|delete; updates arrive as
      // delete(old)+insert(new))
      val tag = if (row.isNullAt(changeIdx)) null
        else row.getUTF8String(changeIdx).toString
      require(tag == "insert" || tag == "delete",
        s"applyChanges: unsupported _change tag '${if (tag == null) "NULL" else tag}' " +
          "(this feed speaks insert|delete; updates arrive as delete(old)+insert(new))")
      // contains() probes with the projection's REUSED row (value-based
      // UnsafeRow equality); only a fresh tuple pays the copy
      val k0 = keyProj(row)
      val k = if (tombKeys.contains(k0)) k0 else {
        val c = k0.copy(); tombKeys += c; c
      }
      if (tag == "delete") {
        if (!delKeys.contains(k)) delKeys += (if (k eq k0) k.copy() else k)
        return // delete rows carry keys only — never data
      }
    } else if (keyed) {
      val k0 = keyProj(row)
      if (!tombKeys.contains(k0)) { tombKeys += k0.copy(); () }
    }
    val suffix = if (partRender.isEmpty) "" else partRender.map(_(row)).mkString("/")
    // bound OPEN writers: an unclustered task spanning many partition
    // values would otherwise hold a parquet buffer set per value (the
    // 100 TB date-partitioned-append OOM). True LRU: a hit REMOVES and
    // re-inserts at the tail below, so the head really is the least-
    // recently-USED writer (a least-recently-OPENED head would evict
    // the writer a round-robin interleave is about to need next —
    // worst case one file per row). A re-appearing evicted value rolls
    // a new file — bounded memory for a few extra small files, and
    // optimizeWrite clustering avoids the spread entirely
    val w = open.remove(suffix).getOrElse {
      if (open.size >= LakehouseDataWriter.MaxOpenWriters) {
        val (oldSuffix, oldW) = open.head
        oldW._2.close(null)
        closed += oldW._1
        open.remove(oldSuffix)
        ()
      }
      openWriter(suffix)
    }
    // the record consumer serializes the row into parquet buffers
    // immediately, so the projection's reused row needs no copy
    w._2.write(null, proj(row))
    val n = w._3 + 1
    // size-targeted optimize-write: roll the file shut at the record
    // cap so a skewed partition value bins into ≈targetBytes files
    if (maxRecordsPerFile.exists(n >= _)) {
      w._2.close(null)
      closed += w._1
      ()
    } else open.put(suffix, (w._1, w._2, n))
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._2.close(null))
    LakehouseWriteMessage(closed.toSeq ++ open.values.map(_._1).toSeq, ddl.toSeq,
      tombFiles = writeKeyFile("tomb", tombKeys).toSeq,
      delFiles = writeKeyFile("del", delKeys).toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { case (_, w, _) =>
      try w.close(null) catch { case _: Exception => () }
    }
    (closed.toSeq ++ open.values.map(_._1).toSeq).foreach { rel =>
      try { java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(rootAbs, rel)); () }
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit = ()
}

object LakehouseDataWriter {
  /** Cap on concurrently OPEN per-partition-value parquet writers in
    * one task — beyond it the least-recently-USED rolls shut (its
    * value re-appearing opens a fresh file). Each open writer holds a
    * row-group buffer set, so unbounded spread is an executor OOM at
    * scale; clustered writes (optimizeWrite) never approach the cap.
    */
  val MaxOpenWriters = 64
}

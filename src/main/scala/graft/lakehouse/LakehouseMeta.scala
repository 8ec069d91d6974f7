package graft.lakehouse

import java.util.{Iterator => JIterator}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Metadata tables + SQL maintenance procedures — the operational
  * surface of the lakehouse from a pure SQL session (the
  * Iceberg-metadata-table / `CALL catalog.system.*` shape):
  *
  * {{{
  *   SELECT * FROM graft.db.`t$snapshots`   -- commit lineage (+ $history alias)
  *   SELECT * FROM graft.db.`t$files`       -- current snapshot's files + stats
  *   SELECT * FROM graft.db.`t$partitions`  -- per-partition file/row/byte counts
  *   SELECT * FROM graft.db.`t$txns`        -- exactly-once ledger state
  *
  *   CALL graft.system.expire_snapshots(table => 'db.t', older_than => TIMESTAMP '...')
  *   CALL graft.system.compact(table => 'db.t', file_threshold => 8)
  *   CALL graft.system.zorder(table => 'db.t', columns => 'id,ts', target_files => 4)
  *   CALL graft.system.build_bloom_index(table => 'db.t', column => 'id')
  *   CALL graft.system.rollback(table => 'db.t', snapshot_id => 3)
  * }}}
  *
  * Everything here is DRIVER-SIDE METADATA (manifest JSON + file sizes
  * + the txn floor): a metadata query over a 100 TB table costs
  * O(files) small reads, zero Spark jobs, zero data I/O. Procedures
  * delegate to the [[LakehouseTable]] maintenance ops the CLI already
  * drives (`maintenance.py:62-244` scope) and return their audit row
  * through a [[LocalScan]].
  */
object LakehouseMeta {

  /** `name$suffix` → (base table name, metadata kind). */
  def metaSuffixOf(name: String): Option[(String, String)] = {
    val i = name.lastIndexOf('$')
    if (i <= 0) None
    else {
      val kind = name.substring(i + 1).toLowerCase(java.util.Locale.ROOT)
      if (Set("snapshots", "history", "files", "txns", "columns", "partitions", "refs")(kind))
        Some((name.substring(0, i), kind))
      else None
    }
  }

  def table(spark: SparkSession, root: String, kind: String): Table = {
    val t = new LakehouseTable(spark, root)
    kind match {
      case "snapshots" | "history" =>
        val schema = StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("parent_id", LongType),
          StructField("committed_at", TimestampType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("file_count", IntegerType, nullable = false),
          StructField("row_count", LongType),
          StructField("txn_app", StringType),
          StructField("txn_version", LongType),
          // live MoR tombstone volume (manifest stats, zero jobs) —
          // the maintenance auto-fold budget input, surfaced where an
          // operator can watch it grow between compactions
          StructField("tombstone_files", IntegerType, nullable = false),
          StructField("tombstone_keys", LongType, nullable = false),
          StructField("tombstone_bytes", LongType, nullable = false),
          // write-audit-publish: NULL = main lineage; a name marks an
          // unpublished branch commit
          StructField("branch", StringType, nullable = true)))
        val rows = t.listSnapshots().map { s =>
          // stats-only: a lineage listing must not open parquet footers
          val (tf, tk, tb) = t.tombstoneVolume(s, footerFallback = false)
          Row(s.snapshotId, s.parentId.map(Long.box).orNull,
            new java.sql.Timestamp(s.timestampMs), s.operation,
            s.files.size, t.manifestRowCount(s).map(Long.box).orNull,
            s.txn.map(_.appId).orNull, s.txn.map(m => Long.box(m.version)).orNull,
            tf, tk, tb, s.branch.orNull)
        }
        new LakehouseMetaTable(s"$root$$$kind", schema, rows)
      case "files" =>
        val schema = StructType(Seq(
          StructField("file", StringType, nullable = false),
          StructField("type", StringType, nullable = false), // data | tombstone
          StructField("size_bytes", LongType),
          StructField("row_count", LongType),
          StructField("partition", StringType)))
        val rows = t.currentSnapshot().toSeq.flatMap { s =>
          def rowOf(f: String, kind: String) = {
            val part = LakehouseTable.hiveSegsOf(f)
            // size from the manifest's write-time FileStats (the
            // driver-metadata-only contract); per-file fs stat only for
            // pre-bytes manifests and tombstones, swallowing a
            // concurrent vacuum's NoSuchFileException to NULL instead
            // of failing the whole metadata query
            val size = s.stats.flatMap(_.get(f)).flatMap(_.bytes).orElse(
              try Some(java.nio.file.Files.size(
                java.nio.file.Paths.get(root).resolve(f)))
              catch { case _: Exception => None })
            Row(f, kind, size.map(Long.box).orNull,
              s.stats.flatMap(_.get(f)).map(st => Long.box(st.rows)).orNull,
              if (part.isEmpty) null else part.mkString("/"))
          }
          s.files.map(rowOf(_, "data")) ++ s.tombstones.map(rowOf(_, "tombstone"))
        }
        new LakehouseMetaTable(s"$root$$files", schema, rows)
      case "columns" =>
        // the schema-evolution surface: declared type per column, the
        // FORMER names a rename lineage carries (oldest first) with the
        // last rename point, the declared layout role (identity
        // partition / bucket(N) source), the immutable field id
        // (FIELD_IDS.md; NULL only for a lineage that predates ids and
        // has not committed since), and the DROPPED registry — every
        // name blocked for re-add until compaction appears as a
        // status='dropped' row with the snapshot that dropped it, so an
        // operator can see WHY a re-add refuses without reading
        // manifests — all driver-side metadata
        val schema = StructType(Seq(
          StructField("column", StringType, nullable = false),
          StructField("type", StringType, nullable = false),
          StructField("nullable", BooleanType, nullable = false),
          StructField("former_names", StringType),
          StructField("renamed_at", LongType),
          StructField("layout", StringType),
          StructField("field_id", IntegerType),
          StructField("status", StringType, nullable = false),
          StructField("dropped_at", LongType)))
        val rows = t.currentSnapshot().toSeq.flatMap { snap =>
          val declared = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
          val metaP = java.nio.file.Paths.get(root).resolve("_catalog.json")
          val spec: Seq[String] =
            if (java.nio.file.Files.exists(metaP))
              """"partitionBy"\s*:\s*\[([^\]]*)\]""".r
                .findFirstMatchIn(java.nio.file.Files.readString(metaP))
                .map(m => LakehouseSource.splitTopLevel(m.group(1))
                  .map(_.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
                .getOrElse(Nil)
            else Nil
          def layoutOf(n: String): String = spec.collectFirst {
            case LakehouseTable.BucketSpecRe(nb, c) if c.equalsIgnoreCase(n) => s"bucket($nb)"
            case c if c.equalsIgnoreCase(n) => "identity"
          }.orNull
          val idOf: Map[String, Int] = snap.fieldIds
            .map(_.ids.map { case (n, i) => n.toLowerCase(java.util.Locale.ROOT) -> i })
            .getOrElse(Map.empty)
          val live = declared.fields.toSeq.map { f =>
            val olds = snap.aliases.collectFirst {
              case (k, v) if k.equalsIgnoreCase(f.name) => v
            }.getOrElse(Nil)
            Row(f.name, f.dataType.simpleString, f.nullable,
              if (olds.isEmpty) null else olds.map(_.name).mkString(","),
              olds.lastOption.map(a => Long.box(a.renamedAt)).orNull,
              layoutOf(f.name),
              idOf.get(f.name.toLowerCase(java.util.Locale.ROOT))
                .map(Int.box).orNull,
              "live", null)
          }
          // the dropped registry: type and field id recover from the
          // dropping snapshot's PARENT schema when that manifest still
          // exists (snapshot expiry may have taken it — then 'unknown')
          val byId = t.listSnapshots().map(s => s.snapshotId -> s).toMap
          val droppedRows = snap.droppedCols.toSeq.sortBy(_._1).map { case (n, at) =>
            val pre = byId.get(at).flatMap(_.parentId).flatMap(byId.get)
            // a registry entry may be a FORMER name of the dropped
            // column — resolve it through the pre-drop alias lineage to
            // the name the pre-drop schema declares
            val declaredName = pre.map { p =>
              p.aliases.collectFirst {
                case (cur, lineage)
                    if lineage.exists(_.name.equalsIgnoreCase(n)) => cur
              }.getOrElse(n)
            }.getOrElse(n)
            val f = pre.flatMap(p => DataType.fromJson(p.schemaJson)
              .asInstanceOf[StructType].fields
              .find(_.name.equalsIgnoreCase(declaredName)))
            val fid = pre.flatMap(_.fieldIds).flatMap(_.ids.collectFirst {
              case (k, i) if k.equalsIgnoreCase(declaredName) => i })
            Row(n, f.map(_.dataType.simpleString).getOrElse("unknown"),
              f.forall(_.nullable), null, null, null,
              fid.map(Int.box).orNull, "dropped", Long.box(at))
          }
          live ++ droppedRows
        }
        new LakehouseMetaTable(s"$root$$columns", schema, rows)
      case "partitions" =>
        // per-partition-value file/row/byte counts from manifest stats
        // (zero jobs at any table size) — the operator-facing layout
        // view, and the input a partition-scoped compaction or the
        // tombstone budget reads to pick WHERE to act. Unpartitioned
        // tables report one NULL-partition row; tombstone files are
        // counted separately (their rows are masked keys, not data).
        val schema = StructType(Seq(
          StructField("partition", StringType),
          StructField("file_count", IntegerType, nullable = false),
          StructField("row_count", LongType),
          StructField("size_bytes", LongType),
          StructField("tombstone_files", IntegerType, nullable = false)))
        val rows = t.currentSnapshot().toSeq.flatMap { s =>
          def partOf(f: String): String = {
            val segs = LakehouseTable.hiveSegsOf(f)
            if (segs.isEmpty) null else segs.mkString("/")
          }
          def statsOf(f: String) = s.stats.flatMap(_.get(f))
          val tombByPart = s.tombstones.groupBy(partOf)
          val byPart = s.files.groupBy(partOf)
          // tombstone key files land under the table's hive layout
          // when the change batch carried the partition columns
          // (round 16) and flat otherwise — either way a partition key
          // present only on the tombstone side must still surface
          val allParts = (byPart.keySet ++ tombByPart.keySet).toSeq
            .sortBy(p => Option(p).getOrElse(""))
          allParts.map { part =>
            val fs = byPart.getOrElse(part, Nil)
            val rc = fs.map(statsOf(_).map(_.rows))
            val bc = fs.map(statsOf(_).flatMap(_.bytes))
            Row(part, fs.size,
              if (rc.exists(_.isEmpty)) null else Long.box(rc.flatten.sum),
              if (bc.exists(_.isEmpty)) null else Long.box(bc.flatten.sum),
              tombByPart.getOrElse(part, Nil).size)
          }
        }
        new LakehouseMetaTable(s"$root$$partitions", schema, rows)
      case "txns" =>
        val schema = StructType(Seq(
          StructField("app_id", StringType, nullable = false),
          StructField("last_version", LongType, nullable = false)))
        val rows = t.txnVersions().toSeq.sortBy(_._1)
          .map { case (a, v) => Row(a, v) }
        new LakehouseMetaTable(s"$root$$txns", schema, rows)
      case "refs" =>
        // snapshot tags: the reproducible-corpus-version registry —
        // each tag pins its snapshot against retention and resolves
        // via VERSION AS OF '<tag>'
        val schema = StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false),
          StructField("created_at", TimestampType, nullable = false),
          // the tag's own retention: NULL = lives until dropped;
          // otherwise the next expiry sweep at/after expires_at drops it
          StructField("max_ref_age_ms", LongType, nullable = true),
          StructField("expires_at", TimestampType, nullable = true),
          StructField("kind", StringType, nullable = false))) // tag | branch
        val rows = t.tagRefs.toSeq.sortBy(_._1).map { case (n, r) =>
          Row(n, r.snapshot, new java.sql.Timestamp(r.createdMs),
            r.maxRefAgeMs.map(Long.box).orNull,
            r.maxRefAgeMs.map(a => new java.sql.Timestamp(r.createdMs + a)).orNull,
            "tag")
        } ++ t.branches.toSeq.sortBy(_._1).map { case (n, ref) =>
          Row(n, t.branchHead(n).snapshotId, new java.sql.Timestamp(ref.createdMs),
            null, null, "branch")
        }
        new LakehouseMetaTable(s"$root$$refs", schema, rows)
      case other => throw new IllegalArgumentException(s"unknown metadata table $$$other")
    }
  }

  // ---------------- procedures ----------------

  private val string = StringType
  private def inParam(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
  private def inParamDefault(n: String, dt: DataType, d: String) =
    ProcedureParameter.in(n, dt).defaultValue(d).build()

  val procedureNames: Seq[String] = Seq(
    "expire_snapshots", "compact", "zorder", "build_bloom_index",
    "prune_bloom_sidecars", "rollback", "set_partition_spec",
    "set_tag", "drop_tag", "fork_branch", "publish_branch", "drop_branch",
    "clone_table", "deepen_table")

  /** One result row through a LocalScan (the CALL statement's output). */
  private def result(schema: StructType, row: Row): JIterator[Scan] = {
    val scan: Scan = new LocalScan {
      private val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] =
        Array(conv(row).asInstanceOf[InternalRow])
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  /** Build the named maintenance procedure; `resolveRoot` maps the
    * procedure's `table` argument ('db.t' under the owning catalog) to
    * a filesystem root; `resolveNewRoot` the same for arguments naming
    * a table the procedure CREATES (clone_table's `dest`).
    */
  def procedure(name: String, resolveRoot: String => String,
      resolveNewRoot: String => String = identity): UnboundProcedure = {
    val procName = name // the anon classes' name() would shadow the param
    def spark = SparkSession.active
    def tableOf(arg: String) = new LakehouseTable(spark, resolveRoot(arg))

    def bound(params: Array[ProcedureParameter], out: StructType)(
        run: InternalRow => Row): BoundProcedure = new BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft-lakehouse $procName"
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): JIterator[Scan] =
        result(out, run(input))
    }
    def unbound(b: => BoundProcedure): UnboundProcedure = new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft-lakehouse $procName"
      override def bind(inputType: StructType): BoundProcedure = b
    }

    name match {
      case "expire_snapshots" => unbound(bound(
        Array(inParam("table", string), inParam("older_than", TimestampType)),
        StructType(Seq(StructField("expired_snapshots", IntegerType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .expireSnapshotsOlderThan(Math.floorDiv(in.getLong(1), 1000L)))
      })
      case "compact" => unbound(bound(
        Array(inParam("table", string),
          inParamDefault("file_threshold", IntegerType, "8"),
          inParamDefault("max_rows", LongType, "1000000"),
          inParamDefault("target_files", IntegerType, "1")),
        StructType(Seq(StructField("snapshot_id", LongType)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .compact(in.getInt(1), in.getLong(2), in.getInt(3))
          .map(s => Long.box(s.snapshotId)).orNull)
      })
      case "zorder" => unbound(bound(
        Array(inParam("table", string), inParam("columns", string),
          inParamDefault("target_files", IntegerType, "1"),
          inParamDefault("buckets", IntegerType, "256")),
        StructType(Seq(StructField("snapshot_id", LongType)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .compactZOrder(in.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq, in.getInt(2), in.getInt(3))
          .map(s => Long.box(s.snapshotId)).orNull)
      })
      case "build_bloom_index" => unbound(bound(
        Array(inParam("table", string), inParam("column", string)),
        StructType(Seq(StructField("files_indexed", IntegerType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .buildBloomIndex(in.getUTF8String(1).toString))
      })
      case "prune_bloom_sidecars" => unbound(bound(
        Array(inParam("table", string)),
        StructType(Seq(StructField("removed", IntegerType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString).pruneBloomSidecars())
      })
      // partition-spec evolution: CALL cat.system.set_partition_spec(
      //   table => 'db.t', spec => 'bucket(8, k), cell')  — '' = flat.
      // New writes take the new layout; old files stay readable; bucket
      // pruning/SPJ apply only past the change until compaction heals.
      case "set_partition_spec" => unbound(bound(
        Array(inParam("table", string), inParam("spec", string)),
        StructType(Seq(StructField("partition_spec_since", LongType, nullable = false)))) { in =>
        val t = tableOf(in.getUTF8String(0).toString)
        t.setPartitionSpec(LakehouseSource.splitTopLevel(in.getUTF8String(1).toString)
          .map(_.trim).filter(_.nonEmpty))
        Row(t.partitionSpecSince)
      })
      case "rollback" => unbound(bound(
        Array(inParam("table", string), inParam("snapshot_id", LongType)),
        StructType(Seq(StructField("new_snapshot_id", LongType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .rollbackToSnapshot(in.getLong(1)).snapshotId)
      })
      // snapshot tags: CALL cat.system.set_tag(table => 'db.t',
      //   tag => 'corpus-v1'[, snapshot_id => N])  — default = current
      // head. A tagged snapshot survives expire_snapshots until the
      // tag drops; reads resolve it via VERSION AS OF 'corpus-v1'.
      case "set_tag" => unbound(bound(
        Array(inParam("table", string), inParam("tag", string),
          inParamDefault("snapshot_id", LongType, "-1"),
          // -1 = no age: the tag lives until dropped; otherwise the
          // first expiry sweep past created+age drops the ref
          inParamDefault("max_ref_age_ms", LongType, "-1")),
        StructType(Seq(StructField("snapshot_id", LongType, nullable = false)))) { in =>
        val t = tableOf(in.getUTF8String(0).toString)
        val id = in.getLong(2) match {
          case -1L => t.currentSnapshot().getOrElse(throw new IllegalStateException(
            "cannot tag a snapshot-less table")).snapshotId
          case v => v
        }
        t.setTag(in.getUTF8String(1).toString, id,
          Some(in.getLong(3)).filter(_ >= 0))
        Row(id)
      })
      case "drop_tag" => unbound(bound(
        Array(inParam("table", string), inParam("tag", string)),
        StructType(Seq(StructField("dropped", BooleanType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .dropTag(in.getUTF8String(1).toString))
      })
      // write-audit-publish: CALL cat.system.fork_branch(table => 'db.t',
      // branch => 'audit-1'[, from_snapshot => 3]) — write to the branch
      // programmatically, audit via VERSION AS OF 'audit-1' /
      // .option("snapshotBranch", ...), then publish_branch fast-forwards
      // main onto the audited state (or drop_branch abandons it)
      case "fork_branch" => unbound(bound(
        Array(inParam("table", string), inParam("branch", string),
          inParamDefault("from_snapshot", LongType, "-1")),
        StructType(Seq(StructField("fork", LongType, nullable = false)))) { in =>
        val t = tableOf(in.getUTF8String(0).toString)
        val from = Some(in.getLong(2)).filter(_ >= 0)
        t.forkBranch(in.getUTF8String(1).toString, from)
        Row(t.branches(in.getUTF8String(1).toString).fork)
      })
      case "publish_branch" => unbound(bound(
        Array(inParam("table", string), inParam("branch", string)),
        StructType(Seq(StructField("snapshot_id", LongType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .publishBranch(in.getUTF8String(1).toString).snapshotId)
      })
      case "drop_branch" => unbound(bound(
        Array(inParam("table", string), inParam("branch", string)),
        StructType(Seq(StructField("dropped", BooleanType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .dropBranch(in.getUTF8String(1).toString))
      })
      // zero-copy snapshot clone: CALL cat.system.clone_table(
      //   table => 'db.src', dest => 'db.replica'
      //   [, tag => 'rel'][, snapshot_id => N][, deep => false]) —
      // the dest becomes a catalog table instantly (one metadata
      // commit, files by reference; `deep` copies bytes). Default pin
      // = the current head by snapshot id. The returned pin_tag names
      // the SOURCE tag protecting the referenced files from expiry
      // (the user tag, or the auto clone-pin-*); NULL for deep clones.
      case "clone_table" => unbound(bound(
        Array(inParam("table", string), inParam("dest", string),
          inParamDefault("tag", string, "''"),
          inParamDefault("snapshot_id", LongType, "-1"),
          inParamDefault("deep", BooleanType, "false")),
        StructType(Seq(StructField("snapshot_id", LongType, nullable = false),
          StructField("pin_tag", StringType)))) { in =>
        val t = tableOf(in.getUTF8String(0).toString)
        val dest = resolveNewRoot(in.getUTF8String(1).toString)
        val tag = Option(in.getUTF8String(2)).map(_.toString).filter(_.nonEmpty)
        val snapId = Some(in.getLong(3)).filter(_ >= 0)
        require(tag.isEmpty || snapId.isEmpty,
          "tag and snapshot_id are mutually exclusive clone pins")
        val deep = in.getBoolean(4)
        val c = tag match {
          case Some(tg) => t.cloneAtTag(dest, tg, deep)
          case None => t.cloneAtSnapshot(dest, snapId.getOrElse(
            t.currentSnapshot().getOrElse(throw new IllegalStateException(
              "cannot clone a snapshot-less table")).snapshotId), deep)
        }
        Row(c.currentSnapshot().get.snapshotId,
          c.cloneProvenance.flatMap(_.pinTag).orNull)
      })
      // localize a shallow clone: CALL cat.system.deepen_table(
      //   table => 'db.replica'[, all_history => true]) — copies every
      // foreign byte local and releases the auto-pin; 0 = nothing
      // foreign (already deep). all_history localizes every reachable
      // snapshot's references, so pre-deepen TIME TRAVEL keeps working
      // after the source expires.
      case "deepen_table" => unbound(bound(
        Array(inParam("table", string),
          inParamDefault("all_history", BooleanType, "false")),
        StructType(Seq(StructField("files_localized", IntegerType, nullable = false)))) { in =>
        Row(tableOf(in.getUTF8String(0).toString)
          .deepen(allHistory = in.getBoolean(1)))
      })
      case other => throw new IllegalArgumentException(
        s"unknown procedure '$other' (have: ${procedureNames.mkString(", ")})")
    }
  }
}

/** Read-only driver-side metadata table: rows computed at resolution,
  * served through [[LocalScan]] (no jobs, no files).
  */
private[lakehouse] final class LakehouseMetaTable(
    tableName: String, tableSchema: StructType, tableRows: Seq[Row])
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        private val conv = CatalystTypeConverters.createToCatalystConverter(tableSchema)
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] =
          tableRows.map(r => conv(r).asInstanceOf[InternalRow]).toArray
      }
    }
}

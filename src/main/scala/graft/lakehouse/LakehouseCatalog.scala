package graft.lakehouse

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NamespaceAlreadyExistsException, TableAlreadyExistsException}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Named-catalog face of the lakehouse — the piece that makes the
  * engine usable from a PURE SQL session (the Iceberg/Delta catalog
  * shape):
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.lakehouse.LakehouseCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft-warehouse
  *
  *   CREATE TABLE graft.db.t (id BIGINT, v STRING) PARTITIONED BY (v)
  *   INSERT INTO graft.db.t SELECT ...
  *   INSERT OVERWRITE graft.db.t SELECT ...
  *   CREATE TABLE graft.db.agg AS SELECT ...      -- CTAS
  *   SELECT * FROM graft.db.t WHERE id = 5        -- pushdown + skipping
  *   DROP TABLE graft.db.t
  * }}}
  *
  * Identifier → filesystem mapping: `<warehouse>/<ns...>/<name>` is a
  * [[LakehouseTable]] root (namespaces are directories). Table schema
  * lives where it always lives — the snapshot manifests — so a
  * path-API table is adoptable by name and vice versa; the only
  * catalog-side state is an optional `_catalog.json` recording the
  * declared partition columns, applied to every INSERT so the hive
  * layout (and partition-pruned reads) survive SQL writes.
  *
  * Reads resolve through the same pinned-snapshot [[LakehouseV2Table]]
  * as the path face: every SELECT pins the head at resolution and
  * keeps it for the query's life, and filter/projection pushdown +
  * manifest-stats skipping + COUNT(*) metadata answers all apply
  * unchanged. Reference scope: the iceberg sink's catalog/table-name
  * surface (`sinks/iceberg.py:68-101` resolves tables by name, not
  * path).
  */
final class LakehouseCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog '$name' requires spark.sql.catalog.$name.warehouse=<dir>")
    warehouse = Paths.get(w).toAbsolutePath.normalize
    // configuring the catalog opts this session into its SQL surface —
    // including the row-mutating verbs (UPDATE / MERGE / full-predicate
    // DELETE), whose planning lives in [[LakehouseDmlStrategy]]
    SparkSession.getActiveSession.foreach(LakehouseDml.install)
  }

  override def name(): String = catalogName

  /** Filesystem root of a table of THIS catalog, for the streaming
    * by-name faces (`.option("table", "cat.db.t")`) — the table must
    * already exist (streaming sources need a snapshot lineage; sink
    * targets auto-create only through CREATE TABLE or a path write).
    */
  private[lakehouse] def tableRoot(ident: Identifier): String = {
    val root = rootFor(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    root.toString
  }

  /** `<warehouse>/<ns...>/<name>`, refusing path-escape identifiers. */
  private def rootFor(ident: Identifier): Path = {
    val parts = ident.namespace.toSeq :+ ident.name
    parts.foreach(p => require(
      p.nonEmpty && !p.contains('/') && !p.contains('\\') && p != ".." && p != ".",
      s"illegal identifier segment '$p'"))
    parts.foldLeft(warehouse)(_.resolve(_))
  }

  private def isTableDir(p: Path): Boolean =
    Files.isDirectory(p.resolve("_snapshots"))

  private def metaPath(root: Path): Path = root.resolve("_catalog.json")

  private def readMetaFields(root: Path): List[JField] =
    if (!Files.exists(metaPath(root))) Nil
    else JsonMethods.parse(Files.readString(metaPath(root))) match {
      case JObject(fields) => fields
      case _ => Nil
    }

  private def writeMetaFields(root: Path, fields: List[JField]): Unit = {
    Files.writeString(metaPath(root),
      JsonMethods.compact(JsonMethods.render(JObject(fields))))
    ()
  }

  /** The free-form TBLPROPERTIES map stored under `"properties"`. */
  private def metaProps(root: Path): Map[String, String] =
    readMetaFields(root).collectFirst {
      case JField("properties", JObject(ps)) =>
        ps.collect { case JField(k, JString(v)) => k -> v }.toMap
    }.getOrElse(Map.empty)

  /** Spark-managed property names a user may not SET/UNSET. */
  private val reservedProps =
    Set("provider", "location", "external", "owner", "format")

  /** Apply SET/UNSET TBLPROPERTIES to `_catalog.json`, preserving every
    * other key. The two write knobs map onto their dedicated top-level
    * keys (the ones the write path reads), so
    * `ALTER TABLE t SET TBLPROPERTIES('optimizeWrite'='true')` takes
    * effect on the very next INSERT; everything else lands in the
    * free-form `"properties"` object.
    */
  private def updateMetaProps(root: Path,
      set: Map[String, String], unset: Seq[String]): Unit = {
    (set.keys ++ unset).foreach(k => require(!reservedProps(k.toLowerCase(java.util.Locale.ROOT)),
      s"table property '$k' is reserved"))
    // case-INSENSITIVE, like the reservedProps check — SET
    // TBLPROPERTIES('OptimizeWrite'='true') must reach the write knob,
    // not silently land in the free-form properties object
    def knobKey(k: String): Option[String] =
      k.toLowerCase(java.util.Locale.ROOT) match {
        case "optimizewrite" => Some("optimizeWrite")
        case "optimizewrite.targetbytes" => Some("optimizeWriteTargetBytes")
        case _ => None
      }
    val (knobSets, propSets) = set.partition { case (k, _) => knobKey(k).isDefined }
    val (knobUnsets, propUnsets) = unset.partition(k => knobKey(k).isDefined)
    val knobJson: Map[String, JValue] = knobSets.map { case (k, v) =>
      knobKey(k) match {
        case Some("optimizeWrite") => "optimizeWrite" -> JBool(v.trim.equalsIgnoreCase("true"))
        case Some("optimizeWriteTargetBytes") => "optimizeWriteTargetBytes" -> JLong(v.trim.toLong)
        case other => throw new IllegalStateException(s"unreachable knob $other")
      }
    }
    val droppedKnobs = knobUnsets.flatMap(knobKey).toSet
    val props = metaProps(root) ++ propSets -- propUnsets
    val others = readMetaFields(root).filterNot { case JField(k, _) =>
      k == "properties" || knobJson.contains(k) || droppedKnobs(k) }
    writeMetaFields(root,
      others ++ knobJson.map { case (k, v) => JField(k, v) } ++
        (if (props.isEmpty) Nil
         else List(JField("properties",
           JObject(props.toList.sortBy(_._1).map { case (k, v) => JField(k, JString(v)) })))))
  }

  private def spark: SparkSession = SparkSession.active

  // ---------------- tables ----------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    graft.Fs.listAll(dir)
      .filter(p => Files.isDirectory(p) && isTableDir(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean = isTableDir(rootFor(ident))

  override def loadTable(ident: Identifier): Table =
    LakehouseMeta.metaSuffixOf(ident.name) match {
      // metadata tables: SELECT * FROM cat.db.`t$snapshots` / `t$files`
      // / `t$txns` ($history = $snapshots) — driver-side manifest reads
      case Some((base, kind)) =>
        val root = rootFor(Identifier.of(ident.namespace, base))
        if (!isTableDir(root)) throw new NoSuchTableException(ident)
        LakehouseMeta.table(spark, root.toString, kind)
      case None =>
        loadPinned(ident, _.currentSnapshot().getOrElse(
          throw new NoSuchTableException(ident)))
    }

  /** SQL time travel: `SELECT * FROM graft.db.t VERSION AS OF 3`, or a
    * snapshot TAG — `VERSION AS OF 'corpus-v1'` (the reproducible
    * corpus-version pin: `CALL <cat>.system.set_tag(...)`).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    // only the NOT-FOUND shape (IllegalArgumentException from
    // snapshotOrThrow/snapshotForTag/branchHead) falls through to the
    // next namespace — an I/O or parse failure on a VALID snapshot id
    // must propagate, never silently resolve an identically-named tag
    // pointing somewhere else (ADVICE r13)
    def orNotFound(primary: => Snapshot)(fallback: => Snapshot): Snapshot =
      try primary catch { case _: IllegalArgumentException => fallback }
    loadPinned(ident, t => scala.util.Try(version.toLong).toOption match {
      // an ALL-DIGIT tag name (e.g. '20260816') parses as a Long too:
      // snapshot ids win, but when no such snapshot exists the tag
      // namespace is consulted before failing — otherwise such tags
      // would be reachable from .option("snapshotTag") yet never from
      // VERSION AS OF (ADVICE r12)
      case Some(id) =>
        orNotFound(t.snapshotOrThrow(id))(
          orNotFound(t.snapshotForTag(version))(
            orNotFound(t.branchHead(version))(
              throw new IllegalArgumentException(
                s"VERSION AS OF '$version': neither a snapshot id, a tag, " +
                  s"nor a branch of this table"))))
      case None =>
        // tags win over branches on a name collision (a tag is the
        // sharper pin); branches resolve for the AUDIT read of
        // write-audit-publish
        orNotFound(t.snapshotForTag(version))(
          orNotFound(t.branchHead(version))(
            t.snapshotForTag(version))) // re-throw the tag error (lists tags)
    })
  }

  /** SQL time travel: `... TIMESTAMP AS OF '2026-01-01 00:00:00'`.
    * Spark hands the instant in MICROseconds since epoch.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadPinned(ident, t => t.snapshotAsOf(Math.floorDiv(timestamp, 1000L)))

  private def loadPinned(ident: Identifier,
      resolve: LakehouseTable => Snapshot): Table = {
    val root = rootFor(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    val t = new LakehouseTable(spark, root.toString)
    val snap = resolve(t)
    val partitionBy =
      if (Files.exists(metaPath(root)))
        """"partitionBy"\s*:\s*\[([^\]]*)\]""".r
          .findFirstMatchIn(Files.readString(metaPath(root)))
          .map(m => LakehouseSource.splitTopLevel(m.group(1))
            .map(_.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
          .getOrElse(Nil)
      else Nil
    val optimizeWrite = Files.exists(metaPath(root)) &&
      """"optimizeWrite"\s*:\s*true""".r
        .findFirstIn(Files.readString(metaPath(root))).isDefined
    val owTarget: Option[String] =
      if (Files.exists(metaPath(root)))
        """"optimizeWriteTargetBytes"\s*:\s*([0-9]+)""".r
          .findFirstMatchIn(Files.readString(metaPath(root))).map(_.group(1))
      else None
    val opts = Map(
      "path" -> root.toString,
      // marks a CATALOG-resolved table: unlocks the SQL dynamic
      // partition overwrite capability pair (the catalog installed the
      // strategy that plans the verb)
      "graft.catalogTable" -> "true",
      // pinned at resolution — one snapshot per query, like the path face
      "snapshotId" -> snap.snapshotId.toString) ++
      (if (partitionBy.nonEmpty) Map("partitionBy" -> partitionBy.mkString(",")) else Map.empty) ++
      (if (optimizeWrite) Map("optimizeWrite" -> "true") else Map.empty) ++
      owTarget.map("optimizeWriteTargetBytes" -> _).toMap
    // the merge-evolution rule's re-load must see the STAGED schema
    // (analysis resolves star actions and casts against it); every
    // other load sees exactly the committed snapshot shape
    val base = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val schema =
      if (LakehouseDml.inMergeEvolutionRule)
        LakehouseDml.evolvedSchema(root.toString, base)
      else base
    new LakehouseV2Table(schema, opts, catalogProps = metaProps(root))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val root = rootFor(ident)
    if (isTableDir(root)) throw new TableAlreadyExistsException(ident)
    val partitionBy = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references()(0).fieldNames.mkString(".")
      // PARTITIONED BY (bucket(N, col)): high-cardinality keys get
      // co-partitioned layout (`col_bucket=` dirs) — two tables
      // bucketed the same way JOIN WITHOUT A SHUFFLE (SPJ; the Iceberg
      // bucket-transform norm). Spec string travels in _catalog.json.
      case t if t.name == "bucket" && t.references.length == 1 =>
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value.toString.toInt
        }.getOrElse(throw new UnsupportedOperationException(
          s"bucket transform needs a literal bucket count, got $t"))
        s"bucket($n,${t.references()(0).fieldNames.mkString(".")})"
      case other => throw new UnsupportedOperationException(
        s"graft catalog supports identity and bucket(N, col) PARTITIONED BY only, got $other")
    }
    partitionBy.foreach {
      case LakehouseTable.BucketSpecRe(_, c) =>
        require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"bucket column '$c' not in table schema")
      case c => require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"partition column '$c' not in table schema")
    }
    Files.createDirectories(root)
    new LakehouseTable(spark, root.toString).create(schema)
    // persisted table metadata: the declared partition layout, plus
    // TBLPROPERTIES('optimizeWrite'='true') so every later INSERT
    // clusters to one file per partition value (the property travels
    // with the table, not the writer)
    val optimizeWrite = Option(properties.get("optimizeWrite"))
      .exists(_.trim.equalsIgnoreCase("true"))
    // TBLPROPERTIES('optimizeWrite.targetBytes'='134217728'): bin each
    // clustered write to ≈target-sized files (skew-proof optimize-write)
    val owTarget = Option(properties.get("optimizeWrite.targetBytes"))
      .map(_.trim.toLong)
    // every other CREATE-time property persists verbatim (readable via
    // SHOW TBLPROPERTIES, mutable via ALTER TABLE SET/UNSET) — minus
    // the Spark-managed reserved names and per-write `option.` keys
    val userProps = properties.asScala.toMap.filter { case (k, _) =>
      !reservedProps(k.toLowerCase(java.util.Locale.ROOT)) &&
        !k.startsWith("option.") &&
        k != "optimizeWrite" && k != "optimizeWrite.targetBytes"
    }
    if (partitionBy.nonEmpty || optimizeWrite || owTarget.isDefined || userProps.nonEmpty) {
      val fields =
        (if (partitionBy.nonEmpty)
           List(JField("partitionBy", JArray(partitionBy.map(JString(_)).toList)))
         else Nil) ++
          (if (optimizeWrite) List(JField("optimizeWrite", JBool(true))) else Nil) ++
          owTarget.map(t => JField("optimizeWriteTargetBytes", JLong(t))).toList ++
          (if (userProps.isEmpty) Nil
           else List(JField("properties", JObject(
             userProps.toList.sortBy(_._1).map { case (k, v) => JField(k, JString(v)) }))))
      writeMetaFields(root, fields)
    }
    loadTable(ident)
  }

  /** `ALTER TABLE t ADD COLUMNS (...)`: the widen-only evolution
    * contract as DDL — a schema-only snapshot; existing rows read the
    * new columns as NULL. Everything else (drop/rename/retype) stays
    * unsupported by design.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootFor(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    // MERGE WITH SCHEMA EVOLUTION calls alterTable FROM THE ANALYZER —
    // committing here would make even an EXPLAIN of an evolving merge
    // alter the table (the round-12/13 documented trade). Those changes
    // STAGE instead ([[LakehouseDml.stageEvolution]]); the analyzer's
    // own re-load sees the staged shape and the merge EXEC commits the
    // DDL when it actually runs. User ALTER TABLE commits here as ever.
    if (LakehouseDml.inMergeEvolutionRule) {
      LakehouseDml.stageEvolution(root.toString, changes.toSeq)
      return loadTable(ident)
    }
    val t = new LakehouseTable(spark, root.toString)
    // ADD COLUMNS batches into one schema-only snapshot; RENAME COLUMN
    // and ALTER COLUMN TYPE (lossless widening) commit one each — all
    // metadata-only, zero data files rewritten
    val adds = changes.collect {
      case a: TableChange.AddColumn if a.fieldNames.length == 1 =>
        require(a.isNullable, s"added column '${a.fieldNames.head}' must be nullable")
        StructField(a.fieldNames.head, a.dataType, nullable = true)
    }
    changes.foreach {
      case a: TableChange.AddColumn if a.fieldNames.length > 1 =>
        throw new UnsupportedOperationException(
          s"nested column add unsupported: ${a.fieldNames.mkString(".")} " +
            "(graft catalog adds top-level nullable columns only)")
      case _: TableChange.AddColumn => () // single-name, collected above
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"RENAME COLUMN supports top-level columns only, got ${r.fieldNames.mkString(".")}")
        t.renameColumn(r.fieldNames.head, r.newName)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"ALTER COLUMN TYPE supports top-level columns only, got ${u.fieldNames.mkString(".")}")
        t.widenColumn(u.fieldNames.head, u.newDataType)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"DROP COLUMN supports top-level columns only, got ${d.fieldNames.mkString(".")}")
        t.dropColumn(d.fieldNames.head)
      case c: TableChange.UpdateColumnComment =>
        require(c.fieldNames.length == 1,
          s"ALTER COLUMN COMMENT supports top-level columns only, got ${c.fieldNames.mkString(".")}")
        t.commentColumn(c.fieldNames.head, c.newComment)
      case s: TableChange.SetProperty =>
        updateMetaProps(root, Map(s.property -> s.value), Nil)
      case r: TableChange.RemoveProperty =>
        updateMetaProps(root, Map.empty, Seq(r.property))
      case other => throw new UnsupportedOperationException(
        "graft catalog supports ALTER TABLE ADD COLUMNS (top-level, nullable), " +
          "RENAME COLUMN, DROP COLUMN, ALTER COLUMN TYPE (lossless widening), " +
          s"ALTER COLUMN COMMENT, and SET/UNSET TBLPROPERTIES only, got $other")
    }
    if (adds.nonEmpty) t.addColumns(adds)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (!isTableDir(root)) false
    else { graft.Fs.deleteRecursively(root); true }
  }

  // ---------------- functions (SPJ transform resolution) ----------------

  /** The `bucket` function, resolvable by name: Spark's
    * storage-partitioned-join machinery resolves a scan's reported
    * `bucket(N, col)` transform through the TABLE'S catalog
    * (FunctionCatalog) — without this, a bucketed layout would never
    * reach KeyGroupedPartitioning compatibility and every bucketed
    * join would shuffle. The bound function computes the exact
    * write-path hash ([[LakehouseTable.bucketId]]).
    */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def functionExists(ident: Identifier): Boolean =
    ident.name.equalsIgnoreCase("bucket")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = rootFor(oldIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    val to = rootFor(newIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
  }

  // ---------------- procedures (CALL cat.system.*) ----------------

  /** A procedure's `table` argument is 'db.t' (or 'ns1.ns2.t') under
    * THIS catalog's warehouse.
    */
  private def resolveProcTable(arg: String): String = {
    val parts = arg.split('.').map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty, s"procedure table argument '$arg' is empty")
    val ident = Identifier.of(parts.init, parts.last)
    val root = rootFor(ident)
    require(isTableDir(root), s"no lakehouse table at '$arg' in catalog $catalogName")
    root.toString
  }

  /** [[resolveProcTable]] for a table the procedure CREATES
    * (clone_table's `dest`): same name→root mapping, existence
    * REFUSED instead of required.
    */
  private def resolveNewProcTable(arg: String): String = {
    val parts = arg.split('.').map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty, s"procedure table argument '$arg' is empty")
    val root = rootFor(Identifier.of(parts.init, parts.last))
    require(!isTableDir(root),
      s"table '$arg' already exists in catalog $catalogName")
    root.toString
  }

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace: CALL $catalogName.system.${ident.name}(...)")
    LakehouseMeta.procedure(ident.name, resolveProcTable, resolveNewProcTable)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      LakehouseMeta.procedureNames.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  // ---------------- namespaces (directories) ----------------

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] =
    if (!Files.isDirectory(warehouse)) Array.empty
    else graft.Fs.listAll(warehouse)
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => Array(p.getFileName.toString)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (namespace.nonEmpty && !Files.isDirectory(dir))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    if (!Files.isDirectory(dir)) Array.empty
    else graft.Fs.listAll(dir)
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => namespace :+ p.getFileName.toString).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      Files.isDirectory(namespace.foldLeft(warehouse)(_.resolve(_)))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (Files.isDirectory(dir))
      throw new NamespaceAlreadyExistsException((catalogName +: namespace.toSeq).toArray)
    Files.createDirectories(dir)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) false
    else {
      if (!cascade) require(graft.Fs.listAll(dir).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
      graft.Fs.deleteRecursively(dir)
      true
    }
  }
}

/** The catalog-visible `bucket(numBuckets, value)` function — bound
  * per value type, producing [[LakehouseTable.bucketId]] (pmod of
  * xxhash64, seed 42) so the SQL-resolvable function, the write
  * layout, and any probe agree bit-for-bit. `canonicalName` is what
  * storage-partitioned-join compatibility compares across the two
  * sides of a join: one shared definition → equal names → equal
  * clustering.
  */
private[lakehouse] object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, value): pmod(xxhash64(value), numBuckets) — the graft layout hash"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket() takes (numBuckets INT, value), got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    new org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
      override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Integer = {
        if (input.isNullAt(1)) null
        else Integer.valueOf(
          LakehouseTable.bucketId(input.get(1, dt), dt, input.getInt(0)))
      }
    }
  }
}

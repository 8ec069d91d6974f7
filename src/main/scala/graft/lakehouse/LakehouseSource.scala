package graft.lakehouse

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, TableScan}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of the lakehouse:
  *
  * {{{
  *   spark.read.format("graft-lakehouse").load(root)                     // current snapshot
  *   spark.read.format("graft-lakehouse")
  *     .option("snapshotId", 3).load(root)                               // time travel
  * }}}
  *
  * A plain `df.filter($"id" === 5)` (or the same predicate in SQL) now
  * reaches [[LakehouseTable.pruneFiles]] automatically: Catalyst pushes
  * its translated `sources.Filter`s through
  * [[SupportsPushDownFilters]], the builder maps them onto
  * [[ScanPredicate]]s for file skipping (manifest stats + bloom
  * sidecars + partition paths), and the relation re-applies the EXACT
  * original filters on the scanned rows — strict `>` stays strict even
  * though pruning bounds are inclusive, so skipping can never change
  * an answer. [[SupportsPushDownRequiredColumns]] prunes the projected
  * columns into the underlying parquet scan.
  *
  * The scan itself adapts through [[V1Scan]] (the engine's official
  * DSv2→V1 bridge, the same shape the built-in JDBC source uses): the
  * pruned file list feeds the REAL parquet reader — vectorized,
  * whole-stage-codegen'd — instead of a hand-rolled row reader, which
  * is exactly what a 100 TB scan wants.
  *
  * Reference scope: `lakehouse/time_travel.py:25-31` — predicate-driven
  * snapshot scans as the user-facing query surface.
  */
final class LakehouseSourceProvider extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider {

  override def shortName(): String = "graft-lakehouse"

  /** `writeStream.format("graft-lakehouse")` — the exactly-once
    * streaming sink (see [[LakehouseSink]]). The engine prefers the V1
    * sink face over the DSv2 table when a provider offers both, which
    * is exactly right here: the keyed merge is a multi-job DataFrame
    * computation, not a per-partition writer.
    */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    val root = LakehouseSource.rootOf(parameters)
    val keys = parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("keys") => v }
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val appId = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("txnAppId") => v
    }.getOrElse(s"graft-lakehouse-sink:$root")
    new LakehouseSink(sqlContext, root, keys, appId, partitionColumns)
  }

  /** `df.write.format("graft-lakehouse").mode(...).save(root)` — the
    * batch write face. Append appends (or UPSERTS when a `keys` option
    * names merge columns), Overwrite replaces the table content,
    * ErrorIfExists/Ignore follow their SaveMode contracts against
    * table existence. `partitionBy` option (comma-separated) lays
    * appends out hive-style for partition-pruned reads.
    */
  override def createRelation(
      sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val root = LakehouseSource.rootOf(parameters)
    val t = new LakehouseTable(sqlContext.sparkSession, root)
    val exists = t.currentSnapshot().isDefined
    val keys = parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("keys") => v }
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val partCols = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("partitionBy") => v
    }.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"lakehouse table $root already exists")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite => t.overwrite(data)
      case _ => // Append, or first write under ErrorIfExists/default
        if (keys.nonEmpty) t.upsert(data, keys) else t.append(data, partCols)
    }
    val ctx = sqlContext
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
      override def buildScan(): org.apache.spark.rdd.RDD[Row] =
        new LakehouseTable(ctx.sparkSession, root).read().rdd
    }
  }

  /** Empty schema (not an exception) when the root has no snapshots:
    * the streaming WRITER resolves the provider through this same path
    * before falling back to the V1 sink, and a sink target is
    * typically auto-created by its first batch. Reads of a missing
    * table still fail loudly — at scan time instead of here.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = new LakehouseTable(SparkSession.active, LakehouseSource.rootOf(options.asScala.toMap))
    val snapId = LakehouseSource.snapshotIdOf(options.asScala.toMap)
    snapId.map(t.snapshotOrThrow).orElse(t.currentSnapshot()) match {
      case Some(snap) => DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      case None => new StructType()
    }
  }

  /** The snapshot id is PINNED here, at table resolution: a loaded
    * DataFrame reads one snapshot for its whole life — across actions
    * (df.count() then df.collect()), and across multiple scans inside
    * one query (a self-join) — even while writers commit concurrently.
    * Without the pin, buildScan would re-resolve the head per action
    * and a single query could silently mix two snapshots.
    */
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = properties.asScala.toMap
    val pinned = LakehouseSource.snapshotIdOf(opts) match {
      case Some(_) => opts // explicit time travel is already a pin
      case None =>
        new LakehouseTable(SparkSession.active, LakehouseSource.rootOf(opts))
          .currentSnapshot() match {
          case Some(s) => opts + ("snapshotId" -> s.snapshotId.toString)
          case None => opts // snapshot-less sink target: nothing to pin
        }
    }
    new LakehouseV2Table(schema, pinned)
  }
}

private[lakehouse] object LakehouseSource {
  def rootOf(options: Map[String, String]): String =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException(
        "graft-lakehouse requires a table root: .load(<root>) or .option(\"path\", <root>)"))

  def snapshotIdOf(options: Map[String, String]): Option[Long] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase("snapshotId") => v.toLong }

  /** (table, resolved snapshot) for an options map. */
  def snapshotFor(spark: SparkSession, options: Map[String, String]): (LakehouseTable, Snapshot) = {
    val t = new LakehouseTable(spark, rootOf(options))
    val snap = snapshotIdOf(options).map(t.snapshotOrThrow).getOrElse(
      t.currentSnapshot().getOrElse(throw new IllegalStateException(
        s"table ${rootOf(options)} has no snapshots")))
    (t, snap)
  }

  /** Exact residual for the accepted filters — the ORIGINAL predicate
    * semantics (strict bounds stay strict), never the inclusive prune
    * bounds.
    */
  def toCondition(f: Filter): Column = f match {
    case sources.EqualTo(c, v) => col(c) === lit(v)
    case sources.GreaterThan(c, v) => col(c) > lit(v)
    case sources.GreaterThanOrEqual(c, v) => col(c) >= lit(v)
    case sources.LessThan(c, v) => col(c) < lit(v)
    case sources.LessThanOrEqual(c, v) => col(c) <= lit(v)
    case sources.In(c, vs) => col(c).isin(vs.toIndexedSeq: _*)
    case sources.IsNotNull(c) => col(c).isNotNull
    case other => throw new IllegalStateException(s"accepted untranslatable filter $other")
  }

  /** Can this filter be enforced exactly by [[toCondition]]? Only such
    * filters are accepted from Catalyst; the rest are returned for the
    * engine to evaluate post-scan.
    */
  def acceptable(f: Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.GreaterThan | _: sources.GreaterThanOrEqual |
         _: sources.LessThan | _: sources.LessThanOrEqual | _: sources.In |
         _: sources.IsNotNull => true
    case _ => false
  }

  /** File pruning for the accepted filter set. Conjunctive ranges map
    * straight onto [[ScanPredicate]]s; an `In` keeps the union of its
    * per-value keep-sets (capped — a huge IN-list prunes nothing
    * rather than looping the planner).
    */
  def pruneForFilters(t: LakehouseTable, snap: Snapshot, filters: Seq[Filter]): Seq[String] = {
    val conjunctive: Seq[ScanPredicate] = filters.flatMap {
      case sources.EqualTo(c, v) => Some(ScanPredicate.EqualTo(c, v))
      case sources.GreaterThan(c, v) => Some(ScanPredicate.Range(c, Some(v), None))
      case sources.GreaterThanOrEqual(c, v) => Some(ScanPredicate.Range(c, Some(v), None))
      case sources.LessThan(c, v) => Some(ScanPredicate.Range(c, None, Some(v)))
      case sources.LessThanOrEqual(c, v) => Some(ScanPredicate.Range(c, None, Some(v)))
      case _ => None
    }
    var kept = if (conjunctive.isEmpty) snap.files else t.pruneFiles(snap, conjunctive)._1
    filters.foreach {
      case sources.In(c, vs) if vs.nonEmpty && vs.length <= 32 && !vs.contains(null) =>
        val union = vs.flatMap(v =>
          t.pruneFiles(snap, Seq(ScanPredicate.EqualTo(c, v)))._1).toSet
        kept = kept.filter(union)
      case _ => ()
    }
    kept
  }
}

private[lakehouse] final class LakehouseV2Table(
    tableSchema: StructType, options: Map[String, String]) extends Table with SupportsRead {

  override def name(): String =
    "graft_lakehouse:" + LakehouseSource.rootOf(options) +
      LakehouseSource.snapshotIdOf(options).map("@" + _).getOrElse("")

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new LakehouseScanBuilder(tableSchema, options ++ scanOptions.asScala)
}

private[lakehouse] final class LakehouseScanBuilder(
    tableSchema: StructType, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(LakehouseSource.acceptable)
    accepted = ok
    rest // the engine evaluates what the scan can't enforce
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projection (e.g. COUNT(*)) keeps one column so the inner
    // frame still has a schema; row counts stay exact either way
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(tableSchema.fields.take(1))

  override def build(): Scan = new LakehouseV1Scan(options, required, accepted)
}

/** Per-root record of the last planned scan — how specs (and humans)
  * observe that pushdown actually pruned: `filesPlanned` is the
  * post-skipping scan set, `filesTotal` the snapshot's, and
  * `columnsRead` the projected schema that reached parquet.
  */
final case class ScanInfo(
    filesPlanned: Int, filesTotal: Int, columnsRead: Seq[String], pushed: Seq[String])

object ScanEvents {
  private val Cap = 256
  private val last = new java.util.concurrent.ConcurrentHashMap[String, ScanInfo]()
  private[lakehouse] def record(root: String, info: ScanInfo): Unit = {
    // observability, not state: bound the per-root map so a long-lived
    // session scanning many ephemeral roots can't grow driver memory.
    // Evict ONE entry, not the map — clearing would wipe lastScan for
    // every active root each time an ephemeral one records
    if (last.size >= Cap && !last.containsKey(root)) {
      val it = last.keySet.iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    last.put(root, info)
  }
  def lastScan(root: String): Option[ScanInfo] = Option(last.get(root))
}

private[lakehouse] final class LakehouseV1Scan(
    options: Map[String, String], required: StructType, filters: Array[Filter])
    extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required

      override def buildScan(): RDD[Row] = {
        val spark = context.sparkSession
        val (t, snap) =
          try LakehouseSource.snapshotFor(spark, options)
          catch {
            case e: IllegalArgumentException =>
              // the isolation tradeoff surfaced: this DataFrame pinned
              // its snapshot at load, and retention has since expired
              // the manifest — the fix is a reload, not a mystery
              throw new IllegalStateException(
                s"the snapshot this DataFrame pinned at load time no longer exists " +
                  s"(snapshot retention likely expired it) — re-run spark.read.load " +
                  s"to pin the current snapshot. Cause: ${e.getMessage}", e)
          }
        val files = LakehouseSource.pruneForFilters(t, snap, filters.toSeq)
        val base = t.scanFiles(snap, files)
        val cond = filters.map(LakehouseSource.toCondition)
          .reduceOption(_ && _).getOrElse(lit(true))
        val df = base.filter(cond).select(required.fieldNames.map(col).toIndexedSeq: _*)
        ScanEvents.record(LakehouseSource.rootOf(options), ScanInfo(
          filesPlanned = files.size,
          filesTotal = snap.files.size,
          columnsRead = required.fieldNames.toSeq,
          pushed = filters.map(_.toString).toSeq))
        df.rdd
      }
    }.asInstanceOf[T]
}

package graft.lakehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Key-tombstone mask data for the NATIVE merge-on-read scan
  * ([[LakehouseBatchScan]]): one entry per distinct tombstone KEY SET,
  * holding every masked key tuple (canonicalized) with the max origin
  * snapshot of a tombstone carrying it. A data row in a file with
  * origin `o` is masked iff its key tuple maps to an origin `> o` —
  * exactly the anti-join-with-origin-sequencing semantics the V1
  * composing path evaluates ([[LakehouseTable.applyTombstones]]),
  * folded into a hash probe the partition readers run per row.
  *
  * Scale shape: tombstones are CDC-batch-sized (each MoR apply writes
  * its batch's keys), so the mask is the same data volume the V1 path
  * broadcast per anti-join — built once at plan time, shipped once as
  * a Spark broadcast, and gone after compaction folds the tombstones.
  * This is what keeps a busy replication target on the vectorized
  * reader + runtime file pruning + SPJ BETWEEN compactions, instead of
  * dropping to the composing path exactly when the table is hot.
  */
final case class MorMaskData(
    keyNames: Seq[String],
    keyTypes: Seq[DataType],
    /** canonicalized key tuple → newest tombstone origin masking it */
    byKey: Map[List[Any], Long],
    maxOrigin: Long) extends Serializable

/** Per-partition mask spec: where the key columns sit in the reader's
  * output row (the group's widened (data ++ partition) schema) and the
  * broadcast mask to probe.
  */
final case class MorMaskSpec(
    bc: org.apache.spark.broadcast.Broadcast[MorMaskData],
    ordinals: Array[Int],
    types: Array[DataType]) extends Serializable

object LakehouseMor {

  /** Test observability (local-mode exact, cluster-mode per-executor):
    * batches that flowed through the masked columnar reader untouched
    * vs batches that paid the survivor copy.
    */
  val batchesPassedThrough = new java.util.concurrent.atomic.AtomicLong
  val batchesCopied = new java.util.concurrent.atomic.AtomicLong

  /** Canonical equality representation for a key value, applied
    * IDENTICALLY to tombstone rows (driver, at mask build) and data
    * rows (executor, per probe) — both read through
    * `InternalRow.get(i, dt)`, so strings arrive as UTF8String and
    * date/timestamp as their int/long encodings. Integral widths fold
    * to Long so a (future) type-widened lineage still matches.
    */
  def canon(dt: DataType, v: Any): Any = dt match {
    case StringType => v.toString
    case ByteType => v.asInstanceOf[Byte].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case IntegerType | DateType => v.asInstanceOf[Int].toLong
    case LongType | TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    // Float folds to Double so a float→double-widened lineage still
    // matches: tombstones written pre-widening decode as Float while
    // data rows probe at the declared (Double) width — without the
    // fold the native scan would stop masking and resurrect deletes.
    case FloatType => v.asInstanceOf[Float].toDouble
    case DoubleType | BooleanType => v
    // decimal normalizes scale-insensitively (stripTrailingZeros): the
    // tombstone dir's physical (precision, scale) and the declared
    // type agree today, but equality must not hinge on it — financial
    // CDC keys are routinely DECIMAL and must keep the native scan
    case _: DecimalType =>
      val jbd = v.asInstanceOf[Decimal].toJavaBigDecimal.stripTrailingZeros
      // BigDecimal("0E-7").stripTrailingZeros keeps its scale pre-Java-8
      // semantics for zero on some paths — pin zero to ONE image
      if (jbd.signum == 0) java.math.BigDecimal.ZERO else jbd
    case other => throw new IllegalStateException(
      s"unsupported MoR mask key type $other (typesSupported must gate this)")
  }

  /** External-typed probe value for a canon'd key. The manifest prune
    * path ([[ScanPredicate.InSet]]) feeds probes through
    * `Literal()`/`Cast` for bloom hashing — a raw canon Long for a DATE
    * key would be an impossible cast there and could wrongly DROP an
    * affected file (resurrecting deleted rows). De-canon restores the
    * exact external type: int/long/string keys (the CDC norm) keep
    * full stats+bloom pruning; date/timestamp/boolean/decimal keys
    * merely prune less — never wrongly. (Decimal canon is already a
    * java BigDecimal, which Literal()/lit() take directly.)
    */
  def decanon(dt: DataType, v: Any): Any = dt match {
    case FloatType => v.asInstanceOf[Double].toFloat
    case ByteType => v.asInstanceOf[Long].toByte
    case ShortType => v.asInstanceOf[Long].toShort
    case IntegerType => v.asInstanceOf[Long].toInt
    case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Long])
    case TimestampType =>
      val us = v.asInstanceOf[Long]
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
    case TimestampNTZType =>
      val us = v.asInstanceOf[Long]
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case _ => v
  }

  private def typeOk(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | DateType | LongType |
         TimestampType | TimestampNTZType | FloatType | DoubleType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Can every tombstone key set of `snap` drive the native hash-probe
    * mask? Schema-only check (one footer read per tombstone dir, plan
    * time, no jobs); binary/nested keys — whose internal
    * representations don't hash-canonicalize safely — send the scan to
    * the V1 composing path instead.
    */
  def typesSupported(spark: SparkSession, t: LakehouseTable, snap: Snapshot): Boolean =
    snap.tombstones.groupBy(dirOf).values.forall { fs =>
      // footer read on the driver — `spark.read.parquet(..).schema` ran
      // a schema-inference JOB per dir per plan. Hive partition path
      // columns (absent from the footer) infer as int/string — always
      // mask-canon-safe, so footer fields alone decide.
      t.footerSchemaOf(fs.head) match {
        case Some(sch) => sch.fields.forall(f => typeOk(f.dataType))
        case None =>
          try spark.read.parquet(t.absDataPath(fs.head)).schema.fields
            .forall(f => typeOk(f.dataType))
          catch { case _: Exception => false }
      }
    }

  private def dirOf(relFile: String): String = LakehouseTable.claimDirOf(relFile)

  /** Mask-build LRU: a snapshot's tombstone set is IMMUTABLE once
    * committed (tombstone paths carry per-write nonces, so a dropped-
    * and-recreated table at the same root can never alias an entry),
    * yet every scan PLANNING of a MoR snapshot was re-reading the key
    * parquet — several Spark jobs per plan, paid again for every action
    * a serve/gate runs over the same snapshot. Bounded access-ordered
    * LRU of the built masks (driver metadata, batch-sized — the same
    * volume a broadcast ships); 64 entries matches the staged-evolution
    * LRU discipline in [[LakehouseDml]].
    */
  private val maskCache = new java.util.LinkedHashMap[
      (String, Long, Seq[String]), Seq[MorMaskData]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, Long, Seq[String]), Seq[MorMaskData]]): Boolean =
      size() > 64
  }

  /** Build the masks: per tombstone dir group, read the key parquet and
    * fold tuples into `byKey` at that dir's origin; dirs sharing one
    * key set merge max-origin-wins. Null-key tuples drop (SQL equality:
    * a null key masks nothing). Driver-side collect of batch-sized key
    * sets — the same volume the V1 anti-join broadcasts.
    */
  def build(spark: SparkSession, t: LakehouseTable, snap: Snapshot): Seq[MorMaskData] = {
    val key = (t.rootAbsPath, snap.snapshotId, snap.tombstones)
    maskCache.synchronized(Option(maskCache.get(key))) match {
      case Some(hit) => hit
      case None =>
        val built = buildUncached(spark, t, snap)
        maskCache.synchronized(maskCache.put(key, built))
        built
    }
  }

  private def buildUncached(spark: SparkSession, t: LakehouseTable,
      snap: Snapshot): Seq[MorMaskData] = {
    val declared = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      .fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
    val perDir = snap.tombstones.groupBy(dirOf).toSeq.sortBy(_._1).map { case (_, fs) =>
      val origin = t.originOfFile(fs.head)
      // files within one claim dir come from ONE write (one schema), so
      // first-footer inference is exact; the old mergeSchema=true paid a
      // distributed footer-merge job per dir for nothing
      val df = spark.read.parquet(fs.map(t.absDataPath): _*)
      val names = df.columns.sorted.toSeq
      (names, names.map(n => df.schema(n).dataType), origin,
        df.select(names.map(col): _*))
    }
    perDir.groupBy(_._1).toSeq.sortBy(_._1.mkString(",")).map { case (names, group) =>
      // recorded key types are the DECLARED (widest) ones: canon folds
      // integral widths to Long, so a tombstone written before a type
      // widening still matches data read at the wide type — each dir's
      // rows decode with the dir's OWN physical types below
      val types = names.map(n =>
        declared.getOrElse(n.toLowerCase(java.util.Locale.ROOT), group.head._2(names.indexOf(n))))
      val acc = scala.collection.mutable.HashMap.empty[List[Any], Long]
      group.foreach { case (_, ts, origin, df) =>
        // .copy() is load-bearing: the scan REUSES its UnsafeRow per
        // partition, so uncopied rows would all alias the LAST one —
        // every tombstone key but one would vanish. collect() (not
        // toLocalIterator, which submits one job PER PARTITION) drains
        // the batch-sized key set in a single job.
        df.queryExecution.toRdd.map(_.copy()).collect().foreach { row =>
          var i = 0
          var ok = true
          val vals = new Array[Any](types.length)
          while (i < types.length && ok) {
            // decode with the dir's OWN physical type (ts), canon folds
            // widths so pre-widening tombstones match wide data rows
            if (row.isNullAt(i)) ok = false
            else { vals(i) = canon(ts(i), row.get(i, ts(i))); i += 1 }
          }
          if (ok) {
            val key = vals.toList
            val prev = acc.getOrElse(key, Long.MinValue)
            if (origin > prev) acc(key) = origin
          }
        }
      }
      MorMaskData(names, types, acc.toMap,
        group.map(_._3).max)
    }.filter(_.byKey.nonEmpty)
  }

  /** Is `row` (the reader's widened output row) masked given its file's
    * origin snapshot? True iff ANY mask holds its full non-null key
    * tuple at a strictly newer origin.
    */
  def masked(row: org.apache.spark.sql.catalyst.InternalRow,
      masks: Array[MorMaskSpec], origin: Long): Boolean = {
    var m = 0
    while (m < masks.length) {
      val sp = masks(m)
      val data = sp.bc.value
      if (data.maxOrigin > origin) {
        val n = sp.ordinals.length
        val vals = new Array[Any](n)
        var i = 0
        var ok = true
        while (i < n && ok) {
          val ord = sp.ordinals(i)
          if (row.isNullAt(ord)) ok = false
          else { vals(i) = canon(sp.types(i), row.get(ord, sp.types(i))); i += 1 }
        }
        if (ok) data.byKey.get(vals.toList) match {
          case Some(to) if to > origin => return true
          case _ => ()
        }
      }
      m += 1
    }
    false
  }
}

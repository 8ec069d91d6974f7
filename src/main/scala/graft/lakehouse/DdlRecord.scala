package graft.lakehouse

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** One schema-history DDL record — the wire format of the change feed's
  * `_change = 'schema'` side channel (the Debezium schema-history-topic
  * shape; reference scope `sources/debezium/config.py:88-92`). Emitted
  * by [[LakehouseTable.schemaChangesBetween]], applied by
  * [[LakehouseTable.applySchemaChange]], ordered by the sink on `seq`,
  * and inspected by [[ChangeFeedSource]]'s mid-stream-ADD guard.
  *
  * ONE versioned codec replaces the former four regex emit/parse sites:
  * real JSON in both directions, so column names containing quotes or
  * backslashes round-trip instead of desyncing the channel, and a new
  * record field (e.g. `spec`) lands in exactly one place.
  *
  * `v` is the record format version (currently 1). Records live only
  * in-flight — re-derived per batch from manifests, never persisted —
  * so a reader newer than a writer is the only compat direction that
  * matters: parse REFUSES versions above [[DdlRecord.V]] loudly instead
  * of guessing at fields it doesn't know.
  *
  * Ops: `rename(from,to)` | `widen(column,tpe)` | `add(column,tpe)` |
  * `drop(column)` | `set_spec(spec)`. Types travel as `catalogString`
  * (parse with `DataType.fromDDL`); `spec` is the declared partition
  * layout (identity columns and `bucket(N, col)` transforms).
  *
  * `fieldId` (round 13, FIELD_IDS.md step 3) makes the channel
  * IDENTITY-keyed: rename/widen/drop records carry the column's
  * immutable field id, `add` records the id the source allocated. A
  * replica whose name resolution fails (it missed an earlier rename)
  * re-derives the target column BY ID and self-heals instead of
  * refusing — see [[LakehouseTable.applySchemaChange]]. Additive and
  * optional, so the format version stays 1: old readers ignore it,
  * old records parse with None.
  */
final case class DdlRecord(
    v: Int,
    seq: Int,
    op: String,
    from: Option[String] = None,
    to: Option[String] = None,
    column: Option[String] = None,
    `type`: Option[String] = None,
    spec: Option[Seq[String]] = None,
    fieldId: Option[Int] = None) {
  def json: String = DdlRecord.encode(this)
}

object DdlRecord {
  /** Current record format version. */
  val V = 1

  private implicit val fmts: Formats = DefaultFormats

  def rename(seq: Int, from: String, to: String,
      fieldId: Option[Int] = None): DdlRecord =
    DdlRecord(V, seq, "rename", from = Some(from), to = Some(to),
      fieldId = fieldId)
  def widen(seq: Int, column: String, tpe: String,
      fieldId: Option[Int] = None): DdlRecord =
    DdlRecord(V, seq, "widen", column = Some(column), `type` = Some(tpe),
      fieldId = fieldId)
  def add(seq: Int, column: String, tpe: String,
      fieldId: Option[Int] = None): DdlRecord =
    DdlRecord(V, seq, "add", column = Some(column), `type` = Some(tpe),
      fieldId = fieldId)
  def drop(seq: Int, column: String, fieldId: Option[Int] = None): DdlRecord =
    DdlRecord(V, seq, "drop", column = Some(column), fieldId = fieldId)
  def setSpec(seq: Int, spec: Seq[String]): DdlRecord =
    DdlRecord(V, seq, "set_spec", spec = Some(spec))

  /** Render as JSON (names escaped properly — `Serialization.write`
    * omits None fields, keeping records minimal on the wire).
    */
  def encode(r: DdlRecord): String = Serialization.write(r)

  /** Parse one record; malformed JSON, a missing op, or a version above
    * [[V]] fail loudly — a desynced channel must never half-apply.
    * Field-lenient (manual extraction, not case-class reflection): a
    * record without `v` reads as version 1, and unknown future fields
    * of a same-version writer are ignored.
    */
  def parse(json: String): DdlRecord = {
    val jv =
      try JsonMethods.parse(json)
      catch {
        case e: Exception =>
          throw new IllegalStateException(s"unparseable schema change: $json", e)
      }
    def str(k: String): Option[String] = jv \ k match {
      case JString(s) => Some(s)
      case _ => None
    }
    def num(k: String, default: Int): Int = jv \ k match {
      case JInt(n) => n.toInt
      case JLong(n) => n.toInt
      case _ => default
    }
    val ver = num("v", 1)
    if (ver > V)
      throw new IllegalStateException(
        s"schema-change record version $ver is newer than this reader " +
          s"(max $V): upgrade the consumer — record: $json")
    val op = str("op").filter(_.nonEmpty).getOrElse(
      throw new IllegalStateException(s"schema change record has no op: $json"))
    val spec = jv \ "spec" match {
      case JArray(xs) => Some(xs.collect { case JString(s) => s })
      case _ => None
    }
    val fid = jv \ "fieldId" match {
      case JInt(n) => Some(n.toInt)
      case JLong(n) => Some(n.toInt)
      case _ => None
    }
    DdlRecord(ver, num("seq", 0), op,
      from = str("from"), to = str("to"), column = str("column"),
      `type` = str("type"), spec = spec, fieldId = fid)
  }

  /** The record's `seq`, or 0 when unparseable (the sink's sort key —
    * ordering garbage first keeps the loud failure in applySchemaChange,
    * where the message names the record).
    */
  def seqOf(json: String): Long =
    try JsonMethods.parse(json) \ "seq" match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => 0L
    } catch { case _: Exception => 0L }
}

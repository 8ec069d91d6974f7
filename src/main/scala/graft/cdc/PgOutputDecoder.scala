package graft.cdc

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Stateful decoder for the PostgreSQL `pgoutput` logical-replication
  * binary wire format (public protocol:
  * https://www.postgresql.org/docs/current/protocol-logicalrep-message-formats.html).
  *
  * Behavior contract pinned by the reference implementation
  * (`src/cdc_platform/sources/wal/decoder.py:50-239`, tests
  * `tests/unit/test_wal_decoder.py`):
  *  - 'B' (Begin: finalLsn u64 + commitTs i64 µs-since-PG-epoch + xid u32)
  *    caches LSN + timestamp for subsequent changes; emits nothing.
  *  - 'C' (Commit) and unknown message types emit nothing.
  *  - 'R' (Relation) caches {relId → (schema, table, columns)}.
  *  - 'I'/'U'/'D' emit exactly one [[WalChange]], resolving column names
  *    through the relation cache.
  *  - Update: optional old tuple behind 'K' (key) / 'O' (old) marker,
  *    then 'N' + new tuple. Delete: 'K'|'O' + old tuple only.
  *  - TupleData column markers: 'n' → NULL, 'u' (unchanged TOAST) → NULL,
  *    't' → length-prefixed UTF-8 text, anything else → NULL.
  *  - Columns beyond the cached relation width are named `col_<i>`.
  *  - PG epoch = 2000-01-01T00:00:00Z; change timestamp = epoch + µs.
  *
  * Pure Scala, no Spark dependency — wrap with [[PgOutputDecoder.decodeAll]]
  * inside `mapPartitions` for distributed decode (one decoder per stream
  * partition; pgoutput guarantees R precedes I/U/D on the same connection,
  * so per-partition replay order preserves cache validity).
  */
final class PgOutputDecoder {
  import PgOutputDecoder._

  private val relations = scala.collection.mutable.Map.empty[Long, RelationInfo]
  private var currentLsn: Long = 0L
  private var currentTimestamp: Timestamp = new Timestamp(PgEpochMillis)

  /** Current transaction LSN (set by the last Begin message). */
  def lsn: Long = currentLsn

  /** Relation cache snapshot (for tests / monitors). */
  def relationCache: Map[Long, RelationInfo] = relations.toMap

  /** Decode one pgoutput message into zero-or-more changes. */
  def decode(data: Array[Byte]): Seq[WalChange] = {
    if (data == null || data.isEmpty) return Nil
    val buf = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
    (buf.get(): @annotation.switch) match {
      case 'B' => decodeBegin(buf); Nil
      case 'C' => Nil
      case 'R' => decodeRelation(buf); Nil
      case 'I' => decodeInsert(buf) :: Nil
      case 'U' => decodeUpdate(buf) :: Nil
      case 'D' => decodeDelete(buf) :: Nil
      case _   => Nil
    }
  }

  /** Decode a whole ordered message stream. */
  def decodeAll(messages: Iterator[Array[Byte]]): Iterator[WalChange] =
    messages.flatMap(decode)

  private def decodeBegin(buf: ByteBuffer): Unit = {
    currentLsn = buf.getLong() // final LSN (u64; values fit in Long here)
    val tsMicros = buf.getLong() // commit timestamp, µs since PG epoch
    currentTimestamp = new Timestamp(PgEpochMillis + tsMicros / 1000L)
    currentTimestamp.setNanos(((tsMicros % 1000000L) * 1000L).toInt)
    // xid (u32) not consumed — not part of the change contract
  }

  private def decodeRelation(buf: ByteBuffer): Unit = {
    val relId = buf.getInt().toLong & 0xffffffffL
    val namespace = readCString(buf)
    val table = readCString(buf)
    buf.get() // replica identity
    val nCols = buf.getShort().toInt & 0xffff
    val cols = IndexedSeq.newBuilder[(String, Int)]
    var i = 0
    while (i < nCols) {
      buf.get() // per-column flags
      val name = readCString(buf)
      val typeOid = buf.getInt()
      buf.getInt() // type modifier
      cols += ((name, typeOid))
      i += 1
    }
    relations(relId) = RelationInfo(namespace, table, cols.result())
  }

  private def decodeInsert(buf: ByteBuffer): WalChange = {
    val rel = relations(buf.getInt().toLong & 0xffffffffL)
    buf.get() // 'N' marker
    val row = decodeTupleData(buf, rel.columns)
    WalChange("insert", rel.schema, rel.table, None, Some(row), currentLsn, currentTimestamp)
  }

  private def decodeUpdate(buf: ByteBuffer): WalChange = {
    val rel = relations(buf.getInt().toLong & 0xffffffffL)
    val marker = buf.get().toChar
    val before =
      if (marker == 'K' || marker == 'O') {
        val b = decodeTupleData(buf, rel.columns)
        buf.get() // 'N' marker for the new tuple
        Some(b)
      } else None // marker was 'N'
    val after = decodeTupleData(buf, rel.columns)
    WalChange("update", rel.schema, rel.table, before, Some(after), currentLsn, currentTimestamp)
  }

  private def decodeDelete(buf: ByteBuffer): WalChange = {
    val rel = relations(buf.getInt().toLong & 0xffffffffL)
    buf.get() // 'K' | 'O' marker
    val before = decodeTupleData(buf, rel.columns)
    WalChange("delete", rel.schema, rel.table, Some(before), None, currentLsn, currentTimestamp)
  }

  private def decodeTupleData(
      buf: ByteBuffer,
      columns: IndexedSeq[(String, Int)]): Map[String, Option[String]] = {
    val nCols = buf.getShort().toInt & 0xffff
    val row = Map.newBuilder[String, Option[String]]
    var i = 0
    while (i < nCols) {
      val colName = if (i < columns.length) columns(i)._1 else s"col_$i"
      (buf.get().toChar: @annotation.switch) match {
        case 'n' => row += colName -> None // NULL
        case 'u' => row += colName -> None // unchanged TOAST
        case 't' =>
          val len = buf.getInt()
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          row += colName -> Some(new String(bytes, StandardCharsets.UTF_8))
        case _ => row += colName -> None
      }
      i += 1
    }
    row.result()
  }

  private def readCString(buf: ByteBuffer): String = {
    val start = buf.position()
    while (buf.get() != 0) {}
    val end = buf.position() - 1 // position of the NUL
    val bytes = new Array[Byte](end - start)
    val save = buf.position()
    buf.position(start)
    buf.get(bytes)
    buf.position(save)
    new String(bytes, StandardCharsets.UTF_8)
  }
}

object PgOutputDecoder {
  /** 2000-01-01T00:00:00Z in epoch millis. */
  val PgEpochMillis: Long = 946684800000L
}

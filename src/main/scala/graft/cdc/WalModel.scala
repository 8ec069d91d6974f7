package graft.cdc

import java.sql.Timestamp

/** CDC data model (SURVEY.md §1.1).
  *
  * Mirrors the reference envelope shapes (behavior, not code):
  *  - `SourceEvent`: universal CDC event — reference
  *    `src/cdc_platform/sources/base.py:13-26`.
  *  - `WalChange`: decoded logical-replication change — reference
  *    `src/cdc_platform/sources/wal/decoder.py:28-38`. `before`/`after`
  *    are Map[String,String] with NULLs dropped into `nullCols` because
  *    pgoutput delivers every value as text and Spark maps cannot hold
  *    null values distinguishably from absent keys.
  */
final case class SourceEvent(
    key: Option[String],
    value: Option[String],
    topic: String,
    partition: Int,
    offset: Long)

final case class WalChange(
    operation: String, // "insert" | "update" | "delete"
    schema: String,
    table: String,
    before: Option[Map[String, Option[String]]],
    after: Option[Map[String, Option[String]]],
    lsn: Long,
    timestamp: Timestamp)

/** Cached relation metadata from a pgoutput Relation ('R') message —
  * reference `sources/wal/decoder.py:41-47`.
  */
final case class RelationInfo(
    schema: String,
    table: String,
    columns: IndexedSeq[(String, Int)]) // (name, type OID)

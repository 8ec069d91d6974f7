package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lakehouse.LakehouseTable

/** JDBC-table-shaped sink (SURVEY.md §2.1 S11): each event lands as the
  * reference's 5-tuple row
  * `(event_key, event_value, source_topic, source_partition,
  * source_offset)` (`sinks/postgres.py:101-107,136-139`), with the
  * optional `ON CONFLICT (source_topic, source_partition, source_offset)
  * DO UPDATE` idempotent-upsert semantics (`sinks/postgres.py:141-146`)
  * re-expressed as a keyed lakehouse upsert — replays of the same
  * micro-batch overwrite instead of duplicating, which is what makes
  * at-least-once redelivery exactly-once in effect (§2.9 T8).
  *
  * In production the same DataFrame goes to `df.write.jdbc` + a MERGE;
  * the emulation keeps the row shape and conflict-key semantics
  * testable without a database in the container.
  */
final class PostgresLikeSink(
    val sinkId: String,
    table: LakehouseTable,
    upsertOnConflict: Boolean = true) extends Sink {

  override def write(batch: DataFrame, batchId: Long): Unit = {
    val rows = batch.select(
      col("key").as("event_key"),
      col("after").as("event_value"),
      col("topic").as("source_topic"),
      col("partition").cast("long").as("source_partition"),
      col("offset").as("source_offset"))
    if (rows.isEmpty) return
    if (upsertOnConflict)
      table.upsert(rows, Seq("source_topic", "source_partition", "source_offset"))
    else table.append(rows)
  }
}

package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lakehouse.LakehouseTable

/** Liveness heartbeat (SURVEY.md §2.9 T12): the reference upserts a row
  * into a `heartbeat` table every 10 s (`sources/debezium/config.py:
  * 59-64`). Spark-native form: a rate-source stream on a
  * ProcessingTime trigger upserting ONE row (fixed key) with the latest
  * beat timestamp — table stays one row regardless of uptime.
  */
object Heartbeat {
  def start(
      spark: SparkSession,
      table: LakehouseTable,
      interval: String = "10 seconds",
      checkpointDir: String): StreamingQuery = {
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val beat = batch.sparkSession.range(1).select(
            lit(0L).as("id"),
            current_timestamp().as("last_heartbeat"),
            lit(batchId).as("beat_batch"))
          table.upsert(beat, Seq("id"))
        }
        () // foreachBatch wants Unit, upsert returns a Snapshot
      }
      .start()
  }
}

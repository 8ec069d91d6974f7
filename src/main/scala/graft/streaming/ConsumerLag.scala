package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** File-transport consumer-lag metrics — the reference's consumer-group
  * lag poller re-expressed for the envelope store
  * (`observability/metrics.py:14-100`, `pipeline/runner.py:408-415`):
  * per (topic, partition), the high watermark is the max offset present
  * in the store, the current offset is the pipeline's min-watermark
  * committed offset, and lag is their distance. Like the reference's
  * isolated-group watermark consumer, the probe never touches the
  * pipeline's own stream — it is an independent batch scan.
  */
object ConsumerLag {

  final case class PartitionLag(
      topic: String,
      partition: Int,
      currentOffset: Long,
      highWatermark: Long,
      lag: Long)

  /** Lag rows sorted by (topic, partition). `committed` is the
    * max-committed map ([[CommitLedger.committedSoFar]]); partitions
    * with nothing committed report from -1 (lag = message count).
    */
  def compute(spark: SparkSession, sourceDir: String,
      committed: Map[(String, Int), Long],
      includeTopics: Seq[String] = Nil): Seq[PartitionLag] = {
    val all = spark.read.schema(ChangeEnvelope.schema).json(sourceDir)
      .filter(!col("topic").endsWith(".dlq"))
    val scoped =
      if (includeTopics.isEmpty) all
      else all.filter(col("topic").isin(includeTopics: _*))
    scoped.groupBy(col("topic"), col("partition"))
      .agg(max(col("offset")).as("hw"))
      .collect().map { r =>
        val topic = r.getString(0)
        val part = r.getInt(1)
        val hw = r.getLong(2)
        val cur = committed.getOrElse((topic, part), -1L)
        PartitionLag(topic, part, cur, hw, hw - cur)
      }.sortBy(p => (p.topic, p.partition)).toSeq
  }
}

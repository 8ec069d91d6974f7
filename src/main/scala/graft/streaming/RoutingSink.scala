package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lakehouse.LakehouseTable

/** Per-table routing sink (SURVEY.md §1.1 "Topic" row: per-table routing
  * = one table per topic): each micro-batch is split by topic and each
  * slice lands in that topic's own lakehouse table (auto-created on
  * first sight with the inferred payload schema — the reference's
  * topic-auto-create + iceberg auto-create composed). Routing happens
  * once per distinct topic per batch, not per row; each slice write is
  * a partition-pruned filter over the cached batch.
  */
final class RoutingSink(
    val sinkId: String,
    warehouseRoot: String,
    spark: org.apache.spark.sql.SparkSession,
    upsertKeys: Seq[String] = Nil) extends Sink {

  private val tables = TrieMap.empty[String, (LakehouseTable, LakehouseSink)]

  /** The lakehouse table backing `topic` (for reads/tests). */
  def tableFor(topic: String): LakehouseTable =
    tables.getOrElseUpdate(topic, newRoute(topic))._1

  private def newRoute(topic: String): (LakehouseTable, LakehouseSink) = {
    val table = new LakehouseTable(spark, s"$warehouseRoot/$topic")
    (table, new LakehouseSink(s"$sinkId/$topic", table, upsertKeys))
  }

  override def write(batch: DataFrame, batchId: Long): Unit = {
    val topics = batch.select(col("topic")).distinct()
      .collect().map(_.getString(0))
    topics.foreach { topic =>
      val (_, sink) = tables.getOrElseUpdate(topic, newRoute(topic))
      sink.write(batch.filter(col("topic") === topic), batchId)
    }
  }
}

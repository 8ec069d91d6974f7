package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Progress/lag monitor (SURVEY.md §2.9 T11) — the Spark-native form of
  * the reference's consumer-lag poller (`observability/metrics.py:
  * 23-143`): a StreamingQueryListener aggregating per-query input rate,
  * processing rate and batch durations, exposed as a health snapshot
  * with the same overall/component shape as `Pipeline.health()`
  * (`pipeline/runner.py:390-416`).
  */
final class PipelineMonitor extends StreamingQueryListener {

  final case class QueryHealth(
      name: String,
      batches: Long,
      inputRows: Long,
      lastInputRowsPerSec: Double,
      lastProcessedRowsPerSec: Double,
      lastBatchDurationMs: Long,
      active: Boolean)

  private val state = mutable.Map.empty[java.util.UUID, QueryHealth]

  override def onQueryStarted(event: QueryStartedEvent): Unit = synchronized {
    state(event.id) = QueryHealth(
      Option(event.name).getOrElse(event.id.toString), 0, 0, 0, 0, 0, active = true)
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    val prev = state.getOrElse(p.id,
      QueryHealth(Option(p.name).getOrElse(p.id.toString), 0, 0, 0, 0, 0, active = true))
    state(p.id) = prev.copy(
      batches = prev.batches + 1,
      inputRows = prev.inputRows + p.numInputRows,
      lastInputRowsPerSec = p.inputRowsPerSecond,
      lastProcessedRowsPerSec = p.processedRowsPerSecond,
      lastBatchDurationMs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = synchronized {
    state.get(event.id).foreach(h => state(event.id) = h.copy(active = false))
  }

  /** Health snapshot: overall status + per-query components (shape
    * mirrors the reference `{status, components: {...}}`).
    */
  def health(): Map[String, Any] = synchronized {
    val comps = state.values.map(h => h.name -> Map(
      "status" -> (if (h.active) "running" else "stopped"),
      "batches" -> h.batches,
      "input_rows" -> h.inputRows,
      "last_input_rows_per_sec" -> h.lastInputRowsPerSec,
      "last_processed_rows_per_sec" -> h.lastProcessedRowsPerSec,
      "last_batch_duration_ms" -> h.lastBatchDurationMs)).toMap
    val overall =
      if (state.isEmpty) "idle"
      else if (state.values.exists(_.active)) "running" else "stopped"
    Map("status" -> overall, "components" -> comps)
  }

  def register(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
  def unregister(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retry policy: exponential backoff with cap and jitter, re-expressing
  * the reference policy (`sinks/webhook.py:80-91`, `config/models.py:
  * 217-224`: initial delay doubled per attempt, capped, ± jitter).
  * Deterministic-jitter variant (hash of attempt) so tests are stable.
  */
final case class RetryPolicy(
    maxAttempts: Int = 3,
    initialDelayMs: Long = 100,
    maxDelayMs: Long = 60000,
    jitterFraction: Double = 0.1) {

  def delayFor(attempt: Int): Long = {
    val base = math.min(initialDelayMs * (1L << math.min(attempt, 20)), maxDelayMs)
    val jitter = ((attempt * 2654435761L) % 1000) / 1000.0 * jitterFraction * base
    (base + jitter).toLong
  }

  /** Run `op` with retries; rethrows the last failure. */
  def run[T](op: () => T): T = {
    var attempt = 0
    while (true) {
      try return op()
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          Thread.sleep(delayFor(attempt - 1))
      }
    }
    sys.error("unreachable")
  }
}

/** Webhook sink: one HTTP POST per event with the reference's payload
  * shape `{key, value, metadata: {topic, partition, offset}}`
  * (`sinks/webhook.py:68-76`), per-event (unbuffered) semantics, retry
  * with exponential backoff + jitter. POSTs run on the EXECUTORS via
  * foreachPartition — the driver never sees event payloads, so the
  * operator scales horizontally with partitions (each task holds one
  * HttpClient, reference's connection-per-sink model).
  */
final class WebhookSink(
    val sinkId: String,
    url: String,
    retry: RetryPolicy = RetryPolicy(),
    timeout: Duration = Duration.ofSeconds(10)) extends Sink with Serializable {

  override def write(batch: DataFrame, batchId: Long): Unit = {
    val targetUrl = url
    val policy = retry
    val tmo = timeout
    batch.select(
        to_json(struct(
          col("key"), col("after").as("value"),
          struct(col("topic"), col("partition"), col("offset")).as("metadata")))
          .as("payload"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val client = HttpClient.newBuilder().connectTimeout(tmo).build()
        rows.foreach { r =>
          val req = HttpRequest.newBuilder(URI.create(targetUrl))
            .timeout(tmo)
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(r.getString(0)))
            .build()
          policy.run { () =>
            val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
            if (resp.statusCode() >= 400)
              throw new RuntimeException(s"webhook HTTP ${resp.statusCode()}")
            resp
          }
        }
      }
  }
}

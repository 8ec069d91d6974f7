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

/** Webhook sink: one HTTP request per event with the reference's payload
  * shape `{key, value, metadata: {topic, partition, offset}}`
  * (`sinks/webhook.py:68-76`), per-event (unbuffered) semantics, retry
  * with exponential backoff + jitter. Requests run on the EXECUTORS via
  * foreachPartition — the driver never sees event payloads, so the
  * operator scales horizontally with partitions (each task holds one
  * HttpClient, reference's connection-per-sink model).
  *
  * Auth + shaping follow `sinks/webhook.py:45-51` / `config/models.py:
  * 238-243`: configured `headers` are sent on every request,
  * `authToken` adds `Authorization: Bearer <token>`, and `method`
  * (default POST) selects the HTTP verb.
  */
final class WebhookSink(
    val sinkId: String,
    url: String,
    retry: RetryPolicy = RetryPolicy(),
    timeout: Duration = Duration.ofSeconds(10),
    method: String = "POST",
    headers: Map[String, String] = Map.empty,
    authToken: Option[String] = None) extends Sink with Serializable {

  override def write(batch: DataFrame, batchId: Long): Unit = {
    val targetUrl = url
    val policy = retry
    val tmo = timeout
    val verb = method.toUpperCase
    // auth header resolved once; Content-Type is overridable by config
    val allHeaders: Seq[(String, String)] =
      (Map("Content-Type" -> "application/json") ++ headers ++
        authToken.map(t => "Authorization" -> s"Bearer $t")).toSeq
    batch.select(
        to_json(struct(
          col("key"), col("after").as("value"),
          struct(col("topic"), col("partition"), col("offset")).as("metadata")))
          .as("payload"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val client = HttpClient.newBuilder().connectTimeout(tmo).build()
        rows.foreach { r =>
          val b = HttpRequest.newBuilder(URI.create(targetUrl))
            .timeout(tmo)
            .method(verb, HttpRequest.BodyPublishers.ofString(r.getString(0)))
          allHeaders.foreach { case (k, v) => b.header(k, v) }
          val req = b.build()
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

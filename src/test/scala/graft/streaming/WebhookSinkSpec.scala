package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec
import graft.lakehouse.LakehouseTable

/** Webhook delivery semantics (`sinks/webhook.py` behavior): per-event
  * POST with {key, value, metadata} payload, retry-with-backoff on
  * failure, failed-after-retries batches land in the DLQ. Pipeline E2E
  * via a local JDK HttpServer (mirrors `test_pipeline_e2e.py:29`).
  */
class WebhookSinkSpec extends SparkSpec {
  import java.nio.file.{Files, Paths}

  private def startServer(failFirst: Int = 0): (HttpServer, ConcurrentLinkedQueue[String], AtomicInteger) =
    startCapturingServer(failFirst) match {
      case (s, bodies, _, calls) => (s, bodies, calls)
    }

  /** Like [[startServer]] but also records `METHOD header1=v1 ...` per
    * request, for the auth/custom-header/verb assertions.
    */
  private def startCapturingServer(failFirst: Int = 0)
      : (HttpServer, ConcurrentLinkedQueue[String], ConcurrentLinkedQueue[String], AtomicInteger) = {
    val received = new ConcurrentLinkedQueue[String]()
    val meta = new ConcurrentLinkedQueue[String]()
    val calls = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      val n = calls.incrementAndGet()
      if (n <= failFirst) {
        exchange.sendResponseHeaders(503, -1)
      } else {
        received.add(body)
        val h = exchange.getRequestHeaders
        meta.add(exchange.getRequestMethod + " " +
          Seq("Authorization", "X-Custom", "Content-Type")
            .flatMap(k => Option(h.getFirst(k)).map(v => s"$k=$v")).mkString(" "))
        exchange.sendResponseHeaders(200, 0)
      }
      exchange.close()
    })
    server.start()
    (server, received, meta, calls)
  }

  private def envelopes(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "b.json"), Seq(
      """{"topic":"t","partition":0,"offset":0,"op":"c","ts_ms":1,"key":"{\"id\":1}","before":null,"after":"{\"id\":1}"}""",
      """{"topic":"t","partition":0,"offset":1,"op":"c","ts_ms":2,"key":"{\"id\":2}","before":null,"after":"{\"id\":2}"}"""
    ).mkString("\n"))
  }

  test("delivers one POST per event with the reference payload shape") {
    val (server, received, _) = startServer()
    try {
      val port = server.getAddress.getPort
      val src = tmpDir("wh-src"); envelopes(src)
      val pipe = new ChangePipeline(spark, src,
        Seq(new WebhookSink("wh", s"http://127.0.0.1:$port/hook")),
        new DlqWriter(new LakehouseTable(spark, tmpDir("wh-dlq"))), tmpDir("wh-ckpt"))
      pipe.start().awaitTermination(60000)

      assert(received.size === 2)
      val bodies = received.toArray.map(_.toString).sorted
      assert(bodies.head.contains(""""metadata":{"topic":"t","partition":0,"offset":0}"""))
      assert(bodies.head.contains(""""key":"{\"id\":1}""""))
      assert(pipe.ledger.committedSoFar === Map(("t", 0) -> 1L))
    } finally server.stop(0)
  }

  test("transient failures retried with backoff; delivery still succeeds") {
    val (server, received, calls) = startServer(failFirst = 2)
    try {
      val port = server.getAddress.getPort
      val src = tmpDir("wh2-src"); envelopes(src)
      val pipe = new ChangePipeline(spark, src,
        Seq(new WebhookSink("wh", s"http://127.0.0.1:$port/hook",
          RetryPolicy(maxAttempts = 5, initialDelayMs = 10))),
        new DlqWriter(new LakehouseTable(spark, tmpDir("wh2-dlq"))), tmpDir("wh2-ckpt"))
      pipe.start().awaitTermination(60000)
      assert(received.size === 2)
      assert(calls.get() >= 4) // 2 failures + 2 successes at minimum
    } finally server.stop(0)
  }

  test("permanent failure exhausts retries and routes the batch to the DLQ") {
    val (server, _, _) = startServer(failFirst = Int.MaxValue)
    try {
      val port = server.getAddress.getPort
      val src = tmpDir("wh3-src"); envelopes(src)
      val dlqTable = new LakehouseTable(spark, tmpDir("wh3-dlq"))
      val pipe = new ChangePipeline(spark, src,
        Seq(new WebhookSink("wh", s"http://127.0.0.1:$port/hook",
          RetryPolicy(maxAttempts = 2, initialDelayMs = 1))),
        new DlqWriter(dlqTable), tmpDir("wh3-ckpt"))
      pipe.start().awaitTermination(60000)
      assert(dlqTable.read().count() === 2) // both events captured
      assert(pipe.ledger.committedSoFar === Map.empty) // commit suppressed
    } finally server.stop(0)
  }

  test("sends configured headers, bearer auth token, and HTTP method " +
      "(sinks/webhook.py:45-51, config/models.py:238-243)") {
    val (server, received, meta, _) = startCapturingServer()
    try {
      val port = server.getAddress.getPort
      val src = tmpDir("wh4-src"); envelopes(src)
      val pipe = new ChangePipeline(spark, src,
        Seq(new WebhookSink("wh", s"http://127.0.0.1:$port/hook",
          method = "PUT",
          headers = Map("X-Custom" -> "graft", "Content-Type" -> "application/cdc+json"),
          authToken = Some("s3cr3t"))),
        new DlqWriter(new LakehouseTable(spark, tmpDir("wh4-dlq"))), tmpDir("wh4-ckpt"))
      pipe.start().awaitTermination(60000)
      assert(received.size === 2)
      meta.forEach { m =>
        assert(m.startsWith("PUT "), s"configured method must be used: $m")
        assert(m.contains("Authorization=Bearer s3cr3t"), m)
        assert(m.contains("X-Custom=graft"), m)
        // configured Content-Type overrides the sink default
        assert(m.contains("Content-Type=application/cdc+json"), m)
      }
    } finally server.stop(0)
  }

  test("retry policy: exponential growth with cap") {
    val p = RetryPolicy(maxAttempts = 10, initialDelayMs = 100, maxDelayMs = 1000, jitterFraction = 0.0)
    assert(p.delayFor(0) === 100)
    assert(p.delayFor(1) === 200)
    assert(p.delayFor(2) === 400)
    assert(p.delayFor(5) === 1000) // capped
    assert(p.delayFor(9) === 1000)
  }
}

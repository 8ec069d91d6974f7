package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer

/** HTTP health endpoint (SURVEY.md §3.1 step 2: the reference starts a
  * health server next to the pipeline, `pipeline/runner.py:97-103`,
  * snapshot shape `:390-416`): GET /health returns the monitor's
  * {status, components} snapshot as JSON, 200 while running / 503 once
  * everything stopped.
  */
final class HealthServer(monitor: PipelineMonitor, port: Int = 0,
    platformCheck: Option[() => PlatformHealth.Report] = None,
    lagCheck: Option[() => Seq[ConsumerLag.PartitionLag]] = None) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // without an executor every context shares the single dispatcher
  // thread — a slow /health/lag store scan would stall the /health
  // liveness probe into timeout; daemon threads so the server never
  // pins the JVM
  private val pool = java.util.concurrent.Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "health-server"); t.setDaemon(true); t
  }
  server.setExecutor(pool)

  private def respond(exchange: com.sun.net.httpserver.HttpExchange,
      code: Int, payload: Any): Unit = {
    val body = toJson(payload).getBytes(StandardCharsets.UTF_8)
    exchange.getResponseHeaders.add("Content-Type", "application/json")
    exchange.sendResponseHeaders(code, body.length)
    exchange.getResponseBody.write(body)
    exchange.close()
  }

  /** The /health verdict: (status code, snapshot). Shared by /readyz so
    * the two can't drift; readiness additionally gates on the platform
    * probes.
    */
  private def healthVerdict(): (Int, Map[String, Any]) = {
    val health = monitor.health()
    (if (health("status") == "stopped") 503 else 200, health)
  }

  server.createContext("/health", { exchange =>
    val (code, health) = healthVerdict()
    respond(exchange, code, health)
  })

  // k8s-style probe pair (`observability/http_health.py:62-83`):
  // liveness is unconditional — the process answering IS the signal;
  // readiness runs the health checks and 503s on any erroring component
  server.createContext("/healthz", { exchange =>
    respond(exchange, 200, Map("status" -> "ok"))
  })

  server.createContext("/readyz", { exchange =>
    val (code, health) = healthVerdict()
    val platformBad = platformCheck.exists(c => !c().healthy)
    respond(exchange, if (platformBad) 503 else code, health)
  })

  // platform component probes (`observability/health.py:131-153` shape,
  // served like the reference's http_health endpoint): healthy iff every
  // component is healthy; otherwise 503 with the per-component detail
  platformCheck.foreach { check =>
    server.createContext("/health/platform", { exchange =>
      val report = check()
      val payload: Map[String, Any] = Map(
        "status" -> (if (report.healthy) "healthy" else "unhealthy"),
        "components" -> report.components.map(c =>
          c.name -> Map("status" -> c.status.value, "detail" -> c.detail)).toMap)
      respond(exchange, if (report.healthy) 200 else 503, payload)
    })
  }

  // per-partition consumer lag (`pipeline/runner.py:408-415` block,
  // `observability/metrics.py` shape): always 200 — lag is data, not a
  // probe verdict
  lagCheck.foreach { check =>
    server.createContext("/health/lag", { exchange =>
      val payload: Map[String, Any] = Map(
        "consumer_lag" -> check().map(l => s"${l.topic}-${l.partition}" -> Map(
          "current_offset" -> l.currentOffset,
          "high_watermark" -> l.highWatermark,
          "lag" -> l.lag)).toMap)
      respond(exchange, 200, payload)
    })
  }

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def toJson(v: Any): String = v match {
    case m: Map[_, _] =>
      m.map { case (k, x) => toJson(k.toString) + ":" + toJson(x) }
        .mkString("{", ",", "}")
    // full string escape incl. control chars: probe details can carry a
    // multi-line exception toString — a raw \n would make the whole
    // health payload invalid JSON
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case null => "null"
    case other => other.toString // numbers / booleans
  }
}

package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** /health endpoint over the live monitor (runner.py health contract). */
class HealthServerSpec extends SparkSpec {

  test("GET /health reflects pipeline state as JSON") {
    val mon = new PipelineMonitor().register(spark)
    val srv = new HealthServer(mon)
    val port = srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val get = (u: String) => client.send(
        HttpRequest.newBuilder(URI.create(u)).GET().build(),
        HttpResponse.BodyHandlers.ofString())

      // idle: 200 with status idle
      val idle = get(s"http://127.0.0.1:$port/health")
      assert(idle.statusCode() === 200)
      assert(idle.body().contains("\"status\":\"idle\""))

      // run a query → component appears with row counts
      val dir = tmpDir("hs-src")
      Files.writeString(Paths.get(dir, "a.json"), """{"v":1}""")
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
        .json(dir)
        .writeStream.format("noop").queryName("hs-query")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val deadline = System.currentTimeMillis() + 10000
      var body = ""
      while (System.currentTimeMillis() < deadline && !body.contains("hs-query")) {
        body = get(s"http://127.0.0.1:$port/health").body()
        Thread.sleep(200)
      }
      assert(body.contains("\"hs-query\""))
      assert(body.contains("\"input_rows\":1"))
    } finally {
      srv.stop()
      mon.unregister(spark)
    }
  }

  test("probe pair: /healthz is unconditional liveness; /readyz gates on component health") {
    // reference shape: http_health.py:62-83 — /healthz always 200,
    // /readyz 503 while any component errors
    val mon = new PipelineMonitor()
    val bad = new java.util.concurrent.atomic.AtomicBoolean(false)
    val srv = new HealthServer(mon,
      platformCheck = Some(() => PlatformHealth.Report(Seq(
        PlatformHealth.ComponentHealth("stub",
          if (bad.get) PlatformHealth.Unhealthy else PlatformHealth.Healthy)))))
    val port = srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val get = (p: String) => client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$p")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val live = get("/healthz")
      assert(live.statusCode() === 200 && live.body() === """{"status":"ok"}""")
      assert(get("/readyz").statusCode() === 200)
      bad.set(true)
      assert(get("/readyz").statusCode() === 503,
        "an erroring platform component must fail readiness")
      assert(get("/healthz").statusCode() === 200,
        "liveness must stay green while readiness is red")
    } finally srv.stop()
  }

  test("platform probes aggregate: one failing component turns the report unhealthy") {
    import PlatformHealth._
    val good = tmpDir("ph-ok")
    val cfg = graft.config.PipelineConfigLoader.parse(
      s"""pipeline_id: ph
         |source:
         |  database: appdb
         |  tables: ["public.users"]
         |source_dir: $good
         |checkpoint_dir: ${tmpDir("ph-chk")}
         |sinks:
         |  - sink_id: lh
         |    sink_type: lakehouse
         |    lakehouse:
         |      table_path: ${tmpDir("ph-lh")}
         |""".stripMargin)

    // all probes green
    val ok = checkPlatform(cfg)
    assert(ok.healthy)
    assert(ok.summary === Map("source-dir" -> "healthy",
      "checkpoint-dir" -> "healthy",
      s"lakehouse:${cfg.sinks.head.lakehouse.get.tablePath}" -> "healthy"))

    // a missing source dir (read probe — never auto-created) flips the
    // aggregate while the other components stay healthy
    val broken = checkPlatform(cfg.copy(sourceDir = s"$good/definitely-missing"))
    assert(!broken.healthy)
    assert(broken.summary("source-dir") === "unhealthy")
    assert(broken.summary("checkpoint-dir") === "healthy")

    // unreachable registry is a component too
    val withDeadRegistry = checkPlatform(cfg.copy(
      registry = Some(graft.config.RegistryCfg("http://127.0.0.1:1"))))
    assert(!withDeadRegistry.healthy)
    assert(withDeadRegistry.summary("schema-registry") === "unhealthy")
  }

  test("GET /health/platform serves the aggregate with 503 when unhealthy") {
    val mon = new PipelineMonitor().register(spark)
    val cfgDir = tmpDir("php-src")
    val state = new java.util.concurrent.atomic.AtomicBoolean(true)
    val srv = new HealthServer(mon, platformCheck = Some(() =>
      PlatformHealth.Report(Seq(PlatformHealth.ComponentHealth("probe",
        if (state.get) PlatformHealth.Healthy else PlatformHealth.Unhealthy,
        cfgDir)))))
    val port = srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val get = () => client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/health/platform")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val healthy = get()
      assert(healthy.statusCode() === 200)
      assert(healthy.body().contains("\"status\":\"healthy\""))
      state.set(false)
      val unhealthy = get()
      assert(unhealthy.statusCode() === 503)
      assert(unhealthy.body().contains("\"status\":\"unhealthy\""))
      assert(unhealthy.body().contains("\"probe\""))
    } finally {
      srv.stop()
      mon.unregister(spark)
    }
  }

  test("control characters in a probe detail still produce valid JSON") {
    val mon = new PipelineMonitor().register(spark)
    // a multi-line exception toString is exactly what PlatformHealth's
    // catch-all puts into detail
    val srv = new HealthServer(mon, platformCheck = Some(() =>
      PlatformHealth.Report(Seq(PlatformHealth.ComponentHealth("probe",
        PlatformHealth.Unhealthy,
        "java.io.IOException: boom\n\tat x.y(Z.scala:1)\r\n")))))
    val port = srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val resp = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/health/platform")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 503)
      // must parse as JSON (json4s is strict about raw control chars)
      val parsed = org.json4s.jackson.JsonMethods.parse(resp.body())
      val detail = (parsed \\ "probe").values.toString
      assert(detail.contains("boom"))
      assert(resp.body().contains("\\n\\tat"), resp.body())
    } finally {
      srv.stop()
      mon.unregister(spark)
    }
  }
}

package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.PipelineConfigLoader
import graft.lakehouse.LakehouseTable

/** e2e: a pipeline booted purely from a YAML config lands rows in two
  * sinks, honors the capture include-list, and advances the commit
  * ledger (the reference's `cdc run pipeline.yaml` path end-to-end).
  */
class PipelineRunnerSpec extends SparkSpec {

  private def writeEvents(dir: String): Unit = {
    def ev(topic: String, p: Int, off: Int, id: Int): String =
      s"""{"topic":"$topic","partition":$p,"offset":$off,"op":"c","ts_ms":$id,"key":"{\\"id\\":$id}","before":null,"after":"{\\"id\\":$id,\\"name\\":\\"u$id\\"}"}"""
    val included = (0 until 20).map(i => ev("cdc.public.users", i % 2, i / 2, i))
    val excluded = (0 until 5).map(i => ev("cdc.public.other", 0, i, 100 + i))
    Files.writeString(Paths.get(dir, "events.json"),
      (included ++ excluded).mkString("\n"))
  }

  test("YAML-configured pipeline: two sinks, include-list filter, ledger commits") {
    val src = tmpDir("cfg-src")
    val lhPath = tmpDir("cfg-lh")
    val dlqPath = tmpDir("cfg-dlq")
    writeEvents(src)

    val yaml =
      s"""pipeline_id: cfg_e2e
         |source:
         |  database: appdb
         |  tables: ["public.users"]
         |source_dir: $src
         |checkpoint_dir: ${tmpDir("cfg-chk")}
         |dlq:
         |  table_path: $dlqPath
         |sinks:
         |  - sink_id: lh
         |    sink_type: lakehouse
         |    lakehouse:
         |      table_path: $lhPath
         |  - sink_id: pg
         |    sink_type: postgres
         |    postgres:
         |      target_table: public.users_sink
         |""".stripMargin
    val yamlPath = Paths.get(tmpDir("cfg-yaml"), "pipeline.yaml")
    Files.writeString(yamlPath, yaml)

    val cfg = PipelineConfigLoader.load(yamlPath.toString)
    val pipe = PipelineRunner.build(spark, cfg)
    pipe.start().awaitTermination(120000)

    // lakehouse sink: only the include-listed topic's 20 events landed
    val lh = new LakehouseTable(spark, lhPath).read()
    assert(lh.count() === 20)
    assert(lh.select("_cdc_topic").distinct().collect().map(_.getString(0)).toSeq
      === Seq("cdc.public.users"))

    // ledger: both partitions committed at max offset + 1 (next-to-fetch)
    assert(pipe.ledger.committedSoFar === Map(
      ("cdc.public.users", 0) -> 9L, ("cdc.public.users", 1) -> 9L))

    // DLQ stayed empty (no sink failures)
    assert(new LakehouseTable(spark, dlqPath).listSnapshots().isEmpty)
  }

  test("registry-configured runner: incompatible schema change stops the streaming query") {
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}
    import com.sun.net.httpserver.HttpServer

    val version = new AtomicReference[Int](1)
    val compatible = new AtomicBoolean(true)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/subjects/", { ex =>
      val body =
        s"""{"version":${version.get},"id":1,"schema":"{\\"v\\":${version.get}}"}"""
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    server.createContext("/compatibility/", { ex =>
      val b = s"""{"is_compatible":${compatible.get}}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val src = tmpDir("reg-src")
      writeEvents(src)
      val yaml =
        s"""pipeline_id: reg_e2e
           |source:
           |  database: appdb
           |  tables: ["public.users"]
           |source_dir: $src
           |checkpoint_dir: ${tmpDir("reg-chk")}
           |registry:
           |  url: http://127.0.0.1:${server.getAddress.getPort}
           |  stop_on_incompatible: true
           |  interval_ms: 100
           |sinks:
           |  - sink_id: lh
           |    sink_type: lakehouse
           |    lakehouse:
           |      table_path: ${tmpDir("reg-lh")}
           |""".stripMargin
      val cfg = PipelineConfigLoader.parse(yaml)
      val running = PipelineRunner.start(spark, cfg,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      try {
        assert(running.monitor.isDefined)
        // query runs continuously until the registry turns incompatible
        assert(!running.query.awaitTermination(1500))
        version.set(2); compatible.set(false)
        assert(running.query.awaitTermination(30000),
          "incompatible schema change must stop the streaming query")
        assert(running.monitor.get.incompatibleDetected)
      } finally running.stop()
    } finally server.stop(0)
  }

  test("start() cleans up after a partial failure: occupied health port stops the query") {
    // regression: when the health server failed to bind AFTER the
    // streaming query started, start() threw without stopping anything —
    // the query kept running detached, holding the checkpoint lock
    val blocker = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    try {
      val src = tmpDir("pf-src")
      writeEvents(src)
      val yaml =
        s"""pipeline_id: pf_e2e
           |source:
           |  database: appdb
           |  tables: ["public.users"]
           |source_dir: $src
           |checkpoint_dir: ${tmpDir("pf-chk")}
           |sinks:
           |  - sink_id: lh
           |    sink_type: lakehouse
           |    lakehouse:
           |      table_path: ${tmpDir("pf-lh")}
           |""".stripMargin
      val cfg = PipelineConfigLoader.parse(yaml)
      val before = spark.streams.active.map(_.id).toSet
      intercept[java.net.BindException] {
        PipelineRunner.start(spark, cfg,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
          platform = Some(graft.config.PlatformCfg(
            healthPort = blocker.getLocalPort)))
      }
      assert(spark.streams.active.map(_.id).toSet === before,
        "a failed start() must not leave its streaming query running")
    } finally blocker.close()
  }

  test("maintenance-enabled lakehouse sink gets a scheduler on the SAME table") {
    val src = tmpDir("m-src")
    val lhPath = tmpDir("m-lh")
    writeEvents(src)
    val yaml =
      s"""pipeline_id: maint_e2e
         |source:
         |  database: appdb
         |  tables: ["public.users"]
         |source_dir: $src
         |checkpoint_dir: ${tmpDir("m-chk")}
         |sinks:
         |  - sink_id: lh
         |    sink_type: lakehouse
         |    lakehouse:
         |      table_path: $lhPath
         |      maintenance:
         |        enabled: true
         |        compact_file_threshold: 1
         |        compact_max_rows: 1000000
         |""".stripMargin
    val cfg = graft.config.PipelineConfigLoader.parse(yaml)
    val built = PipelineRunner.buildAll(spark, cfg)
    assert(built.maintenance.size === 1)
    built.pipeline.start().awaitTermination(120000)
    // a compaction pass through the scheduler compacts the sink's table
    // in place — proof they share the instance (and its write lock)
    assert(built.maintenance.head.runCompaction().isDefined)
    val table = new LakehouseTable(spark, lhPath)
    assert(table.currentSnapshot().get.operation === "compact")
    assert(table.read().count() === 20)
  }
}

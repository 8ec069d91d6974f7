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

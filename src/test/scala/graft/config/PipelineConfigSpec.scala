package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopicNaming

/** Loader semantics pinned to the reference (`config/loader.py`,
  * `config/models.py`, `config/defaults.py`): env interpolation,
  * defaults deep-merge, qualified-name validation, sink sub-config
  * matching, extra-key rejection.
  */
class PipelineConfigSpec extends AnyFunSuite {

  private val minimal =
    """pipeline_id: p1
      |source:
      |  database: appdb
      |  tables: ["public.users"]
      |source_dir: /tmp/src
      |checkpoint_dir: /tmp/chk
      |sinks:
      |  - sink_id: lh
      |    sink_type: lakehouse
      |    lakehouse:
      |      table_path: /tmp/lh
      |""".stripMargin

  test("minimal config parses with defaults merged in") {
    val cfg = PipelineConfigLoader.parse(minimal)
    assert(cfg.pipelineId === "p1")
    assert(cfg.topicPrefix === "cdc") // from defaults
    assert(cfg.maxFilesPerTrigger === 10) // from defaults
    assert(cfg.source.sourceType === TopicNaming.Postgres)
    assert(cfg.source.slotName === "cdc_slot")
    assert(cfg.dlq.enabled && cfg.dlq.topicSuffix === "dlq")
    assert(cfg.includeTopics === Seq("cdc.public.users"))
  }

  test("webhook sub-config parses method/headers/timeout/auth_token " +
      "(config/models.py:238-243) with POST/empty defaults") {
    val yaml =
      """pipeline_id: p1
        |source: { database: appdb }
        |source_dir: /tmp/src
        |checkpoint_dir: /tmp/chk
        |sinks:
        |  - sink_id: wh
        |    sink_type: webhook
        |    webhook:
        |      url: https://example.com/hook
        |      method: put
        |      timeout_seconds: 2.5
        |      auth_token: ${HOOK_TOKEN}
        |      headers:
        |        X-Custom: graft
        |        Content-Type: application/cdc+json
        |""".stripMargin
    val w = PipelineConfigLoader.parse(yaml,
      env = Map("HOOK_TOKEN" -> "s3cr3t")).sinks.head.webhook.get
    assert(w.url === "https://example.com/hook")
    assert(w.method === "put") // verb normalized at send time, not parse
    assert(w.timeoutSeconds === 2.5)
    assert(w.authToken === Some("s3cr3t"))
    assert(w.headers === Map("X-Custom" -> "graft",
      "Content-Type" -> "application/cdc+json"))
    // defaults when omitted
    val d = PipelineConfigLoader.parse(
      yaml.linesIterator.takeWhile(!_.trim.startsWith("method:")).mkString("\n"))
      .sinks.head.webhook.get
    assert(d.method === "POST" && d.headers === Map.empty &&
      d.timeoutSeconds === 30.0 && d.authToken === None)
  }

  test("dlq knobs parse with the reference defaults (config/models.py:207-214)") {
    val cfg = PipelineConfigLoader.parse(minimal)
    assert(cfg.dlq.maxRetries === 3)
    assert(cfg.dlq.includeHeaders)
    assert(cfg.dlq.flushIntervalSeconds === 0.0)
    val tuned = PipelineConfigLoader.parse(minimal +
      """dlq:
        |  topic_suffix: deadletters
        |  max_retries: 0
        |  include_headers: false
        |  flush_interval_seconds: 1.5
        |""".stripMargin)
    assert(tuned.dlq.topicSuffix === "deadletters")
    assert(tuned.dlq.maxRetries === 0)
    assert(!tuned.dlq.includeHeaders)
    assert(tuned.dlq.flushIntervalSeconds === 1.5)
  }

  test("env interpolation resolves ${VAR} and ${VAR:-default}") {
    val cfg = PipelineConfigLoader.parse(
      minimal.replace("appdb", "${DB_NAME:-fallback}")
        .replace("/tmp/src", "${SRC_DIR}"),
      env = Map("SRC_DIR" -> "/data/in"))
    assert(cfg.source.database === "fallback")
    assert(cfg.sourceDir === "/data/in")
  }

  test("unqualified table names are rejected (P2 validation)") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfigLoader.parse(minimal.replace("public.users", "users"))
    }
    assert(e.getMessage.contains("must be schema- or db-qualified"))
  }

  test("ms-valued maintenance knobs accept Longs beyond 2^31 without wrapping") {
    val cfg = PipelineConfigLoader.parse(minimal.replace(
      "      table_path: /tmp/lh\n",
      """      table_path: /tmp/lh
        |      maintenance:
        |        enabled: true
        |        expire_older_than_ms: 2592000000
        |""".stripMargin))
    // 30-day retention; an int-narrowed read would wrap negative and
    // turn the retention window into "expire every snapshot"
    assert(cfg.sinks.head.lakehouse.get.maintenance.expireOlderThanMs === 2592000000L)
  }

  test("int-typed knobs reject out-of-32-bit values instead of truncating") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfigLoader.parse(
        minimal.replace("source_dir: /tmp/src",
          "source_dir: /tmp/src\nmax_files_per_trigger: 8589934592"))
    }
    assert(e.getMessage.contains("out of 32-bit range"))
  }

  test("registry block parses with defaults") {
    val cfg = PipelineConfigLoader.parse(minimal +
      "registry:\n  url: http://localhost:8081\n")
    assert(cfg.registry === Some(RegistryCfg("http://localhost:8081",
      stopOnIncompatible = true, intervalMs = 30000L)))
    assert(PipelineConfigLoader.parse(minimal).registry.isEmpty)
  }

  test("unknown top-level keys are rejected (extra=forbid)") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfigLoader.parse(minimal + "mystery_knob: 7\n")
    }
    assert(e.getMessage.contains("unknown keys: mystery_knob"))
  }

  test("sink_type demands its matching sub-config") {
    val bad =
      """pipeline_id: p1
        |source: { database: appdb }
        |source_dir: /tmp/src
        |checkpoint_dir: /tmp/chk
        |sinks:
        |  - sink_id: w1
        |    sink_type: webhook
        |""".stripMargin
    val e = intercept[IllegalArgumentException](PipelineConfigLoader.parse(bad))
    assert(e.getMessage.contains("webhook config is required"))
  }

  test("postgres target_table must be schema-qualified") {
    val bad =
      """pipeline_id: p1
        |source: { database: appdb }
        |source_dir: /tmp/src
        |checkpoint_dir: /tmp/chk
        |sinks:
        |  - sink_id: pg
        |    sink_type: postgres
        |    postgres: { target_table: nodots }
        |""".stripMargin
    val e = intercept[IllegalArgumentException](PipelineConfigLoader.parse(bad))
    assert(e.getMessage.contains("must be schema-qualified"))
  }

  test("duplicate sink ids are rejected") {
    val dup = minimal +
      """  - sink_id: lh
        |    sink_type: lakehouse
        |    lakehouse: { table_path: /tmp/lh2 }
        |""".stripMargin
    val e = intercept[IllegalArgumentException](PipelineConfigLoader.parse(dup))
    assert(e.getMessage.contains("duplicate sink_id"))
  }

  test("sql server include-list maps to 4-part topics") {
    val cfg = PipelineConfigLoader.parse(
      minimal.replace("database: appdb", "database: cdc_demo\n  source_type: sqlserver")
        .replace("public.users", "dbo.customers"))
    assert(cfg.includeTopics === Seq("cdc.cdc_demo.dbo.customers"))
  }

  test("lakehouse maintenance block parses with defaults") {
    val cfg = PipelineConfigLoader.parse(
      minimal + "      maintenance:\n        enabled: true\n        compact_file_threshold: 3\n")
    val m = cfg.sinks.head.lakehouse.get.maintenance
    assert(m.enabled && m.compactFileThreshold === 3)
    assert(m.expireOlderThanMs === 86400000L) // sibling default intact
    // default when the block is absent: disabled
    assert(!PipelineConfigLoader.parse(minimal)
      .sinks.head.lakehouse.get.maintenance.enabled)
  }

  test("maintenance zorder_cols parses; defaults to plain compaction") {
    val cfg = PipelineConfigLoader.parse(
      minimal + "      maintenance:\n        enabled: true\n        zorder_cols: [user_id, ts]\n")
    assert(cfg.sinks.head.lakehouse.get.maintenance.zorderCols === Seq("user_id", "ts"))
    assert(PipelineConfigLoader.parse(
      minimal + "      maintenance:\n        enabled: true\n")
      .sinks.head.lakehouse.get.maintenance.zorderCols === Nil)
  }

  test("deep-merge: nested override keeps sibling defaults") {
    val cfg = PipelineConfigLoader.parse(
      minimal.replace("database: appdb", "database: appdb\n  slot_name: custom_slot"))
    assert(cfg.source.slotName === "custom_slot")
    assert(cfg.source.publicationName === "cdc_publication") // sibling default intact
  }
}

package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Platform-config loader semantics pinned to the reference
  * (`config/models.py:341-383` + `defaults/platform.yaml`): defaults
  * without a file, transport-requirement validation, Kafka auth
  * requirements, and the JVM client-properties projection.
  */
class PlatformConfigSpec extends AnyFunSuite {

  test("no file -> built-in defaults (the reference's optional platform YAML)") {
    val p = PlatformConfigLoader.load(None)
    assert(p.transportMode === "kafka")
    assert(p.kafka.get.bootstrapServers === "localhost:9092")
    assert(p.connector.get.connectUrl === "http://localhost:8083")
    assert(p.dlq.enabled && p.dlq.maxRetries === 3)
    assert(p.retry.maxAttempts === 5 && p.retry.initialDelayMs === 1000L)
    assert(p.healthPort === 8080 && p.healthEnabled)
  }

  test("overrides merge over defaults; seconds-based retry converts to ms") {
    val p = PlatformConfigLoader.parse(
      """transport_mode: kafka
        |kafka:
        |  bootstrap_servers: broker:9092
        |  session_timeout_ms: 30000
        |retry:
        |  initial_wait_seconds: 2.5
        |  max_wait_seconds: 10
        |health_port: 9999
        |""".stripMargin)
    assert(p.kafka.get.bootstrapServers === "broker:9092")
    assert(p.kafka.get.sessionTimeoutMs === 30000)
    assert(p.kafka.get.groupId === "cdc-platform") // sibling default kept
    assert(p.retry.initialDelayMs === 2500L && p.retry.maxDelayMs === 10000L)
    assert(p.healthPort === 9999)
  }

  test("transport requirements: pubsub/kinesis demand their blocks (models.py:359-383)") {
    val e = intercept[IllegalArgumentException] {
      PlatformConfigLoader.parse("transport_mode: pubsub\n")
    }
    assert(e.getMessage.contains("pubsub config is required"))
    val ok = PlatformConfigLoader.parse(
      """transport_mode: pubsub
        |pubsub:
        |  project_id: my-proj
        |""".stripMargin)
    assert(ok.pubsub.get.projectId === "my-proj")
    assert(ok.pubsub.get.ackDeadlineSeconds === 600)
    val e2 = intercept[IllegalArgumentException] {
      PlatformConfigLoader.parse("transport_mode: kinesis\n")
    }
    assert(e2.getMessage.contains("kinesis config is required"))
    assert(intercept[IllegalArgumentException] {
      PlatformConfigLoader.parse("transport_mode: carrier-pigeon\n")
    }.getMessage.contains("unknown transport_mode"))
  }

  test("auth requirements: SASL mechanisms demand credentials, sasl_iam a region") {
    val e = intercept[IllegalArgumentException] {
      PlatformConfigLoader.parse(
        """kafka:
          |  auth_mechanism: sasl_plain
          |""".stripMargin)
    }
    assert(e.getMessage.contains("sasl_username and sasl_password are required"))
    val e2 = intercept[IllegalArgumentException] {
      PlatformConfigLoader.parse(
        """kafka:
          |  auth_mechanism: sasl_iam
          |""".stripMargin)
    }
    assert(e2.getMessage.contains("aws_region is required"))
  }

  test("clientProperties projects tuning + auth into the JVM key space") {
    val p = PlatformConfigLoader.parse(
      """kafka:
        |  bootstrap_servers: broker:9092
        |  group_id: g1
        |  auth_mechanism: sasl_scram_512
        |  security_protocol: SASL_SSL
        |  sasl_username: svc
        |  sasl_password: ${KPW}
        |""".stripMargin, env = Map("KPW" -> "sekret"))
    val props = p.kafka.get.clientProperties
    assert(props("bootstrap.servers") === "broker:9092")
    assert(props("group.id") === "g1")
    assert(props("session.timeout.ms") === "45000")
    assert(props("sasl.mechanism") === "SCRAM-SHA-512")
    assert(props("sasl.jaas.config").contains("""password="sekret""""))
    // never the librdkafka-only / non-client keys
    assert(!props.contains("aws.region") && !props.contains("ssl.key.location"))
  }
}

package graft.config

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Optional platform YAML → env-interpolation → defaults deep-merge →
  * validated [[PlatformCfg]] (`config/loader.py:81-92` — unlike the
  * pipeline config, NO path is required: built-in defaults alone are a
  * valid local-dev platform, `defaults/platform.yaml`).
  */
object PlatformConfigLoader {

  private type Node = Map[String, Any]
  import PipelineConfigLoader.{bool, double, fail, int, interpolate, merge, node, optStr, toScala}

  def load(path: Option[String], env: Map[String, String] = sys.env): PlatformCfg =
    path match {
      case None => validate(Map.empty)
      case Some(p) =>
        if (!Files.exists(Paths.get(p)))
          throw new IllegalArgumentException(s"Config file not found: $p")
        parse(Files.readString(Paths.get(p)), env)
    }

  def parse(yamlText: String, env: Map[String, String] = sys.env): PlatformCfg = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val raw = mapper.readValue(yamlText, classOf[java.util.Map[String, Object]])
    validate(interpolate(toScala(raw), env).asInstanceOf[Node])
  }

  private def validate(n: Node): PlatformCfg = {
    val transport = optStr(n, "transport_mode").getOrElse("kafka")
    if (!Set("kafka", "pubsub", "kinesis").contains(transport))
      fail(s"unknown transport_mode '$transport'")

    // presence semantics mirror pydantic: an explicit `kafka: null`
    // clears the default block; absence keeps it
    def block(key: String): Option[Node] = n.get(key) match {
      case Some(null) => None
      case Some(m: Map[_, _]) => Some(m.asInstanceOf[Node])
      case Some(other) => fail(s"$key must be a mapping, got $other")
      case None if key == "kafka" || key == "connector" => Some(Map.empty)
      case None => None
    }

    val kafka = block("kafka").map { k =>
      KafkaCfg(
        bootstrapServers = optStr(k, "bootstrap_servers").getOrElse("localhost:9092"),
        schemaRegistryUrl = optStr(k, "schema_registry_url").getOrElse("http://localhost:8081"),
        groupId = optStr(k, "group_id").getOrElse("cdc-platform"),
        autoOffsetReset = optStr(k, "auto_offset_reset").getOrElse("earliest"),
        enableIdempotence = bool(k, "enable_idempotence", dflt = true),
        acks = optStr(k, "acks").getOrElse("all"),
        topicNumPartitions = int(k, "topic_num_partitions", 1),
        topicReplicationFactor = int(k, "topic_replication_factor", 1),
        sessionTimeoutMs = int(k, "session_timeout_ms", 45000),
        maxPollIntervalMs = int(k, "max_poll_interval_ms", 300000),
        fetchMinBytes = int(k, "fetch_min_bytes", 1),
        fetchMaxWaitMs = int(k, "fetch_max_wait_ms", 500),
        pollBatchSize = int(k, "poll_batch_size", 1),
        deserPoolSize = int(k, "deser_pool_size", 1),
        commitIntervalSeconds = double(k, "commit_interval_seconds", 0.0),
        securityProtocol = optStr(k, "security_protocol").getOrElse("PLAINTEXT"),
        authMechanism = optStr(k, "auth_mechanism").getOrElse("none"),
        saslUsername = optStr(k, "sasl_username"),
        saslPassword = optStr(k, "sasl_password"),
        sslCaLocation = optStr(k, "ssl_ca_location"),
        sslCertificateLocation = optStr(k, "ssl_certificate_location"),
        sslKeyLocation = optStr(k, "ssl_key_location"),
        awsRegion = optStr(k, "aws_region"),
        gcpProjectId = optStr(k, "gcp_project_id"))
    }

    // auth requirements (models.py:140-157)
    kafka.foreach { k =>
      k.authMechanism match {
        case "sasl_iam" if k.awsRegion.isEmpty =>
          fail("aws_region is required when auth_mechanism is 'sasl_iam'")
        case m @ ("sasl_plain" | "sasl_scram_256" | "sasl_scram_512")
            if k.saslUsername.isEmpty || k.saslPassword.isEmpty =>
          fail(s"sasl_username and sasl_password are required when auth_mechanism is '$m'")
        case "none" | "sasl_plain" | "sasl_scram_256" | "sasl_scram_512" |
            "sasl_iam" | "sasl_oauthbearer" => ()
        case other => fail(s"unknown auth_mechanism '$other'")
      }
    }

    val connector = block("connector").map { c =>
      ConnectorRestCfg(
        connectUrl = optStr(c, "connect_url").getOrElse("http://localhost:8083"),
        timeoutSeconds = double(c, "timeout_seconds", 30.0),
        retryMaxAttempts = int(c, "retry_max_attempts", 5),
        retryWaitSeconds = double(c, "retry_wait_seconds", 2.0))
    }

    val pubsub = block("pubsub").map { p =>
      PubSubCfg(
        projectId = PipelineConfigLoader.str(p, "project_id", "pubsub"),
        orderingEnabled = bool(p, "ordering_enabled", dflt = true),
        ackDeadlineSeconds = int(p, "ack_deadline_seconds", 600),
        maxMessagesPerPull = int(p, "max_messages_per_pull", 100),
        groupId = optStr(p, "group_id").getOrElse("cdc-platform"),
        maxOutstandingMessages = int(p, "max_outstanding_messages", 1000),
        maxDeliveryAttempts = int(p, "max_delivery_attempts", 5))
    }

    val kinesis = block("kinesis").map { k =>
      KinesisCfg(
        region = optStr(k, "region").getOrElse("us-east-1"),
        shardCount = int(k, "shard_count", 1),
        groupId = optStr(k, "group_id").getOrElse("cdc-platform"),
        iteratorType = optStr(k, "iterator_type").getOrElse("TRIM_HORIZON"),
        checkpointTableName = optStr(k, "checkpoint_table_name").getOrElse("cdc-kinesis-checkpoints"),
        pollIntervalSeconds = double(k, "poll_interval_seconds", 1.0),
        maxRecordsPerShard = int(k, "max_records_per_shard", 100),
        dlqStreamSuffix = optStr(k, "dlq_stream_suffix").getOrElse("dlq"),
        dlqShardCount = int(k, "dlq_shard_count", 1),
        checkpointTtlSeconds = int(k, "checkpoint_ttl_seconds", 604800))
    }

    val walReader = block("wal_reader").map { w =>
      WalReaderCfg(
        publicationName = optStr(w, "publication_name").getOrElse("cdc_publication"),
        slotName = optStr(w, "slot_name").getOrElse("cdc_slot"),
        statusIntervalSeconds = double(w, "status_interval_seconds", 10.0),
        batchSize = int(w, "batch_size", 100),
        batchTimeoutSeconds = double(w, "batch_timeout_seconds", 1.0),
        maxRetries = int(w, "max_retries", 0))
    }

    // transport requirements (models.py:359-383)
    transport match {
      case "kafka" =>
        if (kafka.isEmpty) fail("kafka config is required when transport_mode is 'kafka'")
        if (connector.isEmpty) fail("connector config is required when transport_mode is 'kafka'")
      case "pubsub" =>
        if (pubsub.isEmpty) fail("pubsub config is required when transport_mode is 'pubsub'")
      case "kinesis" =>
        if (kinesis.isEmpty) fail("kinesis config is required when transport_mode is 'kinesis'")
    }

    val dlqN = node(n, "dlq")
    val retryN = node(n, "retry")
    PlatformCfg(
      transportMode = transport,
      kafka = kafka,
      connector = connector,
      pubsub = pubsub,
      kinesis = kinesis,
      walReader = walReader,
      dlq = DlqCfg(
        enabled = bool(dlqN, "enabled", dflt = true),
        tablePath = optStr(dlqN, "table_path"),
        topicSuffix = optStr(dlqN, "topic_suffix").getOrElse("dlq"),
        maxRetries = int(dlqN, "max_retries", 3),
        includeHeaders = bool(dlqN, "include_headers", dflt = true),
        flushIntervalSeconds = double(dlqN, "flush_interval_seconds", 0.0)),
      // reference retry is seconds-based (models.py:217-224); stored ms
      retry = RetryCfg(
        maxAttempts = int(retryN, "max_attempts", 5),
        initialDelayMs = (double(retryN, "initial_wait_seconds", 1.0) * 1000).toLong,
        maxDelayMs = (double(retryN, "max_wait_seconds", 60.0) * 1000).toLong),
      maxBufferedMessages = int(n, "max_buffered_messages", 1000),
      schemaMonitorIntervalSeconds = double(n, "schema_monitor_interval_seconds", 30.0),
      lagMonitorIntervalSeconds = double(n, "lag_monitor_interval_seconds", 15.0),
      stopOnIncompatibleSchema = bool(n, "stop_on_incompatible_schema", dflt = false),
      healthPort = int(n, "health_port", 8080),
      healthEnabled = bool(n, "health_enabled", dflt = true))
  }
}

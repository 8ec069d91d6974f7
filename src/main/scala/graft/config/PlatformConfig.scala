package graft.config

import graft.streaming.KafkaAuth

/** Platform infrastructure configuration — the reference's second YAML
  * beside the pipeline config (`config/models.py:341-383`,
  * `config/defaults/platform.yaml`): transport mode, Kafka
  * broker/consumer tuning + auth, the Connect REST endpoint, per-
  * transport blocks, DLQ/retry defaults and monitor/health knobs.
  *
  * Validation mirrors the reference's model validators:
  *  - transport-specific sub-config must be present for the selected
  *    `transport_mode` (`models.py:359-383`);
  *  - SASL mechanisms demand their credentials, `sasl_iam` demands
  *    `aws_region` (`models.py:140-157`).
  */
final case class KafkaCfg(
    bootstrapServers: String = "localhost:9092",
    schemaRegistryUrl: String = "http://localhost:8081",
    groupId: String = "cdc-platform",
    autoOffsetReset: String = "earliest",
    enableIdempotence: Boolean = true,
    acks: String = "all",
    topicNumPartitions: Int = 1,
    topicReplicationFactor: Int = 1,
    sessionTimeoutMs: Int = 45000,
    maxPollIntervalMs: Int = 300000,
    fetchMinBytes: Int = 1,
    fetchMaxWaitMs: Int = 500,
    pollBatchSize: Int = 1,
    deserPoolSize: Int = 1,
    commitIntervalSeconds: Double = 0.0,
    securityProtocol: String = "PLAINTEXT",
    authMechanism: String = "none", // none|sasl_plain|sasl_scram_256|sasl_scram_512|sasl_iam|sasl_oauthbearer
    saslUsername: Option[String] = None,
    saslPassword: Option[String] = None,
    sslCaLocation: Option[String] = None,
    sslCertificateLocation: Option[String] = None,
    sslKeyLocation: Option[String] = None,
    /** Validated for `sasl_iam` (reference contract) but never emitted
      * as a client key — the JVM MSK IAM handler derives the region
      * from the bootstrap endpoint (see [[graft.streaming.KafkaAuth]]).
      */
    awsRegion: Option[String] = None,
    gcpProjectId: Option[String] = None) {

  def authCfg: KafkaAuth.AuthCfg = KafkaAuth.AuthCfg(
    mechanism = authMechanism match {
      case "none" => KafkaAuth.NoAuth
      case "sasl_plain" => KafkaAuth.SaslPlain
      case "sasl_scram_256" => KafkaAuth.SaslScram256
      case "sasl_scram_512" => KafkaAuth.SaslScram512
      case "sasl_iam" => KafkaAuth.SaslIam
      case "sasl_oauthbearer" => KafkaAuth.SaslOauthBearer
      case other => throw new IllegalArgumentException(
        s"unknown auth_mechanism '$other'")
    },
    securityProtocol = securityProtocol,
    saslUsername = saslUsername,
    saslPassword = saslPassword,
    sslCaLocation = sslCaLocation,
    sslCertificateLocation = sslCertificateLocation,
    sslKeyLocation = sslKeyLocation,
    gcpProjectId = gcpProjectId)

  /** Consumer/client properties in the JVM key space (tuning + auth),
    * ready to merge into consumer configs or `kafka.`-prefix for Spark
    * source options.
    */
  def clientProperties: Map[String, String] = Map(
    "bootstrap.servers" -> bootstrapServers,
    "group.id" -> groupId,
    "auto.offset.reset" -> autoOffsetReset,
    "session.timeout.ms" -> sessionTimeoutMs.toString,
    "max.poll.interval.ms" -> maxPollIntervalMs.toString,
    "fetch.min.bytes" -> fetchMinBytes.toString,
    "fetch.max.wait.ms" -> fetchMaxWaitMs.toString) ++
    KafkaAuth.properties(authCfg)
}

/** Kafka Connect REST client settings (`models.py:198-205`). */
final case class ConnectorRestCfg(
    connectUrl: String = "http://localhost:8083",
    timeoutSeconds: Double = 30.0,
    retryMaxAttempts: Int = 5,
    retryWaitSeconds: Double = 2.0)

/** Google Pub/Sub transport block (`models.py:170-181`). */
final case class PubSubCfg(
    projectId: String,
    orderingEnabled: Boolean = true,
    ackDeadlineSeconds: Int = 600,
    maxMessagesPerPull: Int = 100,
    groupId: String = "cdc-platform",
    maxOutstandingMessages: Int = 1000,
    maxDeliveryAttempts: Int = 5)

/** Amazon Kinesis transport block (`models.py:183-195`). */
final case class KinesisCfg(
    region: String = "us-east-1",
    shardCount: Int = 1,
    groupId: String = "cdc-platform",
    iteratorType: String = "TRIM_HORIZON",
    checkpointTableName: String = "cdc-kinesis-checkpoints",
    pollIntervalSeconds: Double = 1.0,
    maxRecordsPerShard: Int = 100,
    dlqStreamSuffix: String = "dlq",
    dlqShardCount: Int = 1,
    checkpointTtlSeconds: Int = 604800)

/** Direct WAL reader block (`models.py:160-168`). */
final case class WalReaderCfg(
    publicationName: String = "cdc_publication",
    slotName: String = "cdc_slot",
    statusIntervalSeconds: Double = 10.0,
    batchSize: Int = 100,
    batchTimeoutSeconds: Double = 1.0,
    maxRetries: Int = 0)

final case class PlatformCfg(
    transportMode: String = "kafka", // kafka | pubsub | kinesis
    kafka: Option[KafkaCfg] = Some(KafkaCfg()),
    connector: Option[ConnectorRestCfg] = Some(ConnectorRestCfg()),
    pubsub: Option[PubSubCfg] = None,
    kinesis: Option[KinesisCfg] = None,
    walReader: Option[WalReaderCfg] = None,
    dlq: DlqCfg = DlqCfg(),
    retry: RetryCfg = RetryCfg(maxAttempts = 5, initialDelayMs = 1000, maxDelayMs = 60000),
    maxBufferedMessages: Int = 1000,
    schemaMonitorIntervalSeconds: Double = 30.0,
    lagMonitorIntervalSeconds: Double = 15.0,
    stopOnIncompatibleSchema: Boolean = false,
    healthPort: Int = 8080,
    healthEnabled: Boolean = true)

package graft.config

import graft.streaming.TopicNaming

/** Validated pipeline configuration model (SURVEY.md §2.2 P2 + the
  * reference's config surface, behavior from `config/models.py`):
  * a pipeline = one CDC source (with a validated `schema.table`
  * capture include-list) fanning out to N typed sinks, plus the
  * transport/runtime settings the Spark engine needs (envelope source
  * directory, checkpoint location, admission bound).
  *
  * Validation mirrors the reference's pydantic rules:
  *  - `pipeline_id` and `source.database` are required;
  *  - every capture entry must be `namespace.name` qualified
  *    (`config/models.py:89-106`);
  *  - each sink must carry exactly the sub-config its `sink_type`
  *    demands (`config/models.py:317-330`);
  *  - unknown top-level keys are rejected (`extra="forbid"`,
  *    `config/models.py:332`).
  */
final case class RetryCfg(
    maxAttempts: Int = 3,
    initialDelayMs: Long = 100,
    maxDelayMs: Long = 60000)

/** Webhook sub-config (`config/models.py:238-243`): custom headers are
  * sent on every request, `authToken` becomes `Authorization: Bearer`,
  * `method` selects the HTTP verb.
  */
final case class WebhookSinkCfg(
    url: String,
    method: String = "POST",
    headers: Map[String, String] = Map.empty,
    timeoutSeconds: Double = 30.0,
    authToken: Option[String] = None)

final case class PostgresSinkCfg(targetTable: String)

/** Table maintenance knobs (`config/models.py:273-282`). */
final case class MaintenanceCfg(
    enabled: Boolean = false,
    expireIntervalMs: Long = 3600000,
    expireOlderThanMs: Long = 86400000,
    compactIntervalMs: Long = 7200000,
    compactFileThreshold: Int = 10,
    compactMaxRows: Long = 500000,
    zorderCols: Seq[String] = Nil,
    bloomIndexCols: Seq[String] = Nil,
    annIndexRoot: Option[String] = None,
    annRebuildIntervalMs: Long = 0L,
    /** Occupancy-triggered ANN rebalance (0 = off): when the index's
      * per-cell `skew = max/mean` crosses this, the compaction-cadence
      * tick fires a coarse-cell rebalance pinned to the corpus head.
      */
    annRebalanceSkewThreshold: Double = 0.0)

final case class LakehouseSinkCfg(
    tablePath: String,
    upsertKeys: Seq[String] = Nil,
    payloadSchemaJson: Option[String] = None,
    maintenance: MaintenanceCfg = MaintenanceCfg())

final case class SinkCfg(
    sinkId: String,
    sinkType: String, // webhook | postgres | lakehouse
    enabled: Boolean = true,
    retry: RetryCfg = RetryCfg(),
    webhook: Option[WebhookSinkCfg] = None,
    postgres: Option[PostgresSinkCfg] = None,
    lakehouse: Option[LakehouseSinkCfg] = None)

final case class SourceCfg(
    sourceType: TopicNaming.SourceType = TopicNaming.Postgres,
    host: String = "localhost",
    port: Int = 5432,
    database: String,
    username: String = "cdc_user",
    password: String = "cdc_password",
    tables: Seq[String] = Nil,
    snapshotMode: String = "initial",
    slotName: String = "cdc_slot",
    publicationName: String = "cdc_publication",
    mysqlServerId: Int = 1,
    replicaSetName: Option[String] = None,
    authSource: String = "admin")

/** DLQ knobs (`config/models.py:207-214`): `maxRetries` extra sink
  * write attempts before a batch routes to the DLQ, `includeHeaders`
  * toggles the 8 diagnostic columns, `flushIntervalSeconds` <= 0 means
  * every routed batch is durably appended immediately (the reference's
  * per-message producer flush); > 0 buffers routed rows and appends on
  * the interval.
  */
final case class DlqCfg(
    enabled: Boolean = true,
    tablePath: Option[String] = None,
    topicSuffix: String = "dlq",
    maxRetries: Int = 3,
    includeHeaders: Boolean = true,
    flushIntervalSeconds: Double = 0.0)

/** Schema-registry monitoring knobs (`config/models.py:113,355` +
  * `pipeline/runner.py:90-95`): when `url` is configured the runner
  * starts a [[graft.streaming.SchemaRegistryMonitor]] beside the
  * stream and — with `stopOnIncompatible` — stops the streaming query
  * on an incompatible schema change.
  */
final case class RegistryCfg(
    url: String,
    stopOnIncompatible: Boolean = true,
    intervalMs: Long = 30000)

final case class PipelineCfg(
    pipelineId: String,
    topicPrefix: String = "cdc",
    source: SourceCfg,
    sinks: Seq[SinkCfg] = Nil,
    sourceDir: String,
    checkpointDir: String,
    dlq: DlqCfg = DlqCfg(),
    maxFilesPerTrigger: Int = 10,
    registry: Option[RegistryCfg] = None) {

  /** The configured capture include-list as concrete topic names —
    * the P2 predicate the pipeline filters consumption on.
    */
  def includeTopics: Seq[String] =
    source.tables.map(t => TopicNaming.cdcTopicForEntry(
      topicPrefix, source.sourceType, t, Some(source.database)))
}

package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import graft.streaming.TopicNaming

/** YAML → env-interpolation → defaults deep-merge → validated
  * [[PipelineCfg]] (the reference loader pipeline,
  * `config/loader.py:55-106` + `config/defaults.py:25-44`).
  */
object PipelineConfigLoader {

  private type Node = Map[String, Any]

  /** Built-in defaults (the reference ships `defaults/pipeline.yaml`;
    * here the same role is played by an in-code map the user YAML
    * deep-merges over).
    */
  val defaults: Node = Map(
    "topic_prefix" -> "cdc",
    "max_files_per_trigger" -> 10,
    "source" -> Map(
      "source_type" -> "postgres",
      "slot_name" -> "cdc_slot",
      "publication_name" -> "cdc_publication",
      "tables" -> Seq.empty[Any]),
    "dlq" -> Map("enabled" -> true, "topic_suffix" -> "dlq"))

  def load(path: String, env: Map[String, String] = sys.env): PipelineCfg = {
    if (!Files.exists(Paths.get(path)))
      throw new IllegalArgumentException(s"Config file not found: $path")
    parse(Files.readString(Paths.get(path)), env)
  }

  def parse(yamlText: String, env: Map[String, String] = sys.env): PipelineCfg = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val raw = mapper.readValue(yamlText, classOf[java.util.Map[String, Object]])
    val data = interpolate(toScala(raw), env).asInstanceOf[Node]
    validate(merge(defaults, data))
  }

  // ---- plumbing ----

  private[config] def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  /** Recursive `${VAR}` / `${VAR:-default}` resolution over strings
    * (`config/loader.py:41-49` shape, F9 semantics via EnvInterpolator).
    */
  private[config] def interpolate(v: Any, env: Map[String, String]): Any = v match {
    case s: String => EnvInterpolator.interpolate(s, env)
    case m: Map[_, _] =>
      m.map { case (k, x) => k.toString -> interpolate(x, env) }
    case l: Seq[_] => l.map(interpolate(_, env))
    case other => other
  }

  /** Non-mutating recursive deep-merge, overrides win
    * (`config/defaults.py:25-33`).
    */
  def merge(base: Node, overrides: Node): Node =
    overrides.foldLeft(base) {
      case (acc, (k, v: Map[_, _])) =>
        acc.get(k) match {
          case Some(b: Map[_, _]) =>
            acc + (k -> merge(b.asInstanceOf[Node], v.asInstanceOf[Node]))
          case _ => acc + (k -> v)
        }
      case (acc, (k, v)) => acc + (k -> v)
    }

  // ---- validation (mirrors config/models.py rules) ----

  private val QualifiedName = """^[A-Za-z_]\w*\.[A-Za-z_]\w*$""".r

  private[config] def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Invalid pipeline config: $msg")

  private[config] def str(n: Node, key: String, where: String): String =
    n.get(key) match {
      case Some(s: String) if s.nonEmpty => s
      case Some(other) => fail(s"$where.$key must be a string, got $other")
      case None => fail(s"$where.$key is required")
    }

  private[config] def optStr(n: Node, key: String): Option[String] =
    n.get(key).collect { case s: String if s.nonEmpty => s }

  private[config] def int(n: Node, key: String, dflt: Int): Int = n.get(key) match {
    case Some(i: Int) => i
    case Some(i: Integer) => i.intValue
    // YAML numerics > 2^31 parse as Long; NEVER narrow silently — a
    // truncated ms-knob (e.g. 30-day retention = 2592000000 wrapping
    // negative) would turn a retention window into "expire everything".
    case Some(l: Long) if l.isValidInt => l.toInt
    case Some(l: Long) => fail(s"$key out of 32-bit range: $l")
    case Some(other) => fail(s"$key must be an integer, got $other")
    case None => dflt
  }

  /** Long-valued knobs (ms intervals, row counts): accepts Int or Long
    * YAML numerics without narrowing.
    */
  private[config] def long(n: Node, key: String, dflt: Long): Long = n.get(key) match {
    case Some(i: Int) => i.toLong
    case Some(i: Integer) => i.longValue
    case Some(l: Long) => l
    case Some(other) => fail(s"$key must be an integer, got $other")
    case None => dflt
  }

  /** Double-valued knobs (seconds intervals): accepts any YAML numeric. */
  private[config] def double(n: Node, key: String, dflt: Double): Double = n.get(key) match {
    case Some(d: Double) => d
    case Some(f: Float) => f.toDouble
    case Some(i: Int) => i.toDouble
    case Some(l: Long) => l.toDouble
    case Some(other) => fail(s"$key must be a number, got $other")
    case None => dflt
  }

  private[config] def strMap(n: Node, key: String): Map[String, String] = n.get(key) match {
    case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
    case Some(other) => fail(s"$key must be a mapping, got $other")
    case None => Map.empty
  }

  private[config] def bool(n: Node, key: String, dflt: Boolean): Boolean = n.get(key) match {
    case Some(b: Boolean) => b
    case Some(other) => fail(s"$key must be a boolean, got $other")
    case None => dflt
  }

  private[config] def node(n: Node, key: String): Node = n.get(key) match {
    case Some(m: Map[_, _]) => m.asInstanceOf[Node]
    case Some(other) => fail(s"$key must be a mapping, got $other")
    case None => Map.empty
  }

  private[config] def strSeq(n: Node, key: String): Seq[String] = n.get(key) match {
    case Some(l: Seq[_]) => l.map(_.toString)
    case Some(other) => fail(s"$key must be a list, got $other")
    case None => Nil
  }

  private val KnownTopLevel = Set(
    "pipeline_id", "topic_prefix", "source", "sinks",
    "source_dir", "checkpoint_dir", "dlq", "max_files_per_trigger",
    "registry")

  private def validate(n: Node): PipelineCfg = {
    // extra="forbid" on the pipeline model (config/models.py:332)
    val unknown = n.keySet.diff(KnownTopLevel)
    if (unknown.nonEmpty) fail(s"unknown keys: ${unknown.toSeq.sorted.mkString(", ")}")

    val srcN = node(n, "source")
    val tables = strSeq(srcN, "tables")
    tables.foreach { t =>
      if (QualifiedName.findFirstIn(t).isEmpty)
        fail(s"Table/collection '$t' must be schema- or db-qualified " +
          "(e.g. 'public.customers' or 'mydb.events')")
    }
    val source = SourceCfg(
      sourceType = TopicNaming.SourceType.parse(
        optStr(srcN, "source_type").getOrElse("postgres")),
      host = optStr(srcN, "host").getOrElse("localhost"),
      port = int(srcN, "port", 5432),
      database = str(srcN, "database", "source"),
      username = optStr(srcN, "username").getOrElse("cdc_user"),
      password = optStr(srcN, "password").getOrElse("cdc_password"),
      tables = tables,
      snapshotMode = optStr(srcN, "snapshot_mode").getOrElse("initial"),
      slotName = optStr(srcN, "slot_name").getOrElse("cdc_slot"),
      publicationName = optStr(srcN, "publication_name").getOrElse("cdc_publication"),
      mysqlServerId = int(srcN, "mysql_server_id", 1),
      replicaSetName = optStr(srcN, "replica_set_name"),
      authSource = optStr(srcN, "auth_source").getOrElse("admin"))

    val sinks = (n.get("sinks") match {
      case Some(l: Seq[_]) => l.map {
        case m: Map[_, _] => validateSink(m.asInstanceOf[Node])
        case other => fail(s"sinks entries must be mappings, got $other")
      }
      case Some(other) => fail(s"sinks must be a list, got $other")
      case None => Nil
    })
    val dup = sinks.groupBy(_.sinkId).collect { case (id, xs) if xs.size > 1 => id }
    if (dup.nonEmpty) fail(s"duplicate sink_id: ${dup.mkString(", ")}")

    val dlqN = node(n, "dlq")
    PipelineCfg(
      pipelineId = str(n, "pipeline_id", "pipeline"),
      topicPrefix = optStr(n, "topic_prefix").getOrElse("cdc"),
      source = source,
      sinks = sinks,
      sourceDir = str(n, "source_dir", "pipeline"),
      checkpointDir = str(n, "checkpoint_dir", "pipeline"),
      dlq = DlqCfg(
        enabled = bool(dlqN, "enabled", dflt = true),
        tablePath = optStr(dlqN, "table_path"),
        topicSuffix = optStr(dlqN, "topic_suffix").getOrElse("dlq"),
        maxRetries = int(dlqN, "max_retries", 3),
        includeHeaders = bool(dlqN, "include_headers", dflt = true),
        flushIntervalSeconds = double(dlqN, "flush_interval_seconds", 0.0)),
      maxFilesPerTrigger = int(n, "max_files_per_trigger", 10),
      registry = if (n.contains("registry")) {
        val r = node(n, "registry")
        Some(RegistryCfg(
          url = str(r, "url", "registry"),
          stopOnIncompatible = bool(r, "stop_on_incompatible", dflt = true),
          intervalMs = long(r, "interval_ms", 30000L)))
      } else None)
  }

  private def validateSink(n: Node): SinkCfg = {
    val id = str(n, "sink_id", "sink")
    val tpe = str(n, "sink_type", s"sink $id")
    val retryN = node(n, "retry")
    val cfg = SinkCfg(
      sinkId = id,
      sinkType = tpe,
      enabled = bool(n, "enabled", dflt = true),
      retry = RetryCfg(
        maxAttempts = int(retryN, "max_attempts", 3),
        initialDelayMs = long(retryN, "initial_delay_ms", 100L),
        maxDelayMs = long(retryN, "max_delay_ms", 60000L)),
      webhook = if (n.contains("webhook")) {
        val w = node(n, "webhook")
        Some(WebhookSinkCfg(
          url = str(w, "url", s"sink $id webhook"),
          method = optStr(w, "method").getOrElse("POST"),
          headers = strMap(w, "headers"),
          timeoutSeconds = double(w, "timeout_seconds", 30.0),
          authToken = optStr(w, "auth_token")))
      } else None,
      postgres = if (n.contains("postgres"))
        Some(PostgresSinkCfg(str(node(n, "postgres"), "target_table", s"sink $id postgres"))) else None,
      lakehouse = if (n.contains("lakehouse")) {
        val lh = node(n, "lakehouse")
        val m = node(lh, "maintenance")
        Some(LakehouseSinkCfg(
          tablePath = str(lh, "table_path", s"sink $id lakehouse"),
          upsertKeys = strSeq(lh, "upsert_keys"),
          payloadSchemaJson = optStr(lh, "payload_schema_json"),
          maintenance = MaintenanceCfg(
            enabled = bool(m, "enabled", dflt = false),
            expireIntervalMs = long(m, "expire_interval_ms", 3600000L),
            expireOlderThanMs = long(m, "expire_older_than_ms", 86400000L),
            compactIntervalMs = long(m, "compact_interval_ms", 7200000L),
            compactFileThreshold = int(m, "compact_file_threshold", 10),
            compactMaxRows = long(m, "compact_max_rows", 500000L),
            zorderCols = strSeq(m, "zorder_cols"),
            bloomIndexCols = strSeq(m, "bloom_index_cols"),
            annIndexRoot = optStr(m, "ann_index_root"),
            annRebuildIntervalMs = long(m, "ann_rebuild_interval_ms", 0L),
            annRebalanceSkewThreshold =
              double(m, "ann_rebalance_skew_threshold", 0.0))))
      } else None)

    // the sub-config matching sink_type must be present (models.py:317-330)
    tpe match {
      case "webhook" if cfg.webhook.isEmpty =>
        fail(s"webhook config is required when sink_type is 'webhook' (sink $id)")
      case "postgres" if cfg.postgres.isEmpty =>
        fail(s"postgres config is required when sink_type is 'postgres' (sink $id)")
      case "lakehouse" if cfg.lakehouse.isEmpty =>
        fail(s"lakehouse config is required when sink_type is 'lakehouse' (sink $id)")
      case "webhook" | "postgres" | "lakehouse" => ()
      case other => fail(s"unknown sink_type '$other' (sink $id)")
    }
    // postgres target must be schema-qualified (models.py:260-271)
    cfg.postgres.foreach { p =>
      if (QualifiedName.findFirstIn(p.targetTable).isEmpty)
        fail(s"postgres target_table '${p.targetTable}' must be schema-qualified")
    }
    cfg
  }
}

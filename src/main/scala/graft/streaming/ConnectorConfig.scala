package graft.streaming

import graft.config.SourceCfg
import graft.streaming.TopicNaming._

/** Debezium connector-config builders for the four supported source
  * databases (SURVEY.md §2.1 S9; behavior from
  * `sources/debezium/config.py:14-198`): given a validated source
  * config, produce the Kafka Connect JSON properties that deploy the
  * matching Debezium 2.x connector. Pure functions — the HTTP deploy
  * call is transport plumbing outside the engine.
  */
object ConnectorConfig {

  final case class Platform(
      schemaRegistryUrl: String = "http://localhost:8081",
      bootstrapServers: String = "localhost:9092")

  def connectorName(topicPrefix: String, pipelineId: String): String =
    s"$topicPrefix-$pipelineId"

  /** Dispatch on source type (`config.py:19-31`). */
  def build(pipelineId: String, topicPrefix: String, src: SourceCfg,
      platform: Platform = Platform()): Map[String, String] =
    src.sourceType match {
      case Mysql => mysql(pipelineId, topicPrefix, src, platform)
      case Mongo => mongodb(pipelineId, topicPrefix, src, platform)
      case SqlServer => sqlserver(pipelineId, topicPrefix, src, platform)
      case Postgres => postgres(pipelineId, topicPrefix, src, platform)
    }

  private def avroConverters(p: Platform): Map[String, String] = Map(
    "key.converter" -> "io.confluent.connect.avro.AvroConverter",
    "key.converter.schema.registry.url" -> p.schemaRegistryUrl,
    "value.converter" -> "io.confluent.connect.avro.AvroConverter",
    "value.converter.schema.registry.url" -> p.schemaRegistryUrl)

  private def schemaHistory(pipelineId: String, topicPrefix: String,
      p: Platform): Map[String, String] = Map(
    "schema.history.internal.kafka.bootstrap.servers" -> p.bootstrapServers,
    "schema.history.internal.kafka.topic" ->
      s"_schema-history.$topicPrefix.$pipelineId")

  def postgres(pipelineId: String, topicPrefix: String, src: SourceCfg,
      p: Platform): Map[String, String] = {
    val name = connectorName(topicPrefix, pipelineId)
    Map(
      "connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
      "database.hostname" -> src.host,
      "database.port" -> src.port.toString,
      "database.user" -> src.username,
      "database.password" -> src.password,
      "database.dbname" -> src.database,
      "topic.prefix" -> topicPrefix,
      "plugin.name" -> "pgoutput",
      "publication.name" -> src.publicationName,
      "slot.name" -> src.slotName,
      "snapshot.mode" -> src.snapshotMode,
      "table.include.list" -> src.tables.mkString(","),
      "heartbeat.interval.ms" -> "10000",
      "heartbeat.action.query" ->
        (s"INSERT INTO heartbeat (connector, ts) VALUES ('$name', now()) " +
          "ON CONFLICT (connector) DO UPDATE SET ts = now()"),
      "decimal.handling.mode" -> "string",
      "tombstones.on.delete" -> "true") ++ avroConverters(p)
  }

  def mysql(pipelineId: String, topicPrefix: String, src: SourceCfg,
      p: Platform): Map[String, String] =
    Map(
      "connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
      "database.hostname" -> src.host,
      "database.port" -> src.port.toString,
      "database.user" -> src.username,
      "database.password" -> src.password,
      "database.server.id" -> src.mysqlServerId.toString,
      "topic.prefix" -> topicPrefix,
      "database.include.list" -> src.database,
      "table.include.list" -> src.tables.mkString(","),
      "snapshot.mode" -> src.snapshotMode,
      "decimal.handling.mode" -> "string",
      "tombstones.on.delete" -> "true",
      "include.schema.changes" -> "false") ++
      schemaHistory(pipelineId, topicPrefix, p) ++ avroConverters(p)

  def mongodb(pipelineId: String, topicPrefix: String, src: SourceCfg,
      p: Platform): Map[String, String] = {
    // replica set appended as a query param so the driver discovers all
    // members; credentials embedded so no separate JAAS config is needed
    val rsPart = src.replicaSetName match {
      case Some(rs) => s"?replicaSet=$rs&authSource=${src.authSource}"
      case None => s"?authSource=${src.authSource}"
    }
    // credentials are URI components: ':' '@' '/' '%' in a password would
    // otherwise produce a wrong (or unparseable) connection string
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    Map(
      "connector.class" -> "io.debezium.connector.mongodb.MongoDbConnector",
      "mongodb.connection.string" ->
        s"mongodb://${enc(src.username)}:${enc(src.password)}@${src.host}:${src.port}/$rsPart",
      "topic.prefix" -> topicPrefix,
      "collection.include.list" -> src.tables.mkString(","),
      "snapshot.mode" -> src.snapshotMode,
      // full replacement document on updates, not just the diff
      "capture.mode" -> "change_streams_update_full",
      "tombstones.on.delete" -> "true") ++ avroConverters(p)
  }

  def sqlserver(pipelineId: String, topicPrefix: String, src: SourceCfg,
      p: Platform): Map[String, String] =
    Map(
      "connector.class" -> "io.debezium.connector.sqlserver.SqlServerConnector",
      "database.hostname" -> src.host,
      "database.port" -> src.port.toString,
      "database.user" -> src.username,
      "database.password" -> src.password,
      // Debezium 2.x: database.names (supports multiple databases)
      "database.names" -> src.database,
      "topic.prefix" -> topicPrefix,
      "table.include.list" -> src.tables.mkString(","),
      "snapshot.mode" -> src.snapshotMode,
      "decimal.handling.mode" -> "string",
      "tombstones.on.delete" -> "true",
      "include.schema.changes" -> "false") ++
      schemaHistory(pipelineId, topicPrefix, p) ++ avroConverters(p)
}

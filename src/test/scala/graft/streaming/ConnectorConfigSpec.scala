package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.config.SourceCfg
import graft.streaming.TopicNaming._

/** Connector-config vectors pinned to the reference builders
  * (`sources/debezium/config.py:34-198`).
  */
class ConnectorConfigSpec extends AnyFunSuite {
  private val platform = ConnectorConfig.Platform(
    schemaRegistryUrl = "http://registry:8081",
    bootstrapServers = "kafka:9092")

  test("postgres connector: pgoutput plugin, slot/publication, heartbeat upsert") {
    val c = ConnectorConfig.build("p1", "cdc",
      SourceCfg(sourceType = Postgres, database = "appdb",
        tables = Seq("public.customers", "public.orders")), platform)
    assert(c("connector.class") === "io.debezium.connector.postgresql.PostgresConnector")
    assert(c("plugin.name") === "pgoutput")
    assert(c("database.dbname") === "appdb")
    assert(c("slot.name") === "cdc_slot")
    assert(c("publication.name") === "cdc_publication")
    assert(c("table.include.list") === "public.customers,public.orders")
    assert(c("heartbeat.action.query").contains("'cdc-p1'"))
    assert(c("key.converter.schema.registry.url") === "http://registry:8081")
    assert(c("tombstones.on.delete") === "true")
  }

  test("mysql connector: server id, db include-list, schema history topic") {
    val c = ConnectorConfig.build("p2", "cdc",
      SourceCfg(sourceType = Mysql, database = "shop", port = 3306,
        mysqlServerId = 42, tables = Seq("shop.orders")), platform)
    assert(c("connector.class") === "io.debezium.connector.mysql.MySqlConnector")
    assert(c("database.server.id") === "42")
    assert(c("database.include.list") === "shop")
    assert(c("schema.history.internal.kafka.topic") === "_schema-history.cdc.p2")
    assert(c("schema.history.internal.kafka.bootstrap.servers") === "kafka:9092")
    assert(c("include.schema.changes") === "false")
  }

  test("mongodb connector: credentialed connection string with replica set") {
    val c = ConnectorConfig.build("p3", "cdc",
      SourceCfg(sourceType = Mongo, database = "mydb", host = "mongo", port = 27017,
        username = "u", password = "pw", replicaSetName = Some("rs0"),
        tables = Seq("mydb.events")), platform)
    assert(c("mongodb.connection.string")
      === "mongodb://u:pw@mongo:27017/?replicaSet=rs0&authSource=admin")
    assert(c("collection.include.list") === "mydb.events")
    assert(c("capture.mode") === "change_streams_update_full")
  }

  test("mongodb without replica set keeps authSource-only query") {
    val c = ConnectorConfig.build("p3", "cdc",
      SourceCfg(sourceType = Mongo, database = "mydb", host = "mongo", port = 27017,
        username = "u", password = "pw"), platform)
    assert(c("mongodb.connection.string") === "mongodb://u:pw@mongo:27017/?authSource=admin")
  }

  test("sql server connector: database.names (2.x multi-db form)") {
    val c = ConnectorConfig.build("p4", "cdc",
      SourceCfg(sourceType = SqlServer, database = "cdc_demo", port = 1433,
        tables = Seq("dbo.customers")), platform)
    assert(c("connector.class") === "io.debezium.connector.sqlserver.SqlServerConnector")
    assert(c("database.names") === "cdc_demo")
    assert(c("table.include.list") === "dbo.customers")
    assert(c("schema.history.internal.kafka.topic") === "_schema-history.cdc.p4")
  }

  test("connector name derives from prefix + pipeline id") {
    assert(ConnectorConfig.connectorName("cdc", "orders-pipe") === "cdc-orders-pipe")
  }
}

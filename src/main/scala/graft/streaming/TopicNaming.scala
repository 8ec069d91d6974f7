package graft.streaming

/** Topic naming conventions (SURVEY.md §2.8 F1/F2).
  *
  * Behavior ported from the reference (`streaming/topics.py:21-69`,
  * `sources/pubsub/naming.py:6-33`):
  *  - CDC topic: `<prefix>.<schema>.<table>` — but the second segment
  *    varies by source connector: PostgreSQL uses the schema, MySQL and
  *    MongoDB use the database name (already the first component of the
  *    qualified entry), and SQL Server adds an extra level because its
  *    Debezium 2.x connector prepends `database.names`:
  *    `<prefix>.<database>.<schema>.<table>`.
  *  - DLQ topic: `<source_topic>.<suffix>`.
  *  - Pub/Sub mangling: `.` is illegal in Pub/Sub names, so logical CDC
  *    topics map `.`↔`-` inside fully-qualified
  *    `projects/<project>/topics|subscriptions/<name>` paths.
  */
object TopicNaming {

  sealed trait SourceType
  case object Postgres extends SourceType
  case object Mysql extends SourceType
  case object Mongo extends SourceType
  case object SqlServer extends SourceType

  object SourceType {
    def parse(s: String): SourceType = s.toLowerCase match {
      case "postgres" | "postgresql" => Postgres
      case "mysql" => Mysql
      case "mongo" | "mongodb" => Mongo
      case "sqlserver" | "mssql" => SqlServer
      case other => throw new IllegalArgumentException(s"unknown source type: $other")
    }
  }

  /** `<prefix>.<schema>.<table>` (the 3-part base form). */
  def cdcTopicName(prefix: String, schema: String, table: String): String =
    s"$prefix.$schema.$table"

  /** `<source_topic>.<suffix>`. */
  def dlqTopicName(sourceTopic: String, suffix: String = "dlq"): String =
    s"$sourceTopic.$suffix"

  /** Connector-specific topic for one qualified `namespace.name` entry.
    * `database` is required only for SQL Server (its connector embeds
    * the database name as an extra leading segment).
    */
  def cdcTopicForEntry(
      prefix: String,
      sourceType: SourceType,
      qualifiedName: String,
      database: Option[String] = None): String = {
    val parts = qualifiedName.split("\\.", 2)
    require(parts.length == 2, s"expected namespace.name, got: $qualifiedName")
    val (namespace, name) = (parts(0), parts(1))
    sourceType match {
      case SqlServer =>
        val db = database.getOrElse(throw new IllegalArgumentException(
          "SQL Server topics need the database name"))
        s"$prefix.$db.$namespace.$name"
      case _ => cdcTopicName(prefix, namespace, name)
    }
  }

  /** All CDC (+ optional DLQ) topics for a capture list, in entry order. */
  def topicsForTables(
      prefix: String,
      sourceType: SourceType,
      tables: Seq[String],
      database: Option[String] = None,
      dlqEnabled: Boolean = true,
      dlqSuffix: String = "dlq"): Seq[String] =
    tables.flatMap { entry =>
      val t = cdcTopicForEntry(prefix, sourceType, entry, database)
      if (dlqEnabled) Seq(t, dlqTopicName(t, dlqSuffix)) else Seq(t)
    }

  // ---- Pub/Sub name mangling (F2): dots are illegal in Pub/Sub ----

  def pubsubTopicName(projectId: String, cdcTopic: String): String =
    s"projects/$projectId/topics/${cdcTopic.replace('.', '-')}"

  def pubsubSubscriptionName(projectId: String, cdcTopic: String, groupId: String): String =
    s"projects/$projectId/subscriptions/${cdcTopic.replace('.', '-')}-$groupId"

  def pubsubDlqTopicName(projectId: String, cdcTopic: String, suffix: String = "dlq"): String =
    s"projects/$projectId/topics/${cdcTopic.replace('.', '-')}-$suffix"

  /** Logical CDC topic back out of a fully-qualified Pub/Sub path. */
  def cdcTopicFromPubsub(pubsubTopic: String): String =
    pubsubTopic.substring(pubsubTopic.lastIndexOf('/') + 1).replace('-', '.')
}

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Test vectors from the reference's documented naming behavior
  * (`streaming/topics.py:31-69`, `sources/pubsub/naming.py:6-33`).
  */
class TopicNamingSpec extends AnyFunSuite {
  import TopicNaming._

  test("postgres / mysql / mongo use the 3-part form") {
    assert(cdcTopicForEntry("cdc", Postgres, "public.customers") === "cdc.public.customers")
    assert(cdcTopicForEntry("cdc", Mysql, "mydb.customers") === "cdc.mydb.customers")
    assert(cdcTopicForEntry("cdc", Mongo, "mydb.events") === "cdc.mydb.events")
  }

  test("sql server prepends the database: 4-part form") {
    assert(cdcTopicForEntry("cdc", SqlServer, "dbo.customers", Some("cdc_demo"))
      === "cdc.cdc_demo.dbo.customers")
    assertThrows[IllegalArgumentException] {
      cdcTopicForEntry("cdc", SqlServer, "dbo.customers")
    }
  }

  test("dlq topic appends the suffix") {
    assert(dlqTopicName("cdc.public.customers") === "cdc.public.customers.dlq")
    assert(dlqTopicName("cdc.public.customers", "dead") === "cdc.public.customers.dead")
  }

  test("topicsForTables interleaves cdc + dlq in entry order") {
    assert(topicsForTables("cdc", Postgres, Seq("public.a", "public.b")) ===
      Seq("cdc.public.a", "cdc.public.a.dlq", "cdc.public.b", "cdc.public.b.dlq"))
    assert(topicsForTables("cdc", Postgres, Seq("public.a"), dlqEnabled = false) ===
      Seq("cdc.public.a"))
  }

  test("pub/sub mangles dots to hyphens in fully-qualified paths") {
    assert(pubsubTopicName("p1", "cdc.public.customers")
      === "projects/p1/topics/cdc-public-customers")
    assert(pubsubSubscriptionName("p1", "cdc.public.customers", "g1")
      === "projects/p1/subscriptions/cdc-public-customers-g1")
    assert(pubsubDlqTopicName("p1", "cdc.public.customers")
      === "projects/p1/topics/cdc-public-customers-dlq")
  }

  test("pub/sub path round-trips back to the logical topic") {
    assert(cdcTopicFromPubsub("projects/p1/topics/cdc-public-customers")
      === "cdc.public.customers")
  }

  test("source type parsing accepts the reference aliases") {
    assert(SourceType.parse("postgresql") === Postgres)
    assert(SourceType.parse("mssql") === SqlServer)
    assertThrows[IllegalArgumentException](SourceType.parse("oracle"))
  }
}

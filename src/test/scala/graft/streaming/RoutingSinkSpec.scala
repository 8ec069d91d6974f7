package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.lakehouse.LakehouseTable

/** Per-table routing: one stream, N topics → N lakehouse tables with
  * independently inferred schemas.
  */
class RoutingSinkSpec extends SparkSpec {

  test("events route to per-topic tables with per-topic schemas") {
    val src = tmpDir("rt-src")
    Files.createDirectories(Paths.get(src))
    Files.writeString(Paths.get(src, "b.json"), Seq(
      """{"topic":"cdc.public.users","partition":0,"offset":0,"op":"c","ts_ms":1,"key":"{\"id\":1}","before":null,"after":"{\"id\":1,\"name\":\"ann\"}"}""",
      """{"topic":"cdc.public.orders","partition":0,"offset":0,"op":"c","ts_ms":2,"key":"{\"oid\":7}","before":null,"after":"{\"oid\":7,\"total\":99.5}"}""",
      """{"topic":"cdc.public.users","partition":0,"offset":1,"op":"c","ts_ms":3,"key":"{\"id\":2}","before":null,"after":"{\"id\":2,\"name\":\"bo\"}"}"""
    ).mkString("\n"))

    val router = new RoutingSink("rt", tmpDir("rt-wh"), spark)
    val pipe = new ChangePipeline(spark, src, Seq(router),
      new DlqWriter(new LakehouseTable(spark, tmpDir("rt-dlq"))), tmpDir("rt-ckpt"))
    pipe.start().awaitTermination(60000)

    val users = router.tableFor("cdc.public.users").read()
    val orders = router.tableFor("cdc.public.orders").read()
    assert(users.count() === 2)
    assert(orders.count() === 1)
    // schemas inferred per topic
    assert(users.columns.contains("name") && !users.columns.contains("total"))
    assert(orders.columns.contains("total") && !orders.columns.contains("name"))
    import spark.implicits._
    assert(orders.select("oid", "total").as[(Long, Double)].collect().toSet ===
      Set((7L, 99.5)))
    // routing never leaks the other topic's rows
    assert(users.select("_cdc_topic").distinct().as[String].collect().toSeq ===
      Seq("cdc.public.users"))
  }
}

package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** /health endpoint over the live monitor (runner.py health contract). */
class HealthServerSpec extends SparkSpec {

  test("GET /health reflects pipeline state as JSON") {
    val mon = new PipelineMonitor().register(spark)
    val srv = new HealthServer(mon)
    val port = srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val get = (u: String) => client.send(
        HttpRequest.newBuilder(URI.create(u)).GET().build(),
        HttpResponse.BodyHandlers.ofString())

      // idle: 200 with status idle
      val idle = get(s"http://127.0.0.1:$port/health")
      assert(idle.statusCode() === 200)
      assert(idle.body().contains("\"status\":\"idle\""))

      // run a query → component appears with row counts
      val dir = tmpDir("hs-src")
      Files.writeString(Paths.get(dir, "a.json"), """{"v":1}""")
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
        .json(dir)
        .writeStream.format("noop").queryName("hs-query")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val deadline = System.currentTimeMillis() + 10000
      var body = ""
      while (System.currentTimeMillis() < deadline && !body.contains("hs-query")) {
        body = get(s"http://127.0.0.1:$port/health").body()
        Thread.sleep(200)
      }
      assert(body.contains("\"hs-query\""))
      assert(body.contains("\"input_rows\":1"))
    } finally {
      srv.stop()
      mon.unregister(spark)
    }
  }
}

package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Deploy client against a live in-memory Kafka Connect stub: readiness
  * backoff, create/update/no-op idempotence on the config PUT, and the
  * rollback contract when a deployed connector reports FAILED
  * (`sources/debezium/client.py:50-115` + the engine's rollback
  * addition).
  */
class DebeziumClientSpec extends AnyFunSuite {

  /** Minimal Connect REST stub: connectors live in an in-memory map;
    * the status endpoint reports whatever `state` holds.
    */
  private final class ConnectStub {
    val connectors = scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]
    val state = new AtomicReference[String]("RUNNING")
    val putCount = new AtomicInteger(0)
    val rootFailures = new AtomicInteger(0) // GET / fails this many times first

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }

    private def configJson(c: Map[String, String]): String =
      c.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")

    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      (method, path.split("/").filter(_.nonEmpty).toList) match {
        case ("GET", Nil) =>
          if (rootFailures.getAndDecrement() > 0) respond(ex, 503, "")
          else respond(ex, 200, """{"version":"3.6.0"}""")
        case ("GET", List("connectors")) =>
          respond(ex, 200, connectors.keys.toSeq.sorted
            .map(n => s""""$n"""").mkString("[", ",", "]"))
        case ("GET", List("connectors", n, "config")) =>
          connectors.get(n) match {
            // real Connect injects the connector's `name` into this
            // response — the stub must too, so the client's no-op
            // equality check is tested against the faithful shape
            case Some(c) => respond(ex, 200, configJson(c + ("name" -> n)))
            case None => respond(ex, 404, "")
          }
        case ("PUT", List("connectors", n, "config")) =>
          putCount.incrementAndGet()
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val parsed = org.json4s.jackson.JsonMethods.parse(body) match {
            case org.json4s.JObject(fs) =>
              fs.collect { case (k, org.json4s.JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          }
          val existed = connectors.contains(n)
          connectors(n) = parsed
          respond(ex, if (existed) 200 else 201, configJson(parsed))
        case ("GET", List("connectors", n, "status")) =>
          if (!connectors.contains(n)) respond(ex, 404, "")
          else respond(ex, 200,
            s"""{"name":"$n","connector":{"state":"${state.get}"},"tasks":[]}""")
        case ("DELETE", List("connectors", n)) =>
          if (connectors.remove(n).isDefined) respond(ex, 204, "")
          else respond(ex, 404, "")
        case ("PUT", List("connectors", _, "pause" | "resume")) =>
          respond(ex, 202, "")
        case ("POST", List("connectors", _, "restart")) =>
          respond(ex, 204, "")
        case _ => respond(ex, 400, s"unhandled $method $path")
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def withStub(test: (ConnectStub, DebeziumClient) => Unit): Unit = {
    val stub = new ConnectStub
    // no real sleeping in specs — record the backoff schedule instead
    try test(stub, new DebeziumClient(stub.url, sleeper = _ => ()))
    finally stub.stop()
  }

  private val cfgV1 = Map("connector.class" -> "pg", "database.dbname" -> "app")
  private val cfgV2 = cfgV1 + ("snapshot.mode" -> "never")

  test("deploy vectors: fresh name creates, same config no-ops, new config updates") {
    withStub { (stub, client) =>
      assert(client.deploy("cdc-p1", cfgV1) === client.Created)
      assert(stub.connectors("cdc-p1") === cfgV1)
      val putsAfterCreate = stub.putCount.get

      // identical config: idempotent no-op, no PUT hits the wire
      assert(client.deploy("cdc-p1", cfgV1) === client.Unchanged)
      assert(stub.putCount.get === putsAfterCreate)

      assert(client.deploy("cdc-p1", cfgV2) === client.Updated)
      assert(stub.connectors("cdc-p1") === cfgV2)
    }
  }

  test("failed update rolls back to the previous config") {
    withStub { (stub, client) =>
      assert(client.deploy("cdc-p1", cfgV1) === client.Created)
      stub.state.set("FAILED")
      val e = intercept[ConnectError] { client.deploy("cdc-p1", cfgV2) }
      assert(e.getMessage.contains("rolled back"))
      // the bad config was replaced by the previous one
      assert(stub.connectors("cdc-p1") === cfgV1)
    }
  }

  test("failed create deletes the connector it made") {
    withStub { (stub, client) =>
      stub.state.set("FAILED")
      intercept[ConnectError] { client.deploy("cdc-p1", cfgV1) }
      assert(!stub.connectors.contains("cdc-p1"))
      assert(client.listConnectors().isEmpty)
    }
  }

  test("waitUntilReady retries with exponential backoff until the API answers") {
    val stub = new ConnectStub
    stub.rootFailures.set(3)
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val client = new DebeziumClient(stub.url, sleeper = delays += _)
    try {
      client.waitUntilReady(maxAttempts = 10, initialDelayMs = 100, maxDelayMs = 400)
      assert(delays.toSeq === Seq(100L, 200L, 400L)) // doubled, capped
    } finally stub.stop()
  }

  test("waitUntilReady gives up after maxAttempts") {
    val client = new DebeziumClient("http://127.0.0.1:1", sleeper = _ => ())
    val e = intercept[ConnectError] { client.waitUntilReady(maxAttempts = 2) }
    assert(e.getMessage.contains("not ready after 2 attempts"))
  }

  test("CRUD surface: status, list, pause/resume/restart, delete") {
    withStub { (stub, client) =>
      client.registerConnector("c1", cfgV1)
      assert(client.connectorState("c1") === Some("RUNNING"))
      assert(client.listConnectors() === Seq("c1"))
      client.pauseConnector("c1")
      client.resumeConnector("c1")
      client.restartConnector("c1")
      client.deleteConnector("c1")
      assert(client.connectorConfig("c1").isEmpty)
      assert(client.connectorState("c1").isEmpty)
    }
  }
}

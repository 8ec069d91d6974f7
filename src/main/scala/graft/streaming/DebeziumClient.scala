package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Kafka Connect (Debezium) REST client (SURVEY.md §2.1 S9, deploy
  * side; behavior from `sources/debezium/client.py:50-115`): readiness
  * wait with exponential backoff, idempotent connector registration via
  * `PUT /connectors/{name}/config` (200 and 201 both accepted — the
  * endpoint creates or updates), status/list/delete/pause/resume/
  * restart.
  *
  * `deploy` adds the engine's safety contract on top of the raw PUT:
  * a config identical to the deployed one is a no-op (no PUT), and a
  * connector that lands in FAILED state after an update is rolled back
  * to the previous config (or deleted, if this deploy created it) so a
  * bad config never stays live.
  */
final class ConnectError(msg: String) extends RuntimeException(msg)

final class DebeziumClient(
    connectUrl: String,
    requestTimeout: Duration = Duration.ofSeconds(10),
    sleeper: Long => Unit = Thread.sleep) {

  private val base = connectUrl.stripSuffix("/")
  private val client = HttpClient.newHttpClient()

  sealed trait DeployOutcome
  case object Created extends DeployOutcome
  case object Updated extends DeployOutcome
  case object Unchanged extends DeployOutcome
  case object RolledBack extends DeployOutcome

  // ---- plumbing ----

  private def req(path: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(s"$base$path")).timeout(requestTimeout)

  private def send(r: HttpRequest): HttpResponse[String] =
    client.send(r, HttpResponse.BodyHandlers.ofString())

  private def configToJson(config: Map[String, String]): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(config.toList.map { case (k, v) => k -> JString(v) })))

  // ---- health ----

  /** Block until the Connect REST API answers `GET /` (reference:
    * tenacity retry, exponential wait x2 capped at 30 s, 10 attempts,
    * reraise — `client.py:50-61`).
    */
  def waitUntilReady(maxAttempts: Int = 10, initialDelayMs: Long = 1000,
      maxDelayMs: Long = 30000): Unit = {
    var attempt = 0
    var delay = initialDelayMs
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val resp = send(req("/").GET().build())
        if (resp.statusCode() / 100 == 2) return
        throw new ConnectError(s"connect returned ${resp.statusCode()}")
      } catch {
        case e: Exception =>
          if (attempt >= maxAttempts) throw new ConnectError(
            s"Kafka Connect not ready after $maxAttempts attempts: ${e.getMessage}")
          sleeper(delay)
          delay = math.min(delay * 2, maxDelayMs)
      }
    }
  }

  // ---- CRUD (the reference's raw surface) ----

  /** Idempotent register-or-update; 200/201 accepted (`client.py:66-80`). */
  def registerConnector(name: String, config: Map[String, String]): Unit = {
    val resp = send(req(s"/connectors/$name/config")
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(configToJson(config))).build())
    if (resp.statusCode() != 200 && resp.statusCode() != 201)
      throw new ConnectError(
        s"Failed to register connector $name: ${resp.statusCode()} ${resp.body()}")
  }

  /** The currently-deployed config, or None for an unknown connector.
    * Kafka Connect injects a `name` key into this response that the
    * caller never submitted — strip it, or the [[deploy]] no-op
    * equality check would PUT on every identical redeploy.
    */
  def connectorConfig(name: String): Option[Map[String, String]] = {
    val resp = send(req(s"/connectors/$name/config").GET().build())
    if (resp.statusCode() == 404) None
    else if (resp.statusCode() / 100 != 2)
      throw new ConnectError(s"config fetch $name: ${resp.statusCode()}")
    else Some(JsonMethods.parse(resp.body()) match {
      case JObject(fields) =>
        fields.collect { case (k, JString(v)) if k != "name" => k -> v }.toMap
      case _ => Map.empty
    })
  }

  /** `connector.state` from the status endpoint; None while Connect has
    * no status yet (fresh create).
    */
  def connectorState(name: String): Option[String] = {
    val resp = send(req(s"/connectors/$name/status").GET().build())
    if (resp.statusCode() == 404) None
    else if (resp.statusCode() / 100 != 2)
      throw new ConnectError(s"status fetch $name: ${resp.statusCode()}")
    else (JsonMethods.parse(resp.body()) \ "connector" \ "state") match {
      case JString(s) => Some(s)
      case _ => None
    }
  }

  def listConnectors(): Seq[String] = {
    val resp = send(req("/connectors").GET().build())
    if (resp.statusCode() / 100 != 2)
      throw new ConnectError(s"list connectors: ${resp.statusCode()}")
    JsonMethods.parse(resp.body()) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
  }

  def deleteConnector(name: String): Unit = {
    val resp = send(req(s"/connectors/$name").DELETE().build())
    if (resp.statusCode() / 100 != 2 && resp.statusCode() != 404)
      throw new ConnectError(s"delete $name: ${resp.statusCode()}")
  }

  def pauseConnector(name: String): Unit = putAction(name, "pause")
  def resumeConnector(name: String): Unit = putAction(name, "resume")

  def restartConnector(name: String): Unit = {
    val resp = send(req(s"/connectors/$name/restart?includeTasks=true")
      .POST(HttpRequest.BodyPublishers.noBody()).build())
    if (resp.statusCode() / 100 != 2)
      throw new ConnectError(s"restart $name: ${resp.statusCode()}")
  }

  private def putAction(name: String, action: String): Unit = {
    val resp = send(req(s"/connectors/$name/$action")
      .PUT(HttpRequest.BodyPublishers.noBody()).build())
    if (resp.statusCode() / 100 != 2)
      throw new ConnectError(s"$action $name: ${resp.statusCode()}")
  }

  // ---- validated deploy with rollback ----

  /** Deploy `config` under `name`, with the no-op/rollback contract:
    *
    *  - identical config already live → `Unchanged`, no PUT issued;
    *  - fresh name → PUT, then poll the status; FAILED ⇒ delete the
    *    connector we just created and raise;
    *  - changed config → PUT, then poll; FAILED ⇒ PUT the previous
    *    config back and raise.
    *
    * Status polling treats 404/empty as "not reported yet" and accepts
    * the connector once RUNNING (or, within `statusAttempts`, any
    * non-FAILED terminal report).
    */
  def deploy(name: String, config: Map[String, String],
      statusAttempts: Int = 5, statusDelayMs: Long = 200): DeployOutcome = {
    val previous = connectorConfig(name)
    if (previous.contains(config)) return Unchanged
    registerConnector(name, config)

    var attempt = 0
    var state: Option[String] = None
    while (attempt < statusAttempts && !state.contains("RUNNING") &&
        !state.contains("FAILED")) {
      attempt += 1
      state = try connectorState(name) catch { case _: ConnectError => None }
      if (!state.contains("RUNNING") && !state.contains("FAILED") &&
        attempt < statusAttempts) sleeper(statusDelayMs)
    }
    if (state.contains("FAILED")) {
      previous match {
        case Some(old) => registerConnector(name, old)
        case None => deleteConnector(name)
      }
      throw new ConnectError(
        s"connector $name FAILED after deploy; rolled back to " +
          previous.fold("absent (deleted)")(_ => "previous config"))
    }
    if (previous.isEmpty) Created else Updated
  }
}

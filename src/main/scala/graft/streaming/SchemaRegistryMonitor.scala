package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Schema-Registry version poller (SURVEY.md §2.9 T10, full registry
  * flow; behavior from `streaming/schema_monitor.py:16-130`):
  *
  *  - per topic, the `-key` and `-value` subjects are polled at
  *    `GET <registry>/subjects/<subject>/versions/latest`;
  *  - 404 → subject not registered yet, skipped;
  *  - first sighting records (version, schema) silently;
  *  - a version CHANGE with `stopOnIncompatible` checks the OLD schema
  *    against the new latest via
  *    `POST <registry>/compatibility/subjects/<subject>/versions/latest`
  *    and, if `is_compatible=false`, latches `incompatibleDetected` and
  *    fires `onIncompatible` (the pipeline wires its own stop there,
  *    `pipeline/runner.py:90-95`);
  *  - per-subject failures are swallowed (monitoring must never take
  *    the pipeline down);
  *  - compatibility-endpoint failures default to compatible
  *    (`schema_monitor.py:113-130`).
  *
  * `checkOnce()` is the poll body; `start()` runs it on a daemon timer.
  */
final class SchemaRegistryMonitor(
    registryUrl: String,
    topics: Seq[String],
    intervalMs: Long = 30000,
    stopOnIncompatible: Boolean = false,
    onIncompatible: () => Unit = () => ()) {

  private val base = registryUrl.stripSuffix("/")
  private val client = HttpClient.newHttpClient()
  // mutated on the daemon timer thread, read from callers' threads —
  // concurrent maps, not plain mutable.Map (unsynchronized cross-thread
  // reads of a mutable.HashMap can see torn state)
  private val knownVersionsM = scala.collection.concurrent.TrieMap.empty[String, Int]
  private val knownSchemas = scala.collection.concurrent.TrieMap.empty[String, String]
  @volatile private var incompatible = false
  private var timer: Option[java.util.Timer] = None

  def knownVersions: Map[String, Int] = knownVersionsM.toMap
  def incompatibleDetected: Boolean = incompatible

  def checkOnce(): Unit =
    for (topic <- topics; suffix <- Seq("-key", "-value")) {
      val subject = s"$topic$suffix"
      try pollSubject(subject)
      catch { case _: Exception => () } // schema.check_failed: warn-only
    }

  private def pollSubject(subject: String): Unit = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/subjects/$subject/versions/latest"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 404) return
    require(resp.statusCode() / 100 == 2, s"registry ${resp.statusCode()}")
    val json = JsonMethods.parse(resp.body())
    val version = (json \ "version") match {
      case JInt(v) => v.toInt
      case _ => return
    }
    val schemaStr = (json \ "schema") match {
      case JString(s) => s
      case _ => ""
    }
    knownVersionsM.get(subject) match {
      case None =>
        knownVersionsM(subject) = version
        knownSchemas(subject) = schemaStr
      case Some(prev) if version != prev =>
        val compatible =
          if (stopOnIncompatible && knownSchemas.getOrElse(subject, "").nonEmpty)
            checkCompatibility(subject, knownSchemas(subject))
          else true
        if (!compatible) {
          incompatible = true
          onIncompatible()
        }
        knownVersionsM(subject) = version
        knownSchemas(subject) = schemaStr
      case _ => ()
    }
  }

  /** Old-vs-latest compatibility via the registry; errors → compatible. */
  private def checkCompatibility(subject: String, oldSchema: String): Boolean =
    try {
      val body = JsonMethods.compact(JsonMethods.render(
        JObject("schema" -> JString(oldSchema))))
      val resp = client.send(
        HttpRequest.newBuilder(
            URI.create(s"$base/compatibility/subjects/$subject/versions/latest"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200)
        (JsonMethods.parse(resp.body()) \ "is_compatible") match {
          case JBool(b) => b
          case _ => true
        }
      else true
    } catch { case _: Exception => true }

  def start(): Unit = {
    val t = new java.util.Timer(s"schema-monitor", true)
    t.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit = checkOnce()
    }, intervalMs, intervalMs)
    timer = Some(t)
  }

  def stop(): Unit = { timer.foreach(_.cancel()); timer = None }
}

package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import graft.config.PipelineCfg

/** Platform component health probes (SURVEY.md §2.9 T11, platform
  * side; behavior from `observability/health.py:25-153`): each probe
  * returns a named healthy/unhealthy/unknown component, and the report
  * aggregates them — healthy iff EVERY component is healthy.
  *
  * The reference probes its transports (Kafka brokers, schema
  * registry, Connect, Pub/Sub, Kinesis); the Spark engine's
  * counterparts are its storage surfaces (source envelope dir,
  * checkpoint dir, lakehouse table roots) plus the same two HTTP
  * control planes when configured (registry, Connect).
  */
object PlatformHealth {

  sealed abstract class Status(val value: String)
  case object Healthy extends Status("healthy")
  case object Unhealthy extends Status("unhealthy")
  case object Unknown extends Status("unknown")

  final case class ComponentHealth(name: String, status: Status, detail: String = "")

  /** Aggregate (`health.py:32-42`): healthy requires all components. */
  final case class Report(components: Seq[ComponentHealth]) {
    def healthy: Boolean = components.forall(_.status == Healthy)
    def summary: Map[String, String] =
      components.map(c => c.name -> c.status.value).toMap
  }

  private lazy val http = HttpClient.newHttpClient()

  /** Directory probe: exists (or creatable) and, if asked, writable —
    * proven by touching and removing a probe file, not by trusting
    * permission bits.
    */
  def checkDir(name: String, path: String, requireWritable: Boolean): ComponentHealth =
    try {
      val p = Paths.get(path)
      if (!Files.exists(p)) {
        if (!requireWritable)
          return ComponentHealth(name, Unhealthy, s"$path does not exist")
        Files.createDirectories(p)
      }
      if (!Files.isDirectory(p))
        return ComponentHealth(name, Unhealthy, s"$path is not a directory")
      if (requireWritable) {
        val probe = Files.createTempFile(p, ".health-", ".probe")
        Files.delete(probe)
      }
      ComponentHealth(name, Healthy,
        if (requireWritable) s"$path writable" else s"$path readable")
    } catch {
      case e: Exception => ComponentHealth(name, Unhealthy, e.toString)
    }

  /** HTTP control-plane probe: 2xx from `url+path` (the reference GETs
    * /subjects on the registry and /connectors on Connect).
    */
  def checkHttp(name: String, url: String, path: String): ComponentHealth =
    try {
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(url.stripSuffix("/") + path))
          .timeout(java.time.Duration.ofSeconds(5)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2)
        ComponentHealth(name, Healthy, s"HTTP ${resp.statusCode()}")
      else ComponentHealth(name, Unhealthy, s"HTTP ${resp.statusCode()}")
    } catch {
      case e: Exception => ComponentHealth(name, Unhealthy, e.toString)
    }

  /** All probes a pipeline config implies (`health.py:131-153` shape). */
  def checkPlatform(cfg: PipelineCfg, connectUrl: Option[String] = None): Report = {
    val dirs = Seq(
      checkDir("source-dir", cfg.sourceDir, requireWritable = false),
      checkDir("checkpoint-dir", cfg.checkpointDir, requireWritable = true))
    val lakehouses = cfg.sinks.filter(_.enabled).flatMap(_.lakehouse).map(lh =>
      checkDir(s"lakehouse:${lh.tablePath}", lh.tablePath, requireWritable = true))
    val dlq = cfg.dlq.tablePath.map(p =>
      checkDir("dlq-table", p, requireWritable = true)).toSeq
    val registry = cfg.registry.map(r =>
      checkHttp("schema-registry", r.url, "/subjects")).toSeq
    val connect = connectUrl.map(u =>
      checkHttp("kafka-connect", u, "/connectors")).toSeq
    Report(dirs ++ lakehouses ++ dlq ++ registry ++ connect)
  }
}

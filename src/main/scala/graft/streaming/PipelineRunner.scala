package graft.streaming

import java.time.Duration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DataType, StructType}

import graft.config._
import graft.lakehouse.LakehouseTable

/** Config → running pipeline wiring (the reference's `cdc run
  * pipeline.yaml` UX, `cli.py:169-192` + `pipeline/runner.py`): build
  * each enabled sink from its validated config, attach the DLQ, apply
  * the capture include-list, and start the streaming query.
  */
object PipelineRunner {

  /** A wired pipeline plus its per-table maintenance schedulers. Each
    * scheduler shares the SINK's own `LakehouseTable` instance — the
    * single-writer lock is per-instance, so sharing the instance is
    * what makes writer-vs-maintenance exclusion actually hold (the
    * reference passes the iceberg sink's lock into the maintenance
    * loops the same way, `sinks/iceberg.py:93-101`).
    */
  final case class Built(
      pipeline: ChangePipeline,
      maintenance: Seq[graft.lakehouse.MaintenanceScheduler])

  /** Construct (but don't start) the pipeline a config describes. */
  def build(spark: SparkSession, cfg: PipelineCfg): ChangePipeline =
    buildAll(spark, cfg).pipeline

  def buildAll(spark: SparkSession, cfg: PipelineCfg): Built = {
    val parts = cfg.sinks.filter(_.enabled).map(buildSink(spark, _))
    val sinks = parts.map(_._1)
    require(sinks.nonEmpty, s"pipeline ${cfg.pipelineId} has no enabled sinks")
    val dlqTable = new LakehouseTable(spark, cfg.dlq.tablePath.getOrElse(
      java.nio.file.Files.createTempDirectory(s"${cfg.pipelineId}-dlq").toString))
    val dlqWriter = new DlqWriter(dlqTable,
      enabled = cfg.dlq.enabled,
      topicSuffix = cfg.dlq.topicSuffix,
      includeHeaders = cfg.dlq.includeHeaders,
      flushIntervalSeconds = cfg.dlq.flushIntervalSeconds)
    Built(
      new ChangePipeline(spark, cfg.sourceDir, sinks, dlqWriter,
        cfg.checkpointDir,
        includeTopics = cfg.includeTopics,
        maxFilesPerTrigger = cfg.maxFilesPerTrigger,
        dlqMaxRetries = cfg.dlq.maxRetries),
      parts.flatMap(_._2))
  }

  private def buildSink(spark: SparkSession, s: SinkCfg)
      : (Sink, Option[graft.lakehouse.MaintenanceScheduler]) = s.sinkType match {
    case "lakehouse" =>
      val lh = s.lakehouse.get
      val table = new LakehouseTable(spark, lh.tablePath)
      val sink = lh.payloadSchemaJson match {
        case Some(json) =>
          new LakehouseSink(s.sinkId, table,
            DataType.fromJson(json).asInstanceOf[StructType], lh.upsertKeys)
        case None => // auto-create: infer from the first batch
          new LakehouseSink(s.sinkId, table, lh.upsertKeys)
      }
      val maint = Option.when(lh.maintenance.enabled)(
        new graft.lakehouse.MaintenanceScheduler(table,
          expireOlderThanMs = lh.maintenance.expireOlderThanMs,
          expireIntervalMs = lh.maintenance.expireIntervalMs,
          compactIntervalMs = lh.maintenance.compactIntervalMs,
          compactFileThreshold = lh.maintenance.compactFileThreshold,
          compactMaxRows = lh.maintenance.compactMaxRows,
          zorderCols = lh.maintenance.zorderCols,
          bloomIndexCols = lh.maintenance.bloomIndexCols,
          annIndexRoot = lh.maintenance.annIndexRoot,
          annRebuildIntervalMs = lh.maintenance.annRebuildIntervalMs,
          annRebalanceSkewThreshold = lh.maintenance.annRebalanceSkewThreshold))
      (sink, maint)
    case "webhook" =>
      val w = s.webhook.get
      (new WebhookSink(s.sinkId, w.url,
        RetryPolicy(s.retry.maxAttempts, s.retry.initialDelayMs, s.retry.maxDelayMs),
        Duration.ofMillis((w.timeoutSeconds * 1000).toLong),
        method = w.method,
        headers = w.headers,
        authToken = w.authToken), None)
    case "postgres" =>
      val p = s.postgres.get
      // table path derives from the schema-qualified target name
      (new PostgresLikeSink(s.sinkId, new LakehouseTable(spark,
        java.nio.file.Files.createTempDirectory(
          s"pg-${p.targetTable.replace('.', '_')}").toString)), None)
    case other => throw new IllegalArgumentException(s"unknown sink_type $other")
  }

  /** A started pipeline: the streaming query plus every companion
    * service the config wired up, so callers can stop the whole unit
    * (stopping only the query would leave maintenance timers mutating
    * the table and the registry poller running).
    */
  final case class Running(
      query: StreamingQuery,
      maintenance: Seq[graft.lakehouse.MaintenanceScheduler],
      monitor: Option[SchemaRegistryMonitor],
      pipeline: Option[ChangePipeline] = None,
      health: Option[(HealthServer, Int)] = None,
      private[streaming] val onStop: () => Unit = () => ()) {
    /** Bound health endpoint port, when the platform enabled one. */
    def healthPort: Option[Int] = health.map(_._2)
    def stop(): Unit = {
      monitor.foreach(_.stop())
      maintenance.foreach(_.stop())
      query.stop()
      // interval-buffered DLQ rows must not die with the process
      // (the reference flushes its DLQ producer on shutdown,
      // `pipeline/runner.py:332`)
      pipeline.foreach(_.flushDlq())
      health.foreach(_._1.stop())
      onStop()
    }
  }

  /** Wire the pipeline + maintenance + (if configured) the registry
    * monitor, and start all of them. With `registry.stop_on_incompatible`
    * an incompatible schema change stops the streaming query — the
    * reference's `on_incompatible=self.stop` (`pipeline/runner.py:90-95`).
    *
    * With a platform config whose `health_enabled` is set, a health
    * endpoint starts beside the pipeline on `health_port` (0 = any) and
    * stops with it — the reference's `pipeline/runner.py:97-103,299`.
    */
  def start(spark: SparkSession, cfg: PipelineCfg,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      platform: Option[graft.config.PlatformCfg] = None): Running = {
    val built = buildAll(spark, cfg)
    // cleanup stack: anything started before a later wiring step throws
    // (e.g. the health port is already bound) must be stopped — a
    // detached streaming query would keep the checkpoint lock and
    // buffered DLQ rows would never flush
    val started = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    def cleanupAndRethrow(e: Throwable): Nothing = {
      started.reverseIterator.foreach(c =>
        try c() catch { case _: Exception => () })
      throw e
    }
    try {
      built.maintenance.foreach { m => m.start(); started += (() => m.stop()) }
      val query = built.pipeline.start(trigger)
      started += { () => query.stop(); built.pipeline.flushDlq() }
      val monitor = cfg.registry.map { r =>
        val m = new SchemaRegistryMonitor(r.url,
          topics = cfg.includeTopics,
          intervalMs = r.intervalMs,
          stopOnIncompatible = r.stopOnIncompatible,
          onIncompatible = () => query.stop())
        m.start()
        started += (() => m.stop())
        m
      }
      val health = platform.filter(_.healthEnabled).map { p =>
        val mon = new PipelineMonitor().register(spark)
        started += (() => mon.unregister(spark))
        val srv = new HealthServer(mon, port = p.healthPort,
          platformCheck = Some(() => PlatformHealth.checkPlatform(cfg,
            p.connector.map(_.connectUrl))),
          // the lag probe is a full batch scan of the envelope store —
          // memoized so a monitoring system polling every few seconds
          // doesn't run one Spark job per poll
          lagCheck = Some(throttled(LagProbeTtlMs)(() => built.pipeline.consumerLag())))
        ((srv, srv.start()), mon)
      }
      Running(query, built.maintenance, monitor, Some(built.pipeline),
        health = health.map(_._1),
        onStop = () => health.foreach(_._2.unregister(spark)))
    } catch { case e: Throwable => cleanupAndRethrow(e) }
  }

  /** TTL for the /health/lag probe's memoized store scan. */
  val LagProbeTtlMs = 5000L

  /** Memoize a probe result for `ttlMs` (single-flight not needed: the
    * worst case is one redundant scan on a concurrent first call).
    */
  private[streaming] def throttled[A](ttlMs: Long)(f: () => A): () => A = {
    val ref = new java.util.concurrent.atomic.AtomicReference[(Long, A)]
    () => {
      val cur = ref.get()
      val now = System.currentTimeMillis()
      if (cur != null && now - cur._1 < ttlMs) cur._2
      else { val v = f(); ref.set((now, v)); v }
    }
  }

  /** Load a YAML config, wire everything, start everything. */
  def run(spark: SparkSession, configPath: String): Running =
    start(spark, PipelineConfigLoader.load(configPath))
}


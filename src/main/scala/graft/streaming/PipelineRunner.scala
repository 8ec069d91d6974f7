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

  /** Construct (but don't start) the pipeline a config describes. */
  def build(spark: SparkSession, cfg: PipelineCfg): ChangePipeline = {
    val sinks: Seq[Sink] = cfg.sinks.filter(_.enabled).map(buildSink(spark, _))
    require(sinks.nonEmpty, s"pipeline ${cfg.pipelineId} has no enabled sinks")
    val dlqTable = new LakehouseTable(spark, cfg.dlq.tablePath.getOrElse(
      java.nio.file.Files.createTempDirectory(s"${cfg.pipelineId}-dlq").toString))
    new ChangePipeline(spark, cfg.sourceDir, sinks, new DlqWriter(dlqTable),
      cfg.checkpointDir,
      includeTopics = cfg.includeTopics,
      maxFilesPerTrigger = cfg.maxFilesPerTrigger)
  }

  private def buildSink(spark: SparkSession, s: SinkCfg): Sink = s.sinkType match {
    case "lakehouse" =>
      val lh = s.lakehouse.get
      val table = new LakehouseTable(spark, lh.tablePath)
      lh.payloadSchemaJson match {
        case Some(json) =>
          new LakehouseSink(s.sinkId, table,
            DataType.fromJson(json).asInstanceOf[StructType], lh.upsertKeys)
        case None => // auto-create: infer from the first batch
          new LakehouseSink(s.sinkId, table, lh.upsertKeys)
      }
    case "webhook" =>
      val w = s.webhook.get
      new WebhookSink(s.sinkId, w.url,
        RetryPolicy(s.retry.maxAttempts, s.retry.initialDelayMs, s.retry.maxDelayMs),
        Duration.ofSeconds(10))
    case "postgres" =>
      val p = s.postgres.get
      // table path derives from the schema-qualified target name
      new PostgresLikeSink(s.sinkId, new LakehouseTable(spark,
        java.nio.file.Files.createTempDirectory(
          s"pg-${p.targetTable.replace('.', '_')}").toString))
    case other => throw new IllegalArgumentException(s"unknown sink_type $other")
  }

  /** Load a YAML config, wire the pipeline, start it. */
  def run(spark: SparkSession, configPath: String): StreamingQuery =
    build(spark, PipelineConfigLoader.load(configPath)).start()
}

/** `graft.streaming.PipelineCli run pipeline.yaml` — the config-driven
  * entry point (the reference's `cdc run`, `cli.py:169-192`).
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args(0) == "run",
      "usage: PipelineCli run <pipeline.yaml>")
    val cfg = PipelineConfigLoader.load(args(1))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName(s"graft-pipeline-${cfg.pipelineId}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"Starting pipeline: ${cfg.pipelineId}")
    cfg.sinks.filter(_.enabled).foreach(s => println(s"  sink: ${s.sinkId} (${s.sinkType})"))
    PipelineRunner.build(spark, cfg).start().awaitTermination()
  }
}

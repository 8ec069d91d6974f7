package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec
import graft.lakehouse.LakehouseTable

/** `DLQConfig` knob semantics (`config/models.py:207-214` +
  * `streaming/dlq.py:25-93`): enabled gate, topic suffix naming,
  * header suppression, pipeline-level retry budget before routing,
  * and interval-buffered flushing.
  */
class DlqConfigSpec extends SparkSpec {

  private def batch(): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(
      Row("t", 0, 0L, "c", 1L, """{"id":1}""", null, """{"id":1}"""),
      Row("t", 0, 1L, "c", 2L, """{"id":2}""", null, """{"id":2}""")
    ).asJava, ChangeEnvelope.schema)
  }

  private class FailingSink(failTimes: Int) extends Sink {
    val sinkId = "failing"
    val attempts = new AtomicInteger(0)
    override def write(b: DataFrame, batchId: Long): Unit =
      if (attempts.incrementAndGet() <= failTimes)
        throw new RuntimeException("sink down")
  }

  private def pipeline(sink: Sink, dlq: DlqWriter, maxRetries: Int = 0) =
    new ChangePipeline(spark, tmpDir("dlqc-src"), Seq(sink), dlq,
      tmpDir("dlqc-ckpt"), dlqMaxRetries = maxRetries)

  test("dlq_topic names the destination from the source topic + configured suffix") {
    val table = new LakehouseTable(spark, tmpDir("dlqc-t1"))
    val dlq = new DlqWriter(table, topicSuffix = "deadletters")
    pipeline(new FailingSink(Int.MaxValue), dlq).processBatch(batch(), 0L)
    val topics = table.read().select("dlq_topic").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(topics === Seq("t.deadletters"))
  }

  test("include_headers=false drops the diagnostic columns but keeps the event") {
    val table = new LakehouseTable(spark, tmpDir("dlqc-t2"))
    val dlq = new DlqWriter(table, includeHeaders = false)
    pipeline(new FailingSink(Int.MaxValue), dlq).processBatch(batch(), 0L)
    val cols = table.read().columns.toSet
    assert(!cols.exists(_.startsWith("dlq_error")), cols.mkString(","))
    assert(!cols.contains("dlq_sink_id"))
    assert(cols.contains("key") && cols.contains("after") && cols.contains("op"))
    assert(table.read().count() === 2)
  }

  test("enabled=false routes nothing (dlq.py:37-38)") {
    val table = new LakehouseTable(spark, tmpDir("dlqc-t3"))
    val dlq = new DlqWriter(table, enabled = false)
    pipeline(new FailingSink(Int.MaxValue), dlq).processBatch(batch(), 0L)
    assert(table.listSnapshots().isEmpty, "disabled DLQ must never write")
  }

  test("max_retries: transient failure within the budget recovers without DLQ") {
    val table = new LakehouseTable(spark, tmpDir("dlqc-t4"))
    val sink = new FailingSink(failTimes = 2)
    val pipe = pipeline(sink, new DlqWriter(table), maxRetries = 2)
    pipe.processBatch(batch(), 0L)
    assert(sink.attempts.get() === 3, "1 initial + 2 retries")
    assert(table.listSnapshots().isEmpty, "recovered batch must not DLQ")
    // flushed offsets advanced on the successful attempt
    assert(pipe.ledger.committedSoFar === Map(("t", 0) -> 1L))
  }

  test("max_retries: budget exhausted routes ONCE after exactly 1+max attempts") {
    val table = new LakehouseTable(spark, tmpDir("dlqc-t5"))
    val sink = new FailingSink(Int.MaxValue)
    val pipe = pipeline(sink, new DlqWriter(table), maxRetries = 2)
    pipe.processBatch(batch(), 0L)
    assert(sink.attempts.get() === 3)
    assert(table.read().count() === 2, "one routed batch, both events")
    assert(pipe.ledger.committedSoFar === Map.empty)
  }

  test("flush_interval_seconds > 0 buffers routed rows until flush") {
    val table = new LakehouseTable(spark, tmpDir("dlqc-t6"))
    val dlq = new DlqWriter(table, flushIntervalSeconds = 3600.0)
    val pipe = pipeline(new FailingSink(Int.MaxValue), dlq)
    pipe.processBatch(batch(), 0L)
    assert(table.listSnapshots().isEmpty, "rows must buffer inside the interval")
    pipe.flushDlq()
    assert(table.read().count() === 2)
    assert(table.read().select("dlq_topic").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("t.dlq"))
  }

  test("interval timer delivers buffered rows with NO further route() traffic") {
    // the librdkafka-background-thread analogue: rows routed once must
    // reach the table on the interval even if no other batch ever
    // fails — previously delivery waited for the next route() call.
    // Pin the DAEMON TIMER specifically, not route()'s inline elapsed
    // check: warm the session first so route() completes well inside
    // the interval, then prove the buffer was still pending when
    // route() returned — after that, only the timer can deliver.
    // interval = 10 s: the construction→route and route→assert spans
    // below touch only a warmed 2-row collect and a local dir listing,
    // so a spurious inline flush / pre-assert tick would need a >10 s
    // stall of trivial work — comfortably outside loaded-CI jitter
    // (3 s was within reach of one bad GC pause)
    val table = new LakehouseTable(spark, tmpDir("dlqc-t7"))
    batch().limit(1).collect() // warm codegen/job machinery off the clock
    val dlq = new DlqWriter(table, flushIntervalSeconds = 10.0)
    dlq.route(batch(), "s1", new RuntimeException("down"))
    assert(table.listSnapshots().isEmpty,
      "rows must still be buffered when route() returns (inline check must NOT have fired)")
    val deadline = System.currentTimeMillis() + 40000
    while (table.listSnapshots().isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(table.read().count() === 2,
      "timer must append buffered rows without another route() call")
    dlq.close()
  }

  test("buffered mode bypasses the driver buffer for oversized batches") {
    // a batch beyond MaxPendingRows must never be collect()ed — it
    // appends straight to the table while small batches keep buffering
    import scala.jdk.CollectionConverters._
    val big = spark.createDataFrame(
      (0 until DlqWriter.MaxPendingRows + 5).map(i =>
        Row("t", 0, i.toLong, "c", i.toLong, s"""{"id":$i}""", null, s"""{"id":$i}""")
      ).asJava, ChangeEnvelope.schema)
    val table = new LakehouseTable(spark, tmpDir("dlqc-t8"))
    val dlq = new DlqWriter(table, flushIntervalSeconds = 3600.0)
    dlq.route(big, "s1", new RuntimeException("down"))
    assert(table.read().count() === DlqWriter.MaxPendingRows + 5,
      "oversized batch must append directly on route()")
    // a small batch after it still buffers until flush
    dlq.route(batch(), "s1", new RuntimeException("down"))
    assert(table.read().count() === DlqWriter.MaxPendingRows + 5)
    dlq.close()
    assert(table.read().count() === DlqWriter.MaxPendingRows + 7)
  }
}

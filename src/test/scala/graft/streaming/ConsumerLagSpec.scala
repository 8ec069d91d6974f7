package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.lakehouse.LakehouseTable

/** Consumer-lag semantics over the envelope store
  * (`observability/metrics.py` + `pipeline/runner.py:408-415`): lag =
  * high watermark − committed, nothing-committed partitions count every
  * message, DLQ topics are excluded, and a drained pipeline reports 0.
  */
class ConsumerLagSpec extends SparkSpec {

  private def write(dir: String, file: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(dir, file), lines.mkString("\n"))

  private def env(topic: String, p: Int, o: Long): String =
    s"""{"topic":"$topic","partition":$p,"offset":$o,"op":"c","ts_ms":1,"key":"{\\"id\\":$o}","before":null,"after":"{\\"id\\":$o}"}"""

  test("high watermark vs committed; uncommitted partitions count from -1; DLQ excluded") {
    val dir = tmpDir("lag-src")
    write(dir, "a.json", Seq(env("t", 0, 0), env("t", 0, 1), env("t", 0, 2),
      env("t", 1, 0), env("u.dlq", 0, 7)))
    val lags = ConsumerLag.compute(spark, dir, Map(("t", 0) -> 1L))
    assert(lags === Seq(
      ConsumerLag.PartitionLag("t", 0, 1L, 2L, 1L),
      ConsumerLag.PartitionLag("t", 1, -1L, 0L, 1L)))
  }

  test("a drained pipeline reports zero lag; undrained backlog shows up") {
    val src = tmpDir("lag2-src")
    write(src, "a.json", Seq(env("t", 0, 0), env("t", 0, 1)))
    val pipe = new ChangePipeline(spark, src,
      Seq(new LakehouseSink("lh", new LakehouseTable(spark, tmpDir("lag2-lh")), Nil)),
      new DlqWriter(new LakehouseTable(spark, tmpDir("lag2-dlq"))), tmpDir("lag2-ckpt"))
    pipe.start().awaitTermination(60000)
    assert(pipe.consumerLag() === Seq(ConsumerLag.PartitionLag("t", 0, 1L, 1L, 0L)))
    // backlog lands in the store without the pipeline running
    write(src, "b.json", Seq(env("t", 0, 2), env("t", 0, 3)))
    assert(pipe.consumerLag() === Seq(ConsumerLag.PartitionLag("t", 0, 1L, 3L, 2L)))
  }
}

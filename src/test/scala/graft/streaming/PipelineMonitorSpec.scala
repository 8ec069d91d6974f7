package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Progress monitor health snapshot (T11 / `Pipeline.health()` shape). */
class PipelineMonitorSpec extends SparkSpec {

  test("health reflects query lifecycle and row counts") {
    val mon = new PipelineMonitor().register(spark)
    try {
      val dir = tmpDir("mon-src")
      Files.writeString(Paths.get(dir, "a.json"), """{"v":1}""" + "\n" + """{"v":2}""")
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
        .json(dir)
        .writeStream.format("noop").queryName("mon-test")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // listener events are async — allow them to drain
      val deadline = System.currentTimeMillis() + 10000
      def comp = mon.health()("components").asInstanceOf[Map[String, Map[String, Any]]]
      while (System.currentTimeMillis() < deadline &&
        !comp.get("mon-test").exists(_("input_rows").asInstanceOf[Long] >= 2L))
        Thread.sleep(200)
      val c = comp("mon-test")
      assert(c("input_rows").asInstanceOf[Long] === 2L)
      assert(c("batches").asInstanceOf[Long] >= 1L)
    } finally mon.unregister(spark)
  }
}

package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.lakehouse.LakehouseTable

/** S11 sink semantics (`sinks/postgres.py`): 5-tuple row shape, ON
  * CONFLICT idempotent upsert on the transport coordinates; plus the
  * iceberg-style auto-create (schema inferred from first batch).
  */
class PostgresLikeSinkSpec extends SparkSpec {

  private def envelopes(dir: String, lines: Seq[String], file: String = "b.json"): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, file), lines.mkString("\n"))
  }

  private def ev(offset: Long, id: Long, name: String): String =
    s"""{"topic":"t","partition":0,"offset":$offset,"op":"c","ts_ms":1,"key":"{\\"id\\":$id}","before":null,"after":"{\\"id\\":$id,\\"name\\":\\"$name\\"}"}"""

  test("5-tuple row shape; replay upserts instead of duplicating") {
    val src = tmpDir("pg-src")
    envelopes(src, Seq(ev(0, 1, "a"), ev(1, 2, "b")))
    val table = new LakehouseTable(spark, tmpDir("pg-table"))

    val run = (ckpt: String) => {
      new ChangePipeline(spark, src,
        Seq(new PostgresLikeSink("pg", table)),
        new DlqWriter(new LakehouseTable(spark, tmpDir("pg-dlq"))), ckpt)
        .start().awaitTermination(60000)
    }
    run(tmpDir("pg-ckpt1"))
    assert(table.read().columns.toSet === Set(
      "event_key", "event_value", "source_topic", "source_partition", "source_offset"))
    assert(table.read().count() === 2)

    // redelivery through a fresh checkpoint: ON CONFLICT semantics absorb it
    run(tmpDir("pg-ckpt2"))
    assert(table.read().count() === 2)
  }

  test("lakehouse sink auto-creates from first batch (schema inference)") {
    val src = tmpDir("auto-src")
    envelopes(src, Seq(ev(0, 1, "ann"), ev(1, 2, "bo")))
    val table = new LakehouseTable(spark, tmpDir("auto-table"))
    val pipe = new ChangePipeline(spark, src,
      Seq(new LakehouseSink("lh", table, upsertKeys = Seq("id"))),
      new DlqWriter(new LakehouseTable(spark, tmpDir("auto-dlq"))), tmpDir("auto-ckpt"))
    pipe.start().awaitTermination(60000)

    val df = table.read()
    assert(df.count() === 2)
    // inferred: id as bigint, name as string
    assert(df.schema("id").dataType === LongType)
    assert(df.schema("name").dataType === StringType)
  }
}

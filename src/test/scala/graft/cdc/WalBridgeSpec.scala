package graft.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.lakehouse.LakehouseTable
import graft.streaming._

/** Full WAL path E2E (SURVEY.md §3.2): binary pgoutput stream →
  * distributed decode → transport serialization (topic naming, sorted
  * JSON keys, ISO timestamps) → envelope → streaming pipeline →
  * lakehouse table. Also pins the md5 virtual partitioner (F3).
  */
class WalBridgeSpec extends SparkSpec {

  // ---- binary builders (same wire format as PgOutputDecoderSpec) ----
  private def u16(v: Int) = ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def u32(v: Long) = ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def i64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()
  private def cstr(s: String) = s.getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0)

  private def begin(lsn: Long, tsUs: Long) = "B".getBytes ++ i64(lsn) ++ i64(tsUs) ++ u32(1)
  private def relation(relId: Long, table: String, cols: Seq[String]) = {
    var d = "R".getBytes ++ u32(relId) ++ cstr("public") ++ cstr(table) ++
      Array[Byte](0) ++ u16(cols.size)
    cols.foreach(c => d = d ++ Array[Byte](0) ++ cstr(c) ++ u32(23) ++ u32(0))
    d
  }
  private def tup(values: Seq[String]) = {
    var d = u16(values.size)
    values.foreach { v =>
      val b = v.getBytes(StandardCharsets.UTF_8)
      d = d ++ "t".getBytes ++ u32(b.length) ++ b
    }
    d
  }
  private def ins(relId: Long, values: Seq[String]) =
    "I".getBytes ++ u32(relId) ++ "N".getBytes ++ tup(values)
  private def upd(relId: Long, values: Seq[String]) =
    "U".getBytes ++ u32(relId) ++ "N".getBytes ++ tup(values)

  test("virtual partitioner is md5-bit-compatible with the reference") {
    // int(hashlib.md5(b"public.users").hexdigest()[:4], 16) % 16:
    // md5 -> "5233..", 0x5233 % 16 == 3
    assert(VirtualPartitioner.partitionOf("public.users", 16) === 3)
    // md5(b"public.orders") -> "3f03..", 0x3f03 % 16 == 3
    assert(VirtualPartitioner.partitionOf("public.orders", 16) === 3)
    // and a different bucket for a different key
    assert(VirtualPartitioner.partitionOf("public.users", 7) === 0x5233 % 7)
  }

  test("distributed decode + transport serialization shapes") {
    import spark.implicits._
    val stream: Seq[Array[Byte]] = Seq(
      begin(500, 2000000),
      relation(1, "users", Seq("id", "name")),
      ins(1, Seq("1", "ann")),
      upd(1, Seq("1", "ann2")))
    // single partition: per-partition order preserves the relation cache
    val ds = spark.createDataset(stream)(Encoders.BINARY).repartition(1)
    val changes = WalBridge.decode(ds).collect().sortBy(_.lsn)
    assert(changes.length === 2)

    val msgs = WalBridge.toTransport(
      spark.createDataset(changes.toSeq), "cdc").collect().toSeq
    assert(msgs.forall(_.topic === "cdc.public.users"))
    assert(msgs.forall(_.orderingKey === "public.users"))
    val insMsg = msgs.find(_.value.contains("\"operation\":\"insert\"")).get
    // sorted-key canonical JSON
    assert(insMsg.key === """{"id":"1","name":"ann"}""")
    assert(insMsg.value.contains("\"lsn\":500"))
    assert(insMsg.value.contains("\"timestamp\":\"2000-01-01T00:00:02+00:00\""))
    assert(insMsg.value.contains("\"after\":{\"id\":\"1\",\"name\":\"ann\"}"))
  }

  private object Encoders {
    val BINARY = org.apache.spark.sql.Encoders.BINARY
  }

  test("binary WAL stream to lakehouse table, end to end") {
    import spark.implicits._
    val stream: Seq[Array[Byte]] = Seq(
      begin(100, 0),
      relation(7, "accounts", Seq("id", "balance")),
      ins(7, Seq("1", "10")),
      ins(7, Seq("2", "20")),
      upd(7, Seq("1", "15")))
    val ds = spark.createDataset(stream)(Encoders.BINARY).repartition(1)
    val changes = WalBridge.decode(ds).collect().toSeq
    val msgs = WalBridge.toTransport(spark.createDataset(changes), "cdc").collect().toSeq
    val lines = WalBridge.toEnvelopeJson(msgs)

    val src = tmpDir("wal-e2e-src")
    Files.writeString(Paths.get(src, "wal.json"), lines.mkString("\n"))

    // payload: the serialized change value; apply latest-by-key on id
    val changeSchema = StructType(Seq(
      StructField("operation", StringType), StructField("table", StringType),
      StructField("lsn", LongType),
      StructField("after", StructType(Seq(
        StructField("id", StringType), StructField("balance", StringType))))))
    val table = new LakehouseTable(spark, tmpDir("wal-e2e-table"))
    val sink = new Sink {
      val sinkId = "lh"
      override def write(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        import org.apache.spark.sql.functions._
        val rows = batch
          .withColumn("c", from_json(col("after"), changeSchema))
          .select(col("c.after.id").cast(LongType).as("id"),
            col("c.after.balance").cast(LongType).as("balance"),
            col("c.lsn").as("lsn"), col("offset"))
        // CDC apply: latest offset per id wins
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("offset").desc)
        val latest = rows.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn", "lsn", "offset")
        table.upsert(latest, Seq("id"))
      }
    }
    val pipe = new ChangePipeline(spark, src, Seq(sink),
      new DlqWriter(new LakehouseTable(spark, tmpDir("wal-e2e-dlq"))), tmpDir("wal-e2e-ckpt"))
    pipe.start().awaitTermination(60000)

    val state = table.read().select("id", "balance")
      .as[(Long, Long)].collect().toSet
    assert(state === Set((1L, 15L), (2L, 20L))) // update applied over insert
  }
}

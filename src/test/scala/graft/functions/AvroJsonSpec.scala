package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro Debezium-envelope decode through the SQL surface: binary column
  * → avro_to_json → from_json → typed fields. Envelope shape mirrors
  * the reference benchmark producer's schema
  * (`tests/benchmark/helpers.py:103-154`).
  */
class AvroJsonSpec extends SparkSpec {

  private val envelopeSchemaJson =
    """{
      "type": "record", "name": "Envelope", "namespace": "cdc.test",
      "fields": [
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "before", "type": ["null", {"type": "record", "name": "Row",
          "fields": [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}]}],
          "default": null},
        {"name": "after", "type": ["null", "Row"], "default": null}
      ]
    }"""

  private def avroBytes(op: String, tsMs: Long, id: Long, name: String,
      framed: Boolean): Array[Byte] = {
    val schema = new Schema.Parser().parse(envelopeSchemaJson)
    val rowSchema = schema.getField("after").schema().getTypes.get(1)
    val row = new GenericData.Record(rowSchema)
    row.put("id", id)
    row.put("name", name)
    val rec = new GenericData.Record(schema)
    rec.put("op", op)
    rec.put("ts_ms", tsMs)
    rec.put("after", row)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val body = out.toByteArray
    if (framed) Array[Byte](0, 0, 0, 0, 42) ++ body else body
  }

  test("confluent-framed Debezium envelope decodes through SQL to typed fields") {
    import spark.implicits._
    AvroJson.register(spark, "avro_to_json", envelopeSchemaJson)
    val df = Seq(
      avroBytes("c", 1000L, 1L, "ann", framed = true),
      avroBytes("u", 2000L, 2L, "bo", framed = true)).toDF("value")

    val parsed = df
      .withColumn("json", expr("avro_to_json(value)"))
      .withColumn("env", from_json(col("json"), StructType(Seq(
        StructField("op", StringType), StructField("ts_ms", LongType),
        StructField("after", StructType(Seq(
          StructField("id", LongType), StructField("name", StringType))))))))
      .select(col("env.op"), col("env.ts_ms"), col("env.after.id"), col("env.after.name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(parsed === Set(("c", 1000L, 1L, "ann"), ("u", 2000L, 2L, "bo")))
  }

  test("unframed avro decodes with confluentFraming=false; nulls stay null") {
    import spark.implicits._
    AvroJson.register(spark, "avro_raw_to_json", envelopeSchemaJson, confluentFraming = false)
    val df = Seq(Some(avroBytes("d", 3L, 9L, "x", framed = false)), Option.empty[Array[Byte]])
      .toDF("value")
    val out = df.withColumn("json", expr("avro_raw_to_json(value)"))
      .select("json").collect().map(r => Option(r.getString(0)))
    assert(out.count(_.isEmpty) === 1)
    val json = out.flatten.head
    assert(json.contains("\"op\":\"d\""))
    // avro json encoding wraps union values in their branch name
    assert(json.contains("\"id\":9"))
  }
}

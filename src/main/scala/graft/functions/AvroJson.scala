package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Avro → JSON deserialization over the core `avro-1.12.1.jar` (SURVEY.md
  * §2.1 S3): no spark-avro module ships in this env, so Avro-encoded
  * Debezium envelopes are decoded with the vanilla Avro reader and
  * re-rendered as JSON text, which then flows through the same
  * `from_json(...)` path as the JSON transport. Handles the Confluent
  * Schema Registry wire framing (magic byte 0x00 + 4-byte schema id
  * before the Avro body) the reference's `AvroDeserializer` consumes
  * (`streaming/consumer.py:72-110`).
  *
  * One deserializer per executor task (lazy transients), mirroring the
  * reference's per-consumer deserializer instances.
  */
final class AvroJsonDeserializer(
    writerSchemaJson: String,
    confluentFraming: Boolean) extends Serializable {

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(writerSchemaJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](schema)

  def deserialize(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val body =
      if (confluentFraming) {
        require(bytes.length >= 5 && bytes(0) == 0,
          s"not Confluent-framed Avro (len=${bytes.length})")
        java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
      } else bytes
    val decoder = DecoderFactory.get().binaryDecoder(body, null)
    render(reader.read(null, decoder))
  }

  /** Plain JSON (Debezium-JSON shape): unions are transparent — Avro's
    * own JsonEncoder would wrap union values in branch-name objects,
    * which is not what downstream `from_json` schemas expect.
    */
  private def render(v: Any): String = v match {
    case null => "null"
    case r: GenericRecord =>
      r.getSchema.getFields.toArray.map { f0 =>
        val f = f0.asInstanceOf[Schema.Field]
        "\"" + esc(f.name()) + "\":" + render(r.get(f.pos()))
      }.mkString("{", ",", "}")
    case m: java.util.Map[_, _] =>
      m.entrySet().toArray.map { e0 =>
        val e = e0.asInstanceOf[java.util.Map.Entry[_, _]]
        "\"" + esc(e.getKey.toString) + "\":" + render(e.getValue)
      }.mkString("{", ",", "}")
    case a: java.util.Collection[_] =>
      a.toArray.map(render).mkString("[", ",", "]")
    case s: CharSequence => "\"" + esc(s.toString) + "\""
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      "\"" + java.util.Base64.getEncoder.encodeToString(arr) + "\""
    case b: Array[Byte] => "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\""
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => "\"" + esc(e.toString) + "\""
    case other => other.toString // numbers, booleans
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}

object AvroJson {
  /** Register `avro_to_json(binary) -> string` for the given writer
    * schema under `name`.
    */
  def register(
      spark: SparkSession,
      name: String,
      writerSchemaJson: String,
      confluentFraming: Boolean = true): Unit = {
    val de = new AvroJsonDeserializer(writerSchemaJson, confluentFraming)
    spark.udf.register(name, udf((bytes: Array[Byte]) => de.deserialize(bytes)))
  }
}

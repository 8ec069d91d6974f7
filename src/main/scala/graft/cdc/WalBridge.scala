package graft.cdc

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** WAL → transport bridge (SURVEY.md §3.2): distributed decode of raw
  * pgoutput binary streams and serialization of [[WalChange]]s into the
  * transport envelope the pipeline consumes.
  *
  * Shapes re-expressed from the reference reader
  * (`sources/wal/reader.py:187-220`):
  *  - topic    = `{prefix}.{schema}.{table}`
  *  - key      = canonical JSON of (after ?? before ?? {}) with SORTED
  *               keys (deterministic-key contract, §2.6 O3)
  *  - value    = JSON {operation, schema, table, lsn, timestamp ISO-8601,
  *               before?, after?}
  *  - ordering = `{schema}.{table}` (per-table order preservation)
  *
  * Scale notes: decode runs inside `mapPartitions` with one stateful
  * decoder per stream partition — pgoutput emits each table's Relation
  * message before its changes on the same connection, so per-partition
  * replay order keeps the relation cache valid without any shared state
  * or shuffle; the stage is embarrassingly parallel.
  */
object WalBridge {

  implicit val walChangeEncoder: Encoder[WalChange] = Encoders.product[WalChange]

  /** Decode per-partition ordered binary pgoutput messages. */
  def decode(messages: Dataset[Array[Byte]]): Dataset[WalChange] =
    messages.mapPartitions { it => new PgOutputDecoder().decodeAll(it) }

  // Python-isoformat parity: fractional seconds only when non-zero,
  // and then always 6 digits (`wal/reader.py:214` serialization shape).
  private val isoPlain = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxxx")
  private val isoMicros = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
  private def isoFormat(ts: java.time.OffsetDateTime): String =
    if (ts.getNano == 0) isoPlain.format(ts) else isoMicros.format(ts)

  /** JSON text for a row map: sorted keys when `sortKeys` (message keys
    * are canonical; values keep insertion order like the reference's
    * dict dumps — both engines only require determinism, which sorted
    * iteration gives us in either case).
    */
  private def rowJson(row: Map[String, Option[String]]): String =
    row.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + escape(k) + "\":" + v.map(s => "\"" + escape(s) + "\"").getOrElse("null")
    }.mkString("{", ",", "}")

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  final case class TransportMessage(
      topic: String,
      key: String,
      value: String,
      orderingKey: String)

  /** Serialize changes into transport messages under `topicPrefix`. */
  def toTransport(changes: Dataset[WalChange], topicPrefix: String): Dataset[TransportMessage] = {
    implicit val enc: Encoder[TransportMessage] = Encoders.product[TransportMessage]
    changes.map { c =>
      val keySource = c.after.orElse(c.before).getOrElse(Map.empty)
      val ts = c.timestamp.toInstant.atOffset(ZoneOffset.UTC)
      val fields = Seq(
        "\"operation\":\"" + c.operation + "\"",
        "\"schema\":\"" + escape(c.schema) + "\"",
        "\"table\":\"" + escape(c.table) + "\"",
        "\"lsn\":" + c.lsn,
        "\"timestamp\":\"" + isoFormat(ts) + "\"") ++
        c.before.map(b => "\"before\":" + rowJson(b)) ++
        c.after.map(a => "\"after\":" + rowJson(a))
      TransportMessage(
        topic = graft.streaming.TopicNaming.cdcTopicName(topicPrefix, c.schema, c.table),
        key = rowJson(keySource),
        value = fields.mkString("{", ",", "}"),
        orderingKey = s"${c.schema}.${c.table}")
    }
  }

  /** Debezium-style op code for the pipeline envelope (c/u/d). */
  def opCode(operation: String): String = operation match {
    case "insert" => "c"
    case "update" => "u"
    case "delete" => "d"
    case other => other
  }

  /** Envelope rows for [[graft.streaming.ChangeEnvelope]]: one JSON line
    * per change, offsets synthesized per (topic, partition) in stream
    * order — the Pub/Sub virtual-partition model (§2.9 T7): partition =
    * hash(orderingKey) % numPartitions, monotone offsets within each.
    */
  def toEnvelopeJson(
      messages: Seq[TransportMessage],
      numPartitions: Int = 16): Seq[String] = {
    val counters = scala.collection.mutable.Map.empty[(String, Int), Long]
    messages.map { m =>
      val partition = math.floorMod(
        VirtualPartitioner.partitionOf(m.orderingKey, numPartitions), numPartitions)
      val tp = (m.topic, partition)
      val offset = counters.getOrElse(tp, 0L)
      counters(tp) = offset + 1
      val payload = m.value
      val op = {
        // operation sits at a fixed position in our serialization
        val i = payload.indexOf("\"operation\":\"") + "\"operation\":\"".length
        opCode(payload.substring(i, payload.indexOf('"', i)))
      }
      s"""{"topic":"${m.topic}","partition":$partition,"offset":$offset,""" +
        s""""op":"$op","ts_ms":0,"key":${quoteJson(m.key)},"before":null,"after":${quoteJson(payload)}}"""
    }
  }

  private def quoteJson(s: String): String = "\"" + escape(s) + "\""
}

/** md5-based virtual partitioner — bit-compatible with the reference's
  * Pub/Sub shim `int(md5(key)[:4], 16) % n` (`sources/pubsub/source.py:
  * 169-174`, SURVEY §2.8 F3).
  */
object VirtualPartitioner {
  def partitionOf(orderingKey: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(orderingKey.getBytes("UTF-8"))
      .take(2).map(b => f"$b%02x").mkString // first 4 hex chars
    Integer.parseInt(hex, 16) % n
  }
}

package graft.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Scala port of the reference's decoder throughput gates
  * (`tests/benchmark/test_wal_decoder_throughput.py:143,188,227`):
  * pure INSERT > 50 K msg/s, mixed I/U/D > 30 K, 100-column wide
  * > 5 K. Measured steady state on this box is 40–100× above these
  * thresholds (BENCH json), so the gates hold even under heavy
  * co-tenant noise — they catch only real decoder regressions.
  */
class DecoderThroughputSpec extends AnyFunSuite {
  private def u16(v: Int) = ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def u32(v: Long) = ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def i64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()
  private def cstr(s: String) = s.getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0)

  private val begin = "B".getBytes ++ i64(1) ++ i64(0) ++ u32(1)
  private def relation(relId: Long, cols: Seq[String]) = {
    var d = "R".getBytes ++ u32(relId) ++ cstr("public") ++ cstr("t") ++
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
  private def msg(op: String, relId: Long, values: Seq[String]) = op match {
    case "I" => "I".getBytes ++ u32(relId) ++ "N".getBytes ++ tup(values)
    case "U" => "U".getBytes ++ u32(relId) ++ "N".getBytes ++ tup(values)
    case "D" => "D".getBytes ++ u32(relId) ++ "K".getBytes ++ tup(values)
  }

  private def rate(messages: Array[Array[Byte]], prelude: Seq[Array[Byte]]): Double = {
    def pass(): Double = {
      val d = new PgOutputDecoder
      prelude.foreach(d.decode)
      var n = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < messages.length) { n += d.decode(messages(i)).size; i += 1 }
      n / ((System.nanoTime() - t0) / 1e9)
    }
    pass() // JIT warmup
    (1 to 3).map(_ => pass()).max
  }

  test("pure INSERT decode > 50K msg/s (reference gate)") {
    val msgs = Array.tabulate(50000)(i => msg("I", 1, Seq(i.toString, s"name_$i")))
    assert(rate(msgs, Seq(begin, relation(1, Seq("id", "name")))) > 50000.0)
  }

  test("mixed I/U/D decode > 30K msg/s (reference gate)") {
    val ops = Array("I", "U", "D")
    val msgs = Array.tabulate(50000)(i => msg(ops(i % 3), 1, Seq(i.toString, s"v_$i")))
    assert(rate(msgs, Seq(begin, relation(1, Seq("id", "name")))) > 30000.0)
  }

  test("100-column wide decode > 5K msg/s (reference gate)") {
    val cols = (0 until 100).map(i => s"c$i")
    val vals = (0 until 100).map(i => s"value_$i")
    val msgs = Array.tabulate(5000)(_ => msg("I", 2, vals))
    assert(rate(msgs, Seq(begin, relation(2, cols))) > 5000.0)
  }
}

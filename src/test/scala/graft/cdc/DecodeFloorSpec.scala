package graft.cdc

import java.nio.charset.StandardCharsets

import graft.CdcBench
import graft.SparkSpec

/** Decode-throughput regression floors — the reference pins these in
  * its own test suite (`tests/benchmark/test_wal_decoder_throughput.py`:
  * pure INSERT > 50 K, mixed I/U/D > 30 K, wide-100 > 5 K, multi-table
  * interleaved > 30 K, 10 KB text values > 500, null-heavy sparse
  * > 50 K msg/s). Measured rates here are 20–200× above the floors
  * (BENCH_r04: 7.4 M pure, 7.0 M mixed, 108 K wide), so these only
  * trip on a genuine order-of-magnitude regression, never on box noise.
  */
class DecodeFloorSpec extends SparkSpec {
  import CdcBench._

  private val begin = "B".getBytes ++ i64(1) ++ i64(0) ++ u32(1)

  // tuple with explicit null cells ('n' marker, no payload)
  private def tupleSparse(values: Seq[Option[String]]): Array[Byte] = {
    var d = u16(values.size)
    values.foreach {
      case Some(v) =>
        val b = v.getBytes(StandardCharsets.UTF_8)
        d = d ++ "t".getBytes ++ u32(b.length) ++ b
      case None => d = d ++ "n".getBytes
    }
    d
  }
  private def insertSparse(relId: Long, values: Seq[Option[String]]): Array[Byte] =
    "I".getBytes ++ u32(relId) ++ "N".getBytes ++ tupleSparse(values)

  test("pure INSERT decode stays above the 50 K msg/s reference floor") {
    val rel = relation(1, "users", Seq("id", "name"))
    val msgs = Array.tabulate(50000)(i => insert(1, Seq(i.toString, s"name_$i")))
    assert(decodeRate(msgs, Seq(begin, rel)) > 50000.0)
  }

  test("mixed I/U/D decode stays above the 30 K msg/s reference floor") {
    val rel = relation(1, "users", Seq("id", "name"))
    val msgs = Array.tabulate(50000) { i =>
      (i % 3) match {
        case 0 => insert(1, Seq(i.toString, s"name_$i"))
        case 1 => update(1, Seq(i.toString, s"upd_$i"))
        case _ => delete(1, Seq(i.toString, s"name_$i"))
      }
    }
    assert(decodeRate(msgs, Seq(begin, rel)) > 30000.0)
  }

  test("wide-100-column decode stays above the 5 K msg/s reference floor") {
    val rel = relation(2, "wide", (0 until 100).map(i => s"c$i"))
    val vals = (0 until 100).map(c => s"value_$c")
    val msgs = Array.tabulate(5000)(_ => insert(2, vals))
    assert(decodeRate(msgs, Seq(begin, rel)) > 5000.0)
  }

  test("multi-table interleaved decode stays above the 30 K msg/s reference floor") {
    val relA = relation(1, "users", Seq("id", "name"))
    val relB = relation(2, "orders", Seq("id", "total", "status"))
    val msgs = Array.tabulate(50000) { i =>
      if (i % 2 == 0) insert(1, Seq(i.toString, s"name_$i"))
      else insert(2, Seq(i.toString, s"$i.99", "open"))
    }
    assert(decodeRate(msgs, Seq(begin, relA, relB)) > 30000.0)
  }

  test("10 KB text-value decode stays above the 500 msg/s reference floor") {
    val rel = relation(3, "blobs", Seq("id", "body"))
    val big = "x" * 10240
    val msgs = Array.tabulate(2000)(i => insert(3, Seq(i.toString, big)))
    assert(decodeRate(msgs, Seq(begin, rel)) > 500.0)
  }

  test("null-heavy sparse decode stays above the 50 K msg/s reference floor") {
    val rel = relation(4, "sparse", (0 until 20).map(i => s"c$i"))
    val msgs = Array.tabulate(50000) { i =>
      // 2 populated cells, 18 nulls — the sparse-row shape
      insertSparse(4, Seq(Some(i.toString), Some(s"v$i")) ++ Seq.fill(18)(None))
    }
    assert(decodeRate(msgs, Seq(begin, rel)) > 50000.0)
  }
}

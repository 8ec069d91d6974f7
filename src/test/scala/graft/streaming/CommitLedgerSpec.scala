package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Min-watermark algebra, pinned by the reference's semantics tests
  * (`tests/unit/test_pipeline_runner.py:229-341`).
  */
class CommitLedgerSpec extends AnyFunSuite {
  private val tp0 = ("t", 0)
  private val tp1 = ("t", 1)

  test("committed when all sinks flushed") {
    val l = new CommitLedger(Seq("wh1"))
    l.recordFlush("wh1", tp0, 10)
    assert(l.commitable() === Map(tp0 -> 10L))
  }

  test("not committed twice") {
    val l = new CommitLedger(Seq("wh1"))
    l.recordFlush("wh1", tp0, 10)
    assert(l.commitable() === Map(tp0 -> 10L))
    assert(l.commitable() === Map.empty)
  }

  test("min across sinks") {
    val l = new CommitLedger(Seq("wh1", "wh2"))
    l.recordFlush("wh1", tp0, 10)
    l.recordFlush("wh2", tp0, 4)
    assert(l.commitable() === Map(tp0 -> 4L))
  }

  test("partition suppressed while any sink has not flushed it") {
    val l = new CommitLedger(Seq("wh1", "wh2"))
    l.recordFlush("wh1", tp0, 10)
    assert(l.commitable() === Map.empty)
  }

  test("multiple partitions commit independently") {
    val l = new CommitLedger(Seq("wh1"))
    l.recordFlush("wh1", tp0, 5)
    l.recordFlush("wh1", tp1, 12)
    assert(l.commitable() === Map(tp0 -> 5L, tp1 -> 12L))
  }

  test("monotone: later higher flush commits the delta only") {
    val l = new CommitLedger(Seq("wh1"))
    l.recordFlush("wh1", tp0, 5)
    assert(l.commitable() === Map(tp0 -> 5L))
    l.recordFlush("wh1", tp0, 9)
    assert(l.commitable() === Map(tp0 -> 9L))
    // a regressed flush never rolls the watermark back
    l.recordFlush("wh1", tp0, 3)
    assert(l.commitable() === Map.empty)
  }

  test("next-to-fetch form is offset + 1") {
    val l = new CommitLedger(Seq("wh1"))
    l.recordFlush("wh1", tp0, 41)
    assert(l.commitableNextToFetch() === Map(tp0 -> 42L))
  }

  test("laggard sink catching up releases the suppressed partition") {
    val l = new CommitLedger(Seq("fast", "slow"))
    l.recordFlush("fast", tp0, 100)
    assert(l.commitable() === Map.empty)
    l.recordFlush("slow", tp0, 60)
    assert(l.commitable() === Map(tp0 -> 60L))
    l.recordFlush("slow", tp0, 100)
    assert(l.commitable() === Map(tp0 -> 100L))
  }

  test("concurrent flush recording vs health-thread reads stays consistent") {
    // the health endpoint reads committedSoFar from the HTTP dispatcher
    // thread while the micro-batch thread records flushes and commits —
    // hammer both sides and require every invariant the algebra promises
    // (a torn HashMap iteration would throw or return garbage here)
    val l = new CommitLedger(Seq("a", "b"))
    val partitions = 8
    val rounds = 2000
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val writer = new Thread(() => try {
      for (off <- 0 until rounds; p <- 0 until partitions) {
        l.recordFlush("a", ("t", p), off.toLong)
        l.recordFlush("b", ("t", p), off.toLong)
        if (off % 100 == 0) l.commitable()
      }
      l.commitable()
    } catch { case e: Throwable => errs.add(e) })
    val reader = new Thread(() => try {
      while (writer.isAlive) {
        val snap = l.committedSoFar
        assert(snap.size <= partitions)
        snap.foreach { case ((t, p), off) =>
          assert(t == "t" && p >= 0 && p < partitions && off >= 0 && off < rounds)
        }
      }
    } catch { case e: Throwable => errs.add(e) })
    writer.start(); reader.start()
    writer.join(60000); reader.join(60000)
    assert(errs.isEmpty, s"concurrent access failed: ${errs.peek()}")
    assert(l.committedSoFar ===
      (0 until partitions).map(p => ("t", p) -> (rounds - 1).toLong).toMap)
  }

  test("unknown sink id rejected") {
    val l = new CommitLedger(Seq("wh1"))
    intercept[IllegalArgumentException](l.recordFlush("nope", tp0, 1))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench quiet-window gate (round 14, verdict #8): pure logic,
  * driven with injected load readings and a fake clock — no sleeping.
  */
class BenchGateSpec extends AnyFunSuite {

  private def drive(loads: Seq[Double], threshold: Double = 3.0,
      maxWaitMs: Long = 60000L, pollMs: Long = 5000L): (Long, Long) = {
    val it = Iterator(loads: _*) ++ Iterator.continually(loads.last)
    var slept = 0L
    val waited = BenchGate.waitForQuiet(
      () => it.next(), threshold, maxWaitMs, pollMs, sleep = ms => slept += ms)
    (waited, slept)
  }

  test("a quiet box proceeds immediately — zero wait") {
    assert(drive(Seq(0.8)) === ((0L, 0L)))
  }

  test("a loud box holds until the load drops, then proceeds") {
    // 4.8 (the round-13 artifact's start), 4.1, then quiet
    val (waited, slept) = drive(Seq(4.8, 4.1, 1.2))
    assert(waited === 10000L && slept === 10000L,
      "two loud polls = two poll sleeps, then go")
  }

  test("a box that never quiets gives up at the budget — the bench always runs") {
    val (waited, _) = drive(Seq(9.9), maxWaitMs = 17000L)
    assert(waited === 17000L, "bounded: exactly the budget, not forever")
  }

  test("an unreadable loadavg (-1) counts as quiet — never wedge a blind box") {
    assert(drive(Seq(-1.0))._1 === 0L)
  }

  test("the threshold is inclusive-quiet: load == threshold proceeds") {
    assert(drive(Seq(3.0))._1 === 0L)
  }
}

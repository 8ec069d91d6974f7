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

  // ---- CDC e2e CI floor (round 16): the e2e number swings 69–120 K
  //      msg/s on host load alone; the floor is binding only on a
  //      QUIET box, so a violation there is structure, not variance.

  test("cdc floor: a quiet box at 2x baseline passes") {
    assert(CdcBench.floorVerdict(best = 85000.0, loadavg = 1.2) === Some(true))
  }

  test("cdc floor: a quiet box UNDER the floor fails loudly") {
    assert(CdcBench.floorVerdict(best = 61000.0, loadavg = 0.8) === Some(false))
  }

  test("cdc floor: a loud box abstains — variance owns the number there") {
    assert(CdcBench.floorVerdict(best = 61000.0, loadavg = 7.5) === None)
  }

  test("cdc floor: unreadable loadavg (-1) counts as quiet — a blind box still gates") {
    assert(CdcBench.floorVerdict(best = 90000.0, loadavg = -1.0) === Some(true))
  }

  test("cdc floor is exactly 2x the reference's best profile") {
    assert(CdcBench.FloorMsgsPerSec === 77000.0)
    assert(CdcBench.floorVerdict(77000.0, 0.0) === Some(true),
      "the floor itself is inclusive-pass")
  }
}

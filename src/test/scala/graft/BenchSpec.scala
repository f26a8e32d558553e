package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-healing spread rule (VERDICT r4 #7): a >3× divergence
  * between a query's two timed runs means one hit a degraded window and one
  * extra run is scheduled; failures and healthy spreads never retry.
  */
class BenchSpec extends AnyFunSuite {

  test("needsHealing fires only on >3x spread between two valid runs") {
    assert(Bench.needsHealing(10.69, 1.98)) // r4's actual q144 run pair
    assert(Bench.needsHealing(1.98, 10.69)) // order-independent
    assert(Bench.needsHealing(2.20, 6.64)) // r4's q168 pair: 3.02x, just over
    assert(!Bench.needsHealing(1.0, 2.9))
    assert(!Bench.needsHealing(1.0, 3.0)) // boundary: exactly 3x is not >3x
    assert(Bench.needsHealing(1.0, 3.01))
  }

  test("failed runs (-1) never trigger healing") {
    assert(!Bench.needsHealing(-1.0, 5.0))
    assert(!Bench.needsHealing(5.0, -1.0))
    assert(!Bench.needsHealing(-1.0, -1.0))
  }

  test("warm anchor fires when the whole timed pair sits in one degraded window") {
    // r5's actual records: both timed runs mutually consistent (spread rule
    // silent) but 4-5x the out-of-window warm-up measurement
    assert(Bench.needsWarmAnchorHeal(Seq(6.39, 5.71), warmTime = 1.2)) // q144
    assert(Bench.needsWarmAnchorHeal(Seq(4.77, 5.73), warmTime = 1.3)) // q168
    // healthy pair near its warm-up time: no retry
    assert(!Bench.needsWarmAnchorHeal(Seq(1.31, 1.25), warmTime = 1.2))
    // boundary: exactly 2x warm is not > 2x
    assert(!Bench.needsWarmAnchorHeal(Seq(2.4, 3.0), warmTime = 1.2))
    assert(Bench.needsWarmAnchorHeal(Seq(2.401, 3.0), warmTime = 1.2))
  }

  test("warm anchor judges the BEST timed run, never the worst") {
    // one clean run among the pair means the estimator (min) is already
    // sound — no retry even if the other run was 10x
    assert(!Bench.needsWarmAnchorHeal(Seq(1.3, 12.0), warmTime = 1.2))
  }

  test("warm anchor: degraded or failed warm-up never false-triggers") {
    // inflated warm-up only RAISES the anchor
    assert(!Bench.needsWarmAnchorHeal(Seq(5.0, 5.2), warmTime = 4.0))
    // failed warm-up (-1) or failed timed runs disable the rule
    assert(!Bench.needsWarmAnchorHeal(Seq(5.0, 5.2), warmTime = -1.0))
    assert(!Bench.needsWarmAnchorHeal(Seq(-1.0, -1.0), warmTime = 1.0))
    assert(!Bench.needsWarmAnchorHeal(Seq.empty, warmTime = 1.0))
    // a failed run in the pair is ignored, not treated as slow
    assert(!Bench.needsWarmAnchorHeal(Seq(-1.0, 1.3), warmTime = 1.2))
  }
}

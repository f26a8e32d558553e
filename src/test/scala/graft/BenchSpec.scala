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
}

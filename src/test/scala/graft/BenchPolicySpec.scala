package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's load-adjudication policy (r6/r7 verdict task 1):
  * the settle rule must never accept a load spike as "real cost", and
  * the external-load estimator must ignore our own JVM's cpu.
  */
class BenchPolicySpec extends AnyFunSuite {

  test("settle requires genuine two-sided agreement") {
    // agreeing pair, quiet box: settled
    assert(Bench.settledAfterRun(dt = 1.00, prevMin = 1.05, extCores = 0.1))
    assert(Bench.settledAfterRun(dt = 1.05, prevMin = 1.00, extCores = 0.0))
  }

  test("a WORSE re-run never settles (the r6/r7 double-spike shape)") {
    // pass-1 spiked to 5.28s, pass-2 spiked to 6.0s: old rule settled
    // this (dt >= prev*0.9) and excluded it from retries forever
    assert(!Bench.settledAfterRun(dt = 6.0, prevMin = 5.28, extCores = 0.0))
    // just above the 10% agreement band
    assert(!Bench.settledAfterRun(dt = 1.12, prevMin = 1.0, extCores = 0.0))
  }

  test("a big improvement does not settle — keep retrying downward") {
    assert(!Bench.settledAfterRun(dt = 0.5, prevMin = 5.0, extCores = 0.0))
  }

  test("an externally-loaded run never settles, even when agreeing") {
    assert(!Bench.settledAfterRun(dt = 1.0, prevMin = 1.0, extCores = 6.4))
  }

  test("externalCores subtracts our own cpu from machine busy time") {
    // 10 s wall; machine burned 8000 jiffies = 80 cpu-sec; we burned
    // 60 cpu-sec ourselves => 2.0 external cores
    val a = (100000L, 0L, 0L)
    val b = (108000L, 60_000_000_000L, 10_000_000_000L)
    assert(math.abs(Bench.externalCores(a, b) - 2.0) < 1e-9)
  }

  test("externalCores is 0 on unmeasurable snapshots and never negative") {
    assert(Bench.externalCores((-1L, 0L, 0L), (100L, 1L, 1_000_000_000L)) == 0.0)
    // we measured more cpu than the machine reports busy (USER_HZ
    // rounding): clamp to 0, not negative
    val a = (1000L, 0L, 0L)
    val b = (1010L, 5_000_000_000L, 1_000_000_000L)
    assert(Bench.externalCores(a, b) == 0.0)
  }
}

package graft

/** The in-artifact host-noise telemetry (round-16 VERDICT item 2):
  * the fixed-work calibration probe and the /proc/stat steal counter
  * that make every bench artifact self-adjudicating — loadavg alone
  * provably cannot (four sub-2-loadavg round-16 captures, all ~1.67×
  * uniformly inflated by hypervisor noise invisible to the guest
  * average). */
class BenchNoiseSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("calibration probe: deterministic work, positive stable time, scales with iters") {
    Bench.calibrateWarmup()
    val t1 = Bench.calibrate(50000000L)
    val t2 = Bench.calibrate(200000000L)
    assert(t1 > 0 && t2 > 0)
    // 4x the work takes materially more time (JIT'd, allocation-free
    // loop — the ratio is ~4 on a quiet host; we only pin >2 so the
    // assertion is noise-proof)
    assert(t2 > 2 * t1, f"4x work must cost >2x time: $t1%.3f vs $t2%.3f")
  }

  test("steal totals read /proc/stat: totals positive and monotone") {
    val (s0, j0) = Bench.stealTotals()
    assert(j0 > 0, "aggregate cpu jiffies must be readable on Linux")
    assert(s0 >= 0, "steal column exists (0 when hypervisor hides it)")
    Bench.calibrate(50000000L)
    val (s1, j1) = Bench.stealTotals()
    assert(j1 >= j0 && s1 >= s0, "cumulative counters are monotone")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contended-flag math (VERDICT r17 #6): external load is
  * loadavg minus this JVM's own trailing CPU share — pure arithmetic,
  * no settle sleeps, so the flag can neither self-trigger (own
  * executors' tail subtracts out) nor self-suppress (nothing waits
  * for a real spike to decay).
  */
class BenchLoadSpec extends AnyFunSuite {

  test("own CPU share subtracts out: a busy bench on an idle host reads ~0") {
    // 32 threads flat-out for the last minute: loadavg ~32, own ticks
    // = 32 cores x 60 s x 100 ticks
    val ext = Bench.externalLoad(32.0, dTicks = 32L * 60L * 100L,
      windowSec = 60.0, clkTck = 100.0)
    assert(ext == 0.0)
  }

  test("external contention survives the subtraction") {
    // host runs 4 external cores on top of our 2: flags correctly
    val ext = Bench.externalLoad(6.0, dTicks = 2L * 60L * 100L,
      windowSec = 60.0, clkTck = 100.0)
    assert(math.abs(ext - 4.0) < 1e-9 && ext > 2.5)
  }

  test("a short-lived sample window normalizes to the 60 s loadavg horizon") {
    // 20 s of samples, 10 core-seconds burned: share = 10/60, not 10/20
    val ext = Bench.externalLoad(3.0, dTicks = 10L * 100L,
      windowSec = 20.0, clkTck = 100.0)
    assert(math.abs(ext - (3.0 - 10.0 / 60.0)) < 1e-9)
  }

  test("unreadable tick sources degrade to the raw loadavg, never to 0") {
    assert(Bench.externalLoad(5.0, dTicks = -1L, 60.0, 100.0) == 5.0)
    assert(Bench.externalLoad(5.0, dTicks = 100L, 0.0, 100.0) == 5.0)
  }

  test("ownCpuTicks reads /proc/self/stat and is monotone under work") {
    val t0 = Bench.ownCpuTicks()
    assert(t0 >= 0, "this CI runs on Linux; /proc must be readable")
    var acc = 0L
    (0 until 20000000).foreach(i => acc += i * i)
    assert(acc != 0)
    assert(Bench.ownCpuTicks() >= t0)
  }

  test("cal-normalized 2x criterion survives a deliberately slowed host") {
    // VERDICT r19 #4: a host uniformly 2x slower than the MIN's era
    // (cal 0.90 vs 0.45) must neither MANUFACTURE a drift finding...
    val min = 1.0; val calMin = 0.45; val slowCal = 0.90
    val cleanOnSlowHost = 2.1 // raw ratio 2.1x would have flagged
    assert(Bench.normRatio(cleanOnSlowHost, slowCal, min, calMin) < 2.0)
    // ...nor MASK a real regression (2.3x after normalization)
    val regressedOnSlowHost = 4.6
    assert(Bench.normRatio(regressedOnSlowHost, slowCal, min, calMin) > 2.0)
    // a FAST host can't hide a regression either: cal 0.30 (1.5x
    // faster era), t = 1.5 raw (under 2x) but 2.25x normalized
    assert(Bench.normRatio(1.5, 0.30, min, calMin) > 2.0)
    // legacy MIN rows (no cal) keep the raw-ratio behavior exactly
    assert(Bench.normRatio(2.1, slowCal, min, -1.0) == 2.1)
    assert(Bench.normRatio(2.1, -1.0, min, calMin) == 2.1)
  }
}

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
}

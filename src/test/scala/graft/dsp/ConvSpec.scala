package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class ConvSpec extends AnyFunSuite {
  private val g = Golden.load("conv.txt")
  private val tol = 1e-10

  private def check(name: String, got: Array[Double], t: Double = tol): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  for ((n1, n2) <- Seq((20, 5), (5, 20), (16, 16), (31, 7))) {
    val a = g(s"a_${n1}_$n2"); val b = g(s"b_${n1}_$n2")

    test(s"convolve direct modes ($n1,$n2) vs numpy") {
      check(s"conv_full_${n1}_$n2", Conv.convolveDirect(a, b, "full"))
      check(s"conv_same_${n1}_$n2", Conv.convolveDirect(a, b, "same"))
      check(s"conv_valid_${n1}_$n2", Conv.convolveDirect(a, b, "valid"))
    }

    test(s"fftconvolve modes ($n1,$n2) vs numpy") {
      check(s"conv_full_${n1}_$n2", Conv.fftconvolve(a, b, "full"))
      check(s"conv_same_${n1}_$n2", Conv.fftconvolve(a, b, "same"))
      check(s"conv_valid_${n1}_$n2", Conv.fftconvolve(a, b, "valid"))
    }

    test(s"correlate ($n1,$n2) vs numpy") {
      check(s"corr_full_${n1}_$n2", Conv.correlate(a, b, "full"))
    }
  }

  test("fftconvolve2d full+same vs quadratic reference") {
    val a = g("a2d"); val b = g("b2d")
    val (full, fr, fc) = Conv.fftconvolve2d(a, 6, 5, b, 3, 4, "full")
    assert((fr, fc) == (8, 8))
    check("conv2d_full", full)
    val (same, sr, sc) = Conv.fftconvolve2d(a, 6, 5, b, 3, 4, "same")
    assert((sr, sc) == (6, 5))
    check("conv2d_same", same)
  }

  test("auto method matches direct for random sizes") {
    val rnd = new scala.util.Random(3)
    for ((n1, n2) <- Seq((1, 1), (1, 9), (200, 300), (1000, 40))) {
      val a = Array.fill(n1)(rnd.nextGaussian())
      val b = Array.fill(n2)(rnd.nextGaussian())
      for (mode <- Seq("full", "same", "valid")) {
        val d = Conv.convolveDirect(a, b, mode)
        val f = Conv.convolve(a, b, mode, "auto")
        assert(Golden.maxAbsDiff(d, f) < 1e-8, s"($n1,$n2) $mode")
      }
    }
  }
}

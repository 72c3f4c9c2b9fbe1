package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class SpectralSpec extends AnyFunSuite {
  private val g = Golden.load("spectral.txt")
  private val tol = 1e-10

  private def check(name: String, got: Array[Double], t: Double = tol): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  for (n <- Seq(64, 63)) {
    val x = g(s"hx_$n")

    test(s"hilbert n=$n vs numpy analytic-signal") {
      val h = Hilbert.hilbert(x)
      check(s"hilbert_${n}_re", h.re)
      check(s"hilbert_${n}_im", h.im)
      val hN = Hilbert.hilbert(x, 80)
      check(s"hilbertN_${n}_re", hN.re)
      check(s"hilbertN_${n}_im", hN.im)
    }

    test(s"resample n=$n vs numpy Fourier resampling") {
      for (num <- Seq(n / 2, n / 3, 2 * n, n))
        check(s"resample_${n}_$num", Resample.resample(x, num))
    }

    test(s"resample n=$n with spectral window vs numpy") {
      for (win <- Seq("hann", "hamming", "blackman", "bartlett")) {
        check(s"resample_w_${win}_$n", Resample.resample(x, n / 2, window = win))
        check(s"resample_wu_${win}_$n", Resample.resample(x, 2 * n, window = win))
      }
    }

    test(s"resample n=$n domain=freq (packed real spectrum input) vs numpy") {
      val xs = g(s"rsfreq_x_$n")
      check(s"resample_fr_$n", Resample.resample(xs, n, domain = "freq"))
      check(s"resample_frw_$n", Resample.resample(xs, n, window = "hann", domain = "freq"))
    }

    test(s"resample n=$n with an explicit window VECTOR (scipy array branch)") {
      // golden: an asymmetric Fourier-order vector applied dc-first
      val wv = g(s"rswin_vec_$n")
      check(s"resample_vec_$n", Resample.resampleW(x, n / 2, wv))
      check(s"resample_vecu_$n", Resample.resampleW(x, 2 * n, wv))
      // passing ifftshift(named window) through the vector branch must
      // reproduce the named branch bit-exactly (same code path after
      // the shift)
      for (win <- Seq("hann", "hamming")) {
        val shifted = Fft.ifftshift(Resample.periodicWindow(win, n))
        assert(Resample.resampleW(x, n / 2, shifted).toSeq ==
          Resample.resample(x, n / 2, window = win).toSeq)
      }
      // wrong-length vectors fail fast
      assertThrows[IllegalArgumentException](
        Resample.resampleW(x, n / 2, new Array[Double](n + 1)))
    }
  }

  test("hilbert real part preserves input; envelope of a sinusoid is flat") {
    val n = 256
    val sig = Array.tabulate(n)(t => math.cos(2 * math.Pi * 10 * t / n))
    val h = Hilbert.hilbert(sig)
    assert(Golden.maxAbsDiff(h.re, sig) < 1e-9)
    val env = Hilbert.envelope(sig)
    for (t <- 0 until n)
      assert(math.abs(env(t) - 1.0) < 1e-9, s"t=$t env=${env(t)}")
  }

  test("resample of a pure tone preserves the tone") {
    // A bin-aligned tone below both Nyquists survives resampling exactly.
    val n = 128
    val sig = Array.tabulate(n)(t => math.sin(2 * math.Pi * 5 * t / n))
    val up = Resample.resample(sig, 256)
    for (t <- 0 until 256) {
      val want = math.sin(2 * math.Pi * 5 * t / 256.0)
      assert(math.abs(up(t) - want) < 1e-9, s"up t=$t")
    }
    val down = Resample.resample(sig, 64)
    for (t <- 0 until 64) {
      val want = math.sin(2 * math.Pi * 5 * t / 64.0)
      assert(math.abs(down(t) - want) < 1e-9, s"down t=$t")
    }
  }

  test("decimate fir vs numpy firwin+filtfilt") {
    val x = g("dx_256")
    for (q <- Seq(2, 4)) {
      val b = Design.firwinLowpass(20 * q + 1, 1.0 / q)
      check(s"firwin_$q", b)
      check(s"decimate_fir_$q", Resample.decimate(x, q, -1, "fir", zeroPhase = true))
      check(s"decimate_fir_nzp_$q", Resample.decimate(x, q, -1, "fir", zeroPhase = false))
    }
  }

  test("decimate iir preserves low frequencies and output length") {
    val n = 1024
    for (q <- Seq(2, 4, 8)) {
      val sig = Array.tabulate(n)(t => math.sin(2 * math.Pi * 4 * t / n))
      val y = Resample.decimate(sig, q) // iir, zero-phase
      assert(y.length == (n + q - 1) / q)
      // zero-phase chebyshev passband: the tone survives with ~unit
      // gain (|H|^2 ripple of the 0.05 dB design allows ~1.2%)
      for (t <- 20 until y.length - 20) {
        val want = math.sin(2 * math.Pi * 4 * (t * q) / n)
        assert(math.abs(y(t) - want) < 2e-2, s"q=$q t=$t got=${y(t)} want=$want")
      }
      // alias rejection: a tone just above the new Nyquist is crushed
      val hi = Array.tabulate(n)(t => math.sin(2 * math.Pi * (n / (2 * q) + 30) * t / n))
      val z = Resample.decimate(hi, q)
      val rms = math.sqrt(z.drop(20).dropRight(20).map(v => v * v).sum / (z.length - 40))
      assert(rms < 0.05, s"q=$q alias rms=$rms")
    }
  }

  test("decimate q=1 is identity") {
    val x = g("dx_256")
    assert(Golden.maxAbsDiff(Resample.decimate(x, 1), x) == 0.0)
  }
}

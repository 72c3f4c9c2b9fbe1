package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class WelchSpec extends AnyFunSuite {
  private val g = Golden.load("welch.txt")

  private def check(name: String, got: Array[Double], t: Double = 1e-10): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  for (n <- Seq(200, 127)) {
    lazy val x = g(s"wx_$n")
    lazy val y = g(s"wy_$n")

    test(s"detrend constant/linear n=$n vs numpy polyfit") {
      check(s"detrend_const_$n", Spectral.detrend(x, "constant"))
      check(s"detrend_lin_$n", Spectral.detrend(x, "linear"))
    }

    test(s"welch n=$n vs numpy averaged periodogram") {
      for ((np_, hop) <- Seq((32, 16), (25, 10))) {
        val hann = Resample.periodicWindow("hann", np_)
        check(s"welch_hann_${n}_${np_}_$hop",
          Spectral.welch(x, np_, hop, hann, fs = 2.0))
        check(s"welch_box_${n}_${np_}_$hop",
          Spectral.welch(x, np_, hop, Array.fill(np_)(1.0), fs = 2.0,
            demean = false))
      }
    }
  }

  for (n <- Seq(200, 127)) {
    lazy val x = g(s"wx_$n")
    lazy val y = g(s"wy_$n")

    test(s"csd + coherence n=$n vs numpy cross-spectra") {
      for ((np_, hop) <- Seq((32, 16), (25, 10))) {
        val hann = Resample.periodicWindow("hann", np_)
        val p = Spectral.csd(x, y, np_, hop, hann, fs = 2.0)
        check(s"csd_hann_${n}_${np_}_${hop}_re", p.re)
        check(s"csd_hann_${n}_${np_}_${hop}_im", p.im)
        check(s"coh_hann_${n}_${np_}_$hop",
          Spectral.coherence(x, y, np_, hop, hann, fs = 2.0))
      }
    }

    test(s"csd(x, x) == welch(x) exactly, n=$n") {
      val hann = Resample.periodicWindow("hann", 32)
      val p = Spectral.csd(x, x, 32, 16, hann, fs = 2.0)
      val w = Spectral.welch(x, 32, 16, hann, fs = 2.0)
      assert(p.re.sameElements(w), "csd(x,x).re != welch(x)")
      assert(p.im.forall(_ == 0.0), "csd(x,x).im != 0")
    }
  }

  test("periodogram == single-segment welch (kernel identity the bridge relies on)") {
    // the bridge's periodogram builds welch(x, n, n, window(n)); this
    // pins the identity on both an even and an odd length
    for (n <- Seq(64, 63)) {
      val x = g("wx_200").take(n)
      val box = Array.fill(n)(1.0)
      val p = Spectral.welch(x, n, n, box, fs = 2.0)
      // one segment, boxcar: Parseval — sum(psd·df) ≈ variance (density
      // integrates to power); df = fs/n, doubling makes one side carry it
      val varX = { val m = x.sum / n; x.map(v => (v - m) * (v - m)).sum / n }
      val power = p.sum * (2.0 / n)
      assert(math.abs(power - varX) / varX < 1e-9, s"n=$n parseval $power vs $varX")
    }
  }

  test("zoomDft over the full band reproduces the FFT bins") {
    val n = 64
    val x = g("wx_200").take(n)
    // f_k = k*fs/n for k < n is exactly the DFT grid
    val z = Spectral.zoomDft(x, 0.0, 2.0, n, fs = 2.0)
    val want = Fft.rfft(x)
    for (k <- 0 until n / 2 + 1) {
      assert(math.abs(z.re(k) - want.re(k)) < 1e-8, s"re[$k]")
      assert(math.abs(z.im(k) - want.im(k)) < 1e-8, s"im[$k]")
    }
    // single-point zoom is the plain DFT at f1
    val one = Spectral.zoomDft(x, 0.25, 0.9, 1, fs = 2.0)
    val direct = x.indices.map(j =>
      x(j) * math.cos(-2.0 * math.Pi * 0.25 * j / 2.0)).sum
    assert(math.abs(one.re(0) - direct) < 1e-10)
    assertThrows[IllegalArgumentException](Spectral.zoomDft(x, 0.5, 0.1, 4, 2.0))
    assertThrows[IllegalArgumentException](Spectral.zoomDft(x, 0.1, 0.5, 0, 2.0))
  }

  test("czt on the unit-circle DFT contour reproduces the FFT bins") {
    val n = 64
    val x = g("wx_200").take(n)
    // a = 1, w = exp(-2πi/n), m = n: z_k = e^{2πik/n} — the DFT
    val z = Spectral.czt(x, n, wMod = 1.0, wPhi = -2.0 * math.Pi / n,
      aMod = 1.0, aPhi = 0.0)
    val want = Fft.rfft(x)
    for (k <- 0 until n / 2 + 1) {
      assert(math.abs(z.re(k) - want.re(k)) < 1e-8, s"re[$k]")
      assert(math.abs(z.im(k) - want.im(k)) < 1e-8, s"im[$k]")
    }
    // spiral contour (|a|,|w| ≠ 1): replay one point term-by-term
    val zs = Spectral.czt(x, 4, wMod = 0.999, wPhi = -0.3,
      aMod = 1.002, aPhi = 0.05)
    val k = 3
    var sr = 0.0
    var si = 0.0
    for (j <- 0 until n) {
      val mag = math.pow(1.002, -j) * math.pow(0.999, j * k)
      val ang = -j * 0.05 + j.toDouble * k * -0.3
      sr += x(j) * mag * math.cos(ang)
      si += x(j) * mag * math.sin(ang)
    }
    assert(math.abs(zs.re(k) - sr) < 1e-9 * math.max(1.0, math.abs(sr)))
    assert(math.abs(zs.im(k) - si) < 1e-9 * math.max(1.0, math.abs(si)))
    assertThrows[IllegalArgumentException](
      Spectral.czt(x, 0, 1.0, 0.0, 1.0, 0.0))
    assertThrows[IllegalArgumentException](
      Spectral.czt(x, 4, -1.0, 0.0, 1.0, 0.0))
  }

  test("coherence of y = c*x (same segment means) is 1 at every bin") {
    val x = g("wx_200")
    val y = x.map(_ * 3.0)
    val hann = Resample.periodicWindow("hann", 32)
    val c = Spectral.coherence(x, y, 32, 16, hann, fs = 2.0)
    c.foreach(v => assert(math.abs(v - 1.0) < 1e-12, s"coh=$v"))
  }

  test("detrend edge cases: empty, single sample, unknown type") {
    assert(Spectral.detrend(Array.empty[Double]).isEmpty)
    assert(Spectral.detrend(Array(3.5), "linear").toSeq == Seq(0.0))
    assert(Spectral.detrend(Array(3.5), "constant").toSeq == Seq(0.0))
    assertThrows[IllegalArgumentException](Spectral.detrend(Array(1.0), "cubic"))
  }

  test("welch input validation fails fast") {
    val x = Array.fill(64)(1.0)
    val w = Array.fill(16)(1.0)
    assertThrows[IllegalArgumentException](Spectral.welch(x, 16, 0, w, 1.0))
    assertThrows[IllegalArgumentException](Spectral.welch(x, 16, 17, w, 1.0))
    assertThrows[IllegalArgumentException](Spectral.welch(x, 16, 8, Array.fill(15)(1.0), 1.0))
    assertThrows[IllegalArgumentException](Spectral.welch(x, 16, 8, w, 0.0))
    assertThrows[IllegalArgumentException](Spectral.welch(Array.fill(8)(1.0), 16, 8, w, 1.0))
  }

  test("welch average=median: identical segments make median == mean / bias") {
    // x periodic with period == hop: every segment is the same vector,
    // so the median of the raw powers equals the mean of them, and the
    // two estimates differ by exactly the _median_bias factor
    val x = Array.tabulate(96)(t => math.sin(2 * math.Pi * t / 16) + 0.25)
    val w = Array.fill(16)(1.0)
    val mean = Spectral.welch(x, 16, 16, w, fs = 2.0, demean = false)
    val med = Spectral.welch(x, 16, 16, w, fs = 2.0, demean = false,
      average = "median")
    // ns = 6 segments -> bias = 1 + (1/3 - 1/2) + (1/5 - 1/4) = 47/60
    val bias = 1.0 + (1.0 / 3 - 1.0 / 2) + (1.0 / 5 - 1.0 / 4)
    for (b <- mean.indices)
      assert(math.abs(med(b) - mean(b) / bias) < 1e-12 * math.max(1.0, mean(b)),
        s"bin $b: median=${med(b)} mean=${mean(b)}")
  }

  test("welch average=median shrugs off one poisoned segment where mean cannot") {
    val r = new scala.util.Random(13)
    val x = Array.tabulate(160)(t => math.sin(2 * math.Pi * t / 8) + r.nextGaussian() * 0.01)
    // blow up one interior segment (scale, not offset — the per-segment
    // demean would cancel a constant)
    for (i <- 64 until 80) x(i) *= 100.0
    val w = Array.fill(16)(1.0)
    val mean = Spectral.welch(x, 16, 16, w, fs = 2.0)
    val med = Spectral.welch(x, 16, 16, w, fs = 2.0, average = "median")
    // the spike dominates the mean's tone bin estimate; the median stays
    // within an order of magnitude of the clean tone power
    val tone = 2 // bin for period 8 at nperseg 16
    assert(mean(tone) > 50 * med(tone),
      s"mean=${mean(tone)} median=${med(tone)} — median should be robust")
    assertThrows[IllegalArgumentException](
      Spectral.welch(x, 16, 16, w, fs = 2.0, average = "trimmed"))
  }

  test("tukey periodic window: scipy piecewise anchors") {
    // n=16, alpha=0.25: sym length 17, width = floor(0.25*16/2) = 2 ->
    // taper on k=0..2 and k=14..15, flat 1.0 on k=3..13
    val w = Resample.tukeyPeriodic(16, 0.25)
    assert(w.length == 16)
    assert(w(0) == 0.0) // cos(-pi) edge
    for (k <- 3 to 13) assert(w(k) == 1.0, s"flat top broken at $k")
    // taper is the published cosine: w(k) = 0.5(1+cos(pi(-1 + 2k/(alpha(M-1)))))
    for (k <- 1 to 2) {
      val want = 0.5 * (1 + math.cos(math.Pi * (-1 + 2.0 * k / 0.25 / 16)))
      assert(math.abs(w(k) - want) < 1e-15)
    }
    // periodic truncation keeps the head/tail asymmetric: w(14) mirrors w(2)
    assert(math.abs(w(14) - w(2)) < 1e-12)
    assert(math.abs(w(15) - w(1)) < 1e-12)
    // degenerate alphas
    assert(Resample.tukeyPeriodic(8, 0.0).forall(_ == 1.0))
    val hann = Resample.periodicWindow("hann", 8)
    assert(Resample.tukeyPeriodic(8, 1.0).zip(hann).forall { case (a, b) => a == b })
  }

  test("welch of a bin-aligned tone concentrates power in its bin (Parseval sanity)") {
    // sin(2*pi*4*t/32) with nperseg=32, boxcar, no demean: all power in
    // bin 4. Density scaling: psd[4] = 2 * |n/2 * 1|^2 / (fs * n) with
    // amplitude 1 -> 2*(16^2)/(2*32) = 8.
    val x = Array.tabulate(128)(t => math.sin(2 * math.Pi * 4 * t / 32))
    val psd = Spectral.welch(x, 32, 16, Array.fill(32)(1.0), fs = 2.0,
      demean = false)
    assert(math.abs(psd(4) - 8.0) < 1e-9, s"tone bin psd=${psd(4)}")
    for (b <- psd.indices if b != 4)
      assert(math.abs(psd(b)) < 1e-9, s"leak at bin $b: ${psd(b)}")
  }
}

package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** Ricker/CWT and Lomb-Scargle kernel invariants. The ricker closed
  * form and the Lomb-Scargle τ-rotation definition are published
  * (scipy.signal docs); the tests pin our kernels against
  * independently-coded versions of those definitions, not against
  * themselves.
  */
class WaveletSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("ricker closed-form anchors: center amplitude, zeros at ±a, symmetry") {
    for ((points, a) <- Seq((11, 2.0), (10, 1.0), (40, 4.0), (21, 3.0))) {
      val w = Wavelet.ricker(points, a)
      assert(w.length == points)
      // symmetry about (points-1)/2 for both parities
      for (i <- 0 until points)
        assert(math.abs(w(i) - w(points - 1 - i)) < 1e-15, s"asym at $i")
      // center amplitude A = 2/(sqrt(3a) pi^1/4) when a sample sits at t=0
      if (points % 2 == 1) {
        val amp = 2.0 / (math.sqrt(3.0 * a) * math.pow(math.Pi, 0.25))
        assert(math.abs(w((points - 1) / 2) - amp) < 1e-15)
      }
      // zero crossing exactly at |t| = a when a sample lands there
      val center = (points - 1) / 2.0
      for (i <- 0 until points; if math.abs(math.abs(i - center) - a) < 1e-12)
        assert(math.abs(w(i)) < 1e-15, s"nonzero at |t|=a, i=$i")
    }
  }

  test("ricker has (near-)zero mean — the admissibility the wavelet is built for") {
    // discretized integral of the Mexican hat over +-5a: analytically 0,
    // truncation leaves only the exp(-12.5) tail
    val w = Wavelet.ricker(101, 10.0)
    assert(math.abs(w.sum) < 1e-3)
  }

  test("cwtFlat rows equal independent direct same-mode convolutions") {
    val r = rng(7)
    val x = Array.fill(57)(r.nextDouble() * 10 - 5)
    val widths = Array(1.0, 3.0, 6.0)
    val taps = widths.map(a => Wavelet.ricker((10 * a).toInt, a))
    val got = Wavelet.cwtFlat(x, taps.flatten, taps.map(_.length))
    assert(got.length == widths.length * x.length)
    for ((tp, wi) <- taps.zipWithIndex) {
      val m = tp.length
      val off = (m - 1) / 2
      for (p <- x.indices) {
        // full[p+off] = sum_j x(j) tp(p+off-j)
        var sum = 0.0
        for (j <- x.indices) {
          val ti = p + off - j
          if (ti >= 0 && ti < m) sum += x(j) * tp(ti)
        }
        assert(math.abs(got(wi * x.length + p) - sum) < 1e-10,
          s"width $wi pos $p")
      }
    }
  }

  /** The classic τ-rotation Lomb-Scargle definition, coded from the
    * published formula (independent of the kernel's 2×2 solve).
    */
  private def lsTau(t: Array[Double], y: Array[Double], w: Double): Double = {
    val n = t.length
    var s2 = 0.0; var c2 = 0.0
    for (i <- 0 until n) { s2 += math.sin(2 * w * t(i)); c2 += math.cos(2 * w * t(i)) }
    val tau = math.atan2(s2, c2) / (2 * w)
    var yc = 0.0; var ys = 0.0; var cc = 0.0; var ss = 0.0
    for (i <- 0 until n) {
      val cv = math.cos(w * (t(i) - tau)); val sv = math.sin(w * (t(i) - tau))
      yc += y(i) * cv; ys += y(i) * sv; cc += cv * cv; ss += sv * sv
    }
    0.5 * (yc * yc / cc + ys * ys / ss)
  }

  test("lombscargle equals the published tau-rotation form on irregular times") {
    val r = rng(42)
    var acc = 0.0
    val t = Array.fill(200) { acc += 0.05 + r.nextDouble(); acc }
    val y = t.map(ti => math.sin(1.3 * ti) + 0.5 * math.cos(2.7 * ti)) // no noise term needed
    val freqs = Array(0.3, 0.9, 1.3, 2.0, 2.7, 3.4)
    val got = Wavelet.lombscargle(t, y, freqs)
    for ((f, i) <- freqs.zipWithIndex) {
      val want = lsTau(t, y, f)
      assert(math.abs(got(i) - want) <= 1e-9 * math.max(1.0, math.abs(want)),
        s"freq $f: got ${got(i)} want $want")
    }
    // and the power peaks at the planted frequencies
    assert(got(2) > 4 * got(0) && got(2) > 4 * got(3))
    assert(got(4) > 4 * got(0))
  }

  test("lombscargle is time-shift invariant (the property `center` relies on)") {
    val r = rng(3)
    var acc = 100.0
    val t = Array.fill(80) { acc += 0.1 + r.nextDouble() * 0.5; acc }
    val y = Array.fill(80)(r.nextDouble() * 4 - 2)
    val freqs = Array(0.5, 1.0, 2.0)
    val a = Wavelet.lombscargle(t, y, freqs)
    val b = Wavelet.lombscargle(t.map(_ - t(0)), y, freqs)
    for (i <- freqs.indices)
      assert(math.abs(a(i) - b(i)) <= 1e-6 * math.max(1.0, math.abs(a(i))))
  }

  test("lombscargle precenter subtracts the mean; normalize scales by 2/sum(y^2)") {
    val r = rng(11)
    var acc = 0.0
    val t = Array.fill(60) { acc += 0.2 + r.nextDouble(); acc }
    val y = t.map(ti => 5.0 + math.sin(0.9 * ti))
    val freqs = Array(0.9, 1.7)
    val centered = {
      val m = y.sum / y.length
      y.map(_ - m)
    }
    val viaFlag = Wavelet.lombscargle(t, y, freqs, precenter = true)
    val manual = Wavelet.lombscargle(t, centered, freqs)
    for (i <- freqs.indices)
      assert(math.abs(viaFlag(i) - manual(i)) <= 1e-9 * math.max(1.0, manual(i).abs))
    val norm = Wavelet.lombscargle(t, centered, freqs, normalize = true)
    val ysq = centered.map(v => v * v).sum
    for (i <- freqs.indices)
      assert(math.abs(norm(i) - manual(i) * 2.0 / ysq) <= 1e-12)
  }

  test("istft round trip: hann 50% overlap reconstructs exactly where the envelope is nonzero") {
    val r = rng(5)
    val n = 100; val w = 16; val h = 8
    val x = Array.fill(n)(r.nextDouble() * 20 - 10)
    val wts = Resample.periodicWindow("hann", w)
    val nWins = (n - w) / h + 1
    val nb = w / 2 + 1
    val re = new Array[Double](nWins * nb)
    val im = new Array[Double](nWins * nb)
    for (k <- 0 until nWins) {
      val seg = Array.tabulate(w)(i => x(k * h + i) * wts(i))
      val sp = Fft.rfft(seg)
      System.arraycopy(sp.re, 0, re, k * nb, nb)
      System.arraycopy(sp.im, 0, im, k * nb, nb)
    }
    val got = Spectral.istft(re, im, nWins, w, h, wts)
    val covered = (nWins - 1) * h + w
    assert(got.length == covered)
    assert(got(0) == 0.0) // hann w[0]=0: zero envelope, scipy's NOLA edge
    for (i <- 1 until covered)
      assert(math.abs(got(i) - x(i)) < 1e-9, s"sample $i")
  }

  test("istft round trip: boxcar non-overlapping windows reconstruct every sample") {
    val r = rng(9)
    val n = 64; val w = 16; val h = 16
    val x = Array.fill(n)(r.nextDouble() * 2 - 1)
    val wts = Resample.periodicWindow("boxcar", w)
    val nWins = n / w
    val nb = w / 2 + 1
    val re = new Array[Double](nWins * nb)
    val im = new Array[Double](nWins * nb)
    for (k <- 0 until nWins) {
      val sp = Fft.rfft(java.util.Arrays.copyOfRange(x, k * h, k * h + w))
      System.arraycopy(sp.re, 0, re, k * nb, nb)
      System.arraycopy(sp.im, 0, im, k * nb, nb)
    }
    val got = Spectral.istft(re, im, nWins, w, h, wts)
    for (i <- 0 until n) assert(math.abs(got(i) - x(i)) < 1e-12, s"sample $i")
  }
}

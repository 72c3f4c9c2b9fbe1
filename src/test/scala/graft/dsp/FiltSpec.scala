package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class FiltSpec extends AnyFunSuite {
  private val g = Golden.load("filt.txt")
  private val tol = 1e-10

  private def check(name: String, got: Array[Double], t: Double = tol): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  private val x = g("x_64")
  private val b1 = g("b1"); private val a1 = g("a1")
  private val b2 = g("b2"); private val a2 = g("a2")

  test("lfilter zero-state vs naive DF1 (numpy)") {
    check("lfilter_1", Filt.lfilter(b1, a1, x))
    check("lfilter_2", Filt.lfilter(b2, a2, x))
  }

  test("lfilter_zi vs numpy.linalg solve") {
    check("lfilter_zi_1", Filt.lfilterZi(b1, a1))
    check("lfilter_zi_2", Filt.lfilterZi(b2, a2))
  }

  test("lfilter with initial conditions vs numpy DF2T") {
    val zi = Filt.lfilterZi(b1, a1).map(_ * x(0))
    check("lfilter_1_zi", Filt.lfilter(b1, a1, x, zi))
  }

  test("sosfilt cascade vs sequential DF1 (numpy)") {
    val sos = Array(
      b1(0), b1(1), b1(2), a1(0), a1(1), a1(2),
      b2(0), b2(1), b2(2), a2(0), a2(1), a2(2))
    check("sosfilt_12", Filt.sosfilt(sos, x))
  }

  test("sosfilt equals lfilter for a single section") {
    val sos = Array(b1(0), b1(1), b1(2), a1(0), a1(1), a1(2))
    val got = Filt.sosfilt(sos, x)
    val want = Filt.lfilter(b1, a1, x)
    assert(Golden.maxAbsDiff(got, want) < 1e-12)
  }

  test("sosfilt_zi gives step-steady state") {
    // Feeding a constant input with zi = sosfiltZi * c must give a
    // constant output from sample 0 (the defining property of
    // scipy.signal.sosfilt_zi).
    val sos = Design.butterSos(4, 0.3)
    val c = 1.7
    val zi = Filt.sosfiltZi(sos).map(_ * c)
    val y = Filt.sosfilt(sos, Array.fill(32)(c), zi)
    val dc = y(31) // steady-state gain * c (DC gain is 1 for butter lowpass)
    for (t <- 0 until 32)
      assert(math.abs(y(t) - dc) < 1e-9, s"t=$t y=${y(t)} dc=$dc")
  }

  test("padExt odd/even/constant") {
    val s = Array(1.0, 2.0, 4.0, 7.0)
    assert(Filt.padExt(s, 2, "odd").toSeq ==
      Seq(-2.0, 0.0, 1.0, 2.0, 4.0, 7.0, 10.0, 12.0))
    assert(Filt.padExt(s, 2, "even").toSeq ==
      Seq(4.0, 2.0, 1.0, 2.0, 4.0, 7.0, 4.0, 2.0))
    assert(Filt.padExt(s, 2, "constant").toSeq ==
      Seq(1.0, 1.0, 1.0, 2.0, 4.0, 7.0, 7.0, 7.0))
  }

  test("sosfiltfilt is zero-phase and matches filtfilt for one biquad") {
    // A passband sinusoid survives forward-backward filtering with no
    // phase shift and |H|^2 amplitude.
    val sos = Design.butterSos(4, 0.5)
    val n = 512
    val w = 2 * math.Pi * 0.02 // well inside passband
    val sig = Array.tabulate(n)(t => math.sin(w * t))
    val y = Filt.sosfiltfilt(sos, sig)
    val h2 = math.pow(Design.sosFreqAbs(sos, w), 2)
    // compare mid-section (edges have residual transient)
    for (t <- 100 until n - 100)
      assert(math.abs(y(t) - h2 * sig(t)) < 1e-6, s"t=$t")
    val sosB = Array(b1(0), b1(1), b1(2), a1(0), a1(1), a1(2))
    val viaBa = Filt.filtfilt(b1, a1, x)
    val viaSos = Filt.sosfiltfilt(sosB, x)
    assert(Golden.maxAbsDiff(viaBa, viaSos) < 1e-9)
  }
}

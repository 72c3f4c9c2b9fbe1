package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class SavgolSpec extends AnyFunSuite {
  private val g = Golden.load("savgol.txt")

  private def check(name: String, got: Array[Double], t: Double = 1e-8): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  for (n <- Seq(80, 23)) {
    lazy val x = g(s"sgx_$n")

    test(s"savgol n=$n vs numpy per-window polyfit, both modes") {
      for ((w, p) <- Seq((5, 2), (7, 3), (9, 4))) {
        check(s"savgol_const_${n}_${w}_$p", Filt.savgol(x, w, p, "constant"))
        check(s"savgol_interp_${n}_${w}_$p", Filt.savgol(x, w, p, "interp"))
      }
    }
  }

  test("savgolCoeffs reproduces the published window-5 order-2 table") {
    val want = Array(-3.0, 12.0, 17.0, 12.0, -3.0).map(_ / 35.0)
    val got = Filt.savgolCoeffs(5, 2)
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, got.toSeq) }
    // window 7 order 2: (-2, 3, 6, 7, 6, 3, -2)/21
    val want7 = Array(-2.0, 3.0, 6.0, 7.0, 6.0, 3.0, -2.0).map(_ / 21.0)
    Filt.savgolCoeffs(7, 2).zip(want7).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("polyorder = window-1 interpolates (output == input away from constant-pad edges)") {
    val x = Array(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0)
    val y = Filt.savgol(x, 5, 4, "interp")
    x.indices.foreach(i => assert(math.abs(y(i) - x(i)) < 1e-9, s"i=$i"))
  }

  test("savgol deriv: published slope table, polynomial exactness, delta scale") {
    // window 5, poly 2, deriv 1 center weights are the classic
    // least-squares slope (-2,-1,0,1,2)/10
    val h = Filt.savgolCoeffs(5, 2, 0.0, deriv = 1)
    val want = Array(-0.2, -0.1, 0.0, 0.1, 0.2)
    h.indices.foreach(i => assert(math.abs(h(i) - want(i)) < 1e-12, s"tap $i"))
    // interp mode on a quadratic: 1st derivative exact EVERYWHERE
    // (edges included — the edge fit is the same exact polynomial)
    val x = Array.tabulate(12)(i => 0.5 * i * i - 3.0 * i + 2.0)
    val d1 = Filt.savgol(x, 5, 2, "interp", deriv = 1)
    x.indices.foreach(i =>
      assert(math.abs(d1(i) - (i - 3.0)) < 1e-9, s"d1 at $i: ${d1(i)}"))
    val d2 = Filt.savgol(x, 5, 2, "interp", deriv = 2)
    x.indices.foreach(i => assert(math.abs(d2(i) - 1.0) < 1e-9, s"d2 at $i"))
    // delta converts to coordinate units: halving the spacing doubles
    // the per-coordinate slope estimate
    val dHalf = Filt.savgol(x, 5, 2, "interp", deriv = 1, delta = 0.5)
    x.indices.foreach(i => assert(math.abs(dHalf(i) - 2.0 * d1(i)) < 1e-9))
    // deriv beyond the fit degree is identically zero
    assert(Filt.savgol(x, 5, 2, "constant", deriv = 3).forall(_ == 0.0))
  }

  test("savgol validation fails fast") {
    assertThrows[IllegalArgumentException](Filt.savgol(Array(1.0, 2.0), 4, 2))
    assertThrows[IllegalArgumentException](Filt.savgol(Array(1.0, 2.0), 5, 5))
    assertThrows[IllegalArgumentException](Filt.savgol(Array(1.0, 2.0), 5, 2, "interp"))
    assertThrows[IllegalArgumentException](Filt.savgol(Array(1.0, 2.0), 3, 1, "nearest"))
    assert(Filt.savgol(Array.empty[Double], 5, 2).isEmpty)
  }
}

package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class UpfirdnSpec extends AnyFunSuite {
  private val g = Golden.load("upfirdn.txt")

  private def check(name: String, got: Array[Double], t: Double = 1e-10): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    assert(got.length == want.length,
      s"$name length ${got.length} != ${want.length}")
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  private val h = Array(0.25, 0.5, 1.0, 0.5, 0.25)

  for (n <- Seq(50, 17)) {
    lazy val x = g(s"ux_$n")

    test(s"upfirdn n=$n vs numpy zero-stuff + convolve + stride") {
      for ((up, down) <- Seq((3, 2), (2, 3), (1, 4), (4, 1)))
        check(s"upfirdn_${n}_${up}_$down", Resample.upfirdn(h, x, up, down))
    }

    test(s"resamplePoly n=$n vs numpy reimplementation of the published algorithm") {
      for ((up, down) <- Seq((3, 2), (2, 3), (5, 7)))
        check(s"rpoly_${n}_${up}_$down", Resample.resamplePoly(x, up, down))
    }
  }

  test("kaiser window vs numpy.kaiser (pins besselI0)") {
    check("kaiser_21_5", Design.kaiser(21, 5.0), 1e-12)
    check("kaiser_8_14", Design.kaiser(8, 14.0), 1e-12)
  }

  test("upfirdn identities: up=down=1 is plain convolution; h=[1] is zero-stuff") {
    val x = Array(1.0, 2.0, 3.0)
    assert(Resample.upfirdn(h, x, 1, 1).toSeq ==
      Conv.convolve(x, h, "full", "direct").toSeq)
    assert(Resample.upfirdn(Array(1.0), x, 2, 1).toSeq ==
      Seq(1.0, 0.0, 2.0, 0.0, 3.0))
  }

  test("interpGrid: numpy.interp semantics — interior linear, exact hits, edge clamp") {
    val c = Array(0.0, 1.0, 3.0, 7.0)
    val v = Array(10.0, 20.0, 30.0, 70.0)
    // grid -1, 0.5, 2, 3.5, ... clamps below, interpolates, hits samples
    val got = Resample.interpGrid(c, v, start = -1.0, step = 1.5, n = 7)
    val want = Seq(
      10.0,              // -1  -> clamp to first
      15.0,              // 0.5 -> midpoint of (0,10)-(1,20)
      25.0,              // 2   -> midpoint of (1,20)-(3,30)
      35.0,              // 3.5 -> 30 + 10*0.5/4
      50.0,              // 5   -> 30 + 40*2/4
      65.0,              // 6.5 -> 30 + 40*3.5/4
      70.0)              // 8   -> clamp to last
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, got.toSeq) }
    // NaN start anchors at the first coordinate; exact hits return samples
    val anchored = Resample.interpGrid(c, v, Double.NaN, 1.0, 4)
    assert(anchored(0) == 10.0 && anchored(1) == 20.0)
    assertThrows[IllegalArgumentException](Resample.interpGrid(c, v, 0.0, 0.0, 3))
    assertThrows[IllegalArgumentException](
      Resample.interpGrid(Array.empty[Double], Array.empty[Double], 0.0, 1.0, 3))
  }

  test("resamplePoly rate identities: gcd reduction and 1:1 passthrough") {
    val x = g("ux_50")
    assert(Resample.resamplePoly(x, 4, 4).toSeq == x.toSeq)
    assert(Resample.resamplePoly(x, 6, 4).toSeq ==
      Resample.resamplePoly(x, 3, 2).toSeq)
    assert(Resample.resamplePoly(x, 3, 2).length == 75) // ceil(50*3/2)
    assert(Resample.resamplePoly(x, 2, 3).length == 34) // ceil(50*2/3)
  }
}

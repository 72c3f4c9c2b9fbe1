package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class MedfiltSpec extends AnyFunSuite {
  private val g = Golden.load("medfilt.txt")

  private def check(name: String, got: Array[Double], t: Double = 1e-12): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < t, s"$name maxAbsDiff=$d")
  }

  for (n <- Seq(100, 37)) {
    lazy val x = g(s"mx_$n")

    test(s"medfilt n=$n vs numpy sliding median") {
      for (k <- Seq(3, 5, 9))
        check(s"medfilt_${n}_$k", Filt.medfilt(x, k))
    }

    test(s"wiener n=$n vs numpy local-statistics reference") {
      for (size <- Seq(3, 7)) {
        check(s"wiener_${n}_$size", Filt.wiener(x, size))
        check(s"wiener_${n}_${size}_n01", Filt.wiener(x, size, noise = 0.1))
      }
    }
  }

  test("orderFilter: rank size/2 == medfilt; extreme ranks select window min/max") {
    val x = g("mx_100")
    assert(Filt.orderFilter(x, 5, 2).sameElements(Filt.medfilt(x, 5)))
    // rank 0 over [5,1,3]: windows [0,5,1]->0, [5,1,3]->1, [1,3,0]->0
    assert(Filt.orderFilter(Array(5.0, 1.0, 3.0), 3, 0).toSeq == Seq(0.0, 1.0, 0.0))
    // rank k-1 = window max
    assert(Filt.orderFilter(Array(5.0, 1.0, 3.0), 3, 2).toSeq == Seq(5.0, 5.0, 3.0))
    assertThrows[IllegalArgumentException](Filt.orderFilter(x, 5, 5))
    assertThrows[IllegalArgumentException](Filt.orderFilter(x, 4, 1))
  }

  test("medfilt selects the exact middle element (no averaging)") {
    // k=3 over [5, 1, 3]: windows [0,5,1]->1, [5,1,3]->3, [1,3,0]->1
    assert(Filt.medfilt(Array(5.0, 1.0, 3.0), 3).toSeq == Seq(1.0, 3.0, 1.0))
  }

  test("medfilt/wiener input validation fails fast") {
    assertThrows[IllegalArgumentException](Filt.medfilt(Array(1.0), 4))
    assertThrows[IllegalArgumentException](Filt.medfilt(Array(1.0), -1))
    assertThrows[IllegalArgumentException](Filt.wiener(Array(1.0), 2))
    assert(Filt.wiener(Array.empty[Double]).isEmpty)
    assert(Filt.medfilt(Array.empty[Double]).isEmpty)
  }

  test("wiener with huge noise floor degenerates to the local mean") {
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val got = Filt.wiener(x, 3, noise = 1e9)
    val lm = Array((0.0 + 1 + 2) / 3, (1.0 + 2 + 3) / 3, (2.0 + 3 + 4) / 3, (3.0 + 4 + 0) / 3)
    got.zip(lm).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("medfilt2d: hand-computed 3x3, zero-padded corners") {
    // 3x3 grid 1..9; at the corner the 9-window holds 5 zeros + 4
    // values, so the median IS 0+… — e.g. (0,0): {0,0,0,0,0,1,2,4,5}
    // sorted → middle 0. Center: {1..9} → 5.
    val x = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0)
    val got = Filt.medfilt2d(x, 3, 3)
    assert(got(4) == 5.0, s"center ${got(4)}")
    assert(got(0) == 0.0, s"corner ${got(0)}")
    // edge (0,1): {0,0,0,1,2,3,4,5,6} → 2
    assert(got(1) == 2.0, s"edge ${got(1)}")
  }

  test("medfilt2d on a 1-row grid with a 1x3 kernel equals 1-D medfilt") {
    val x = Array(5.0, 1.0, 3.0, 9.0, 2.0, 7.0)
    assert(Filt.medfilt2d(x, 1, x.length, 1, 3).toSeq ==
      Filt.medfilt(x, 3).toSeq)
    // 1x1 kernel is the identity
    assert(Filt.medfilt2d(x, 2, 3, 1, 1).toSeq == x.toSeq)
  }

  test("medfilt2d input validation fails fast") {
    assertThrows[IllegalArgumentException](Filt.medfilt2d(Array(1.0, 2.0), 2, 2))
    assertThrows[IllegalArgumentException](Filt.medfilt2d(Array(1.0), 1, 1, 2, 3))
  }
}

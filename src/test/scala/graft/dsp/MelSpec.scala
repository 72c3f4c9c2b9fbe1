package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contracts mm_mfcc's oracle relies on: the literal weight
  * tables the oracle embeds must agree with the kernel's fast paths
  * (radix-2 rfft vs naive DFT, Makhoul DCT-II vs the explicit ortho
  * weight matrix), and the filterbank must have the textbook shape.
  */
class MelSpec extends AnyFunSuite {

  test("hamming endpoints and symmetry") {
    val w = Mel.hamming(32)
    assert(math.abs(w(0) - 0.08) < 1e-12)
    assert(math.abs(w(31) - 0.08) < 1e-12)
    (0 until 16).foreach(j => assert(math.abs(w(j) - w(31 - j)) < 1e-12))
    assert(w.max <= 1.0 && w((31) / 2) > 0.9)
  }

  test("filterbank: triangles partition the mel axis, rows nonneg, peaks interior") {
    val fb = Mel.filterbank(32, 8, 8000.0)
    assert(fb.length == 8 && fb.forall(_.length == 17))
    assert(fb.flatten.forall(_ >= 0.0))
    // every filter has at least one nonzero bin and is unimodal
    fb.foreach { row =>
      assert(row.exists(_ > 0.0))
      val peak = row.indexOf(row.max)
      assert((0 until peak).forall(k => row(k) <= row(k + 1)))
      assert((peak until row.length - 1).forall(k => row(k) >= row(k + 1)))
    }
    // mel scale is monotone: filter peak bins strictly increase
    val peaks = fb.map(r => r.indexOf(r.max)).toSeq
    assert(peaks == peaks.sorted)
  }

  test("dctOrthoWeights matrix equals Fft.dct2(·, ortho) action") {
    val rnd = new scala.util.Random(7)
    val x = Array.fill(8)(rnd.nextDouble() * 10 - 5)
    val full = Fft.dct2(x, "ortho")
    val w = Mel.dctOrthoWeights(8, 8)
    (0 until 8).foreach { c =>
      val naive = (0 until 8).map(m => w(c)(m) * x(m)).sum
      assert(math.abs(naive - full(c)) < 1e-10, s"coef $c")
    }
  }

  test("mfccFrame equals the naive windowed-DFT → mel → log → DCT chain") {
    val rnd = new scala.util.Random(42)
    val s = Array.fill(32)(rnd.nextInt(30000) - 15000.0)
    val win = Mel.hamming(32)
    val fb = Mel.filterbank(32, 8, 8000.0)
    val got = Mel.mfccFrame(s, win, fb, 4)
    // naive replay, the oracle's exact structure
    val x = s.zip(win).map { case (a, b) => a * b }
    val power = (0 to 16).map { k =>
      val re = x.zipWithIndex.map { case (v, j) =>
        v * math.cos(2 * math.Pi * k * j / 32) }.sum
      val im = x.zipWithIndex.map { case (v, j) =>
        v * math.sin(2 * math.Pi * k * j / 32) }.sum
      re * re + im * im
    }
    val le = fb.map(row => math.log(row.zip(power).map { case (w, p) => w * p }.sum + 1.0))
    val dw = Mel.dctOrthoWeights(4, 8)
    val want = (0 until 4).map(c => (0 until 8).map(m => dw(c)(m) * le(m)).sum)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"got ${got.toSeq} want $want")
    }
  }
}

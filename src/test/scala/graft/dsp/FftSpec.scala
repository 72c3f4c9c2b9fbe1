package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class FftSpec extends AnyFunSuite {
  private val g = Golden.load("fft.txt")
  private val tol = 1e-10

  private def check(name: String, got: Array[Double]): Unit = {
    val want = g.getOrElse(name, fail(s"no golden $name"))
    val d = Golden.maxAbsDiff(got, want)
    assert(d < tol, s"$name maxAbsDiff=$d")
  }

  for (n <- Seq(16, 15, 17, 64)) {
    val re = g(s"in_re_$n"); val im = g(s"in_im_$n")

    test(s"fft/ifft n=$n all norms vs numpy") {
      for (norm <- Seq("backward", "ortho", "forward")) {
        val f = Fft.fft(re, im, -1, norm)
        check(s"fft_${n}_${norm}_re", f.re)
        check(s"fft_${n}_${norm}_im", f.im)
        val i = Fft.ifft(re, im, -1, norm)
        check(s"ifft_${n}_${norm}_re", i.re)
        check(s"ifft_${n}_${norm}_im", i.im)
      }
    }

    test(s"fft n=$n crop/pad vs numpy") {
      for (m <- Seq(n / 2 + 1, 2 * n)) {
        val f = Fft.fft(re, im, m, "backward")
        check(s"fftn_${n}_${m}_re", f.re)
        check(s"fftn_${n}_${m}_im", f.im)
      }
    }

    test(s"rfft/irfft n=$n vs numpy") {
      val r = Fft.rfft(re)
      check(s"rfft_${n}_re", r.re)
      check(s"rfft_${n}_im", r.im)
      check(s"irfft_$n", Fft.irfft(r.re, r.im))
      check(s"irfft_n_$n", Fft.irfft(r.re, r.im, n))
    }

    test(s"hfft/ihfft n=$n vs numpy") {
      val m = n / 2 + 1
      check(s"hfft_$n", Fft.hfft(re.take(m), im.take(m)))
      val ih = Fft.ihfft(re)
      check(s"ihfft_${n}_re", ih.re)
      check(s"ihfft_${n}_im", ih.im)
    }

    test(s"fftfreq/rfftfreq/shift n=$n vs numpy") {
      check(s"fftfreq_$n", Fft.fftfreq(n, 0.25))
      check(s"rfftfreq_$n", Fft.rfftfreq(n, 0.25))
      check(s"fftshift_$n", Fft.fftshift(re))
      check(s"ifftshift_$n", Fft.ifftshift(re))
    }
  }

  test("rfft/irfft ortho+forward norms vs numpy") {
    val x = g("in2_re_16")
    for (norm <- Seq("ortho", "forward")) {
      val r = Fft.rfft(x, -1, norm)
      check(s"rfft2_16_${norm}_re", r.re)
      check(s"rfft2_16_${norm}_im", r.im)
      check(s"irfft2_16_$norm", Fft.irfft(r.re, r.im, -1, norm))
    }
  }

  test("hfft/ihfft norms vs numpy") {
    val hre = g("hin_re_9"); val him = g("hin_im_9")
    for (norm <- Seq("backward", "ortho", "forward")) {
      check(s"hfft_9_$norm", Fft.hfft(hre, him, -1, norm))
      val base = Fft.hfft(hre, him) // length 16 real
      val ih = Fft.ihfft(base, -1, norm)
      check(s"ihfft_16_${norm}_re", ih.re)
      check(s"ihfft_16_${norm}_im", ih.im)
    }
  }

  test("ifftshift inverts fftshift for odd and even n") {
    for (n <- Seq(8, 9, 15, 16)) {
      val x = Array.tabulate(n)(_.toDouble)
      assert(Golden.maxAbsDiff(Fft.ifftshift(Fft.fftshift(x)), x) == 0.0)
    }
  }

  test("fftshiftNd matches per-axis 1-D shifts and inverts, odd and even dims") {
    for ((n1, n2) <- Seq((3, 4), (5, 7), (4, 4))) {
      val x = Array.tabulate(n1 * n2)(_.toDouble * 1.5 - 3)
      val shape = Array(n1, n2)
      val f = Fft.fftshiftNd(x, shape, inverse = false)
      // composing the 1-D kernel over rows then columns gives the same
      val rows = Array.tabulate(n1)(r => x.slice(r * n2, (r + 1) * n2))
      val rowShifted = rows.map(Fft.fftshift)
      val want = Array.tabulate(n1 * n2) { k =>
        // column shift: output row k1 takes input row (k1 + ceil(n1/2)) mod n1
        rowShifted(((k / n2) + (n1 - n1 / 2)) % n1)(k % n2)
      }
      assert(f.toSeq == want.toSeq, s"${n1}x$n2")
      assert(Fft.fftshiftNd(f, shape, inverse = true).toSeq == x.toSeq)
      // 1-D degenerate case equals the 1-D kernels exactly
      assert(Fft.fftshiftNd(x, Array(n1 * n2), inverse = false).toSeq ==
        Fft.fftshift(x).toSeq)
      assert(Fft.fftshiftNd(x, Array(n1 * n2), inverse = true).toSeq ==
        Fft.ifftshift(x).toSeq)
    }
  }

  test("fft roundtrip identity at non-golden sizes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 3, 5, 12, 100, 257)) {
      val re = Array.fill(n)(rnd.nextGaussian())
      val im = Array.fill(n)(rnd.nextGaussian())
      val f = Fft.fft(re, im)
      val b = Fft.ifft(f.re, f.im)
      assert(Golden.maxAbsDiff(b.re, re) < 1e-9, s"n=$n re")
      assert(Golden.maxAbsDiff(b.im, im) < 1e-9, s"n=$n im")
    }
  }

  test("fftNd 2-D equals row-then-column 1-D ffts; ifftNd inverts; norms scale by total") {
    val rnd = new scala.util.Random(23)
    for ((r, c) <- Seq((4, 8), (3, 5), (1, 7), (6, 1))) {
      val re = Array.fill(r * c)(rnd.nextGaussian())
      val im = Array.fill(r * c)(rnd.nextGaussian())
      // independent path: 1-D fft of every row, then of every column
      val wr = Array.ofDim[Double](r * c); val wi = Array.ofDim[Double](r * c)
      for (i <- 0 until r) {
        val f = Fft.fft(re.slice(i * c, i * c + c), im.slice(i * c, i * c + c))
        for (j <- 0 until c) { wr(i * c + j) = f.re(j); wi(i * c + j) = f.im(j) }
      }
      val er = wr.clone(); val ei = wi.clone()
      for (j <- 0 until c) {
        val f = Fft.fft(Array.tabulate(r)(i => wr(i * c + j)),
          Array.tabulate(r)(i => wi(i * c + j)))
        for (i <- 0 until r) { er(i * c + j) = f.re(i); ei(i * c + j) = f.im(i) }
      }
      val got = Fft.fftNd(re, im, Array(r, c))
      assert(Golden.maxAbsDiff(got.re, er) < 1e-9, s"${r}x$c re")
      assert(Golden.maxAbsDiff(got.im, ei) < 1e-9, s"${r}x$c im")
      for (norm <- Seq("backward", "ortho", "forward")) {
        val f = Fft.fftNd(re, im, Array(r, c), inverse = false, norm)
        val b = Fft.fftNd(f.re, f.im, Array(r, c), inverse = true, norm)
        assert(Golden.maxAbsDiff(b.re, re) < 1e-9, s"${r}x$c roundtrip $norm re")
        assert(Golden.maxAbsDiff(b.im, im) < 1e-9, s"${r}x$c roundtrip $norm im")
      }
    }
    // rank 3, coprime odd sizes (Bluestein on every axis)
    val re3 = Array.fill(3 * 5 * 7)(rnd.nextGaussian())
    val f3 = Fft.fftNd(re3, null, Array(3, 5, 7))
    val b3 = Fft.fftNd(f3.re, f3.im, Array(3, 5, 7), inverse = true)
    assert(Golden.maxAbsDiff(b3.re, re3) < 1e-9)
    assert(b3.im.forall(math.abs(_) < 1e-9))
  }

  // ---- DCT / DST: the FFT-based kernels vs the direct O(n²)
  // definition sums (two independent derivations — scipy.fft.dct
  // type 2 definitions transcribed verbatim), round trips, and the
  // ortho Parseval identity.

  private def dct2Naive(x: Array[Double], norm: String): Array[Double] = {
    val n = x.length
    val y = Array.tabulate(n) { k =>
      2.0 * (0 until n).map(j =>
        x(j) * math.cos(math.Pi * k * (2 * j + 1) / (2.0 * n))).sum
    }
    if (norm == "ortho") {
      y(0) *= math.sqrt(1.0 / (4.0 * n))
      for (k <- 1 until n) y(k) *= math.sqrt(1.0 / (2.0 * n))
    }
    y
  }

  private def dst2Naive(x: Array[Double], norm: String): Array[Double] = {
    val n = x.length
    val y = Array.tabulate(n) { k =>
      2.0 * (0 until n).map(j =>
        x(j) * math.sin(math.Pi * (k + 1) * (2 * j + 1) / (2.0 * n))).sum
    }
    if (norm == "ortho") {
      y(n - 1) *= math.sqrt(1.0 / (4.0 * n))
      for (k <- 0 until n - 1) y(k) *= math.sqrt(1.0 / (2.0 * n))
    }
    y
  }

  test("dct2/dst2 match the direct definition sums, odd and even n, both norms") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 2, 3, 8, 15, 64, 100); norm <- Seq("backward", "ortho")) {
      val x = Array.fill(n)(rnd.nextGaussian())
      assert(Golden.maxAbsDiff(Fft.dct2(x, norm), dct2Naive(x, norm)) < 1e-9,
        s"dct2 n=$n $norm")
      assert(Golden.maxAbsDiff(Fft.dst2(x, norm), dst2Naive(x, norm)) < 1e-9,
        s"dst2 n=$n $norm")
    }
  }

  test("idct2/idst2 invert dct2/dst2 exactly under both norms") {
    val rnd = new scala.util.Random(13)
    for (n <- Seq(1, 2, 3, 8, 15, 64, 100); norm <- Seq("backward", "ortho")) {
      val x = Array.fill(n)(rnd.nextGaussian())
      assert(Golden.maxAbsDiff(Fft.idct2(Fft.dct2(x, norm), norm), x) < 1e-9,
        s"idct2∘dct2 n=$n $norm")
      assert(Golden.maxAbsDiff(Fft.idst2(Fft.dst2(x, norm), norm), x) < 1e-9,
        s"idst2∘dst2 n=$n $norm")
    }
  }

  test("ortho dct2/dst2 preserve the l2 norm (orthonormal matrix)") {
    val rnd = new scala.util.Random(17)
    for (n <- Seq(2, 7, 32, 101)) {
      val x = Array.fill(n)(rnd.nextGaussian())
      val e = x.map(v => v * v).sum
      assert(math.abs(Fft.dct2(x, "ortho").map(v => v * v).sum - e) < 1e-9 * e)
      assert(math.abs(Fft.dst2(x, "ortho").map(v => v * v).sum - e) < 1e-9 * e)
    }
  }

  test("dct/dst reject unsupported norms with a clear error") {
    intercept[IllegalArgumentException](Fft.dct2(Array(1.0), "forward"))
    intercept[IllegalArgumentException](Fft.idst2(Array(1.0), "wat"))
  }
}

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

  test("fftconvolveNd reduces to the 1-D and 2-D paths") {
    val a = g("a_20_5"); val b = g("b_20_5")
    for (mode <- Seq("full", "same", "valid")) {
      val (nd1, sh1) = Conv.fftconvolveNd(a, Array(20), b, Array(5), mode)
      val want1 = Conv.convolve(a, b, mode)
      assert(sh1.toSeq == Seq(want1.length))
      assert(Golden.maxAbsDiff(nd1, want1) < tol, s"1d $mode")
    }
    val a2 = g("a2d"); val b2 = g("b2d")
    for (mode <- Seq("full", "same")) {
      val (nd2, sh2) = Conv.fftconvolveNd(a2, Array(6, 5), b2, Array(3, 4), mode)
      val (want2, wr, wc) = Conv.fftconvolve2d(a2, 6, 5, b2, 3, 4, mode)
      assert(sh2.toSeq == Seq(wr, wc))
      assert(Golden.maxAbsDiff(nd2, want2) < tol, s"2d $mode")
    }
  }

  test("fftconvolveNd 3-D matches the direct triple-loop convolution") {
    val rnd = new scala.util.Random(7)
    val aSh = Array(4, 3, 5); val bSh = Array(2, 3, 2)
    val a = Array.fill(aSh.product)(rnd.nextGaussian())
    val b = Array.fill(bSh.product)(rnd.nextGaussian())
    // direct full convolution: out[i,j,k] = sum a[p,q,r] b[i-p,j-q,k-r]
    val fSh = Array(aSh(0) + bSh(0) - 1, aSh(1) + bSh(1) - 1, aSh(2) + bSh(2) - 1)
    val full = new Array[Double](fSh.product)
    for (p <- 0 until aSh(0); q <- 0 until aSh(1); r <- 0 until aSh(2);
         u <- 0 until bSh(0); v <- 0 until bSh(1); w <- 0 until bSh(2)) {
      val i = p + u; val j = q + v; val k = r + w
      full((i * fSh(1) + j) * fSh(2) + k) +=
        a((p * aSh(1) + q) * aSh(2) + r) * b((u * bSh(1) + v) * bSh(2) + w)
    }
    val (gotF, shF) = Conv.fftconvolveNd(a, aSh, b, bSh, "full")
    assert(shF.toSeq == fSh.toSeq)
    assert(Golden.maxAbsDiff(gotF, full) < 1e-10)
    // same: centered window of full
    val (gotS, shS) = Conv.fftconvolveNd(a, aSh, b, bSh, "same")
    assert(shS.toSeq == aSh.toSeq)
    val off = bSh.map(n => (n - 1) / 2)
    for (i <- 0 until aSh(0); j <- 0 until aSh(1); k <- 0 until aSh(2)) {
      val want = full(((i + off(0)) * fSh(1) + (j + off(1))) * fSh(2) + (k + off(2)))
      assert(math.abs(gotS((i * aSh(1) + j) * aSh(2) + k) - want) < 1e-10)
    }
    // valid: offset bShape-1
    val (gotV, shV) = Conv.fftconvolveNd(a, aSh, b, bSh, "valid")
    assert(shV.toSeq == Seq(3, 1, 4))
    for (i <- 0 until 3; j <- 0 until 1; k <- 0 until 4) {
      val want = full(((i + bSh(0) - 1) * fSh(1) + (j + bSh(1) - 1)) * fSh(2) + (k + bSh(2) - 1))
      assert(math.abs(gotV((i * 1 + j) * 4 + k) - want) < 1e-10)
    }
  }

  test("fftconvolveNd random shapes up to rank 4 match direct N-D convolution") {
    val rnd = new scala.util.Random(23)
    def directFull(a: Array[Double], aSh: Array[Int],
                   b: Array[Double], bSh: Array[Int]): (Array[Double], Array[Int]) = {
      val nd = aSh.length
      val fSh = Array.tabulate(nd)(i => aSh(i) + bSh(i) - 1)
      val out = new Array[Double](fSh.product)
      def flat(idx: Array[Int], sh: Array[Int]): Int =
        idx.zip(sh).foldLeft(0) { case (acc, (i, n)) => acc * n + i }
      def loop(sh: Array[Int])(f: Array[Int] => Unit): Unit = {
        val idx = new Array[Int](sh.length)
        val total = sh.product
        var c = 0
        while (c < total) {
          f(idx)
          var d = sh.length - 1
          var carry = true
          while (carry && d >= 0) {
            idx(d) += 1
            if (idx(d) == sh(d)) { idx(d) = 0; d -= 1 } else carry = false
          }
          c += 1
        }
      }
      loop(aSh) { ai =>
        val av = a(flat(ai, aSh))
        loop(bSh) { bi =>
          val oi = ai.zip(bi).map { case (x, y) => x + y }
          out(flat(oi, fSh)) += av * b(flat(bi, bSh))
        }
      }
      (out, fSh)
    }
    for (nd <- 1 to 4; _ <- 0 until 2) {
      val aSh = Array.fill(nd)(1 + rnd.nextInt(5))
      val bSh = Array.tabulate(nd)(i => 1 + rnd.nextInt(aSh(i)))
      val a = Array.fill(aSh.product)(rnd.nextGaussian())
      val b = Array.fill(bSh.product)(rnd.nextGaussian())
      val (want, wSh) = directFull(a, aSh, b, bSh)
      val (got, gSh) = Conv.fftconvolveNd(a, aSh, b, bSh, "full")
      assert(gSh.toSeq == wSh.toSeq, s"nd=$nd ${aSh.toSeq} ${bSh.toSeq}")
      assert(Golden.maxAbsDiff(got, want) < 1e-9, s"nd=$nd ${aSh.toSeq} ${bSh.toSeq}")
      // valid also exercised (bSh <= aSh per axis by construction)
      val (gotV, vSh) = Conv.fftconvolveNd(a, aSh, b, bSh, "valid")
      assert(vSh.toSeq == aSh.zip(bSh).map { case (x, y) => x - y + 1 }.toSeq)
      assert(gotV.length == vSh.product)
    }
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

  for ((n1, n2) <- Seq((20, 5), (16, 16), (7, 31))) {
    val ar = g(s"cxa_re_${n1}_$n2"); val ai = g(s"cxa_im_${n1}_$n2")
    val br = g(s"cxb_re_${n1}_$n2"); val bi = g(s"cxb_im_${n1}_$n2")

    test(s"complex convolve modes ($n1,$n2) vs numpy, direct and fft") {
      for (method <- Seq("direct", "fft"); mode <- Seq("full", "same", "valid")) {
        val got = Conv.convolveComplex(ar, ai, br, bi, mode, method)
        check(s"cxconv_${mode}_${n1}_${n2}_re", got.re)
        check(s"cxconv_${mode}_${n1}_${n2}_im", got.im)
      }
    }

    test(s"complex correlate ($n1,$n2) conjugates in2 like scipy") {
      for (method <- Seq("direct", "fft")) {
        val got = Conv.correlateComplex(ar, ai, br, bi, "full", method)
        check(s"cxcorr_full_${n1}_${n2}_re", got.re)
        check(s"cxcorr_full_${n1}_${n2}_im", got.im)
      }
    }
  }

  test("complex convolve with zero imag parts equals the real path") {
    val a = g("a_20_5"); val b = g("b_20_5")
    val z1 = new Array[Double](a.length); val z2 = new Array[Double](b.length)
    for (mode <- Seq("full", "same", "valid")) {
      val got = Conv.convolveComplex(a, z1, b, z2, mode)
      assert(Golden.maxAbsDiff(got.re, Conv.convolve(a, b, mode)) < tol)
      assert(got.im.forall(math.abs(_) < tol))
    }
  }

  test("empty inputs are rejected loudly, not NegativeArraySizeException/zeros") {
    val v = Array(1.0, 2.0)
    val e0 = Array.empty[Double]
    for (m <- Seq("direct", "fft", "auto")) {
      intercept[IllegalArgumentException](Conv.convolve(e0, v, "full", m))
      intercept[IllegalArgumentException](Conv.convolve(v, e0, "full", m))
      intercept[IllegalArgumentException](Conv.convolve(e0, e0, "full", m))
      intercept[IllegalArgumentException](
        Conv.convolveComplex(e0, e0, v, v, "full", m))
    }
  }

  test("fftconvolveNd valid accepts the in2-dominant case like scipy") {
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(0.5, -1.0, 0.25, 2.0, 1.5, -0.5, 1.0)
    // 1-D: the dedicated path already swap-handles n2 > n1
    val want = Conv.convolve(a, b, "valid")
    val (got, sh) = Conv.fftconvolveNd(a, Array(3), b, Array(7), "valid")
    assert(sh.toSeq == Seq(want.length))
    assert(Golden.maxAbsDiff(got, want) < tol)
    // swapped operands agree (commutativity of valid with swap)
    val (got2, sh2) = Conv.fftconvolveNd(b, Array(7), a, Array(3), "valid")
    assert(sh2.toSeq == sh.toSeq && Golden.maxAbsDiff(got2, got) < tol)
    // mixed dominance still rejected
    intercept[IllegalArgumentException](
      Conv.fftconvolveNd(Array.fill(6)(1.0), Array(2, 3),
        Array.fill(6)(1.0), Array(3, 2), "valid"))
  }

  test("complex kernel algebra: delta identity, commutativity, correlate duality") {
    val rnd = new scala.util.Random(11)
    def vec(n: Int) = Array.fill(n)(rnd.nextGaussian())
    for (trial <- 0 until 5) {
      val n1 = 2 + rnd.nextInt(40); val n2 = 2 + rnd.nextInt(40)
      val ar = vec(n1); val ai = vec(n1); val br = vec(n2); val bi = vec(n2)
      // (1 + 0i) delta kernel is the identity
      val id = Conv.convolveComplex(ar, ai, Array(1.0), Array(0.0), "full")
      assert(Golden.maxAbsDiff(id.re, ar) < tol && Golden.maxAbsDiff(id.im, ai) < tol)
      // full-mode convolution commutes
      val ab = Conv.convolveComplex(ar, ai, br, bi, "full")
      val ba = Conv.convolveComplex(br, bi, ar, ai, "full")
      assert(Golden.maxAbsDiff(ab.re, ba.re) < 1e-8, s"trial $trial re")
      assert(Golden.maxAbsDiff(ab.im, ba.im) < 1e-8, s"trial $trial im")
      // correlate(a, b) = conj(reverse(correlate(b, a))) (scipy identity)
      val cab = Conv.correlateComplex(ar, ai, br, bi, "full")
      val cba = Conv.correlateComplex(br, bi, ar, ai, "full")
      val revConjRe = cba.re.reverse
      val revConjIm = cba.im.reverse.map(-_)
      assert(Golden.maxAbsDiff(cab.re, revConjRe) < 1e-8, s"trial $trial corr re")
      assert(Golden.maxAbsDiff(cab.im, revConjIm) < 1e-8, s"trial $trial corr im")
    }
  }

  test("deconvolve: exact long division, remainder identity, scipy edge rules") {
    // exact division: convolve then deconvolve recovers the quotient
    // with ZERO remainder (small integers — every step exact)
    val q0 = Array(1.0, 2.0, 3.0)
    val d0 = Array(1.0, 0.5)
    val (q, r) = Conv.deconvolve(Conv.convolveDirect(q0, d0), d0)
    assert(q.toSeq == q0.toSeq)
    assert(r.forall(_ == 0.0))
    // nonzero remainder, hand-computed: [1,1,1] / [1,2] → q=[1,-1], r=[0,0,3]
    val (q1, r1) = Conv.deconvolve(Array(1.0, 1.0, 1.0), Array(1.0, 2.0))
    assert(q1.toSeq == Seq(1.0, -1.0))
    assert(r1.toSeq == Seq(0.0, 0.0, 3.0))
    // signal = divisor*q + r always (random trial)
    val rnd = new scala.util.Random(31)
    val sig = Array.fill(20)(rnd.nextGaussian())
    val div = Array(1.5, -0.3, 0.2)
    val (q2, r2) = Conv.deconvolve(sig, div)
    val back = Conv.convolveDirect(div, q2).zipAll(r2, 0.0, 0.0).map(t => t._1 + t._2)
    assert(Golden.maxAbsDiff(back, sig) < 1e-12)
    // shorter-than-divisor signal: empty quotient, remainder = signal
    val (q3, r3) = Conv.deconvolve(Array(1.0, 2.0), Array(1.0, 0.0, 0.0))
    assert(q3.isEmpty && r3.toSeq == Seq(1.0, 2.0))
    assertThrows[IllegalArgumentException](
      Conv.deconvolve(Array(1.0), Array(0.0, 1.0)))
  }
}

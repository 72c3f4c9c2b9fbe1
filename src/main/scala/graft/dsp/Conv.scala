package graft.dsp

/** 1-D and 2-D convolution kernels matching `scipy.signal.convolve` /
  * `fftconvolve` as wrapped by the reference (xarray_scipy/signal.py:34-106).
  * Modes: full / same / valid ('same' is centered on in1, scipy
  * convention). `method`: direct for small kernels, FFT otherwise —
  * same spirit as scipy's "auto".
  */
object Conv {

  def outLength(n1: Int, n2: Int, mode: String): Int = mode match {
    case "full"  => n1 + n2 - 1
    case "same"  => n1
    case "valid" => math.max(n1, n2) - math.min(n1, n2) + 1
    case other   => throw new IllegalArgumentException(s"unknown mode: $other")
  }

  private def trim(full: Array[Double], n1: Int, n2: Int, mode: String): Array[Double] = mode match {
    case "full" => full
    case "same" =>
      val start = (n2 - 1) / 2
      java.util.Arrays.copyOfRange(full, start, start + n1)
    case "valid" =>
      val start = math.min(n1, n2) - 1
      java.util.Arrays.copyOfRange(full, start, start + outLength(n1, n2, "valid"))
    case other => throw new IllegalArgumentException(s"unknown mode: $other")
  }

  def convolveDirect(a: Array[Double], b: Array[Double], mode: String = "full"): Array[Double] = {
    val n1 = a.length; val n2 = b.length
    // scipy raises on empty input; without this, both-empty hits
    // new Array(-1) (NegativeArraySizeException) and one-empty
    // silently returns zeros
    require(n1 > 0 && n2 > 0, s"convolve: empty input ($n1, $n2 samples)")
    val full = new Array[Double](n1 + n2 - 1)
    var i = 0
    while (i < n1) {
      val ai = a(i)
      if (ai != 0.0) {
        var j = 0
        while (j < n2) { full(i + j) += ai * b(j); j += 1 }
      }
      i += 1
    }
    trim(full, n1, n2, mode)
  }

  def fftconvolve(a: Array[Double], b: Array[Double], mode: String = "full"): Array[Double] = {
    val n1 = a.length; val n2 = b.length
    require(n1 > 0 && n2 > 0, s"convolve: empty input ($n1, $n2 samples)")
    val nfull = n1 + n2 - 1
    val m = Fft.nextPow2(nfull)
    val fa = Fft.fft(a, null, m)
    val fb = Fft.fft(b, null, m)
    var i = 0
    while (i < m) {
      val tr = fa.re(i) * fb.re(i) - fa.im(i) * fb.im(i)
      fa.im(i) = fa.re(i) * fb.im(i) + fa.im(i) * fb.re(i)
      fa.re(i) = tr
      i += 1
    }
    val inv = Fft.ifft(fa.re, fa.im, m)
    trim(java.util.Arrays.copyOf(inv.re, nfull), n1, n2, mode)
  }

  /** scipy.signal.convolve(method="auto"): direct for small problems,
    * FFT otherwise. Cutover ~ where n1*n2 exceeds the FFT cost.
    */
  def convolve(a: Array[Double], b: Array[Double], mode: String = "full", method: String = "auto"): Array[Double] =
    method match {
      case "direct" => convolveDirect(a, b, mode)
      case "fft"    => fftconvolve(a, b, mode)
      case "auto" =>
        if (math.min(a.length, b.length).toLong * math.max(a.length, b.length) <= 8192L)
          convolveDirect(a, b, mode)
        else fftconvolve(a, b, mode)
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }

  /** Cross-correlation (scipy.signal.correlate): convolve with reversed b. */
  def correlate(a: Array[Double], b: Array[Double], mode: String = "full", method: String = "auto"): Array[Double] = {
    val br = b.reverse
    convolve(a, br, mode, method)
  }

  // ---- complex 1-D --------------------------------------------------
  // scipy.signal.convolve/correlate accept complex input (the
  // reference wraps them directly, xarray_scipy/signal.py:34-38);
  // series use the repo-wide (re, im) parallel-array convention.

  private def trimC(fullRe: Array[Double], fullIm: Array[Double],
                    n1: Int, n2: Int, mode: String): Fft.C =
    Fft.C(trim(fullRe, n1, n2, mode), trim(fullIm, n1, n2, mode))

  def convolveComplexDirect(aRe: Array[Double], aIm: Array[Double],
                            bRe: Array[Double], bIm: Array[Double],
                            mode: String = "full"): Fft.C = {
    val n1 = aRe.length; val n2 = bRe.length
    require(n1 > 0 && n2 > 0, s"convolve: empty input ($n1, $n2 samples)")
    require(aIm.length == n1 && bIm.length == n2,
      s"re/im lengths differ: ($n1, ${aIm.length}) / ($n2, ${bIm.length})")
    val fr = new Array[Double](n1 + n2 - 1)
    val fi = new Array[Double](n1 + n2 - 1)
    var i = 0
    while (i < n1) {
      val ar = aRe(i); val ai = aIm(i)
      if (ar != 0.0 || ai != 0.0) {
        var j = 0
        while (j < n2) {
          val br = bRe(j); val bi = bIm(j)
          fr(i + j) += ar * br - ai * bi
          fi(i + j) += ar * bi + ai * br
          j += 1
        }
      }
      i += 1
    }
    trimC(fr, fi, n1, n2, mode)
  }

  def fftconvolveComplex(aRe: Array[Double], aIm: Array[Double],
                         bRe: Array[Double], bIm: Array[Double],
                         mode: String = "full"): Fft.C = {
    val n1 = aRe.length; val n2 = bRe.length
    require(n1 > 0 && n2 > 0, s"convolve: empty input ($n1, $n2 samples)")
    require(aIm.length == n1 && bIm.length == n2,
      s"re/im lengths differ: ($n1, ${aIm.length}) / ($n2, ${bIm.length})")
    val nfull = n1 + n2 - 1
    val m = Fft.nextPow2(nfull)
    val fa = Fft.fft(aRe, aIm, m)
    val fb = Fft.fft(bRe, bIm, m)
    var i = 0
    while (i < m) {
      val tr = fa.re(i) * fb.re(i) - fa.im(i) * fb.im(i)
      fa.im(i) = fa.re(i) * fb.im(i) + fa.im(i) * fb.re(i)
      fa.re(i) = tr
      i += 1
    }
    val inv = Fft.ifft(fa.re, fa.im, m)
    trimC(java.util.Arrays.copyOf(inv.re, nfull),
      java.util.Arrays.copyOf(inv.im, nfull), n1, n2, mode)
  }

  /** Complex convolve, method="auto" with the same direct/FFT cutover
    * as the real path (the complex direct loop is ~4x the flops but
    * so is the complex FFT's, so the crossover point is unchanged).
    */
  def convolveComplex(aRe: Array[Double], aIm: Array[Double],
                      bRe: Array[Double], bIm: Array[Double],
                      mode: String = "full", method: String = "auto"): Fft.C =
    method match {
      case "direct" => convolveComplexDirect(aRe, aIm, bRe, bIm, mode)
      case "fft"    => fftconvolveComplex(aRe, aIm, bRe, bIm, mode)
      case "auto" =>
        if (math.min(aRe.length, bRe.length).toLong *
            math.max(aRe.length, bRe.length) <= 8192L)
          convolveComplexDirect(aRe, aIm, bRe, bIm, mode)
        else fftconvolveComplex(aRe, aIm, bRe, bIm, mode)
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }

  /** Complex cross-correlation: scipy conjugates in2 —
    * correlate(a, b) = convolve(a, conj(reverse(b))).
    */
  def correlateComplex(aRe: Array[Double], aIm: Array[Double],
                       bRe: Array[Double], bIm: Array[Double],
                       mode: String = "full", method: String = "auto"): Fft.C = {
    val br = bRe.reverse
    val bi = new Array[Double](bIm.length)
    var j = 0
    while (j < bIm.length) { bi(j) = -bIm(bIm.length - 1 - j); j += 1 }
    convolveComplex(aRe, aIm, br, bi, mode, method)
  }

  /** 2-D FFT convolution on row-major flattened arrays; covers the
    * reference's multi-dim `fftconvolve(dims=[d1,d2])` (signal.py:51).
    */
  def fftconvolve2d(a: Array[Double], aRows: Int, aCols: Int,
                    b: Array[Double], bRows: Int, bCols: Int,
                    mode: String = "full"): (Array[Double], Int, Int) = {
    val fullR = aRows + bRows - 1; val fullC = aCols + bCols - 1
    val mR = Fft.nextPow2(fullR); val mC = Fft.nextPow2(fullC)
    // ONE in-place row/column transform shared by the forward and
    // inverse passes (rawFft handles the unnormalized inverse, so no
    // conjugate trick and no per-line clones — two reusable line
    // buffers per pass instead of three allocations per line)
    def fft2InPlace(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
      val rowRe = new Array[Double](mC); val rowIm = new Array[Double](mC)
      var r = 0
      while (r < mR) {
        System.arraycopy(re, r * mC, rowRe, 0, mC)
        System.arraycopy(im, r * mC, rowIm, 0, mC)
        Fft.transformInPlace(rowRe, rowIm, inverse)
        System.arraycopy(rowRe, 0, re, r * mC, mC)
        System.arraycopy(rowIm, 0, im, r * mC, mC)
        r += 1
      }
      val colRe = new Array[Double](mR); val colIm = new Array[Double](mR)
      var c = 0
      while (c < mC) {
        var rr = 0
        while (rr < mR) { colRe(rr) = re(rr * mC + c); colIm(rr) = im(rr * mC + c); rr += 1 }
        Fft.transformInPlace(colRe, colIm, inverse)
        rr = 0
        while (rr < mR) { re(rr * mC + c) = colRe(rr); im(rr * mC + c) = colIm(rr); rr += 1 }
        c += 1
      }
    }
    def pack(x: Array[Double], rows: Int, cols: Int): (Array[Double], Array[Double]) = {
      val re = new Array[Double](mR * mC); val im = new Array[Double](mR * mC)
      var r = 0
      while (r < rows) {
        System.arraycopy(x, r * cols, re, r * mC, cols)
        r += 1
      }
      (re, im)
    }
    val (are, aim) = pack(a, aRows, aCols)
    val (bre, bim) = pack(b, bRows, bCols)
    fft2InPlace(are, aim, inverse = false)
    fft2InPlace(bre, bim, inverse = false)
    var i = 0
    while (i < mR * mC) {
      val tr = are(i) * bre(i) - aim(i) * bim(i)
      aim(i) = are(i) * bim(i) + aim(i) * bre(i)
      are(i) = tr
      i += 1
    }
    fft2InPlace(are, aim, inverse = true)
    val cre = are
    val scale = 1.0 / (mR * mC)
    val (outR, outC) = mode match {
      case "full" => (fullR, fullC)
      case "same" => (aRows, aCols)
      case "valid" =>
        // scipy raises unless one input dominates every axis; computing
        // per-axis max-min extents for mixed shapes (5x2 vs 2x5) would
        // return a region that corresponds to no valid overlap
        require((aRows >= bRows && aCols >= bCols) ||
          (bRows >= aRows && bCols >= aCols),
          s"valid mode requires one input >= the other on every dim; " +
            s"got ${aRows}x$aCols vs ${bRows}x$bCols")
        (math.max(aRows, bRows) - math.min(aRows, bRows) + 1,
          math.max(aCols, bCols) - math.min(aCols, bCols) + 1)
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    }
    val (offR, offC) = mode match {
      case "full"  => (0, 0)
      case "same"  => ((bRows - 1) / 2, (bCols - 1) / 2)
      case "valid" => (math.min(aRows, bRows) - 1, math.min(aCols, bCols) - 1)
      case _       => (0, 0)
    }
    val out = new Array[Double](outR * outC)
    var r = 0
    while (r < outR) {
      var c = 0
      while (c < outC) {
        out(r * outC + c) = cre((r + offR) * mC + (c + offC)) * scale
        c += 1
      }
      r += 1
    }
    (out, outR, outC)
  }

  /** N-dimensional FFT convolution on row-major flattened arrays —
    * the reference's arbitrary `dims` list (xarray_scipy/signal.py:51-106)
    * beyond the dedicated 1-D/2-D paths. Each axis is padded to the
    * next power of two of the full output extent; the transform is
    * applied axis-by-axis over strided lines (the separable DFT), the
    * spectra multiply pointwise, and the inverse uses the conjugate
    * trick. Returns (row-major values, output shape) for `mode`
    * full / same / valid ('valid' requires in1 >= in2 per axis).
    */
  def fftconvolveNd(a: Array[Double], aShape: Array[Int],
                    b: Array[Double], bShape: Array[Int],
                    mode: String = "full"): (Array[Double], Array[Int]) = {
    val nd = aShape.length
    require(bShape.length == nd, s"shape ranks differ: $nd vs ${bShape.length}")
    require(aShape.product == a.length, "in1 shape does not match its length")
    require(bShape.product == b.length, "in2 shape does not match its length")
    // scipy's 'valid' accepts either operand dominant (it swaps —
    // convolution commutes); mirror that and the 2-D path instead of
    // rejecting the in2-dominant case. 'same' is NOT commutative
    // (output is centered on in1), so only swap for valid.
    if (mode == "valid" && (0 until nd).forall(j => bShape(j) >= aShape(j)) &&
        (0 until nd).exists(j => bShape(j) > aShape(j)))
      return fftconvolveNd(b, bShape, a, aShape, mode)
    val full = Array.tabulate(nd)(i => aShape(i) + bShape(i) - 1)
    val m = full.map(Fft.nextPow2)
    val total = m.product
    val stride = new Array[Int](nd)
    stride(nd - 1) = 1
    var k = nd - 2
    while (k >= 0) { stride(k) = stride(k + 1) * m(k + 1); k -= 1 }

    // copy a row-major source block into the zero-padded m-shaped buffer
    def pack(x: Array[Double], shape: Array[Int]): (Array[Double], Array[Double]) = {
      val re = new Array[Double](total); val im = new Array[Double](total)
      val idx = new Array[Int](nd)
      var s = 0
      while (s < x.length) {
        var dst = 0; var j = 0
        while (j < nd) { dst += idx(j) * stride(j); j += 1 }
        re(dst) = x(s)
        // odometer increment over `shape`
        var c = nd - 1
        var carry = true
        while (carry && c >= 0) {
          idx(c) += 1
          if (idx(c) == shape(c)) { idx(c) = 0; c -= 1 } else carry = false
        }
        s += 1
      }
      (re, im)
    }

    // in-place transform of every length-m(axis) line along `axis`;
    // the two line buffers are reused across all lines (Fft
    // .transformInPlace does not clone — see its scaladoc)
    def fftAxis(re: Array[Double], im: Array[Double], axis: Int,
                inverse: Boolean): Unit = {
      val len = m(axis); val st = stride(axis)
      val outer = total / len
      val lineRe = new Array[Double](len); val lineIm = new Array[Double](len)
      var o = 0
      while (o < outer) {
        // decompose o over the non-axis dims to find the line's base offset
        var rem = o; var base = 0; var j = nd - 1
        while (j >= 0) {
          if (j != axis) { base += (rem % m(j)) * stride(j); rem /= m(j) }
          j -= 1
        }
        var t = 0
        while (t < len) { lineRe(t) = re(base + t * st); lineIm(t) = im(base + t * st); t += 1 }
        Fft.transformInPlace(lineRe, lineIm, inverse)
        t = 0
        while (t < len) { re(base + t * st) = lineRe(t); im(base + t * st) = lineIm(t); t += 1 }
        o += 1
      }
    }

    val (are, aim) = pack(a, aShape)
    val (bre, bim) = pack(b, bShape)
    var ax = 0
    while (ax < nd) {
      fftAxis(are, aim, ax, inverse = false)
      fftAxis(bre, bim, ax, inverse = false)
      ax += 1
    }
    var i = 0
    while (i < total) {
      val tr = are(i) * bre(i) - aim(i) * bim(i)
      aim(i) = are(i) * bim(i) + aim(i) * bre(i)
      are(i) = tr
      i += 1
    }
    // unnormalized inverse per axis; one 1/total scale at extraction
    ax = 0
    while (ax < nd) { fftAxis(are, aim, ax, inverse = true); ax += 1 }
    val scale = 1.0 / total

    val outShape = mode match {
      case "full" => full
      case "same" => aShape.clone()
      case "valid" =>
        require((0 until nd).forall(j => aShape(j) >= bShape(j)),
          "valid mode requires one input >= the other along every dim")
        Array.tabulate(nd)(j => aShape(j) - bShape(j) + 1)
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    }
    val off = mode match {
      case "full"  => new Array[Int](nd)
      case "same"  => Array.tabulate(nd)(j => (bShape(j) - 1) / 2)
      case "valid" => Array.tabulate(nd)(j => bShape(j) - 1)
      case _       => new Array[Int](nd)
    }
    val outN = outShape.product
    val out = new Array[Double](outN)
    val idx = new Array[Int](nd)
    var s = 0
    while (s < outN) {
      var src = 0; var j = 0
      while (j < nd) { src += (idx(j) + off(j)) * stride(j); j += 1 }
      out(s) = are(src) * scale
      var c = nd - 1
      var carry = true
      while (carry && c >= 0) {
        idx(c) += 1
        if (idx(c) == outShape(c)) { idx(c) = 0; c -= 1 } else carry = false
      }
      s += 1
    }
    (out, outShape)
  }

  /** scipy.signal.deconvolve: polynomial long division — quotient q
    * and remainder r with signal = convolve(divisor, q) + r. Standard
    * synthetic division: the working copy accumulates the remainder in
    * place, so r IS signal − divisor∗q exactly (no re-convolution).
    * Signals shorter than the divisor yield an empty quotient and
    * r = signal, scipy's rule.
    */
  def deconvolve(sig: Array[Double], div: Array[Double]): (Array[Double], Array[Double]) = {
    require(div.nonEmpty && div(0) != 0.0,
      "deconvolve: divisor must be non-empty with a nonzero leading coefficient")
    val n = sig.length - div.length + 1
    if (n <= 0) return (Array.empty[Double], sig.clone())
    val q = new Array[Double](n)
    val w = sig.clone()
    var k = 0
    while (k < n) {
      val qk = w(k) / div(0)
      q(k) = qk
      if (qk != 0.0) {
        var j = 0
        while (j < div.length) { w(k + j) -= qk * div(j); j += 1 }
      }
      k += 1
    }
    (q, w)
  }
}

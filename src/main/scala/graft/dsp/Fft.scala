package graft.dsp

/** Pure-JVM FFT kernels (no Spark deps). Semantics follow
  * `numpy.fft` / `scipy.fft` as wrapped by the reference
  * (xarray_scipy/signal.py:155-241): fft/ifft/rfft/irfft/hfft/ihfft
  * with `n` (crop/zero-pad) and `norm` (backward/ortho/forward), plus
  * fftfreq/rfftfreq coordinate generation and fftshift/ifftshift
  * (signal.py:244-276).
  *
  * Complex arrays are struct-of-arrays: (re, im) as two
  * Array[Double] — matches Spark's columnar array<double> layout with
  * no boxing.
  *
  * Radix-2 iterative Cooley-Tukey for powers of two; Bluestein's
  * chirp-z (via power-of-two convolution) for arbitrary n. O(n log n)
  * for every n.
  */
object Fft {

  final case class C(re: Array[Double], im: Array[Double]) {
    def length: Int = re.length
  }

  private def bitReverse(x: Int, bits: Int): Int = {
    var v = x; var r = 0; var i = 0
    while (i < bits) { r = (r << 1) | (v & 1); v >>= 1; i += 1 }
    r
  }

  def isPow2(n: Int): Boolean = n > 0 && (n & (n - 1)) == 0

  def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** In-place iterative radix-2; requires power-of-two length. */
  private def fftPow2(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    if (n <= 1) return
    val bits = java.lang.Integer.numberOfTrailingZeros(n)
    var i = 0
    while (i < n) {
      val j = bitReverse(i, bits)
      if (j > i) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val i0 = blk + k; val i1 = i0 + half
          val tr = re(i1) * cr - im(i1) * ci
          val ti = re(i1) * ci + im(i1) * cr
          re(i1) = re(i0) - tr; im(i1) = im(i0) - ti
          re(i0) += tr; im(i0) += ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Bluestein chirp-z transform for arbitrary n (uses pow-2 FFTs). */
  private def fftBluestein(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    val m = nextPow2(2 * n + 1)
    val cosT = new Array[Double](n)
    val sinT = new Array[Double](n)
    var i = 0
    while (i < n) {
      // angle = pi * i^2 / n (mod 2pi), computed with Long to avoid fp blowup
      val j = (i.toLong * i) % (2L * n)
      val ang = math.Pi * j / n
      cosT(i) = math.cos(ang)
      sinT(i) = if (inverse) math.sin(ang) else -math.sin(ang)
      i += 1
    }
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    i = 0
    while (i < n) {
      ar(i) = re(i) * cosT(i) - im(i) * sinT(i)
      ai(i) = re(i) * sinT(i) + im(i) * cosT(i)
      i += 1
    }
    val br = new Array[Double](m); val bi = new Array[Double](m)
    br(0) = cosT(0); bi(0) = -sinT(0)
    i = 1
    while (i < n) {
      br(i) = cosT(i); bi(i) = -sinT(i)
      br(m - i) = cosT(i); bi(m - i) = -sinT(i)
      i += 1
    }
    fftPow2(ar, ai, inverse = false)
    fftPow2(br, bi, inverse = false)
    i = 0
    while (i < m) {
      val tr = ar(i) * br(i) - ai(i) * bi(i)
      ai(i) = ar(i) * bi(i) + ai(i) * br(i)
      ar(i) = tr
      i += 1
    }
    fftPow2(ar, ai, inverse = true)
    val inv = 1.0 / m
    i = 0
    while (i < n) {
      val tr = (ar(i) * cosT(i) - ai(i) * sinT(i)) * inv
      val ti = (ar(i) * sinT(i) + ai(i) * cosT(i)) * inv
      re(i) = tr; im(i) = ti
      i += 1
    }
  }

  /** Unnormalized DFT (forward) / unnormalized inverse; caller applies norm. */
  private def rawFft(re: Array[Double], im: Array[Double], inverse: Boolean): Unit =
    if (isPow2(re.length)) fftPow2(re, im, inverse) else fftBluestein(re, im, inverse)

  /** In-place unnormalized transform of one line — the hot-loop entry
    * for the multi-dim convolutions, which transform thousands of
    * lines per group and must not pay [[fft]]'s defensive clones and
    * result-struct allocation per line. Caller owns normalization
    * (inverse is unnormalized: divide by the total padded size once).
    */
  private[dsp] def transformInPlace(re: Array[Double], im: Array[Double],
                                    inverse: Boolean): Unit = {
    require(re.length == im.length, "re/im length mismatch")
    rawFft(re, im, inverse)
  }

  private def cropOrPad(x: Array[Double], n: Int): Array[Double] =
    if (x.length == n) x.clone()
    else {
      val out = new Array[Double](n)
      System.arraycopy(x, 0, out, 0, math.min(x.length, n))
      out
    }

  private def normFactor(norm: String, n: Int, forward: Boolean): Double = norm match {
    case null | "backward" => if (forward) 1.0 else 1.0 / n
    case "ortho"           => 1.0 / math.sqrt(n.toDouble)
    case "forward"         => if (forward) 1.0 / n else 1.0
    case other => throw new IllegalArgumentException(s"unknown norm: $other")
  }

  private def scaleInPlace(c: C, f: Double): C = {
    if (f != 1.0) {
      var i = 0
      while (i < c.length) { c.re(i) *= f; c.im(i) *= f; i += 1 }
    }
    c
  }

  /** numpy.fft.fft(a, n, norm) for complex input. */
  def fft(xre: Array[Double], xim: Array[Double], n: Int = -1, norm: String = "backward"): C = {
    // numpy raises a shape error on mismatched re/im; silently
    // cropOrPad-ing a short im to re's length would zero the missing
    // imaginary samples and return a plausible but wrong spectrum
    require(xim == null || xim.length == xre.length,
      s"fft: re/im lengths differ (${xre.length} vs ${xim.length})")
    val nn = if (n <= 0) xre.length else n
    val re = cropOrPad(xre, nn)
    val im = cropOrPad(if (xim == null) new Array[Double](xre.length) else xim, nn)
    rawFft(re, im, inverse = false)
    scaleInPlace(C(re, im), normFactor(norm, nn, forward = true))
  }

  /** numpy.fft.ifft(a, n, norm). */
  def ifft(xre: Array[Double], xim: Array[Double], n: Int = -1, norm: String = "backward"): C = {
    require(xim == null || xim.length == xre.length,
      s"ifft: re/im lengths differ (${xre.length} vs ${xim.length})")
    val nn = if (n <= 0) xre.length else n
    val re = cropOrPad(xre, nn)
    val im = cropOrPad(if (xim == null) new Array[Double](xre.length) else xim, nn)
    rawFft(re, im, inverse = true)
    scaleInPlace(C(re, im), normFactor(norm, nn, forward = false))
  }

  /** numpy.fft.rfft: real input, n//2+1 output bins. */
  def rfft(x: Array[Double], n: Int = -1, norm: String = "backward"): C = {
    val nn = if (n <= 0) x.length else n
    val full = fft(x, null, nn, norm)
    val m = nn / 2 + 1
    C(java.util.Arrays.copyOf(full.re, m), java.util.Arrays.copyOf(full.im, m))
  }

  /** numpy.fft.irfft: hermitian input (m bins), real output of length
    * n (default (m-1)*2, signal.py:210-211).
    */
  def irfft(xre: Array[Double], xim: Array[Double], n: Int = -1, norm: String = "backward"): Array[Double] = {
    val m = xre.length
    val nn = if (n <= 0) (m - 1) * 2 else n
    // numpy raises "Invalid number of FFT data points" here; without
    // this check m=1 silently returns an empty series and m=0 throws
    // NegativeArraySizeException deep in the buffer allocation
    require(nn >= 1,
      s"irfft: invalid output length $nn (input has $m bins; " +
        "default n = (m-1)*2 needs m >= 2)")
    // Rebuild the full hermitian spectrum at length nn, then complex ifft.
    val nb = nn / 2 + 1 // bins actually used from input
    val fre = new Array[Double](nn); val fim = new Array[Double](nn)
    var i = 0
    while (i < math.min(m, nb)) { fre(i) = xre(i); fim(i) = xim(i); i += 1 }
    // hermitian symmetry: X[nn-k] = conj(X[k])
    i = 1
    while (i < nb - (if (nn % 2 == 0) 1 else 0)) {
      if (nn - i < nn && i < math.min(m, nb)) { fre(nn - i) = xre(i); fim(nn - i) = -xim(i) }
      i += 1
    }
    // even nn: Nyquist bin nn/2 must be real; numpy uses it as-is from input
    if (nn % 2 == 0 && nb - 1 < m) { fre(nn / 2) = xre(nb - 1); fim(nn / 2) = 0.0 }
    val inv = ifft(fre, fim, nn, "backward")
    val out = inv.re
    norm match {
      case null | "backward" => ()
      case "ortho" =>
        // numpy irfft ortho: multiply by sqrt(n) relative to backward
        val f = math.sqrt(nn.toDouble)
        var k = 0; while (k < nn) { out(k) *= f; k += 1 }
      case "forward" =>
        val f = nn.toDouble
        var k = 0; while (k < nn) { out(k) *= f; k += 1 }
      case other => throw new IllegalArgumentException(s"unknown norm: $other")
    }
    out
  }

  /** numpy.fft.hfft: hermitian-symmetric (complex) input → real
    * spectrum of length n (default (m-1)*2). hfft(a, n) = irfft(conj(a), n) * n.
    */
  def hfft(xre: Array[Double], xim: Array[Double], n: Int = -1, norm: String = "backward"): Array[Double] = {
    val m = xre.length
    val nn = if (n <= 0) (m - 1) * 2 else n
    val conjIm = new Array[Double](m)
    var i = 0
    while (i < m) { conjIm(i) = -xim(i); i += 1 }
    val y = irfft(xre, conjIm, nn, "backward")
    val f = norm match {
      case null | "backward" => nn.toDouble
      case "ortho"           => math.sqrt(nn.toDouble)
      case "forward"         => 1.0
      case other => throw new IllegalArgumentException(s"unknown norm: $other")
    }
    var k = 0
    while (k < nn) { y(k) *= f; k += 1 }
    y
  }

  /** numpy.fft.ihfft: real input → hermitian half-spectrum, n//2+1 bins.
    * ihfft(a, n) = conj(rfft(a, n)) / n.
    */
  def ihfft(x: Array[Double], n: Int = -1, norm: String = "backward"): C = {
    val nn = if (n <= 0) x.length else n
    val r = rfft(x, nn, "backward")
    val f = norm match {
      case null | "backward" => 1.0 / nn
      case "ortho"           => 1.0 / math.sqrt(nn.toDouble)
      case "forward"         => 1.0
      case other => throw new IllegalArgumentException(s"unknown norm: $other")
    }
    var i = 0
    while (i < r.length) { r.re(i) *= f; r.im(i) = -r.im(i) * f; i += 1 }
    r
  }

  /** N-D complex FFT (numpy.fft.fftn/ifftn over a row-major buffer,
    * no axis resizing): axis-by-axis strided 1-D transforms, radix-2
    * or Bluestein per line so ANY per-axis length works (unlike the
    * convolution path there is no freedom to zero-pad to a power of
    * two — the transform length IS the axis length). Norm scaling is
    * by the total element count, numpy's rule.
    */
  def fftNd(xre: Array[Double], xim: Array[Double], shape: Array[Int],
            inverse: Boolean = false, norm: String = "backward"): C = {
    val nd = shape.length
    require(nd >= 1 && shape.forall(_ > 0), s"fftNd: bad shape ${shape.mkString("x")}")
    val total = shape.product
    require(xre.length == total,
      s"fftNd: ${xre.length} values do not fill a ${shape.mkString("x")} grid")
    require(xim == null || xim.length == xre.length,
      s"fftNd: re/im lengths differ (${xre.length} vs ${xim.length})")
    val re = xre.clone()
    val im = if (xim == null) new Array[Double](total) else xim.clone()
    val stride = new Array[Int](nd)
    stride(nd - 1) = 1
    var k = nd - 2
    while (k >= 0) { stride(k) = stride(k + 1) * shape(k + 1); k -= 1 }
    var axis = 0
    while (axis < nd) {
      val len = shape(axis); val st = stride(axis)
      if (len > 1) {
        val outer = total / len
        val lineRe = new Array[Double](len); val lineIm = new Array[Double](len)
        var o = 0
        while (o < outer) {
          var rem = o; var base = 0; var j = nd - 1
          while (j >= 0) {
            if (j != axis) { base += (rem % shape(j)) * stride(j); rem /= shape(j) }
            j -= 1
          }
          var t = 0
          while (t < len) { lineRe(t) = re(base + t * st); lineIm(t) = im(base + t * st); t += 1 }
          transformInPlace(lineRe, lineIm, inverse)
          t = 0
          while (t < len) { re(base + t * st) = lineRe(t); im(base + t * st) = lineIm(t); t += 1 }
          o += 1
        }
      }
      axis += 1
    }
    scaleInPlace(C(re, im), normFactor(norm, total, forward = !inverse))
  }

  // ---- DCT / DST (scipy.fft.dct/idct/dst/idst, type 2) -------------
  // The reference's FFT family stops at the numpy.fft surface; DCT-II
  // is the missing real-even sibling every MFCC / compression pipeline
  // reaches for next. Computed via Makhoul's even-permutation FFT
  // algorithm (one length-N complex FFT, no 2N zero-extension), so the
  // cost matches the fft family. Norms: "backward" (unnormalized
  // forward, scipy default) and "ortho" (orthonormal matrix); scipy's
  // rarely-used norm="forward" is rejected explicitly rather than
  // half-supported.

  private def requireDctNorm(norm: String): Unit = norm match {
    case null | "backward" | "ortho" => ()
    case other => throw new IllegalArgumentException(
      s"dct/dst: unsupported norm '$other' (backward | ortho)")
  }

  /** scipy.fft.dct(x, type=2, norm): y[k] = 2 Σ_n x[n] cos(πk(2n+1)/(2N)),
    * ortho-scaled by √(1/4N) for k=0 and √(1/2N) otherwise.
    * Even-permutation algorithm: v[i]=x[2i], v[N-1-i]=x[2i+1];
    * y[k] = 2 Re(FFT(v)[k] · e^{-iπk/2N}).
    */
  def dct2(x: Array[Double], norm: String = "backward"): Array[Double] = {
    requireDctNorm(norm)
    val n = x.length
    require(n > 0, "dct2: empty input")
    val vre = new Array[Double](n); val vim = new Array[Double](n)
    var i = 0
    while (2 * i < n) { vre(i) = x(2 * i); i += 1 }
    i = 0
    while (2 * i + 1 < n) { vre(n - 1 - i) = x(2 * i + 1); i += 1 }
    rawFft(vre, vim, inverse = false)
    val y = new Array[Double](n)
    var k = 0
    while (k < n) {
      val ang = -math.Pi * k / (2.0 * n)
      y(k) = 2.0 * (vre(k) * math.cos(ang) - vim(k) * math.sin(ang))
      k += 1
    }
    if (norm == "ortho") {
      y(0) *= math.sqrt(1.0 / (4.0 * n))
      val f = math.sqrt(1.0 / (2.0 * n))
      k = 1; while (k < n) { y(k) *= f; k += 1 }
    }
    y
  }

  /** scipy.fft.idct(y, type=2, norm): the exact inverse of [[dct2]]
    * under the SAME norm (idct(dct(x)) == x for both norms — scipy.fft
    * semantics, not fftpack's unnormalized pair). Inverse algorithm:
    * V[k] = e^{iπk/2N}(y[k] - i·y[N-k])/2 (y[N]≡0, hermitian fold of
    * the forward path), v = IFFT(V), de-interleave.
    */
  def idct2(y: Array[Double], norm: String = "backward"): Array[Double] = {
    requireDctNorm(norm)
    val n = y.length
    require(n > 0, "idct2: empty input")
    // undo the norm scaling so the core inverts the unnormalized dct2,
    // then the backward 1/(2N) (or nothing for ortho) lands at the end
    val yy = new Array[Double](n)
    if (norm == "ortho") {
      yy(0) = y(0) / math.sqrt(1.0 / (4.0 * n))
      val f = math.sqrt(1.0 / (2.0 * n))
      var k = 1; while (k < n) { yy(k) = y(k) / f; k += 1 }
    } else {
      System.arraycopy(y, 0, yy, 0, n)
    }
    val vre = new Array[Double](n); val vim = new Array[Double](n)
    var k = 0
    while (k < n) {
      val ang = math.Pi * k / (2.0 * n)
      val re = yy(k) / 2.0
      val im = -(if (k == 0) 0.0 else yy(n - k)) / 2.0
      val c = math.cos(ang); val s = math.sin(ang)
      vre(k) = re * c - im * s
      vim(k) = re * s + im * c
      k += 1
    }
    rawFft(vre, vim, inverse = true) // unnormalized: carries a factor N
    val x = new Array[Double](n)
    var i = 0
    while (2 * i < n) { x(2 * i) = vre(i); i += 1 }
    i = 0
    while (2 * i + 1 < n) { x(2 * i + 1) = vre(n - 1 - i); i += 1 }
    // rawFft inverse left ×N; the /2 of C2⁻¹ = C3/(2N) is already in
    // the A[k] = (y[k] - i·y[N-k])/2 fold, so /N finishes both norms
    val f = 1.0 / n
    i = 0; while (i < n) { x(i) *= f; i += 1 }
    x
  }

  /** scipy.fft.dst(x, type=2, norm): y[k] = 2 Σ_n x[n] sin(π(k+1)(2n+1)/(2N)).
    * Identity sin(π(k+1)(2n+1)/2N) = (-1)^n cos(π(N-1-k)(2n+1)/2N)
    * reduces it to a reversed dct2 of the alternating-sign input; the
    * ortho diag lands on row N-1 (√(1/4N)) after the reversal, which
    * is exactly scipy's scaling.
    */
  def dst2(x: Array[Double], norm: String = "backward"): Array[Double] = {
    requireDctNorm(norm)
    val n = x.length
    require(n > 0, "dst2: empty input")
    val xa = new Array[Double](n)
    var i = 0
    while (i < n) { xa(i) = if ((i & 1) == 0) x(i) else -x(i); i += 1 }
    val c = dct2(xa, norm)
    val y = new Array[Double](n)
    i = 0
    while (i < n) { y(i) = c(n - 1 - i); i += 1 }
    y
  }

  /** scipy.fft.idst(y, type=2, norm): inverse of [[dst2]] under the
    * same norm. S2 = R·C2·E (row-reversal · dct2 · sign-flip) for both
    * norms ⇒ S2⁻¹ = E·C2⁻¹·R: sign-flip(idct2(reverse(y))).
    */
  def idst2(y: Array[Double], norm: String = "backward"): Array[Double] = {
    requireDctNorm(norm)
    val n = y.length
    require(n > 0, "idst2: empty input")
    val rev = new Array[Double](n)
    var i = 0
    while (i < n) { rev(i) = y(n - 1 - i); i += 1 }
    val x = idct2(rev, norm)
    i = 0
    while (i < n) { if ((i & 1) == 1) x(i) = -x(i); i += 1 }
    x
  }

  /** numpy.fft.fftfreq(n, d). */
  def fftfreq(n: Int, d: Double): Array[Double] = {
    val out = new Array[Double](n)
    val f = 1.0 / (n * d)
    val mid = (n - 1) / 2 + 1
    var i = 0
    while (i < mid) { out(i) = i * f; i += 1 }
    while (i < n) { out(i) = (i - n) * f; i += 1 }
    out
  }

  /** numpy.fft.rfftfreq(n, d). */
  def rfftfreq(n: Int, d: Double): Array[Double] = {
    val m = n / 2 + 1
    val out = new Array[Double](m)
    val f = 1.0 / (n * d)
    var i = 0
    while (i < m) { out(i) = i * f; i += 1 }
    out
  }

  /** numpy.fft.fftshift for 1-D: rotate left half to the end. */
  def fftshift(x: Array[Double]): Array[Double] = {
    val n = x.length
    val s = n - n / 2 // shift amount: elements [s, n) move to front
    val out = new Array[Double](n)
    System.arraycopy(x, s, out, 0, n - s)
    System.arraycopy(x, 0, out, n - s, s)
    out
  }

  /** numpy.fft.ifftshift for 1-D (inverse of fftshift). */
  def ifftshift(x: Array[Double]): Array[Double] = {
    val n = x.length
    val s = n / 2
    val out = new Array[Double](n)
    System.arraycopy(x, s, out, 0, n - s)
    System.arraycopy(x, 0, out, n - s, s)
    out
  }

  /** numpy.fft.fftshift/ifftshift over EVERY axis of a row-major
    * N-D array (the reference's `dims` tuple, signal.py:245-268,
    * applies the shift to each listed core dim): per dim,
    * out[k] = in[(k + s) mod n] with s = ceil(n/2) forward and
    * floor(n/2) inverse — the same roll the 1-D kernels implement,
    * composed across dims.
    */
  def fftshiftNd(x: Array[Double], shape: Array[Int],
                 inverse: Boolean): Array[Double] = {
    require(shape.forall(_ > 0) && shape.product == x.length,
      s"fftshiftNd: shape ${shape.mkString("x")} != length ${x.length}")
    val nd = shape.length
    val sh = Array.tabulate(nd) { i =>
      if (inverse) shape(i) / 2 else shape(i) - shape(i) / 2
    }
    val out = new Array[Double](x.length)
    var k = 0
    while (k < x.length) {
      // decompose k row-major, roll each digit, recompose
      var rem = k
      var src = 0
      var i = nd - 1
      var stride = 1
      while (i >= 0) {
        val ki = rem % shape(i)
        rem /= shape(i)
        src += ((ki + sh(i)) % shape(i)) * stride
        stride *= shape(i)
        i -= 1
      }
      out(k) = x(src)
      k += 1
    }
    out
  }
}

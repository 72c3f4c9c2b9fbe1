package graft.dsp

/** IIR/FIR filtering kernels matching scipy.signal semantics used by
  * the reference: sosfilt (xarray_scipy/signal.py:403), sosfiltfilt
  * (signal.py:433), and lfilter/filtfilt (the b,a path of decimate,
  * signal.py:109).
  *
  * sos layout: flattened row-major Array[Double] of shape (nSections, 6)
  * = [b0 b1 b2 a0 a1 a2] per section — the same (section, coefficient)
  * layout the reference uses for its sos DataArray.
  */
object Filt {

  /** Direct-form II transposed lfilter; a(0) must be nonzero. */
  def lfilter(b: Array[Double], a: Array[Double], x: Array[Double],
              zi: Array[Double] = null): Array[Double] = {
    val n = math.max(b.length, a.length)
    val bn = new Array[Double](n); val an = new Array[Double](n)
    System.arraycopy(b, 0, bn, 0, b.length)
    System.arraycopy(a, 0, an, 0, a.length)
    val a0 = an(0)
    var i = 0
    while (i < n) { bn(i) /= a0; an(i) /= a0; i += 1 }
    val z = new Array[Double](n - 1)
    if (zi != null) {
      // scipy raises ValueError on a wrong-shaped zi; silently
      // truncating/zero-padding would corrupt the transient
      require(zi.length == n - 1,
        s"lfilter: zi has ${zi.length} values, filter order needs ${n - 1}")
      System.arraycopy(zi, 0, z, 0, n - 1)
    }
    val y = new Array[Double](x.length)
    var t = 0
    while (t < x.length) {
      val xt = x(t)
      val yt = bn(0) * xt + (if (n > 1) z(0) else 0.0)
      var k = 0
      while (k < n - 2) {
        z(k) = bn(k + 1) * xt + z(k + 1) - an(k + 1) * yt
        k += 1
      }
      if (n > 1) z(n - 2) = bn(n - 1) * xt - an(n - 1) * yt
      y(t) = yt
      t += 1
    }
    y
  }

  /** Solve a small dense linear system in-place (Gaussian elimination,
    * partial pivoting). Sizes here are filter orders (≤ ~16).
    */
  private[dsp] def solve(aIn: Array[Array[Double]], bIn: Array[Double]): Array[Double] = {
    val n = bIn.length
    val a = aIn.map(_.clone())
    val b = bIn.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb }
      val d = a(col)(col)
      require(d != 0.0, "singular system in lfilter_zi")
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / d
        if (f != 0.0) {
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var r = n - 1
    while (r >= 0) {
      var s = b(r)
      var c = r + 1
      while (c < n) { s -= a(r)(c) * x(c); c += 1 }
      x(r) = s / a(r)(r)
      r -= 1
    }
    x
  }

  /** scipy.signal.lfilter_zi: steady-state initial conditions for a
    * unit step: zi = (I - A^T)^-1 B with A the companion matrix of a.
    */
  def lfilterZi(bIn: Array[Double], aIn: Array[Double]): Array[Double] = {
    val n = math.max(bIn.length, aIn.length)
    val b = new Array[Double](n); val a = new Array[Double](n)
    System.arraycopy(bIn, 0, b, 0, bIn.length)
    System.arraycopy(aIn, 0, a, 0, aIn.length)
    val a0 = a(0)
    var i = 0
    while (i < n) { b(i) /= a0; a(i) /= a0; i += 1 }
    val m = n - 1
    // IminusA = eye(m) - companion(a).T ; companion(a)(0,j) = -a(j+1), sub-diagonal ones
    val iMinusA = Array.ofDim[Double](m, m)
    var r = 0
    while (r < m) {
      var c = 0
      while (c < m) {
        val compT = if (c == 0) -a(r + 1) else if (r == c - 1) 1.0 else 0.0 // companion.T(r)(c)
        iMinusA(r)(c) = (if (r == c) 1.0 else 0.0) - compT
        c += 1
      }
      r += 1
    }
    val rhs = new Array[Double](m)
    r = 0
    while (r < m) { rhs(r) = b(r + 1) - a(r + 1) * b(0); r += 1 }
    solve(iMinusA, rhs)
  }

  val SOS_W = 6

  def nSections(sos: Array[Double]): Int = {
    require(sos.length % SOS_W == 0, "sos must be flattened (n,6)")
    sos.length / SOS_W
  }

  /** scipy.signal.sosfilt, DF2T biquad cascade. zi: flattened (n,2) or null. */
  def sosfilt(sos: Array[Double], x: Array[Double], zi: Array[Double] = null): Array[Double] = {
    val ns = nSections(sos)
    val z = new Array[Double](ns * 2)
    if (zi != null) {
      // scipy raises 'Invalid zi shape'; a short zi would silently
      // start later sections from zero state
      require(zi.length == ns * 2,
        s"sosfilt: zi has ${zi.length} values, $ns sections need ${ns * 2}")
      System.arraycopy(zi, 0, z, 0, ns * 2)
    }
    val y = x.clone()
    var s = 0
    while (s < ns) {
      val o = s * SOS_W
      val a0 = sos(o + 3)
      val b0 = sos(o) / a0; val b1 = sos(o + 1) / a0; val b2 = sos(o + 2) / a0
      val a1 = sos(o + 4) / a0; val a2 = sos(o + 5) / a0
      var z0 = z(s * 2); var z1 = z(s * 2 + 1)
      var t = 0
      while (t < y.length) {
        val xt = y(t)
        val yt = b0 * xt + z0
        z0 = b1 * xt + z1 - a1 * yt
        z1 = b2 * xt - a2 * yt
        y(t) = yt
        t += 1
      }
      z(s * 2) = z0; z(s * 2 + 1) = z1
      s += 1
    }
    y
  }

  /** scipy.signal.sosfilt_zi: per-section lfilter_zi with cumulative
    * DC-gain scaling.
    */
  def sosfiltZi(sos: Array[Double]): Array[Double] = {
    val ns = nSections(sos)
    val zi = new Array[Double](ns * 2)
    var scale = 1.0
    var s = 0
    while (s < ns) {
      val o = s * SOS_W
      val b = Array(sos(o), sos(o + 1), sos(o + 2))
      val a = Array(sos(o + 3), sos(o + 4), sos(o + 5))
      val z = lfilterZi(b, a)
      zi(s * 2) = scale * z(0)
      zi(s * 2 + 1) = scale * z(1)
      scale *= (b(0) + b(1) + b(2)) / (a(0) + a(1) + a(2))
      s += 1
    }
    zi
  }

  /** Odd/even/constant edge extension (scipy.signal._arraytools). */
  def padExt(x: Array[Double], padlen: Int, padtype: String): Array[Double] = {
    if (padlen == 0 || padtype == null || padtype == "none") return x.clone()
    val n = x.length
    require(padlen < n, s"padlen $padlen must be less than signal length $n")
    val out = new Array[Double](n + 2 * padlen)
    System.arraycopy(x, 0, out, padlen, n)
    var i = 0
    while (i < padlen) {
      padtype match {
        case "odd" =>
          out(padlen - 1 - i) = 2 * x(0) - x(i + 1)
          out(padlen + n + i) = 2 * x(n - 1) - x(n - 2 - i)
        case "even" =>
          out(padlen - 1 - i) = x(i + 1)
          out(padlen + n + i) = x(n - 2 - i)
        case "constant" =>
          out(padlen - 1 - i) = x(0)
          out(padlen + n + i) = x(n - 1)
        case other => throw new IllegalArgumentException(s"unknown padtype: $other")
      }
      i += 1
    }
    out
  }

  private def reverse(x: Array[Double]): Array[Double] = {
    val n = x.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x(n - 1 - i); i += 1 }
    out
  }

  /** scipy.signal.sosfiltfilt: edge-pad, forward+backward sosfilt with
    * step-matched initial conditions, trim.
    */
  def sosfiltfilt(sos: Array[Double], x: Array[Double],
                  padtype: String = "odd", padlen: Int = -1): Array[Double] = {
    val ns = nSections(sos)
    var zeroB = 0; var zeroA = 0
    var s = 0
    while (s < ns) {
      if (sos(s * SOS_W + 2) == 0.0) zeroB += 1
      if (sos(s * SOS_W + 5) == 0.0) zeroA += 1
      s += 1
    }
    val ntaps = 2 * ns + 1 - math.min(zeroB, zeroA)
    val edge = if (padlen >= 0) padlen else 3 * ntaps
    val ext = padExt(x, edge, if (edge > 0) padtype else "none")
    val zi = sosfiltZi(sos)
    val ziX0 = zi.map(_ * ext(0))
    val fwd = sosfilt(sos, ext, ziX0)
    val fwdRev = reverse(fwd)
    val ziY0 = zi.map(_ * fwdRev(0))
    val bwd = sosfilt(sos, fwdRev, ziY0)
    val y = reverse(bwd)
    if (edge > 0) java.util.Arrays.copyOfRange(y, edge, y.length - edge) else y
  }

  /** scipy.signal.filtfilt (b,a form), pad method. */
  def filtfilt(b: Array[Double], a: Array[Double], x: Array[Double],
               padtype: String = "odd", padlen: Int = -1): Array[Double] = {
    val ntaps = math.max(b.length, a.length)
    val edge = if (padlen >= 0) padlen else 3 * ntaps
    val ext = padExt(x, edge, if (edge > 0) padtype else "none")
    val zi = lfilterZi(b, a)
    val ziX0 = zi.map(_ * ext(0))
    val fwd = lfilter(b, a, ext, ziX0)
    val fwdRev = reverse(fwd)
    val ziY0 = zi.map(_ * fwdRev(0))
    val bwd = lfilter(b, a, fwdRev, ziY0)
    val y = reverse(bwd)
    if (edge > 0) java.util.Arrays.copyOfRange(y, edge, y.length - edge) else y
  }

  /** Savitzky-Golay smoothing coefficients (Savitzky & Golay 1964):
    * least-squares fit of a degree-`polyorder` polynomial over the
    * odd-length window on abscissa -h..h, evaluated at `t` (0 = the
    * center; edge positions use t != 0). Derivation: y(t) = rhsᵀM⁻¹Aᵀy
    * with M = AᵀA the normal matrix and rhs_j = t^j, so the weight of
    * sample i is Σ_j c_j·x_i^j where Mc = rhs — solved with the same
    * Gaussian elimination [[solve]] the zi computation uses. The
    * kernel is fully general; published closed-form tables (e.g.
    * (-3,12,17,12,-3)/35 for window 5, order 2) fall out as special
    * cases and pin it in tests and oracles.
    */
  def savgolCoeffs(window: Int, polyorder: Int, t: Double = 0.0,
                   deriv: Int = 0, delta: Double = 1.0): Array[Double] = {
    require(window > 0 && window % 2 == 1,
      s"savgol: window must be positive odd, got $window")
    require(polyorder >= 0 && polyorder < window,
      s"savgol: need 0 <= polyorder < window, got $polyorder/$window")
    require(deriv >= 0, s"savgol: deriv must be nonnegative, got $deriv")
    require(delta > 0.0, s"savgol: delta must be positive, got $delta")
    val ho = window / 2
    val p = polyorder
    // a derivative order past the polynomial degree is identically 0
    // (scipy returns the zero filter)
    if (deriv > p) return new Array[Double](window)
    val m = Array.ofDim[Double](p + 1, p + 1)
    var j = 0
    while (j <= p) {
      var k = 0
      while (k <= p) {
        var s = 0.0
        var i = -ho
        while (i <= ho) { s += math.pow(i.toDouble, (j + k).toDouble); i += 1 }
        m(j)(k) = s
        k += 1
      }
      j += 1
    }
    // evaluation functional on the monomial basis: d-th derivative of
    // u^j at u=t is j!/(j-d)! · t^(j-d); the sample-spacing scale
    // delta^d converts per-sample to per-coordinate derivatives
    val rhs = Array.tabulate(p + 1) { j =>
      if (j < deriv) 0.0
      else {
        var f = 1.0
        var q = j
        while (q > j - deriv) { f *= q; q -= 1 }
        f * math.pow(t, (j - deriv).toDouble)
      }
    }
    val c = solve(m, rhs)
    val scale = math.pow(delta, deriv.toDouble)
    Array.tabulate(window) { idx =>
      val xi = (idx - ho).toDouble
      var s = 0.0
      var jj = 0
      while (jj <= p) { s += c(jj) * math.pow(xi, jj.toDouble); jj += 1 }
      s / scale
    }
  }

  /** scipy.signal.savgol_filter (1-D, deriv=0): polynomial
    * least-squares smoothing. mode="constant" zero-pads (cval=0);
    * mode="interp" (scipy's default) fits the first/last full window
    * and evaluates the SAME fit at the edge positions — which is why
    * it needs n >= window.
    */
  def savgol(x: Array[Double], window: Int = 5, polyorder: Int = 2,
             mode: String = "constant", deriv: Int = 0,
             delta: Double = 1.0): Array[Double] = {
    val n = x.length
    val ho = window / 2
    val out = new Array[Double](n)
    if (n == 0) return out
    val center = savgolCoeffs(window, polyorder, 0.0, deriv, delta)
    mode match {
      case "constant" =>
        var i = 0
        while (i < n) {
          var s = 0.0
          var k = 0
          while (k < window) {
            val src = i - ho + k
            if (src >= 0 && src < n) s += center(k) * x(src)
            k += 1
          }
          out(i) = s
          i += 1
        }
      case "interp" =>
        require(n >= window,
          s"savgol mode=interp: series length $n < window $window")
        var i = 0
        while (i < n) {
          // window base + eval offset: head fits the first window,
          // tail the last, middle the centered one
          val (base, t) =
            if (i < ho) (0, (i - ho).toDouble)
            else if (i >= n - ho) (n - window, (i - (n - 1 - ho)).toDouble)
            else (i - ho, 0.0)
          val h = if (t == 0.0) center
                  else savgolCoeffs(window, polyorder, t, deriv, delta)
          var s = 0.0
          var k = 0
          while (k < window) { s += h(k) * x(base + k); k += 1 }
          out(i) = s
          i += 1
        }
      case other =>
        throw new IllegalArgumentException(
          s"savgol: unknown mode '$other' (constant|interp)")
    }
    out
  }

  /** scipy.signal.medfilt (1-D): sliding median with odd kernel size,
    * zero-padded edges (scipy pads with zeros, not reflection). Output
    * length == input length. O(n·k log k) — k is a small constant
    * (scipy default 3); a heap-based O(n log k) variant isn't worth
    * the code until k grows past ~100.
    */
  def medfilt(x: Array[Double], kernelSize: Int = 3): Array[Double] = {
    require(kernelSize > 0 && kernelSize % 2 == 1,
      s"medfilt: kernel size must be positive odd, got $kernelSize")
    val n = x.length
    val ho = kernelSize / 2
    val out = new Array[Double](n)
    val buf = new Array[Double](kernelSize)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < kernelSize) {
        val src = i - ho + j
        buf(j) = if (src < 0 || src >= n) 0.0 else x(src)
        j += 1
      }
      java.util.Arrays.sort(buf)
      out(i) = buf(ho)
      i += 1
    }
    out
  }

  /** scipy.signal.medfilt2d: 2-D sliding median over a row-major
    * rows×cols grid, odd (kr × kc) kernel, zero-padded edges (scipy
    * zero-pads here too). O(n·k² log k²) with the same small-constant
    * argument as the 1-D kernel.
    */
  def medfilt2d(x: Array[Double], rows: Int, cols: Int,
                kr: Int = 3, kc: Int = 3): Array[Double] = {
    require(rows > 0 && cols > 0 && rows * cols == x.length,
      s"medfilt2d: ${x.length} values do not fill a ${rows}x$cols grid")
    require(kr > 0 && kr % 2 == 1 && kc > 0 && kc % 2 == 1,
      s"medfilt2d: kernel dims must be positive odd, got ${kr}x$kc")
    val hr = kr / 2; val hc = kc / 2
    val out = new Array[Double](x.length)
    val buf = new Array[Double](kr * kc)
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        var j = 0
        var dr = -hr
        while (dr <= hr) {
          var dc = -hc
          while (dc <= hc) {
            val rr = r + dr; val cc = c + dc
            buf(j) = if (rr < 0 || rr >= rows || cc < 0 || cc >= cols) 0.0
                     else x(rr * cols + cc)
            j += 1; dc += 1
          }
          dr += 1
        }
        java.util.Arrays.sort(buf)
        out(r * cols + c) = buf(buf.length / 2)
        c += 1
      }
      r += 1
    }
    out
  }

  /** scipy.signal.order_filter (1-D, full domain): sliding rank
    * selection — output i is the `rank`-th smallest (0-based) of the
    * zero-padded window, so rank = size/2 IS medfilt. Same O(n·k log k)
    * envelope as medfilt.
    */
  def orderFilter(x: Array[Double], size: Int, rank: Int): Array[Double] = {
    require(size > 0 && size % 2 == 1,
      s"orderFilter: window size must be positive odd, got $size")
    require(rank >= 0 && rank < size,
      s"orderFilter: need 0 <= rank < size, got $rank/$size")
    val n = x.length
    val ho = size / 2
    val out = new Array[Double](n)
    val buf = new Array[Double](size)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < size) {
        val src = i - ho + j
        buf(j) = if (src < 0 || src >= n) 0.0 else x(src)
        j += 1
      }
      java.util.Arrays.sort(buf)
      out(i) = buf(rank)
      i += 1
    }
    out
  }

  /** scipy.signal.wiener (1-D): adaptive local-statistics filter.
    * Local mean/variance over a zero-padded `size` window (size odd,
    * scipy default 3); `noise` defaults to the mean of the local
    * variances (scipy's estimate). Where lVar < noise the output is
    * the local mean; elsewhere lMean + (x - lMean)·(1 - noise/lVar).
    */
  def wiener(x: Array[Double], size: Int = 3, noise: Double = -1.0): Array[Double] = {
    require(size > 0 && size % 2 == 1,
      s"wiener: window size must be positive odd, got $size")
    val n = x.length
    if (n == 0) return new Array[Double](0)
    val ho = size / 2
    val lMean = new Array[Double](n)
    val lVar = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var s2 = 0.0
      var j = i - ho
      while (j <= i + ho) {
        val v = if (j < 0 || j >= n) 0.0 else x(j)
        s += v
        s2 += v * v
        j += 1
      }
      val m = s / size
      lMean(i) = m
      lVar(i) = s2 / size - m * m
      i += 1
    }
    val nz = if (noise >= 0) noise else {
      var s = 0.0
      i = 0
      while (i < n) { s += lVar(i); i += 1 }
      s / n
    }
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) =
        if (lVar(i) < nz) lMean(i)
        else lMean(i) + (x(i) - lMean(i)) * (1.0 - nz / lVar(i))
      i += 1
    }
    out
  }
}

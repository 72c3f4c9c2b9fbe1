package graft.dsp

/** Wavelet and irregular-sampling kernels: the ricker (Mexican-hat)
  * wavelet, the continuous wavelet transform built on it
  * (scipy.signal.ricker / scipy.signal.cwt), and the Lomb-Scargle
  * periodogram (scipy.signal.lombscargle) — the one spectral estimator
  * that does NOT require the reference's equispaced-coordinate
  * contract (README; xarray_scipy/signal.py:16 `_compute_delta`), and
  * therefore the natural spectrum operator for irregular event-time
  * series. Pure JVM, zero Spark deps, like every kernel here.
  */
object Wavelet {

  /** scipy.signal.ricker: A·(1 − t²/a²)·exp(−t²/2a²) on the `points`
    * abscissae t = i − (points−1)/2, A = 2/(√(3a)·π^¼). Symmetric for
    * both parities of `points` (the center sits between samples when
    * even), so scipy.cwt's tap reversal is a value-level no-op.
    */
  def ricker(points: Int, a: Double): Array[Double] = {
    require(points > 0 && a > 0, s"ricker: need points > 0 and a > 0")
    val amp = 2.0 / (math.sqrt(3.0 * a) * math.pow(math.Pi, 0.25))
    val asq = a * a
    val out = new Array[Double](points)
    var i = 0
    while (i < points) {
      val t = i - (points - 1) / 2.0
      val tsq = t * t
      out(i) = amp * (1.0 - tsq / asq) * math.exp(-tsq / (2.0 * asq))
      i += 1
    }
    out
  }

  /** scipy.signal.cwt core: one "same"-mode convolution of the signal
    * against each wavelet's taps, rows stacked row-major
    * (nWavelets × n). Taps arrive pre-computed and FLATTENED
    * (`tapsFlat` + per-row `tapLens`) so the caller fixes the exact
    * tap doubles once at the driver — the kernel then has no
    * transcendentals, and an oracle can replay the identical literals.
    * scipy conjugates and reverses the taps before convolving; for the
    * real symmetric ricker both are value-level no-ops, so plain
    * convolve("same") is the same computation.
    */
  def cwtFlat(x: Array[Double], tapsFlat: Array[Double],
              tapLens: Array[Int]): Array[Double] = {
    val n = x.length
    val out = new Array[Double](tapLens.length * n)
    var off = 0
    var wi = 0
    while (wi < tapLens.length) {
      val m = tapLens(wi)
      require(off + m <= tapsFlat.length,
        s"cwtFlat: tap lengths overrun ${tapsFlat.length} flattened taps")
      val taps = java.util.Arrays.copyOfRange(tapsFlat, off, off + m)
      val row = Conv.convolve(x, taps, "same", "direct")
      System.arraycopy(row, 0, out, wi * n, n)
      off += m
      wi += 1
    }
    require(off == tapsFlat.length,
      s"cwtFlat: ${tapsFlat.length - off} flattened taps left over")
    out
  }

  /** scipy.signal.lombscargle: the least-squares spectral power of an
    * UNEVENLY sampled series at each angular frequency ω. Computed via
    * the 2×2 normal-equation solve
    *   P(ω) = ½ · (c²·ss − 2c·s·cs + s²·cc) / (cc·ss − cs²)
    * with c = Σy·cos ωt, s = Σy·sin ωt, cc = Σcos², ss = Σsin²,
    * cs = Σcos·sin — algebraically identical to the classic
    * τ-rotation form (the rotation diagonalizes the same matrix;
    * equality is spec-pinned), and expressible term-by-term in SQL,
    * which the τ form's atan2 is not. `precenter` subtracts the mean
    * of y first; `normalize` scales by 2/Σy² (scipy's flags).
    */
  def lombscargle(t: Array[Double], y: Array[Double], freqs: Array[Double],
                  precenter: Boolean = false,
                  normalize: Boolean = false): Array[Double] = {
    val n = t.length
    require(y.length == n, s"lombscargle: ${y.length} values for $n times")
    require(n >= 2, s"lombscargle: need at least 2 samples, got $n")
    val yy =
      if (!precenter) y
      else {
        var m = 0.0
        var i = 0
        while (i < n) { m += y(i); i += 1 }
        m /= n
        val out = new Array[Double](n)
        i = 0
        while (i < n) { out(i) = y(i) - m; i += 1 }
        out
      }
    var ysq = 0.0
    if (normalize) {
      var i = 0
      while (i < n) { ysq += yy(i) * yy(i); i += 1 }
    }
    val out = new Array[Double](freqs.length)
    var fi = 0
    while (fi < freqs.length) {
      val w = freqs(fi)
      require(w > 0, s"lombscargle: frequencies must be positive, got $w")
      var c = 0.0; var s = 0.0; var cc = 0.0; var ss = 0.0; var cs = 0.0
      var i = 0
      while (i < n) {
        val cv = math.cos(w * t(i))
        val sv = math.sin(w * t(i))
        c += yy(i) * cv
        s += yy(i) * sv
        cc += cv * cv
        ss += sv * sv
        cs += cv * sv
        i += 1
      }
      val det = cc * ss - cs * cs
      var p = 0.5 * (c * c * ss - 2.0 * c * s * cs + s * s * cc) / det
      if (normalize) p *= 2.0 / ysq
      out(fi) = p
      fi += 1
    }
    out
  }
}

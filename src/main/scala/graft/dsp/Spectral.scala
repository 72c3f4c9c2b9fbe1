package graft.dsp

/** Spectral-estimation kernels: detrend and Welch's averaged
  * periodogram — the scipy.signal surface adjacent to the reference's
  * STFT usage (scipy.signal.detrend / scipy.signal.welch; the
  * reference delegates both to scipy, xarray_scipy/signal.py keeps
  * only the dim bookkeeping). Pure JVM, zero Spark deps, like every
  * kernel in this package.
  */
object Spectral {

  /** scipy.signal.detrend: remove the mean (`"constant"`) or the
    * least-squares straight line over the sample index (`"linear"`,
    * the scipy default). n < 2 degenerates to the constant path (a
    * line through one point is the point).
    */
  def detrend(x: Array[Double], typ: String = "linear"): Array[Double] = {
    val n = x.length
    val out = new Array[Double](n)
    if (n == 0) return out
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i); i += 1 }
    val mean = s / n
    typ match {
      case "constant" =>
        i = 0
        while (i < n) { out(i) = x(i) - mean; i += 1 }
      case "linear" =>
        if (n < 2) return out // x - mean == 0
        // least squares on abscissa 0..n-1: slope = Sxy/Sxx around the
        // centroid ((n-1)/2, mean); exact in the same doubles the
        // oracle's aggregate formulation uses
        val xbar = (n - 1) / 2.0
        var sxy = 0.0
        var sxx = 0.0
        i = 0
        while (i < n) {
          val dx = i - xbar
          sxy += dx * (x(i) - mean)
          sxx += dx * dx
          i += 1
        }
        val slope = sxy / sxx
        i = 0
        while (i < n) { out(i) = x(i) - (mean + slope * (i - xbar)); i += 1 }
      case other =>
        throw new IllegalArgumentException(
          s"detrend: unknown type '$other' (constant|linear)")
    }
    out
  }

  /** scipy.signal.welch (onesided, density scaling, average="mean"):
    * `nperseg`-sample segments every `hop` samples (scipy's
    * noverlap = nperseg - hop; its default noverlap = nperseg//2),
    * per-segment constant detrend (scipy's detrend="constant" when
    * `demean`), taper by `wts`, rfft, |X|² average across segments,
    * scaled by 1/(fs·Σw²) with every bin except DC and (even nperseg)
    * Nyquist doubled. Segment placement (start + nperseg ≤ n) is
    * IDENTICAL to the batch/streaming STFT so the three spectral ops
    * agree on which samples form a frame.
    */
  def welch(x: Array[Double], nperseg: Int, hop: Int, wts: Array[Double],
            fs: Double, demean: Boolean = true): Array[Double] = {
    require(nperseg > 0 && hop > 0 && hop <= nperseg,
      s"welch: need 0 < hop <= nperseg, got hop=$hop nperseg=$nperseg")
    require(wts.length == nperseg,
      s"welch: window length ${wts.length} != nperseg $nperseg")
    require(fs > 0, s"welch: fs must be positive, got $fs")
    val n = x.length
    require(n >= nperseg, s"welch: series length $n < nperseg $nperseg")
    val nb = nperseg / 2 + 1
    val acc = new Array[Double](nb)
    val seg = new Array[Double](nperseg)
    var w2 = 0.0
    var i = 0
    while (i < nperseg) { w2 += wts(i) * wts(i); i += 1 }
    var nSeg = 0
    var st = 0
    while (st + nperseg <= n) {
      var m = 0.0
      if (demean) {
        i = 0
        while (i < nperseg) { m += x(st + i); i += 1 }
        m /= nperseg
      }
      i = 0
      while (i < nperseg) { seg(i) = (x(st + i) - m) * wts(i); i += 1 }
      val sp = Fft.rfft(seg)
      var b = 0
      while (b < nb) { acc(b) += sp.re(b) * sp.re(b) + sp.im(b) * sp.im(b); b += 1 }
      nSeg += 1
      st += hop
    }
    val scale = 1.0 / (fs * w2 * nSeg)
    var b = 0
    while (b < nb) {
      val dbl = if (b == 0 || (nperseg % 2 == 0 && b == nb - 1)) 1.0 else 2.0
      acc(b) = acc(b) * scale * dbl
      b += 1
    }
    acc
  }
}

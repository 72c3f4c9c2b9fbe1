package graft.dsp

/** Fourier-domain resampling and decimation, matching
  * `scipy.signal.resample` (xarray_scipy/signal.py:374-400) and
  * `scipy.signal.decimate` (signal.py:109-152) for real-valued input.
  */
object Resample {

  /** Periodic (fftbins=true) window of length n, matching
    * scipy.signal.get_window's default mode for the named windows.
    */
  def periodicWindow(name: String, n: Int): Array[Double] = {
    val w = new Array[Double](n)
    var k = 0
    while (k < n) {
      val t = 2.0 * math.Pi * k / n
      w(k) = name match {
        case "boxcar" | "rectangular" => 1.0
        case "hann" | "hanning" => 0.5 - 0.5 * math.cos(t)
        case "hamming" => 0.54 - 0.46 * math.cos(t)
        case "blackman" => 0.42 - 0.5 * math.cos(t) + 0.08 * math.cos(2 * t)
        case "bartlett" => 1.0 - math.abs(2.0 * k / n - 1.0)
        case other => throw new IllegalArgumentException(
          s"unknown window '$other' (supported: boxcar, hann, hamming, blackman, bartlett)")
      }
      k += 1
    }
    w
  }

  /** Periodic (fftbins=true) Tukey window — scipy.signal.windows.tukey
    * with sym=False, the default analysis window of
    * scipy.signal.spectrogram (('tukey', 0.25)). The periodic variant
    * evaluates the symmetric window on n+1 points and drops the last;
    * the piecewise formula below is scipy's verbatim (cosine taper of
    * total fraction `alpha`, flat top between).
    */
  def tukeyPeriodic(n: Int, alpha: Double): Array[Double] = {
    require(n > 0, s"tukey: need n > 0, got $n")
    if (alpha <= 0) return Array.fill(n)(1.0)
    if (alpha >= 1) return periodicWindow("hann", n)
    val m = n + 1 // symmetric length before the periodic truncation
    val width = math.floor(alpha * (m - 1) / 2.0).toInt
    val w = new Array[Double](n)
    var k = 0
    while (k < n) {
      w(k) =
        if (k <= width)
          0.5 * (1 + math.cos(math.Pi * (-1 + 2.0 * k / alpha / (m - 1))))
        else if (k < m - 1 - width) 1.0
        else
          0.5 * (1 + math.cos(math.Pi * (-2.0 / alpha + 1 + 2.0 * k / alpha / (m - 1))))
      k += 1
    }
    w
  }

  /** scipy.signal.resample(x, num, window, domain): real input path.
    * domain "time": x is a time series → rfft first.
    * domain "freq": x is interpreted as a real-valued packed rfft
    * spectrum (scipy's real-input freq path: `X = x`, imaginary parts
    * zero) — Nx is then the bin count, exactly like scipy.
    * window: a named window ("" = none), built periodic
    * (get_window fftbins=True), ifftshifted, folded onto itself for
    * real input (scipy's W_real), and applied to the spectrum before
    * the truncate/pad copy.
    */
  def resample(x: Array[Double], num: Int, window: String = "",
               domain: String = "time"): Array[Double] =
    resampleW(x, num,
      if (window.isEmpty) null
      else Fft.ifftshift(periodicWindow(window, x.length)), domain)

  /** resample with the window as an explicit Fourier-order VECTOR —
    * scipy's `window: array_like` branch ("assumed to be the window to
    * be applied directly in the Fourier domain, dc and low-frequency
    * first", so no ifftshift here; the named-window overload does the
    * shift before delegating). `w` must have length Nx; null = none.
    */
  def resampleW(x: Array[Double], num: Int, w: Array[Double],
                domain: String = "time"): Array[Double] = {
    val nx = x.length
    require(num > 0, "num must be positive")
    require(domain == "time" || domain == "freq",
      s"domain must be 'time' or 'freq': $domain")
    require(w == null || w.length == nx,
      s"window vector length ${if (w == null) -1 else w.length} != input length $nx")
    // spectrum bins
    var xRe: Array[Double] = null
    var xIm: Array[Double] = null
    if (domain == "time") {
      val xf = Fft.rfft(x)
      xRe = xf.re; xIm = xf.im
    } else {
      xRe = x.clone(); xIm = new Array[Double](nx)
    }
    val bins = xRe.length
    if (w != null) {
      // real-input fold: W_real[i] = (W[i] + W[Nx-i]) / 2 for i >= 1
      var i = 0
      while (i < bins) {
        val wr = if (i == 0) w(0) else 0.5 * (w(i) + w(nx - i))
        xRe(i) *= wr; xIm(i) *= wr
        i += 1
      }
    }
    val nyOut = num / 2 + 1
    val yRe = new Array[Double](nyOut)
    val yIm = new Array[Double](nyOut)
    val nMin = math.min(num, nx)
    val nyq = nMin / 2 + 1
    var i = 0
    while (i < math.min(nyq, nyOut)) { yRe(i) = xRe(i); yIm(i) = xIm(i); i += 1 }
    if (nMin % 2 == 0) {
      if (num < nx) {
        // downsampling: fold the (dropped) negative Nyquist energy in
        yRe(nMin / 2) *= 2.0; yIm(nMin / 2) *= 2.0
      } else if (num > nx) {
        // upsampling: split the Nyquist component
        yRe(nMin / 2) *= 0.5; yIm(nMin / 2) *= 0.5
      }
    }
    val y = Fft.irfft(yRe, yIm, num, "backward")
    val scale = num.toDouble / nx.toDouble
    var k = 0
    while (k < num) { y(k) *= scale; k += 1 }
    y
  }

  /** scipy.signal.decimate(x, q, n, ftype, zero_phase): anti-alias
    * filter then take every q-th sample. ftype "iir" → cheby1(order 8,
    * 0.05 dB ripple, 0.8/q) sos; "fir" → firwin(20q+1 taps, 1/q,
    * hamming). Output length ceil(n/q) (numpy slice [::q]).
    */
  def decimate(x: Array[Double], q: Int, n: Int = -1, ftype: String = "iir",
               zeroPhase: Boolean = true): Array[Double] = {
    require(q >= 1, s"q must be >= 1: $q")
    if (q == 1) return x.clone()
    val filtered = ftype match {
      case "iir" =>
        val order = if (n > 0) n else 8
        val sos = Design.cheby1Sos(order, 0.05, 0.8 / q)
        if (zeroPhase) Filt.sosfiltfilt(sos, x) else Filt.sosfilt(sos, x)
      case "fir" =>
        val numtaps = (if (n > 0) n else 20 * q) + 1
        val b = Design.firwinLowpass(numtaps, 1.0 / q)
        if (zeroPhase) {
          // scipy routes FIR+zero_phase through resample_poly/upfirdn:
          // one centered pass of the linear-phase filter (group delay
          // (numtaps-1)/2 compensated), zero-padded edges.
          val full = Conv.convolve(x, b, "full", "auto")
          val half = (numtaps - 1) / 2
          val outLen = (x.length + q - 1) / q
          val out = new Array[Double](outLen)
          var i = 0
          while (i < outLen) {
            val idx = half + i * q
            out(i) = if (idx < full.length) full(idx) else 0.0
            i += 1
          }
          return out
        } else Filt.lfilter(b, Array(1.0), x)
      case other => throw new IllegalArgumentException(s"unknown ftype: $other")
    }
    val outLen = (x.length + q - 1) / q
    val out = new Array[Double](outLen)
    var i = 0
    while (i < outLen) { out(i) = filtered(i * q); i += 1 }
    out
  }

  /** numpy.interp onto a regular grid: linear interpolation of the
    * (coords, values) series at points start + i·step, i < n, with
    * numpy's edge policy (clamp to the first/last sample value outside
    * the observed span; exact hits return the sample). Coords must be
    * ascending (the seriesify contract). Two-pointer sweep, O(n + m).
    * NaN start means "the series' own first coordinate".
    */
  def interpGrid(coords: Array[Double], values: Array[Double], start: Double,
                 step: Double, n: Int): Array[Double] = {
    require(coords.length == values.length,
      s"interpGrid: coords/values length mismatch ${coords.length}/${values.length}")
    require(coords.nonEmpty, "interpGrid: empty series")
    require(step > 0, s"interpGrid: step must be positive, got $step")
    require(n > 0, s"interpGrid: n must be positive, got $n")
    val s0 = if (start.isNaN) coords(0) else start
    val m = coords.length
    val out = new Array[Double](n)
    var j = 0 // last sample with coords(j) <= g (sweep pointer)
    var i = 0
    while (i < n) {
      val g = s0 + i * step
      if (g <= coords(0)) out(i) = values(0)
      else if (g >= coords(m - 1)) out(i) = values(m - 1)
      else {
        while (j + 1 < m && coords(j + 1) <= g) j += 1
        val tlo = coords(j)
        val thi = coords(j + 1)
        out(i) = values(j) + (values(j + 1) - values(j)) * ((g - tlo) / (thi - tlo))
      }
      i += 1
    }
    out
  }

  /** scipy.signal.upfirdn(h, x, up, down): upsample by zero insertion,
    * FIR filter (full convolution), downsample — evaluated polyphase-
    * style without materializing the zero-stuffed signal:
    * y[m] = Σ_j x[j]·h[m·down − j·up] over taps in range. Output
    * length ceil(((n−1)·up + len(h)) / down), scipy's _output_len.
    */
  def upfirdn(h: Array[Double], x: Array[Double], up: Int,
              down: Int): Array[Double] = {
    require(up >= 1 && down >= 1, s"upfirdn: up/down must be >= 1: $up/$down")
    require(h.nonEmpty, "upfirdn: empty filter")
    val n = x.length
    if (n == 0) return new Array[Double](0)
    val total = (n - 1) * up + h.length
    val outLen = (total + down - 1) / down
    val out = new Array[Double](outLen)
    var m = 0
    while (m < outLen) {
      val t = m * down
      // j with 0 <= t - j*up <= L-1 and 0 <= j < n
      var j = math.max(0, (t - h.length + up) / up) // ceil((t-L+1)/up) for t-L+1 > 0
      if (j * up > t) j = t / up
      var s = 0.0
      while (j < n && j * up <= t) {
        val k = t - j * up
        if (k < h.length) s += x(j) * h(k)
        j += 1
      }
      out(m) = s
      m += 1
    }
    out
  }

  /** scipy.signal.resample_poly(x, up, down, window=('kaiser', 5.0)):
    * polyphase rational-rate resampling, reimplemented from the
    * published algorithm — gcd-reduce the ratio, design
    * firwin(2·10·max_rate + 1, 1/max_rate, kaiser β)·up, zero-pad the
    * filter so the kept samples sit on the output grid
    * (n_pre_pad = down − half_len % down, n_pre_remove =
    * (half_len + n_pre_pad)/down), run [[upfirdn]], slice n_out =
    * ceil(n·up/down).
    */
  def resamplePoly(x: Array[Double], upIn: Int, downIn: Int,
                   beta: Double = 5.0): Array[Double] = {
    require(upIn >= 1 && downIn >= 1, s"up/down must be >= 1: $upIn/$downIn")
    val g = BigInt(upIn).gcd(BigInt(downIn)).toInt
    val up = upIn / g
    val down = downIn / g
    if (up == 1 && down == 1) return x.clone()
    val n = x.length
    val nOut = (n.toLong * up / down + (if (n.toLong * up % down != 0) 1 else 0)).toInt
    val maxRate = math.max(up, down)
    val halfLen = 10 * maxRate
    val h0 = Design.firwinLowpassW(2 * halfLen + 1, 1.0 / maxRate,
      Design.kaiser(2 * halfLen + 1, beta))
    var i = 0
    while (i < h0.length) { h0(i) *= up; i += 1 }
    val nPrePad = down - halfLen % down
    val nPreRemove = (halfLen + nPrePad) / down
    def outputLen(lenH: Int): Int = ((n - 1) * up + lenH + down - 1) / down
    var nPostPad = 0
    while (outputLen(h0.length + nPrePad + nPostPad) < nOut + nPreRemove)
      nPostPad += 1
    val h = new Array[Double](nPrePad + h0.length + nPostPad)
    System.arraycopy(h0, 0, h, nPrePad, h0.length)
    val y = upfirdn(h, x, up, down)
    java.util.Arrays.copyOfRange(y, nPreRemove,
      math.min(y.length, nPreRemove + nOut)) match {
      case r if r.length == nOut => r
      case r => java.util.Arrays.copyOf(r, nOut) // zero-extend (rare)
    }
  }
}

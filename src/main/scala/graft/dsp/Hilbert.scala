package graft.dsp

/** Analytic signal via FFT, matching `scipy.signal.hilbert` as wrapped
  * by the reference (xarray_scipy/signal.py:279-327): real input x,
  * optional N (crop/zero-pad before transform), output complex
  * analytic signal of length N.
  *
  * Algorithm (published in the scipy docs): Xf = fft(x, N); h[0] = 1,
  * h[N/2] = 1 (N even), h[1..ceil(N/2)-1] = 2, rest 0; out = ifft(Xf*h).
  */
object Hilbert {

  def hilbert(x: Array[Double], nIn: Int = -1): Fft.C = {
    val n = if (nIn <= 0) x.length else nIn
    require(n > 0, "N must be positive")
    val f = Fft.fft(x, null, n, "backward")
    // apply the step multiplier h in-place
    val half = n / 2
    var i = 1
    if (n % 2 == 0) {
      while (i < half) { f.re(i) *= 2; f.im(i) *= 2; i += 1 }
      // bins 0 and n/2 stay as-is; upper half zeroed
      i = half + 1
    } else {
      while (i <= half) { f.re(i) *= 2; f.im(i) *= 2; i += 1 }
    }
    while (i < n) { f.re(i) = 0.0; f.im(i) = 0.0; i += 1 }
    Fft.ifft(f.re, f.im, n, "backward")
  }

  /** |analytic| — the instantaneous amplitude envelope. */
  def envelope(x: Array[Double], n: Int = -1): Array[Double] = {
    val a = hilbert(x, n)
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = math.hypot(a.re(i), a.im(i)); i += 1 }
    out
  }
}

package graft.dsp

/** Mel-frequency cepstral coefficients — the standard audio-pipeline
  * frame representation (Davis & Mermelstein 1980; the HTK mel scale
  * m = 2595·log10(1 + f/700)). Composed entirely from shipped
  * kernels: Hamming window → real FFT power spectrum ([[Fft.rfft]])
  * → triangular mel filterbank (literal matrix, computed here so the
  * SQL oracle can embed the IDENTICAL weights) → log → orthonormal
  * DCT-II ([[Fft.dct2]], the Makhoul path).
  *
  * Everything in this object is deterministic closed-form math over
  * (frameLen, sampleRate, nMels) — both the Spark kernel and the
  * DuckDB oracle draw their weights from these same functions, the
  * sig_cwt literal-taps discipline.
  */
object Mel {

  /** Hamming window, the periodic-symmetric (N-1 denominator) form. */
  def hamming(n: Int): Array[Double] =
    Array.tabulate(n)(j =>
      if (n == 1) 1.0 else 0.54 - 0.46 * math.cos(2.0 * math.Pi * j / (n - 1)))

  def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  def melToHz(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank over the `nFft/2 + 1` rfft bins:
    * `nMels` filters with edges equispaced on the mel axis between
    * fMin and fMax, each bin weighted by its distance up/down the
    * triangle (continuous bin-center frequencies, no edge rounding).
    * Returns weights(m)(k), most entries zero.
    */
  def filterbank(nFft: Int, nMels: Int, sampleRate: Double,
                 fMin: Double = 0.0, fMaxOpt: Double = -1.0): Array[Array[Double]] = {
    val fMax = if (fMaxOpt > 0) fMaxOpt else sampleRate / 2.0
    val nBins = nFft / 2 + 1
    val edges = Array.tabulate(nMels + 2)(i =>
      melToHz(hzToMel(fMin) + (hzToMel(fMax) - hzToMel(fMin)) * i / (nMels + 1)))
    Array.tabulate(nMels) { m =>
      val (lo, ctr, hi) = (edges(m), edges(m + 1), edges(m + 2))
      Array.tabulate(nBins) { k =>
        val fk = k * sampleRate / nFft
        val up = (fk - lo) / (ctr - lo)
        val down = (hi - fk) / (hi - ctr)
        math.max(0.0, math.min(up, down))
      }
    }
  }

  /** Orthonormal DCT-II weights: w(c)(m) such that
    * coef(c) = Σ_m w(c)(m) · x(m) — the matrix [[Fft.dct2]] with
    * norm="ortho" applies. Embedded literally in the oracle.
    */
  def dctOrthoWeights(nCoef: Int, n: Int): Array[Array[Double]] =
    Array.tabulate(nCoef) { c =>
      val scale = if (c == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      Array.tabulate(n)(m =>
        scale * math.cos(math.Pi * (2 * m + 1) * c / (2.0 * n)))
    }

  /** Per-frame MFCC: windowed power spectrum → mel energies →
    * log(E + 1) (the +1 shift keeps an exact zero-energy frame
    * finite and is replayed identically by the oracle) → orthonormal
    * DCT-II, first `nCoef` coefficients kept.
    */
  def mfccFrame(samples: Array[Double], win: Array[Double],
                fb: Array[Array[Double]], nCoef: Int): Array[Double] = {
    val n = samples.length
    val x = new Array[Double](n)
    var j = 0
    while (j < n) { x(j) = samples(j) * win(j); j += 1 }
    val sp = Fft.rfft(x, n, "backward")
    val nBins = n / 2 + 1
    val power = new Array[Double](nBins)
    var k = 0
    while (k < nBins) {
      power(k) = sp.re(k) * sp.re(k) + sp.im(k) * sp.im(k); k += 1
    }
    val logE = new Array[Double](fb.length)
    var m = 0
    while (m < fb.length) {
      var e = 0.0
      var kk = 0
      while (kk < nBins) { e += fb(m)(kk) * power(kk); kk += 1 }
      logE(m) = math.log(e + 1.0)
      m += 1
    }
    Fft.dct2(logE, "ortho").take(nCoef)
  }
}

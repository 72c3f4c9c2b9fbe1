package graft.dsp

/** Filter design kernels: the subset scipy.signal provides that the
  * reference depends on — firwin (FIR path of decimate,
  * xarray_scipy/signal.py:109), cheby1 (IIR path of decimate), butter
  * (used by the reference's sosfilt tests, tests/test_signal.py:543).
  * Digital lowpass only; frequencies normalized to Nyquist = 1.
  *
  * Complex arithmetic is on (re, im) pairs; poles/zeros kept as
  * parallel arrays.
  */
object Design {

  def hamming(m: Int): Array[Double] = {
    if (m == 1) return Array(1.0)
    val out = new Array[Double](m)
    var i = 0
    while (i < m) {
      out(i) = 0.54 - 0.46 * math.cos(2.0 * math.Pi * i / (m - 1))
      i += 1
    }
    out
  }

  private def sinc(x: Double): Double =
    if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)

  /** Modified Bessel function of the first kind, order 0 — the kaiser
    * window's kernel. Power series Σ ((x/2)^k / k!)², terms added
    * until they stop moving the sum (converges fast for the β ≤ ~20
    * range windows use).
    */
  def besselI0(x: Double): Double = {
    val h = x / 2.0
    var term = 1.0
    var sum = 1.0
    var k = 1
    while (term > sum * 1e-17 && k < 1000) {
      val t = h / k
      term *= t * t
      sum += term
      k += 1
    }
    sum
  }

  /** Symmetric kaiser window (numpy.kaiser / scipy get_window('kaiser',
    * sym=True)): I0(β√(1 − ((2i/(M−1)) − 1)²)) / I0(β).
    */
  def kaiser(m: Int, beta: Double): Array[Double] = {
    if (m == 1) return Array(1.0)
    val denom = besselI0(beta)
    Array.tabulate(m) { i =>
      val r = 2.0 * i / (m - 1) - 1.0
      besselI0(beta * math.sqrt(math.max(0.0, 1.0 - r * r))) / denom
    }
  }

  /** scipy.signal.firwin lowpass with an explicit window vector,
    * scaled so the DC gain is exactly 1.
    */
  def firwinLowpassW(numtaps: Int, cutoff: Double,
                     w: Array[Double]): Array[Double] = {
    require(cutoff > 0 && cutoff < 1, s"cutoff must be in (0,1): $cutoff")
    require(w.length == numtaps, s"window length ${w.length} != numtaps $numtaps")
    val m = numtaps
    val alpha = 0.5 * (m - 1)
    val h = new Array[Double](m)
    var i = 0
    while (i < m) {
      val x = i - alpha
      h(i) = cutoff * sinc(cutoff * x) * w(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < m) { s += h(i); i += 1 }
    i = 0
    while (i < m) { h(i) /= s; i += 1 }
    h
  }

  /** scipy.signal.firwin lowpass with a hamming window (decimate's
    * default), scaled so the DC gain is exactly 1.
    */
  def firwinLowpass(numtaps: Int, cutoff: Double): Array[Double] =
    firwinLowpassW(numtaps, cutoff, hamming(numtaps))

  // ---- zpk machinery ------------------------------------------------

  /** Analog Chebyshev type-I prototype (scipy.signal.cheb1ap):
    * poles on an ellipse, no zeros, gain normalized for -rp dB at DC
    * (even order) / 0 dB (odd order).
    */
  private def cheb1ap(n: Int, rp: Double): (Array[Double], Array[Double], Double) = {
    val eps = math.sqrt(math.pow(10.0, 0.1 * rp) - 1.0)
    val mu = 1.0 / n * math.log((1.0 + math.sqrt(1 + eps * eps)) / eps) // asinh(1/eps)/n
    val pr = new Array[Double](n); val pi = new Array[Double](n)
    var k = 0
    while (k < n) {
      val theta = math.Pi * (2.0 * (k + 1) - 1.0) / (2.0 * n) // (2k-1)pi/2n, k=1..n
      pr(k) = -math.sinh(mu) * math.sin(theta)
      pi(k) = math.cosh(mu) * math.cos(theta)
      k += 1
    }
    // gain = prod(-p).real / sqrt(1+eps^2) if n even else prod(-p).real
    var gr = 1.0; var gi = 0.0
    k = 0
    while (k < n) {
      val nr = gr * (-pr(k)) - gi * (-pi(k))
      gi = gr * (-pi(k)) + gi * (-pr(k))
      gr = nr
      k += 1
    }
    val gain = if (n % 2 == 0) gr / math.sqrt(1.0 + eps * eps) else gr
    (pr, pi, gain)
  }

  /** Analog Butterworth prototype (scipy.signal.buttap). */
  private def buttap(n: Int): (Array[Double], Array[Double], Double) = {
    val pr = new Array[Double](n); val pi = new Array[Double](n)
    var k = 0
    while (k < n) {
      val theta = math.Pi * (2.0 * (k + 1) - 1.0) / (2.0 * n)
      pr(k) = -math.sin(theta)
      pi(k) = math.cos(theta)
      k += 1
    }
    (pr, pi, 1.0)
  }

  /** Digital lowpass design via prototype → lp2lp → bilinear → sos.
    * wn is the cutoff normalized to Nyquist (scipy convention).
    */
  private def designLowpassSos(proto: (Array[Double], Array[Double], Double), wn: Double): Array[Double] = {
    require(wn > 0 && wn < 1, s"Wn must be in (0,1): $wn")
    val (pr0, pi0, k0) = proto
    val n = pr0.length
    val fs = 2.0
    val warped = 2.0 * fs * math.tan(math.Pi * wn / fs)
    // lp2lp_zpk: p *= wo; k *= wo^(n - nZeros) (no zeros here)
    val pr = pr0.map(_ * warped); val pi = pi0.map(_ * warped)
    var k = k0 * math.pow(warped, n)
    // bilinear_zpk: z_d = (2fs + p) / (2fs - p); zeros at -1 (degree n);
    // k *= real(prod(2fs - p_analog)^-1) * prod(2fs - z_analog) [no zeros]
    val fs2 = 2.0 * fs
    val zr = new Array[Double](n); val zi = new Array[Double](n)
    var denR = 1.0; var denI = 0.0
    var j = 0
    while (j < n) {
      val ar = fs2 + pr(j); val ai = pi(j)      // 2fs + p
      val br = fs2 - pr(j); val bi = -pi(j)     // 2fs - p
      val d = br * br + bi * bi
      val npr = (ar * br + ai * bi) / d
      val npi = (ai * br - ar * bi) / d
      pr(j) = npr; pi(j) = npi
      zr(j) = -1.0; zi(j) = 0.0
      val nr = denR * br - denI * bi
      denI = denR * bi + denI * br
      denR = nr
      j += 1
    }
    k = k / denR // prod(2fs - p) is real for conjugate-symmetric pole sets
    zpk2sos(zr, zi, pr, pi, k)
  }

  /** scipy.signal.cheby1(N, rp, Wn, btype='low', output='sos'). */
  def cheby1Sos(n: Int, rpDb: Double, wn: Double): Array[Double] =
    designLowpassSos(cheb1ap(n, rpDb), wn)

  /** scipy.signal.butter(N, Wn, btype='low', output='sos'). */
  def butterSos(n: Int, wn: Double): Array[Double] =
    designLowpassSos(buttap(n), wn)

  /** zpk → flattened sos (n/2 sections, padded with a first-order
    * section when n is odd). Pairing: conjugate pole pairs ordered by
    * closeness to the unit circle (closest last, like scipy), each
    * paired with two zeros (all zeros are at z=-1 for our lowpass
    * designs, so pairing freedom doesn't change the cascade response).
    * Overall gain is applied to the last section (matches scipy).
    */
  def zpk2sos(zr: Array[Double], zi: Array[Double],
              pr: Array[Double], pi: Array[Double], k: Double): Array[Double] = {
    val n = pr.length
    require(zr.length <= n, "more zeros than poles not supported")
    // group conjugate pairs: sort by imag >= 0 then by |p| ascending
    val idx = (0 until n).sortBy(i => (math.abs(1.0 - math.sqrt(pr(i) * pr(i) + pi(i) * pi(i))), pr(i), math.abs(pi(i))))
    // pick pairs: walk sorted-by-distance-to-unit-circle descending so the
    // most selective sections come last (scipy order).
    val used = new Array[Boolean](n)
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (i, j) j = -1 for real single
    for (i <- idx if !used(i)) {
      used(i) = true
      if (math.abs(pi(i)) < 1e-14) {
        // real pole: try to find another unused real pole to share a section
        val j = idx.find(j => !used(j) && math.abs(pi(j)) < 1e-14)
        j match {
          case Some(jj) => used(jj) = true; pairs += ((i, jj))
          case None     => pairs += ((i, -1))
        }
      } else {
        // conjugate partner
        val j = idx.find(j => !used(j) && math.abs(pr(j) - pr(i)) < 1e-9 && math.abs(pi(j) + pi(i)) < 1e-9)
          .getOrElse(throw new IllegalStateException("unpaired complex pole"))
        used(j) = true
        pairs += ((i, j))
      }
    }
    val ns = pairs.length
    val sos = new Array[Double](ns * Filt.SOS_W)
    // distribute zeros two per section (all at -1 for lowpass; odd order
    // leaves one section with a single zero)
    var zLeft = zr.length
    var s = 0
    // sections ordered: least selective first (farthest from unit circle)
    val ordered = pairs.sortBy { case (i, j) =>
      val r2 = math.sqrt(pr(i) * pr(i) + pi(i) * pi(i))
      val rj = if (j >= 0) math.sqrt(pr(j) * pr(j) + pi(j) * pi(j)) else r2
      math.max(r2, rj)
    }
    for ((i, j) <- ordered) {
      val o = s * Filt.SOS_W
      // denominator from pole pair
      if (j >= 0) {
        sos(o + 3) = 1.0
        sos(o + 4) = -(pr(i) + pr(j))
        sos(o + 5) = pr(i) * pr(j) - pi(i) * pi(j)
      } else {
        sos(o + 3) = 1.0
        sos(o + 4) = -pr(i)
        sos(o + 5) = 0.0
      }
      // numerator: two zeros if available (else one / none)
      val nz = math.min(zLeft, if (j >= 0) 2 else 1)
      zLeft -= nz
      nz match {
        case 2 => sos(o) = 1.0; sos(o + 1) = 2.0; sos(o + 2) = 1.0 // (z+1)^2
        case 1 => sos(o) = 1.0; sos(o + 1) = 1.0; sos(o + 2) = 0.0 // (z+1)
        case _ => sos(o) = 1.0
      }
      s += 1
    }
    // apply overall gain to the last section's numerator (scipy puts it
    // on the first section; equivalent cascade — document the choice)
    val o = (ns - 1) * Filt.SOS_W
    sos(o) *= k; sos(o + 1) *= k; sos(o + 2) *= k
    sos
  }

  /** Frequency response of an sos cascade at normalized frequency
    * w (radians/sample): returns |H(e^{jw})|.
    */
  /** scipy.signal.freqz(b, a, worN, whole=False): the complex
    * frequency response of the transfer function
    * H(e^{jw}) = Σ b_j e^{-jwj} / Σ a_j e^{-jwj} at the worN points
    * w_k = π·k/worN. Returns (w, re, im).
    */
  def freqz(b: Array[Double], a: Array[Double],
            worN: Int = 512): (Array[Double], Array[Double], Array[Double]) = {
    require(worN > 0, s"freqz: need worN > 0, got $worN")
    require(b.nonEmpty && a.nonEmpty && a(0) != 0.0,
      "freqz: empty polynomial or zero leading denominator coefficient")
    val w = new Array[Double](worN)
    val re = new Array[Double](worN)
    val im = new Array[Double](worN)
    var k = 0
    while (k < worN) {
      val wk = math.Pi * k / worN
      w(k) = wk
      var nr = 0.0; var ni = 0.0; var dr = 0.0; var di = 0.0
      var j = 0
      while (j < b.length) {
        nr += b(j) * math.cos(wk * j); ni -= b(j) * math.sin(wk * j); j += 1
      }
      j = 0
      while (j < a.length) {
        dr += a(j) * math.cos(wk * j); di -= a(j) * math.sin(wk * j); j += 1
      }
      val dd = dr * dr + di * di
      re(k) = (nr * dr + ni * di) / dd
      im(k) = (ni * dr - nr * di) / dd
      k += 1
    }
    (w, re, im)
  }

  /** scipy.signal.sosfreqz: cascade response — the pointwise product
    * of each biquad section's freqz. Returns (w, re, im).
    */
  def sosfreqz(sos: Array[Double],
               worN: Int = 512): (Array[Double], Array[Double], Array[Double]) = {
    require(sos.nonEmpty && sos.length % Filt.SOS_W == 0,
      s"sosfreqz: ${sos.length} values do not form whole sos sections")
    val ns = sos.length / Filt.SOS_W
    var acc: (Array[Double], Array[Double], Array[Double]) = null
    var s = 0
    while (s < ns) {
      val o = s * Filt.SOS_W
      val sec = freqz(
        Array(sos(o), sos(o + 1), sos(o + 2)),
        Array(sos(o + 3), sos(o + 4), sos(o + 5)), worN)
      if (acc == null) acc = sec
      else {
        val (_, ar, ai) = acc
        val (_, br, bi) = sec
        var k = 0
        while (k < worN) {
          val tr = ar(k) * br(k) - ai(k) * bi(k)
          ai(k) = ar(k) * bi(k) + ai(k) * br(k)
          ar(k) = tr
          k += 1
        }
      }
      s += 1
    }
    acc
  }

  def sosFreqAbs(sos: Array[Double], w: Double): Double = {
    val ns = Filt.nSections(sos)
    val c1 = math.cos(-w); val s1 = math.sin(-w)
    val c2 = math.cos(-2 * w); val s2 = math.sin(-2 * w)
    var hr = 1.0; var hi = 0.0
    var s = 0
    while (s < ns) {
      val o = s * Filt.SOS_W
      val nr = sos(o) + sos(o + 1) * c1 + sos(o + 2) * c2
      val ni = sos(o + 1) * s1 + sos(o + 2) * s2
      val dr = sos(o + 3) + sos(o + 4) * c1 + sos(o + 5) * c2
      val di = sos(o + 4) * s1 + sos(o + 5) * s2
      val dd = dr * dr + di * di
      val qr = (nr * dr + ni * di) / dd
      val qi = (ni * dr - nr * di) / dd
      val tr = hr * qr - hi * qi
      hi = hr * qi + hi * qr
      hr = tr
      s += 1
    }
    math.sqrt(hr * hr + hi * hi)
  }
}

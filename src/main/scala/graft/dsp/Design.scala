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

  /** scipy.signal.firwin, general form: `cutoffs` are the normalized
    * band edges in (0, 1), `passZero` says whether DC is inside a
    * passband — together spanning lowpass (one edge, passZero),
    * highpass (one edge, !passZero), bandpass (two edges, !passZero),
    * bandstop (two edges, passZero). Construction is scipy's band
    * sum: h[x] = Σ_bands (r·sinc(r·x) − l·sinc(l·x)) windowed, then
    * scaled to unit response at the first passband's reference
    * frequency (DC if the band starts at 0, Nyquist if it ends at 1,
    * else the band center — scipy's scale rule). A Nyquist passband
    * (highpass/bandstop) needs ODD numtaps, scipy's own error.
    */
  def firwin(numtaps: Int, cutoffs: Array[Double], passZero: Boolean = true,
             window: Array[Double] = null): Array[Double] = {
    require(numtaps > 0, s"firwin: numtaps must be positive, got $numtaps")
    require(cutoffs.nonEmpty && cutoffs.forall(c => c > 0 && c < 1) &&
      cutoffs.zip(cutoffs.drop(1)).forall { case (a, b) => a < b },
      s"firwin: cutoffs must be strictly increasing in (0,1): ${cutoffs.mkString(",")}")
    val w = if (window == null) hamming(numtaps) else window
    require(w.length == numtaps, s"window length ${w.length} != numtaps $numtaps")
    val edges0 = if (passZero) 0.0 +: cutoffs.toVector else cutoffs.toVector
    val edges = if (edges0.length % 2 == 1) edges0 :+ 1.0 else edges0
    require(edges.last != 1.0 || numtaps % 2 == 1,
      "firwin: a Nyquist passband (highpass/bandstop) needs odd numtaps")
    val alpha = 0.5 * (numtaps - 1)
    val h = new Array[Double](numtaps)
    edges.grouped(2).foreach { b =>
      val l = b(0); val r = b(1)
      var i = 0
      while (i < numtaps) {
        val x = i - alpha
        h(i) += r * sinc(r * x) - l * sinc(l * x)
        i += 1
      }
    }
    var i = 0
    while (i < numtaps) { h(i) *= w(i); i += 1 }
    val fs =
      if (edges(0) == 0.0) 0.0
      else if (edges(1) == 1.0) 1.0
      else 0.5 * (edges(0) + edges(1))
    var g = 0.0
    i = 0
    while (i < numtaps) { g += h(i) * math.cos(math.Pi * fs * (i - alpha)); i += 1 }
    i = 0
    while (i < numtaps) { h(i) /= g; i += 1 }
    h
  }

  def firwinHighpass(numtaps: Int, cutoff: Double): Array[Double] =
    firwin(numtaps, Array(cutoff), passZero = false)

  def firwinBandpass(numtaps: Int, f1: Double, f2: Double): Array[Double] =
    firwin(numtaps, Array(f1, f2), passZero = false)

  def firwinBandstop(numtaps: Int, f1: Double, f2: Double): Array[Double] =
    firwin(numtaps, Array(f1, f2), passZero = true)

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

  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))

  /** Re(prod(-x)) / conj-symmetric complex product of negated roots. */
  private def prodNegReal(xr: Array[Double], xi: Array[Double]): Double = {
    var gr = 1.0; var gi = 0.0
    var k = 0
    while (k < xr.length) {
      val nr = gr * (-xr(k)) - gi * (-xi(k))
      gi = gr * (-xi(k)) + gi * (-xr(k))
      gr = nr
      k += 1
    }
    gr
  }

  /** Analog Chebyshev type-II (inverse Chebyshev) prototype
    * (scipy.signal.cheb2ap): maximally-flat passband, equiripple
    * stopband with attenuation rs dB; purely-imaginary zeros at
    * 1/sin(mπ/2n), poles the inverted type-I pole set. The stopband
    * EDGE sits at ω = 1 (scipy's Wn convention for cheby2).
    */
  private def cheb2ap(n: Int, rs: Double): (Array[Double], Array[Double], Array[Double], Array[Double], Double) = {
    val de = 1.0 / math.sqrt(math.pow(10.0, 0.1 * rs) - 1.0)
    val mu = asinh(1.0 / de) / n
    // index set m = odd integers in (-n, n), skipping 0's slot when n
    // is odd (the real pole has no finite zero partner)
    val full = (-n + 1) until n by 2
    val zIdx = if (n % 2 == 1) full.filter(_ != 0) else full
    val zr = Array.fill(zIdx.length)(0.0)
    val zi = zIdx.map(m => 1.0 / math.sin(m * math.Pi / (2.0 * n))).toArray
    val pr = new Array[Double](n); val pi = new Array[Double](n)
    for ((m, k) <- full.zipWithIndex) {
      // p = 1 / (sinh(mu)·Re(-e^{jθ}) + j·cosh(mu)·Im(-e^{jθ}))
      val theta = math.Pi * m / (2.0 * n)
      val ar = -math.sinh(mu) * math.cos(theta)
      val ai = -math.cosh(mu) * math.sin(theta)
      val d = ar * ar + ai * ai
      pr(k) = ar / d; pi(k) = -ai / d
    }
    val k0 = prodNegReal(pr, pi) / prodNegReal(zr, zi)
    (zr, zi, pr, pi, k0)
  }

  // ---- elliptic machinery (AGM / Landen; Abramowitz & Stegun 16-17) --

  /** Complete elliptic integral K(m), parameter m = k² (AGM). */
  def ellipK(m: Double): Double = {
    require(m >= 0 && m < 1, s"ellipK: m in [0,1): $m")
    var a = 1.0; var b = math.sqrt(1.0 - m)
    var it = 0
    while (math.abs(a - b) > 1e-16 * a && it < 60) {
      val an = 0.5 * (a + b)
      b = math.sqrt(a * b)
      a = an
      it += 1
    }
    math.Pi / (2.0 * a)
  }

  /** Jacobi elliptic sn/cn/dn(u | m) via the AGM descending ladder. */
  def ellipj(u: Double, m: Double): (Double, Double, Double) = {
    require(m >= 0 && m <= 1, s"ellipj: m in [0,1]: $m")
    if (m < 1e-16) return (math.sin(u), math.cos(u), 1.0)
    if (m > 1.0 - 1e-16) {
      val sech = 1.0 / math.cosh(u)
      return (math.tanh(u), sech, sech)
    }
    val a = new Array[Double](32); val c = new Array[Double](32)
    a(0) = 1.0; c(0) = math.sqrt(m)
    var b = math.sqrt(1.0 - m)
    var i = 0
    while (math.abs(c(i)) > 1e-16 * math.abs(a(i)) && i < 30) {
      val an = 0.5 * (a(i) + b)
      c(i + 1) = 0.5 * (a(i) - b)
      b = math.sqrt(a(i) * b)
      a(i + 1) = an
      i += 1
    }
    var phi = math.pow(2.0, i.toDouble) * a(i) * u
    var j = i
    while (j > 0) {
      phi = 0.5 * (phi + math.asin(math.max(-1.0, math.min(1.0,
        c(j) * math.sin(phi) / a(j)))))
      j -= 1
    }
    val sn = math.sin(phi); val cn = math.cos(phi)
    val dn = math.sqrt(math.max(0.0, 1.0 - m * sn * sn))
    (sn, cn, dn)
  }

  /** Solve the elliptic-filter degree equation for the pole modulus m
    * given the order and the (squared) stopband modulus m1 (scipy
    * _ellipdeg: nome expansion with MMAX=7 terms).
    */
  private[dsp] def ellipdeg(n: Int, m1: Double): Double = {
    val k1 = ellipK(m1); val k1p = ellipK(1.0 - m1)
    val q1 = math.exp(-math.Pi * k1p / k1)
    val q = math.pow(q1, 1.0 / n)
    var num = 0.0; var den = 1.0
    var i = 0
    while (i <= 7) {
      num += math.pow(q, (i * (i + 1)).toDouble)
      den += 2.0 * math.pow(q, ((i + 1) * (i + 1)).toDouble)
      i += 1
    }
    16.0 * q * math.pow(num / den, 4.0)
  }

  /** Real inverse Jacobi sc with complementary modulus: solve
    * sc(z, 1-m) = w (scipy _arc_jac_sc1). The underlying inverse-sn
    * Landen ladder stays purely imaginary for the j·w argument, so the
    * iteration tracks only the imaginary part.
    */
  private def arcJacSc1(w: Double, m: Double): Double = {
    val k = math.sqrt(m)
    require(k < 1, s"arcJacSc1: modulus >= 1")
    val ks = scala.collection.mutable.ArrayBuffer(k)
    var it = 0
    while (ks.last != 0.0) {
      val kp = math.sqrt((1.0 - ks.last) * (1.0 + ks.last))
      ks += (1.0 - kp) / (1.0 + kp)
      it += 1
      require(it < 60, "arcJacSc1: Landen ladder not converging")
    }
    var bigK = math.Pi / 2.0
    for (kn <- ks.drop(1)) bigK *= (1.0 + kn)
    // wn ladder on the imaginary part: complement(kn·jt) = sqrt(1+kn²t²)
    var t = w
    var i = 0
    while (i < ks.length - 1) {
      val kn = ks(i); val knext = ks(i + 1)
      t = 2.0 * t / ((1.0 + knext) * (1.0 + math.sqrt(1.0 + kn * kn * t * t)))
      i += 1
    }
    bigK * (2.0 / math.Pi) * asinh(t)
  }

  /** Analog elliptic (Cauer) prototype (scipy.signal.ellipap):
    * equiripple in BOTH bands — rp dB passband ripple, rs dB stopband
    * floor, the steepest possible transition at a given order.
    */
  private def ellipap(n: Int, rp: Double, rs: Double): (Array[Double], Array[Double], Array[Double], Array[Double], Double) = {
    require(n >= 1, "ellipap: order >= 1")
    val epsSq = math.pow(10.0, 0.1 * rp) - 1.0
    if (n == 1) {
      val p = -math.sqrt(1.0 / epsSq)
      return (new Array[Double](0), new Array[Double](0),
        Array(p), Array(0.0), -p)
    }
    val eps = math.sqrt(epsSq)
    val ck1Sq = epsSq / (math.pow(10.0, 0.1 * rs) - 1.0)
    require(ck1Sq > 0, "ellipap: rs must exceed rp")
    val bigK1 = ellipK(ck1Sq)
    val m = ellipdeg(n, ck1Sq)
    val capk = ellipK(m)
    val js = ((1 - n % 2) until n by 2).toArray
    val sn = new Array[Double](js.length)
    val cn = new Array[Double](js.length)
    val dn = new Array[Double](js.length)
    for ((j, idx) <- js.zipWithIndex) {
      val (s, c, d) = ellipj(j * capk / n, m)
      sn(idx) = s; cn(idx) = c; dn(idx) = d
    }
    // zeros: ±j / (sqrt(m)·sn) for the nonzero sn entries
    val zBase = sn.filter(math.abs(_) > 1e-13).map(s => 1.0 / (math.sqrt(m) * s))
    val zr = Array.fill(zBase.length * 2)(0.0)
    val zi = zBase ++ zBase.map(-_)
    // poles
    val r = arcJacSc1(1.0 / eps, ck1Sq)
    val v0 = capk * r / (n * bigK1)
    val (sv, cv, dv) = ellipj(v0, 1.0 - m)
    val prB = new Array[Double](js.length)
    val piB = new Array[Double](js.length)
    for (idx <- js.indices) {
      val d = 1.0 - (dn(idx) * sv) * (dn(idx) * sv)
      prB(idx) = -(cn(idx) * dn(idx) * sv * cv) / d
      piB(idx) = -(sn(idx) * dv) / d
    }
    // conjugate completion: even order duplicates all; odd order keeps
    // the real pole (the j=0 slot) single
    val keep = prB.indices.filter(idx =>
      math.abs(piB(idx)) > 1e-13 * math.sqrt(prB.map(x => x * x).sum + piB.map(x => x * x).sum))
    val pr = prB ++ keep.map(prB(_))
    val pi = piB ++ keep.map(-piB(_))
    var k0 = prodNegReal(pr, pi) / prodNegReal(zr, zi)
    if (n % 2 == 0) k0 /= math.sqrt(1.0 + epsSq)
    (zr, zi, pr, pi, k0)
  }

  /** Digital lowpass design via prototype → lp2lp → bilinear → sos.
    * wn is the cutoff normalized to Nyquist (scipy convention).
    */
  private def designLowpassSos(proto: (Array[Double], Array[Double], Double), wn: Double): Array[Double] = {
    val (pr0, pi0, k0) = proto
    designLowpassSosZpk(new Array[Double](0), new Array[Double](0),
      pr0, pi0, k0, wn)
  }

  /** The general prototype→digital path (scipy lp2lp_zpk + bilinear_zpk
    * + zpk2sos) for prototypes WITH finite zeros (cheby2, elliptic).
    * The all-pole designs delegate here with an empty zero set.
    */
  private def designLowpassSosZpk(
      zr0: Array[Double], zi0: Array[Double],
      pr0: Array[Double], pi0: Array[Double],
      k0: Double, wn: Double): Array[Double] = {
    require(wn > 0 && wn < 1, s"Wn must be in (0,1): $wn")
    val np = pr0.length; val nz = zr0.length
    require(nz <= np, "improper prototype (more zeros than poles)")
    val fs = 2.0
    val warped = 2.0 * fs * math.tan(math.Pi * wn / fs)
    // lp2lp_zpk: z *= wo; p *= wo; k *= wo^(np - nz)
    val zr = zr0.map(_ * warped); val zi = zi0.map(_ * warped)
    val pr = pr0.map(_ * warped); val pi = pi0.map(_ * warped)
    var k = k0 * math.pow(warped, (np - nz).toDouble)
    // bilinear_zpk: x_d = (2fs + x) / (2fs - x) for zeros and poles;
    // the (np - nz) excess poles pull in digital zeros at -1;
    // k *= real(prod(2fs - z) / prod(2fs - p))
    val fs2 = 2.0 * fs
    def mapBilinear(xr: Array[Double], xi: Array[Double]): (Double, Double) = {
      // maps in place, returns the complex product prod(2fs - x)
      var prodR = 1.0; var prodI = 0.0
      var j = 0
      while (j < xr.length) {
        val ar = fs2 + xr(j); val ai = xi(j)      // 2fs + x
        val br = fs2 - xr(j); val bi = -xi(j)     // 2fs - x
        val d = br * br + bi * bi
        xr(j) = (ar * br + ai * bi) / d
        xi(j) = (ai * br - ar * bi) / d
        val nr = prodR * br - prodI * bi
        prodI = prodR * bi + prodI * br
        prodR = nr
        j += 1
      }
      (prodR, prodI)
    }
    val (numR, numI) = mapBilinear(zr, zi)
    val (denR, denI) = mapBilinear(pr, pi)
    // both products are real for conjugate-symmetric sets
    require(math.abs(numI) <= 1e-9 * math.abs(numR) + 1e-12 &&
      math.abs(denI) <= 1e-9 * math.abs(denR) + 1e-12,
      "non-conjugate-symmetric prototype")
    k = k * numR / denR
    val zrD = zr ++ Array.fill(np - nz)(-1.0)
    val ziD = zi ++ Array.fill(np - nz)(0.0)
    zpk2sos(zrD, ziD, pr, pi, k)
  }

  /** scipy.signal.remez (Parks-McClellan) restricted to type-I linear
    * phase (ODD numtaps, symmetric taps) — the optimal-Chebyshev FIR
    * design: minimize the maximum weighted error over the specified
    * bands; the optimum equioscillates over M+2 extremal frequencies
    * (alternation theorem), which is exactly what DesignSpec pins.
    *
    * Conventions match scipy: `bands` are edge pairs on the fs=1 axis
    * (so [0, 0.5] is the full range), `desired` is one gain per band,
    * `weight` one relative weight per band. Implementation is the
    * textbook McClellan-Parks-Rabiner exchange: dense cosine-domain
    * grid, barycentric-Lagrange evaluation of the degree-M Chebyshev
    * interpolant, extremal exchange until the ripple stops growing.
    * Driver-side design (bounded: grid size ≈ 16·(M+2) per band) —
    * taps then travel into kernels as literals like every other design.
    */
  def remez(numtaps: Int, bands: Array[Double], desired: Array[Double],
            weight: Array[Double] = Array.empty,
            maxiter: Int = 40): Array[Double] = {
    require(numtaps >= 3 && numtaps % 2 == 1,
      s"remez: type-I design needs odd numtaps >= 3, got $numtaps")
    require(bands.length >= 4 && bands.length % 2 == 0,
      "remez: bands must be edge pairs [f0lo, f0hi, f1lo, f1hi, ...]")
    val nBands = bands.length / 2
    require(desired.length == nBands, "remez: one desired gain per band")
    val w = if (weight.isEmpty) Array.fill(nBands)(1.0) else weight
    require(w.length == nBands && w.forall(_ > 0), "remez: bad weights")
    // strictly increasing: a shared edge (zero-width transition band)
    // puts duplicate cos-domain abscissae on the dense grid, and if
    // both duplicates are ever selected as extremals the barycentric
    // weights divide by zero and every tap comes back NaN (ADVICE r10)
    require(bands.forall(f => f >= 0 && f <= 0.5) &&
      bands.sliding(2).forall(p => p(0) < p(1)),
      "remez: band edges must be strictly increasing in [0, 0.5] " +
        "(nonzero band widths and nonzero transition bands)")
    val mOrd = (numtaps - 1) / 2
    val r = mOrd + 2 // extremal count (alternation theorem)
    // dense grid: ~16 points per extremal, spread across the bands
    val gridF = {
      val delta = 0.5 / (16.0 * r)
      val buf = scala.collection.mutable.ArrayBuffer[ (Double, Int) ]()
      for (b <- 0 until nBands) {
        val (lo, hi) = (bands(2 * b), bands(2 * b + 1))
        val n = math.max(2, math.ceil((hi - lo) / delta).toInt + 1)
        for (i <- 0 until n) buf += ((lo + (hi - lo) * i / (n - 1), b))
      }
      buf.toArray
    }
    val nGrid = gridF.length
    val gx = gridF.map { case (f, _) => math.cos(2.0 * math.Pi * f) }
    val gd = gridF.map { case (_, b) => desired(b) }
    val gw = gridF.map { case (_, b) => w(b) }
    // initial extremals: equally spaced grid indices
    var ext = Array.tabulate(r)(k => (k.toDouble * (nGrid - 1) / (r - 1)).toInt)
    var taps: Array[Double] = null
    var lastDelta = 0.0
    var it = 0
    var converged = false
    while (it < maxiter && !converged) {
      val x = ext.map(gx)
      val d = ext.map(gd)
      val wt = ext.map(gw)
      // barycentric weights over ALL r extremal abscissae
      val gam = Array.tabulate(r) { k =>
        var p = 1.0
        for (j <- 0 until r if j != k) p *= (x(k) - x(j))
        1.0 / p
      }
      var num = 0.0
      var den = 0.0
      for (k <- 0 until r) {
        num += gam(k) * d(k)
        den += gam(k) * (if (k % 2 == 0) 1.0 else -1.0) / wt(k)
      }
      val delta = num / den
      // interpolate through the first r-1 points at the shifted values
      val nI = r - 1
      val cy = Array.tabulate(nI)(k =>
        d(k) - (if (k % 2 == 0) 1.0 else -1.0) * delta / wt(k))
      val beta = Array.tabulate(nI) { k =>
        var p = 1.0
        for (j <- 0 until nI if j != k) p *= (x(k) - x(j))
        1.0 / p
      }
      def aOf(xx: Double): Double = {
        // exact hit → nodal value (barycentric singularity)
        var hit = -1
        var k = 0
        while (k < nI && hit < 0) { if (xx == x(k)) hit = k; k += 1 }
        if (hit >= 0) cy(hit)
        else {
          var nn = 0.0
          var dd = 0.0
          for (j <- 0 until nI) {
            val t = beta(j) / (xx - x(j))
            nn += t * cy(j)
            dd += t
          }
          nn / dd
        }
      }
      // weighted error on the whole grid
      val err = Array.tabulate(nGrid)(i => gw(i) * (aOf(gx(i)) - gd(i)))
      // candidate extrema: alternation-filtered local maxima of |err|
      val cand = scala.collection.mutable.ArrayBuffer[Int]()
      for (i <- 0 until nGrid) {
        val isEnd = i == 0 || i == nGrid - 1 ||
          gridF(i)._2 != gridF(i - 1)._2 || gridF(i)._2 != gridF(i + 1)._2
        val localMax =
          (isEnd || math.abs(err(i)) >= math.abs(err(i - 1))) &&
          (isEnd || math.abs(err(i)) >= math.abs(err(i + 1)))
        if (localMax &&
            (i == 0 || i == nGrid - 1 || gridF(i)._2 != gridF(i - 1)._2 ||
             gridF(i)._2 != gridF(i + 1)._2 ||
             math.abs(err(i)) > math.abs(err(i - 1)) ||
             math.abs(err(i)) > math.abs(err(i + 1))))
          cand += i
      }
      // enforce sign alternation: among same-sign runs keep the largest
      val alt = scala.collection.mutable.ArrayBuffer[Int]()
      for (i <- cand) {
        if (alt.isEmpty) alt += i
        else if (math.signum(err(i)) == math.signum(err(alt.last))) {
          if (math.abs(err(i)) > math.abs(err(alt.last))) alt(alt.length - 1) = i
        } else alt += i
      }
      // trim to r keeping the largest ripples at the ends
      while (alt.length > r) {
        if (math.abs(err(alt.head)) < math.abs(err(alt.last))) alt.remove(0)
        else alt.remove(alt.length - 1)
      }
      if (alt.length < r) {
        // degenerate exchange (flat error) — keep previous extremals
        converged = true
      } else {
        val next = alt.toArray
        converged = next.sameElements(ext) ||
          (it > 0 && math.abs(math.abs(delta) - math.abs(lastDelta)) <
            1e-12 * math.max(1.0, math.abs(delta)))
        ext = next
      }
      lastDelta = delta
      // reconstruct type-I taps from A(f) samples at N points
      val nT = numtaps
      val a0 = aOf(1.0) // f = 0
      taps = Array.tabulate(nT) { n =>
        var s = a0
        for (j <- 1 to mOrd) {
          val fj = j.toDouble / nT
          s += 2.0 * aOf(math.cos(2.0 * math.Pi * fj)) *
            math.cos(2.0 * math.Pi * fj * (n - mOrd))
        }
        s / nT
      }
      it += 1
    }
    taps
  }

  /** scipy.signal.iirnotch(w0, Q) — second-order notch on the fs=2
    * convention (w0 ∈ (0,1), 1 = Nyquist): zeros ON the unit circle at
    * ±w0 (exact null), poles pulled inside by the −3 dB bandwidth
    * w0/Q through the bilinear tan mapping, so |H| = 1/√2 exactly at
    * the band edges (scipy's beta = tan(bw/2) construction). Returns
    * (b, a), a(0) = 1.
    */
  def iirnotch(w0: Double, q: Double): (Array[Double], Array[Double]) =
    notchPeak(w0, q, peak = false)

  /** scipy.signal.iirpeak(w0, Q) — the complementary resonator: unit
    * gain at w0, zeros at DC and Nyquist, same −3 dB bandwidth rule.
    */
  def iirpeak(w0: Double, q: Double): (Array[Double], Array[Double]) =
    notchPeak(w0, q, peak = true)

  private def notchPeak(w0: Double, q: Double,
                        peak: Boolean): (Array[Double], Array[Double]) = {
    require(w0 > 0 && w0 < 1, s"w0 must be in (0, 1), got $w0")
    require(q > 0, s"Q must be positive, got $q")
    val om = w0 * math.Pi
    val beta = math.tan(om / q / 2.0)
    val gain = 1.0 / (1.0 + beta)
    val b =
      if (peak) Array(1.0 - gain, 0.0, -(1.0 - gain))
      else Array(gain, -2.0 * gain * math.cos(om), gain)
    val a = Array(1.0, -2.0 * gain * math.cos(om), 2.0 * gain - 1.0)
    (b, a)
  }

  /** (b, a) biquad → the flattened one-section sos layout the sosfilt
    * family consumes ([b0 b1 b2 a0 a1 a2], a0 = 1). */
  def baToSos(ba: (Array[Double], Array[Double])): Array[Double] = {
    val (b, a) = ba
    require(b.length == 3 && a.length == 3 && a(0) == 1.0,
      "baToSos expects a normalized biquad")
    Array(b(0), b(1), b(2), a(0), a(1), a(2))
  }

  /** scipy.signal.cheby1(N, rp, Wn, btype='low', output='sos'). */
  def cheby1Sos(n: Int, rpDb: Double, wn: Double): Array[Double] =
    designLowpassSos(cheb1ap(n, rpDb), wn)

  /** scipy.signal.butter(N, Wn, btype='low', output='sos'). */
  def butterSos(n: Int, wn: Double): Array[Double] =
    designLowpassSos(buttap(n), wn)

  /** scipy.signal.cheby2(N, rs, Wn, btype='low', output='sos').
    * NOTE scipy's convention: Wn is the STOPBAND edge — the lowest
    * frequency where the attenuation first reaches rs dB.
    */
  def cheby2Sos(n: Int, rsDb: Double, wn: Double): Array[Double] = {
    val (zr, zi, pr, pi, k) = cheb2ap(n, rsDb)
    designLowpassSosZpk(zr, zi, pr, pi, k, wn)
  }

  /** scipy.signal.ellip(N, rp, rs, Wn, btype='low', output='sos').
    * Wn is the PASSBAND edge (last frequency where |H| ≥ -rp dB).
    */
  def ellipSos(n: Int, rpDb: Double, rsDb: Double, wn: Double): Array[Double] = {
    val (zr, zi, pr, pi, k) = ellipap(n, rpDb, rsDb)
    designLowpassSosZpk(zr, zi, pr, pi, k, wn)
  }

  /** zpk → flattened sos (n/2 sections, padded with a first-order
    * section when n is odd). Pairing: conjugate pole pairs ordered by
    * closeness to the unit circle (closest last, like scipy); zeros are
    * grouped into conjugate pairs / reals and distributed one group per
    * section (real zeros reserved first for single-pole sections — a
    * degree-2 numerator can't sit over a degree-1 denominator). The
    * CASCADE response is pairing-invariant, which is what the freqz
    * specs pin; scipy's exact section-by-section grouping is not
    * reproduced. Overall gain lands on the last (most selective)
    * section.
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
    // group zeros: conjugate pairs and reals
    val zUsed = new Array[Boolean](zr.length)
    val zPairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val zReals = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- zr.indices if !zUsed(i)) {
      zUsed(i) = true
      if (math.abs(zi(i)) < 1e-14) zReals += i
      else {
        val j = zr.indices.find(j => !zUsed(j) &&
          math.abs(zr(j) - zr(i)) < 1e-9 && math.abs(zi(j) + zi(i)) < 1e-9)
          .getOrElse(throw new IllegalStateException("unpaired complex zero"))
        zUsed(j) = true
        zPairs += ((i, j))
      }
    }
    var s = 0
    // sections ordered: least selective first (farthest from unit circle)
    val ordered = pairs.sortBy { case (i, j) =>
      val r2 = math.sqrt(pr(i) * pr(i) + pi(i) * pi(i))
      val rj = if (j >= 0) math.sqrt(pr(j) * pr(j) + pi(j) * pi(j)) else r2
      math.max(r2, rj)
    }
    for (((i, j), secIdx) <- ordered.zipWithIndex) {
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
      // numerator from the next zero group that fits this section
      if (j < 0) {
        // single real pole: at most one real zero
        if (zReals.nonEmpty) {
          val a = zr(zReals.remove(0))
          sos(o) = 1.0; sos(o + 1) = -a; sos(o + 2) = 0.0
        } else sos(o) = 1.0
      } else {
        // 2-pole section, but keep enough reals back for the remaining
        // single-pole sections downstream of this one (cheby2/ellip
        // odd order: the bilinear fill zero at -1 must land on the one
        // real-pole section)
        val singlesLeft = ordered.drop(secIdx + 1).count(_._2 < 0)
        val spareReals = zReals.length - singlesLeft
        if (zPairs.nonEmpty) {
          val (a, b) = zPairs.remove(0)
          sos(o) = 1.0
          sos(o + 1) = -(zr(a) + zr(b))
          sos(o + 2) = zr(a) * zr(b) - zi(a) * zi(b)
        } else if (spareReals >= 2) {
          val a = zr(zReals.remove(0)); val b = zr(zReals.remove(0))
          sos(o) = 1.0; sos(o + 1) = -(a + b); sos(o + 2) = a * b
        } else if (spareReals == 1) {
          val a = zr(zReals.remove(0))
          sos(o) = 1.0; sos(o + 1) = -a; sos(o + 2) = 0.0
        } else sos(o) = 1.0
      }
      s += 1
    }
    require(zPairs.isEmpty && zReals.isEmpty,
      "zpk2sos: zeros left unassigned (zero units exceed section capacity)")
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

  /** scipy.signal.group_delay((b, a), w=πk/worN): τ(w) = -dφ/dw in
    * samples, via the ramped-polynomial identity scipy uses —
    * c = b ∗ reverse(a), τ = Re(C'(e^{jw})/C(e^{jw})) − (len(a)−1)
    * where C' has coefficients n·c_n. Singular points (|C| ≈ 0, a
    * response zero ON the unit circle) yield 0, scipy's convention.
    */
  def groupDelay(b: Array[Double], a: Array[Double],
                 worN: Int = 512): (Array[Double], Array[Double]) = {
    require(worN > 0, s"groupDelay: need worN > 0, got $worN")
    require(b.nonEmpty && a.nonEmpty && a(0) != 0.0,
      "groupDelay: empty polynomial or zero leading denominator coefficient")
    // c = convolve(b, a reversed): the single polynomial whose phase
    // slope is the full transfer function's (denominator phase enters
    // negated, hence the reversal and the -(len(a)-1) shift)
    val ar = a.reverse
    val c = new Array[Double](b.length + a.length - 1)
    var i = 0
    while (i < b.length) {
      var j = 0
      while (j < ar.length) { c(i + j) += b(i) * ar(j); j += 1 }
      i += 1
    }
    val w = new Array[Double](worN)
    val gd = new Array[Double](worN)
    var k = 0
    while (k < worN) {
      val wk = math.Pi * k / worN
      w(k) = wk
      var dr = 0.0; var di = 0.0; var nr = 0.0; var ni = 0.0
      var n = 0
      while (n < c.length) {
        val cs = math.cos(wk * n); val sn = -math.sin(wk * n)
        dr += c(n) * cs; di += c(n) * sn
        nr += n * c(n) * cs; ni += n * c(n) * sn
        n += 1
      }
      val dd = dr * dr + di * di
      gd(k) =
        if (dd <= 1e-300) 0.0 // singular: zero on the unit circle
        else (nr * dr + ni * di) / dd - (a.length - 1).toDouble
      k += 1
    }
    (w, gd)
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

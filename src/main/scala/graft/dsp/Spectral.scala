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

  /** scipy.signal.detrend with BREAKPOINTS (`bp`): the fit applies
    * independently to each segment [bp_i, bp_{i+1}) of the implicit
    * 0..n axis (scipy sorts, dedups, clips and brackets the list with
    * 0 and n). Each segment reuses the single-segment kernel, so the
    * per-segment arithmetic is bit-identical to [[detrend]].
    */
  def detrendBp(x: Array[Double], typ: String, bp: Array[Int]): Array[Double] = {
    val n = x.length
    val pts = (bp.filter(b => b > 0 && b < n).distinct.sorted
      .prepended(0).appended(n))
    val out = new Array[Double](n)
    var s = 0
    while (s < pts.length - 1) {
      val lo = pts(s); val hi = pts(s + 1)
      if (hi > lo) {
        val seg = detrend(java.util.Arrays.copyOfRange(x, lo, hi), typ)
        System.arraycopy(seg, 0, out, lo, hi - lo)
      }
      s += 1
    }
    out
  }

  /** scipy.signal.zoom_fft: the spectrum evaluated on m points of the
    * band [f1, f2) only (endpoint=false, scipy's default — pass true
    * for the inclusive grid). Direct O(n·m) evaluation: zoom bands are
    * small by construction (that is the point of zooming — m ≪ n/2),
    * so the chirp-z O((n+m) log) machinery buys nothing at kernel
    * sizes and the direct sum keeps the oracle replayable term by
    * term. Matches czt/zoom_fft values exactly in exact arithmetic.
    */
  /** scipy.signal.czt: the chirp-z transform on the general spiral
    * contour z_k = a·w^{−k}, k = 0..m−1 — X[k] = Σ_n x[n]·a^{−n}·w^{kn}
    * with a and w in polar form (mod, phase). With a=1, wMod=1,
    * wPhi=−2π/m this IS the DFT; |w| ≠ 1 spirals the contour in/out of
    * the unit circle (the case [[zoomDft]]'s unit-circle band can't
    * express). Direct O(n·m) term evaluation for the same reason as
    * zoomDft: czt sizes are small by construction and the term sum is
    * what a SQL oracle can replay — Bluestein O((n+m)log) buys nothing
    * at kernel sizes (it IS available in dsp.Fft for plain FFT sizes).
    */
  def czt(x: Array[Double], m: Int, wMod: Double, wPhi: Double,
          aMod: Double, aPhi: Double): Fft.C = {
    require(m > 0, s"czt: m must be positive, got $m")
    require(wMod > 0 && aMod > 0,
      s"czt: |w| and |a| must be positive, got $wMod, $aMod")
    val n = x.length
    val lnW = math.log(wMod)
    val lnA = math.log(aMod)
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    var k = 0
    while (k < m) {
      var sr = 0.0
      var si = 0.0
      var j = 0
      while (j < n) {
        // a^{−j}·w^{jk}: magnitude exp(−j·ln|a| + j·k·ln|w|),
        // angle −j·arg(a) + j·k·arg(w)
        val mag = math.exp(-j * lnA + j.toDouble * k * lnW)
        val ang = -j * aPhi + j.toDouble * k * wPhi
        sr += x(j) * mag * math.cos(ang)
        si += x(j) * mag * math.sin(ang)
        j += 1
      }
      re(k) = sr
      im(k) = si
      k += 1
    }
    Fft.C(re, im)
  }

  def zoomDft(x: Array[Double], f1: Double, f2: Double, m: Int,
              fs: Double, endpoint: Boolean = false): Fft.C = {
    require(m > 0, s"zoomDft: m must be positive, got $m")
    require(fs > 0, s"zoomDft: fs must be positive, got $fs")
    require(f2 >= f1, s"zoomDft: need f2 >= f1, got [$f1, $f2]")
    val n = x.length
    val step = if (m == 1) 0.0 else (f2 - f1) / (if (endpoint) m - 1 else m)
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    var k = 0
    while (k < m) {
      val fk = f1 + k * step
      var sr = 0.0
      var si = 0.0
      var j = 0
      while (j < n) {
        val ang = -2.0 * math.Pi * fk * j / fs
        sr += x(j) * math.cos(ang)
        si += x(j) * math.sin(ang)
        j += 1
      }
      re(k) = sr
      im(k) = si
      k += 1
    }
    Fft.C(re, im)
  }

  /** Partial Welch accumulator for ONE chunk of a long series: the
    * unscaled Σ|rfft(segment)|² over every hop-aligned segment whose
    * START lies in this chunk's span, plus the segment count prepended
    * (out(0) = count, out(1+b) = power sum for bin b). `vals` holds
    * samples [chunkStart, chunkStart + vals.length); a forward halo of
    * nperseg−1 samples lets edge segments complete, and the
    * vals-length guard drops series-tail segments exactly like the
    * whole-series kernel's `st + nperseg <= n`. Summing these partials
    * across chunks and scaling by 1/(fs·Σw²·count) reproduces
    * [[welch]] up to float association — the distributed path for
    * series that do not fit one task.
    */
  def welchPartial(vals: Array[Double], chunkStart: Long, span: Int,
                   nperseg: Int, hop: Int, wts: Array[Double],
                   demean: Boolean): Array[Double] = {
    require(nperseg > 0 && hop > 0 && hop <= nperseg,
      s"welchPartial: need 0 < hop <= nperseg, got hop=$hop nperseg=$nperseg")
    require(wts.length == nperseg,
      s"welchPartial: window length ${wts.length} != nperseg $nperseg")
    val nb = nperseg / 2 + 1
    val out = new Array[Double](nb + 1)
    val seg = new Array[Double](nperseg)
    // first hop-aligned start at or after chunkStart
    var st = ((chunkStart + hop - 1) / hop) * hop
    while (st < chunkStart + span &&
           st - chunkStart + nperseg <= vals.length) {
      val local = (st - chunkStart).toInt
      var m = 0.0
      var i = 0
      if (demean) {
        while (i < nperseg) { m += vals(local + i); i += 1 }
        m /= nperseg
      }
      i = 0
      while (i < nperseg) { seg(i) = (vals(local + i) - m) * wts(i); i += 1 }
      val sp = Fft.rfft(seg)
      var b = 0
      while (b < nb) { out(1 + b) += sp.re(b) * sp.re(b) + sp.im(b) * sp.im(b); b += 1 }
      out(0) += 1.0
      st += hop
    }
    out
  }

  /** scipy.signal.csd (onesided, density scaling): cross power
    * spectral density Pxy via Welch's method — per segment, conj(X)·Y
    * of the demeaned+tapered rffts, averaged across segments, scaled
    * by 1/(fs·Σw²) with non-DC/non-Nyquist bins doubled (the same
    * scaling [[welch]] applies; scipy's _spectral_helper is shared by
    * both, csd(x, x) == welch(x) exactly). Segment placement is
    * identical to [[welch]]/STFT. Returns (re, im) arrays of
    * nperseg/2+1 bins.
    */
  def csd(x: Array[Double], y: Array[Double], nperseg: Int, hop: Int,
          wts: Array[Double], fs: Double, demean: Boolean = true): Fft.C = {
    require(x.length == y.length,
      s"csd: series lengths differ (${x.length} vs ${y.length})")
    require(nperseg > 0 && hop > 0 && hop <= nperseg,
      s"csd: need 0 < hop <= nperseg, got hop=$hop nperseg=$nperseg")
    require(wts.length == nperseg,
      s"csd: window length ${wts.length} != nperseg $nperseg")
    require(fs > 0, s"csd: fs must be positive, got $fs")
    val n = x.length
    require(n >= nperseg, s"csd: series length $n < nperseg $nperseg")
    val nb = nperseg / 2 + 1
    val accRe = new Array[Double](nb)
    val accIm = new Array[Double](nb)
    val segX = new Array[Double](nperseg)
    val segY = new Array[Double](nperseg)
    var w2 = 0.0
    var i = 0
    while (i < nperseg) { w2 += wts(i) * wts(i); i += 1 }
    var nSeg = 0
    var st = 0
    while (st + nperseg <= n) {
      var mx = 0.0
      var my = 0.0
      if (demean) {
        i = 0
        while (i < nperseg) { mx += x(st + i); my += y(st + i); i += 1 }
        mx /= nperseg
        my /= nperseg
      }
      i = 0
      while (i < nperseg) {
        segX(i) = (x(st + i) - mx) * wts(i)
        segY(i) = (y(st + i) - my) * wts(i)
        i += 1
      }
      val fx = Fft.rfft(segX)
      val fy = Fft.rfft(segY)
      var b = 0
      while (b < nb) {
        // conj(X) * Y
        accRe(b) += fx.re(b) * fy.re(b) + fx.im(b) * fy.im(b)
        accIm(b) += fx.re(b) * fy.im(b) - fx.im(b) * fy.re(b)
        b += 1
      }
      nSeg += 1
      st += hop
    }
    val scale = 1.0 / (fs * w2 * nSeg)
    var b = 0
    while (b < nb) {
      val dbl = if (b == 0 || (nperseg % 2 == 0 && b == nb - 1)) 1.0 else 2.0
      accRe(b) = accRe(b) * scale * dbl
      accIm(b) = accIm(b) * scale * dbl
      b += 1
    }
    Fft.C(accRe, accIm)
  }

  /** scipy.signal.coherence: magnitude-squared coherence
    * Cxy = |Pxy|² / (Pxx·Pyy) from the three Welch estimates over the
    * SAME segmentation. All scaling factors (fs, Σw², nSeg, onesided
    * doubling) cancel algebraically, but we compute the three spectra
    * through the same scaled [[welch]]/[[csd]] code paths anyway so the
    * float streams match scipy's (which also divides scaled spectra).
    */
  def coherence(x: Array[Double], y: Array[Double], nperseg: Int, hop: Int,
                wts: Array[Double], fs: Double,
                demean: Boolean = true): Array[Double] = {
    val pxx = welch(x, nperseg, hop, wts, fs, demean)
    val pyy = welch(y, nperseg, hop, wts, fs, demean)
    val pxy = csd(x, y, nperseg, hop, wts, fs, demean)
    val nb = pxx.length
    val out = new Array[Double](nb)
    var b = 0
    while (b < nb) {
      out(b) = (pxy.re(b) * pxy.re(b) + pxy.im(b) * pxy.im(b)) / (pxx(b) * pyy(b))
      b += 1
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
  /** scipy.signal.istft: overlap-add inverse of the STFT with the
    * repo-wide window placement (starts 0, h, 2h, …). Input is the
    * flattened (nWins × (w/2+1)) onesided spectrum grid, row-major in
    * window order. Each window's spectrum inverts by irfft, is tapered
    * by the SAME analysis window, and accumulates into the output;
    * normalization divides by the accumulated squared-window envelope
    * (scipy's exact rule, istft's `norm` array), so for unmodified
    * spectra the round trip reproduces the signal EXACTLY wherever
    * Σ w² > 0 — samples with zero window coverage (e.g. sample 0 under
    * a periodic hann, whose only covering tap is w[0] = 0) emit 0.
    * Output length (nWins−1)·h + w, the span the windows cover.
    */
  def istft(re: Array[Double], im: Array[Double], nWins: Int, w: Int, h: Int,
            wts: Array[Double]): Array[Double] = {
    require(w > 0 && h > 0 && h <= w, s"istft: need 0 < hop <= window, got h=$h w=$w")
    require(wts.length == w, s"istft: window length ${wts.length} != $w")
    val nb = w / 2 + 1
    require(nWins > 0 && re.length == nWins * nb && im.length == nWins * nb,
      s"istft: ${re.length} spectrum values do not form $nWins windows of $nb bins")
    val nOut = (nWins - 1) * h + w
    val ola = new Array[Double](nOut)
    val norm = new Array[Double](nOut)
    val sr = new Array[Double](nb)
    val si = new Array[Double](nb)
    var k = 0
    while (k < nWins) {
      System.arraycopy(re, k * nb, sr, 0, nb)
      System.arraycopy(im, k * nb, si, 0, nb)
      val xsub = Fft.irfft(sr, si, w)
      var i = 0
      while (i < w) {
        ola(k * h + i) += xsub(i) * wts(i)
        norm(k * h + i) += wts(i) * wts(i)
        i += 1
      }
      k += 1
    }
    var i = 0
    while (i < nOut) {
      ola(i) = if (norm(i) > 1e-12) ola(i) / norm(i) else 0.0
      i += 1
    }
    ola
  }

  def welch(x: Array[Double], nperseg: Int, hop: Int, wts: Array[Double],
            fs: Double, demean: Boolean = true,
            average: String = "mean"): Array[Double] = {
    require(nperseg > 0 && hop > 0 && hop <= nperseg,
      s"welch: need 0 < hop <= nperseg, got hop=$hop nperseg=$nperseg")
    require(wts.length == nperseg,
      s"welch: window length ${wts.length} != nperseg $nperseg")
    require(fs > 0, s"welch: fs must be positive, got $fs")
    val median = average match {
      case "mean" => false
      case "median" => true
      case other => throw new IllegalArgumentException(
        s"welch: unknown average '$other' (mean|median)")
    }
    val n = x.length
    require(n >= nperseg, s"welch: series length $n < nperseg $nperseg")
    val nb = nperseg / 2 + 1
    val nSegTot = (n - nperseg) / hop + 1
    val acc = new Array[Double](nb)
    // median averaging (scipy average="median", Welch's robust
    // variant) keeps the per-segment raw powers per bin; mean folds
    // them into one accumulator
    val perSeg = if (median) Array.ofDim[Double](nb, nSegTot) else null
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
      while (b < nb) {
        val p = sp.re(b) * sp.re(b) + sp.im(b) * sp.im(b)
        if (median) perSeg(b)(nSeg) = p else acc(b) += p
        b += 1
      }
      nSeg += 1
      st += hop
    }
    if (median) {
      // median of the raw powers, then scipy's small-sample bias
      // correction _median_bias(n) = 1 + Σ_{k=1}^{(n-1)/2} (1/(2k+1) − 1/(2k))
      // (the median of n iid χ²₂ variables underestimates the mean);
      // the lo + (hi−lo)/2 interpolation matches quantile_cont(0.5)
      var bias = 1.0
      var k = 1
      while (k <= (nSegTot - 1) / 2) {
        bias += 1.0 / (2 * k + 1) - 1.0 / (2 * k)
        k += 1
      }
      var b = 0
      while (b < nb) {
        val v = perSeg(b)
        java.util.Arrays.sort(v)
        val med =
          if (nSegTot % 2 == 1) v(nSegTot / 2)
          else {
            val lo = v(nSegTot / 2 - 1); val hi = v(nSegTot / 2)
            lo + (hi - lo) * 0.5
          }
        acc(b) = med / bias
        b += 1
      }
    }
    val scale =
      if (median) 1.0 / (fs * w2)
      else 1.0 / (fs * w2 * nSeg)
    var b = 0
    while (b < nb) {
      val dbl = if (b == 0 || (nperseg % 2 == 0 && b == nb - 1)) 1.0 else 2.0
      acc(b) = acc(b) * scale * dbl
      b += 1
    }
    acc
  }
}

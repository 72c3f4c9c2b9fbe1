package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** Filter design is checked against analytic properties of the
  * published designs (scipy has no numpy-only golden source in this
  * container): Butterworth is maximally flat with |H(wn)| = 1/sqrt(2);
  * Chebyshev-I is equiripple in the passband with |H(wn)| = 10^(-rp/20);
  * firwin has unit DC gain and linear phase (symmetric taps).
  */
class DesignSpec extends AnyFunSuite {

  private def db(x: Double) = 20 * math.log10(x)

  test("butterSos: -3dB at cutoff, DC gain 1, monotone rolloff") {
    for (n <- Seq(2, 3, 4, 5, 8); wn <- Seq(0.1, 0.25, 0.5, 0.8)) {
      val sos = Design.butterSos(n, wn)
      assert(Filt.nSections(sos) == (n + 1) / 2)
      val dc = Design.sosFreqAbs(sos, 0.0)
      assert(math.abs(dc - 1.0) < 1e-9, s"n=$n wn=$wn dc=$dc")
      val hc = Design.sosFreqAbs(sos, math.Pi * wn)
      assert(math.abs(hc - 1.0 / math.sqrt(2)) < 1e-9, s"n=$n wn=$wn |H(wn)|=$hc")
      // monotone decreasing magnitude
      var prev = Double.MaxValue
      for (k <- 0 to 100) {
        val h = Design.sosFreqAbs(sos, math.Pi * k / 100.0)
        assert(h <= prev + 1e-12, s"n=$n wn=$wn not monotone at k=$k")
        prev = h
      }
      // asymptotic slope ~ -20n dB/decade: compare 2*wn vs wn region
      if (wn <= 0.25) {
        val att = db(Design.sosFreqAbs(sos, math.Pi * 2 * wn))
        assert(att < -6.0 * n + 3, s"n=$n wn=$wn att at 2wn=$att dB")
      }
    }
  }

  test("cheby1Sos: rp-ripple passband, |H(wn)|=-rp dB, equiripple extrema") {
    for (n <- Seq(2, 3, 4, 5, 8); rp <- Seq(0.05, 1.0, 3.0); wn <- Seq(0.25, 0.8)) {
      val sos = Design.cheby1Sos(n, rp, wn)
      val floorG = math.pow(10.0, -rp / 20.0)
      val dc = Design.sosFreqAbs(sos, 0.0)
      val expDc = if (n % 2 == 0) floorG else 1.0
      assert(math.abs(dc - expDc) < 1e-9, s"n=$n rp=$rp wn=$wn dc=$dc exp=$expDc")
      val hc = Design.sosFreqAbs(sos, math.Pi * wn)
      assert(math.abs(hc - floorG) < 1e-8, s"n=$n rp=$rp wn=$wn |H(wn)|=$hc")
      // passband magnitude stays in [floorG - eps, 1 + eps]
      var nearMax = 0
      for (k <- 0 to 2000) {
        val h = Design.sosFreqAbs(sos, math.Pi * wn * k / 2000.0)
        assert(h <= 1.0 + 1e-9, s"n=$n rp=$rp wn=$wn passband overshoot $h")
        assert(h >= floorG - 1e-8, s"n=$n rp=$rp wn=$wn passband droop $h")
        if (h > 1.0 - 1e-4) nearMax += 1
      }
      // equiripple: the response actually touches its 1.0 ceiling
      // (combined with the floor/cutoff/DC pins above this fixes the
      // ripple structure; exact extrema counting is too sampling-
      // sensitive for narrow peaks).
      assert(nearMax >= 1, s"n=$n rp=$rp wn=$wn never reaches passband max")
      // stopband: strictly below the passband floor and decreasing
      val h15 = Design.sosFreqAbs(sos, math.Pi * math.min(1.0, wn * 1.5))
      assert(h15 < floorG, s"n=$n rp=$rp stopband $h15")
    }
  }

  test("cheby1 poles are stable (inside unit circle)") {
    for (n <- Seq(2, 5, 8)) {
      val sos = Design.cheby1Sos(n, 0.05, 0.3)
      for (s <- 0 until Filt.nSections(sos)) {
        val o = s * Filt.SOS_W
        val a1 = sos(o + 4); val a2 = sos(o + 5)
        // stability triangle: |a2| < 1 and |a1| < 1 + a2
        assert(math.abs(a2) < 1.0, s"n=$n s=$s a2=$a2")
        assert(math.abs(a1) < 1.0 + a2 + 1e-12, s"n=$n s=$s a1=$a1 a2=$a2")
      }
    }
  }

  test("firwinLowpass: unit DC gain, symmetric, -6dB near cutoff, stopband") {
    for (taps <- Seq(21, 31, 64); cutoff <- Seq(0.2, 0.5)) {
      val h = Design.firwinLowpass(taps, cutoff)
      assert(h.length == taps)
      assert(math.abs(h.sum - 1.0) < 1e-12)
      for (i <- 0 until taps / 2)
        assert(math.abs(h(i) - h(taps - 1 - i)) < 1e-12, s"tap $i asymmetric")
      def mag(w: Double): Double = {
        var re = 0.0; var im = 0.0
        for (i <- h.indices) { re += h(i) * math.cos(w * i); im -= h(i) * math.sin(w * i) }
        math.hypot(re, im)
      }
      // hamming-window lowpass crosses ~-6dB at the cutoff
      assert(math.abs(db(mag(math.Pi * cutoff)) + 6.0) < 1.0,
        s"taps=$taps cutoff=$cutoff |H(wc)|=${db(mag(math.Pi * cutoff))} dB")
      // stopband attenuation beyond transition: hamming gives ~-53 dB
      val trans = 8.0 / taps // double-sided hamming transition width (cycles)
      val ws = math.Pi * math.min(0.98, cutoff + trans)
      assert(db(mag(ws)) < -40.0, s"taps=$taps cutoff=$cutoff stopband ${db(mag(ws))} dB")
    }
  }

  test("hamming window endpoints and symmetry") {
    val w = Design.hamming(11)
    assert(math.abs(w(0) - 0.08) < 1e-12)
    assert(math.abs(w(10) - 0.08) < 1e-12)
    assert(math.abs(w(5) - 1.0) < 1e-12)
    assert(Design.hamming(1).toSeq == Seq(1.0))
  }

  test("freqz: moving average matches the closed form |1 + 2cos(w)|/3") {
    val (w, re, im) = Design.freqz(Array(1.0 / 3, 1.0 / 3, 1.0 / 3), Array(1.0), 64)
    for (k <- 0 until 64) {
      val want = math.abs(1.0 + 2.0 * math.cos(w(k))) / 3.0
      assert(math.abs(math.hypot(re(k), im(k)) - want) < 1e-12, s"bin $k")
      // linear phase -w for the symmetric FIR (where the real factor
      // is positive)
      if (1.0 + 2.0 * math.cos(w(k)) > 1e-6) {
        val ph = math.atan2(im(k), re(k))
        assert(math.abs(ph - (-w(k))) < 1e-9, s"phase at $k")
      }
    }
  }

  test("freqz of an FIR equals the rfft of the zero-padded taps (independent FFT path)") {
    val h = Design.firwinLowpass(21, 0.3)
    val n = 64
    val (_, re, im) = Design.freqz(h, Array(1.0), n)
    val sp = graft.dsp.Fft.rfft(h, 2 * n) // bins at pi*k/n for k <= n
    for (k <- 0 until n) {
      assert(math.abs(re(k) - sp.re(k)) < 1e-10, s"re bin $k")
      assert(math.abs(im(k) - sp.im(k)) < 1e-10, s"im bin $k")
    }
  }

  test("firwin general form: lowpass identity, highpass/bandpass/bandstop responses") {
    def mag(h: Array[Double], f: Double): Double = {
      val alpha = 0.5 * (h.length - 1)
      val re = h.indices.map(i => h(i) * math.cos(-math.Pi * f * (i - alpha))).sum
      val im = h.indices.map(i => h(i) * math.sin(-math.Pi * f * (i - alpha))).sum
      math.hypot(re, im)
    }
    // single cutoff + passZero reduces EXACTLY to the lowpass path
    assert(Design.firwin(21, Array(0.3)).toSeq == Design.firwinLowpass(21, 0.3).toSeq)
    // highpass: unit gain AT Nyquist by the scale rule, stopband DC leak tiny
    val hp = Design.firwinHighpass(31, 0.4)
    assert(math.abs(mag(hp, 1.0) - 1.0) < 1e-12)
    // hamming's stopband floor is ~-53 dB (~2e-3) — the leak IS that
    assert(mag(hp, 0.0) < 5e-3, s"DC leak ${mag(hp, 0.0)}")
    assert(hp.indices.forall(i => math.abs(hp(i) - hp(hp.length - 1 - i)) < 1e-15),
      "linear phase (symmetric taps)")
    // bandpass: unit gain at the band CENTER, both stopbands down
    val bp = Design.firwinBandpass(41, 0.3, 0.6)
    assert(math.abs(mag(bp, 0.45) - 1.0) < 1e-12)
    assert(mag(bp, 0.0) < 5e-3 && mag(bp, 1.0) < 5e-3)
    assert(mag(bp, 0.1) < 0.05 && mag(bp, 0.85) < 0.05)
    // bandstop: unit DC gain, notch at the stop-band center
    val bs = Design.firwinBandstop(41, 0.3, 0.6)
    assert(math.abs(mag(bs, 0.0) - 1.0) < 1e-12)
    assert(mag(bs, 0.45) < 0.05, s"notch ${mag(bs, 0.45)}")
    // Nyquist-passband parity rule enforced
    assertThrows[IllegalArgumentException](Design.firwinHighpass(20, 0.4))
  }

  test("groupDelay: linear-phase FIRs are exactly (n-1)/2 samples everywhere") {
    // symmetric 3-tap MA: τ ≡ 1; pure k-sample delay b = [0..0,1]: τ ≡ k
    val (_, gd3) = Design.groupDelay(Array(1.0 / 3, 1.0 / 3, 1.0 / 3), Array(1.0), 64)
    for (k <- 0 until 64 if math.abs(1.0 + 2.0 * math.cos(math.Pi * k / 64)) > 1e-6)
      assert(math.abs(gd3(k) - 1.0) < 1e-9, s"MA bin $k: ${gd3(k)}")
    val (_, gdD) = Design.groupDelay(Array(0.0, 0.0, 0.0, 1.0), Array(1.0), 32)
    for (k <- 0 until 32)
      assert(math.abs(gdD(k) - 3.0) < 1e-9, s"delay bin $k: ${gdD(k)}")
    // long symmetric firwin: τ ≡ (numtaps-1)/2
    val h = Design.firwinLowpass(21, 0.3)
    val (_, gdH) = Design.groupDelay(h, Array(1.0), 50)
    for (k <- 0 until 40) // pass/transition band, away from stop zeros
      assert(math.abs(gdH(k) - 10.0) < 1e-6, s"firwin bin $k: ${gdH(k)}")
  }

  test("groupDelay: IIR matches the numerical phase derivative; cascades add") {
    val sos = Design.butterSos(2, 0.3) // one biquad => exact (b, a) form
    val bb = Array(sos(0), sos(1), sos(2))
    val aa = Array(sos(3), sos(4), sos(5))
    val n = 4096
    val (w, gd) = Design.groupDelay(bb, aa, n)
    val (_, re, im) = Design.freqz(bb, aa, n)
    val ph = Array.tabulate(n)(k => math.atan2(im(k), re(k)))
    // unwrap then central-difference -dφ/dw
    for (k <- 1 until n) while (ph(k) - ph(k - 1) > math.Pi) ph(k) -= 2 * math.Pi
    for (k <- 1 until n - 1) {
      val num = -(ph(k + 1) - ph(k - 1)) / (w(k + 1) - w(k - 1))
      assert(math.abs(gd(k) - num) < 1e-3 * (1 + math.abs(num)),
        s"bin $k: analytic ${gd(k)} vs numeric $num")
    }
    // group delay of a cascade is the sum of the stages'
    val b2 = Array(0.5, 0.5)
    val casc = new Array[Double](bb.length + 1)
    for (i <- bb.indices; j <- 0 to 1) casc(i + j) += bb(i) * b2(j)
    val (_, gdC) = Design.groupDelay(casc, aa, 64)
    val (_, gdA) = Design.groupDelay(bb, aa, 64)
    val (_, gdB) = Design.groupDelay(b2, Array(1.0), 64)
    for (k <- 0 until 64)
      assert(math.abs(gdC(k) - (gdA(k) + gdB(k))) < 1e-8, s"cascade bin $k")
  }

  test("sosfreqz: butterworth is exactly -3dB at its cutoff, monotone, unity DC") {
    for ((order, wn) <- Seq((2, 0.4), (4, 0.5), (6, 0.2))) {
      val sos = Design.butterSos(order, wn)
      val n = 1000
      val (w, re, im) = Design.sosfreqz(sos, n)
      val mag = Array.tabulate(n)(k => math.hypot(re(k), im(k)))
      assert(math.abs(mag(0) - 1.0) < 1e-12, "DC gain")
      // half-power exactly at wn*pi (butterworth's defining property,
      // preserved by the bilinear transform's frequency warping)
      val kc = (wn * n).round.toInt
      assert(math.abs(mag(kc) - 1.0 / math.sqrt(2.0)) < 1e-9,
        s"order=$order wn=$wn |H(wc)|=${mag(kc)}")
      // monotone decreasing magnitude (no ripple)
      for (k <- 1 until n)
        assert(mag(k) <= mag(k - 1) + 1e-12, s"ripple at $k")
      // agrees with the independent single-point evaluator
      for (k <- Seq(1, n / 4, n / 2, 3 * n / 4))
        assert(math.abs(mag(k) - Design.sosFreqAbs(sos, w(k))) < 1e-12)
    }
  }

  test("cheby2Sos: DC gain 1, exactly -rs dB at the stopband edge, equiripple stopband") {
    for (n <- Seq(2, 3, 4, 5, 8); rs <- Seq(20.0, 40.0, 60.0); wn <- Seq(0.3, 0.6)) {
      val sos = Design.cheby2Sos(n, rs, wn)
      assert(Filt.nSections(sos) == (n + 1) / 2)
      val ceilS = math.pow(10.0, -rs / 20.0)
      val dc = Design.sosFreqAbs(sos, 0.0)
      assert(math.abs(dc - 1.0) < 1e-9, s"n=$n rs=$rs wn=$wn dc=$dc")
      // scipy Wn convention for cheby2: attenuation is exactly rs at wn
      val he = Design.sosFreqAbs(sos, math.Pi * wn)
      assert(math.abs(he - ceilS) < 1e-7 * (1 + ceilS),
        s"n=$n rs=$rs wn=$wn |H(edge)|=$he want $ceilS")
      // passband: monotone decreasing from DC to the stopband edge
      // (type II is maximally flat in the passband — no ripple there)
      var prev = Double.MaxValue
      for (k <- 0 to 500) {
        val h = Design.sosFreqAbs(sos, math.Pi * wn * k / 500.0)
        assert(h <= prev + 1e-10, s"n=$n rs=$rs wn=$wn passband ripple at k=$k")
        prev = h
      }
      // stopband: never above the -rs ceiling, but TOUCHES it between
      // the transmission zeros (the equiripple signature)
      var mx = 0.0
      for (k <- 0 to 3000) {
        val w = math.Pi * (wn + (1.0 - wn) * k / 3000.0)
        val h = Design.sosFreqAbs(sos, w)
        assert(h <= ceilS * (1 + 1e-9), s"n=$n rs=$rs wn=$wn stopband leak $h at $w")
        mx = math.max(mx, h)
      }
      assert(mx > ceilS * 0.999, s"n=$n rs=$rs wn=$wn stopband never touches ceiling ($mx vs $ceilS)")
      // stability triangle per section
      for (s <- 0 until Filt.nSections(sos)) {
        val o = s * Filt.SOS_W
        assert(math.abs(sos(o + 5)) < 1.0 && math.abs(sos(o + 4)) < 1.0 + sos(o + 5) + 1e-12)
      }
      // the two independent response evaluators agree
      val (w, re, im) = Design.sosfreqz(sos, 64)
      for (k <- Seq(1, 16, 32, 63))
        assert(math.abs(math.hypot(re(k), im(k)) - Design.sosFreqAbs(sos, w(k))) < 1e-12)
    }
  }

  test("ellipSos: rp passband ripple, -rs stopband floor, sharp transition") {
    for (n <- Seq(2, 3, 4, 5, 7); rp <- Seq(0.5, 1.0); rs <- Seq(40.0, 60.0); wn <- Seq(0.3, 0.6)) {
      val sos = Design.ellipSos(n, rp, rs, wn)
      assert(Filt.nSections(sos) == (n + 1) / 2)
      val floorG = math.pow(10.0, -rp / 20.0)
      val ceilS = math.pow(10.0, -rs / 20.0)
      val dc = Design.sosFreqAbs(sos, 0.0)
      val expDc = if (n % 2 == 0) floorG else 1.0
      assert(math.abs(dc - expDc) < 1e-8, s"n=$n rp=$rp rs=$rs dc=$dc exp=$expDc")
      // passband edge sits exactly on the ripple floor
      val he = Design.sosFreqAbs(sos, math.Pi * wn)
      assert(math.abs(he - floorG) < 1e-6, s"n=$n rp=$rp rs=$rs wn=$wn |H(wn)|=$he")
      // equiripple passband within [floor, 1], touching both
      var nearMax = 0; var nearMin = 0
      for (k <- 0 to 2000) {
        val h = Design.sosFreqAbs(sos, math.Pi * wn * k / 2000.0)
        assert(h <= 1.0 + 1e-8, s"n=$n rp=$rp rs=$rs overshoot $h")
        assert(h >= floorG - 1e-6, s"n=$n rp=$rp rs=$rs droop $h")
        if (h > 1.0 - 1e-3) nearMax += 1
        if (h < floorG + 1e-3) nearMin += 1
      }
      assert(nearMax >= 1, s"n=$n rp=$rp rs=$rs never touches passband max")
      assert(nearMin >= 1, s"n=$n rp=$rp rs=$rs never touches ripple floor")
      // stopband: once attenuation reaches rs it stays there, and the
      // transition ends EXACTLY at the degree-equation stopband edge
      // ws = (2/pi)·atan(tan(pi·wn/2)/sqrt(m)) (prototype edge 1/sqrt(m)
      // through the same lp2lp+bilinear warp) — the defining minimality
      // property of the elliptic family
      val wsIdx = (0 to 3000).find { k =>
        val w = math.Pi * (wn + (1.0 - wn) * k / 3000.0)
        Design.sosFreqAbs(sos, w) <= ceilS * (1 + 1e-9)
      }
      assert(wsIdx.isDefined, s"n=$n rp=$rp rs=$rs never reaches the stopband floor")
      val ws = wn + (1.0 - wn) * wsIdx.get / 3000.0
      val ck1Sq = (math.pow(10, 0.1 * rp) - 1) / (math.pow(10, 0.1 * rs) - 1)
      val mDeg = Design.ellipdeg(n, ck1Sq)
      val wsPred = 2.0 / math.Pi *
        math.atan(math.tan(math.Pi * wn / 2) / math.sqrt(mDeg))
      if (wsPred < 0.99)
        assert(math.abs(ws - wsPred) < 5e-3,
          s"n=$n rp=$rp rs=$rs wn=$wn measured edge $ws vs degree-equation $wsPred")
      var mx = 0.0
      for (k <- wsIdx.get to 3000) {
        val w = math.Pi * (wn + (1.0 - wn) * k / 3000.0)
        val h = Design.sosFreqAbs(sos, w)
        assert(h <= ceilS * (1 + 1e-6), s"n=$n rp=$rp rs=$rs stopband leak $h")
        mx = math.max(mx, h)
      }
      if (n >= 3)
        assert(mx > ceilS * 0.99, s"n=$n rp=$rp rs=$rs stopband never touches its floor")
      // stability
      for (s <- 0 until Filt.nSections(sos)) {
        val o = s * Filt.SOS_W
        assert(math.abs(sos(o + 5)) < 1.0 && math.abs(sos(o + 4)) < 1.0 + sos(o + 5) + 1e-12)
      }
    }
  }

  test("ellipj/ellipK: Jacobi identities and known values") {
    // K(0) = pi/2; K(m) vs the arithmetic-geometric mean is internal,
    // so pin against independently known points: K(0.5) = 1.85407467730...
    assert(math.abs(Design.ellipK(0.0) - math.Pi / 2) < 1e-14)
    assert(math.abs(Design.ellipK(0.5) - 1.8540746773013719) < 1e-12)
    // sn² + cn² = 1 and dn² + m·sn² = 1 across a grid
    for (m <- Seq(0.1, 0.5, 0.9, 0.99); u <- Seq(-2.0, -0.3, 0.0, 0.7, 1.9)) {
      val (sn, cn, dn) = Design.ellipj(u, m)
      assert(math.abs(sn * sn + cn * cn - 1.0) < 1e-12, s"m=$m u=$u")
      assert(math.abs(dn * dn + m * sn * sn - 1.0) < 1e-12, s"m=$m u=$u")
    }
    // quarter period: sn(K, m) = 1, cn(K, m) = 0
    for (m <- Seq(0.2, 0.7)) {
      val k = Design.ellipK(m)
      val (sn, cn, _) = Design.ellipj(k, m)
      assert(math.abs(sn - 1.0) < 1e-10 && math.abs(cn) < 1e-10, s"m=$m")
    }
    // degenerate moduli
    val (s0, c0, d0) = Design.ellipj(0.8, 0.0)
    assert(math.abs(s0 - math.sin(0.8)) < 1e-15 && math.abs(c0 - math.cos(0.8)) < 1e-15 && d0 == 1.0)
  }

  test("iirnotch: exact null at w0, unit gain at DC/Nyquist, -3 dB at band edges") {
    val w0 = 0.25
    val q = 30.0
    val (b, a) = Design.iirnotch(w0, q)
    def mag(w: Double): Double = {
      // direct evaluation of B(e^{-jw})/A(e^{-jw})
      def ev(c: Array[Double]): (Double, Double) =
        (c.indices.map(i => c(i) * math.cos(-i * w)).sum,
          c.indices.map(i => c(i) * math.sin(-i * w)).sum)
      val (br, bi) = ev(b); val (ar, ai) = ev(a)
      math.hypot(br, bi) / math.hypot(ar, ai)
    }
    val om = w0 * math.Pi
    assert(mag(om) < 1e-12, s"notch floor ${mag(om)}")
    assert(math.abs(mag(0.0) - 1.0) < 1e-12)
    assert(math.abs(mag(math.Pi) - 1.0) < 1e-12)
    // beta = tan(bw/2) sets the -3 dB bandwidth in the TAN-WARPED
    // domain; in linear frequency the crossings sit within ~0.3% of
    // w0 ± bw/2 at Q=30 (the residual is the bilinear warp, not error)
    val bw = om / q
    for (edge <- Seq(om - bw / 2, om + bw / 2))
      assert(math.abs(mag(edge) - 1.0 / math.sqrt(2.0)) < 5e-3,
        s"edge gain ${mag(edge)} at $edge")
    // peak is the complement: unit gain AT w0, nulls at DC/Nyquist
    val (pb, pa) = Design.iirpeak(w0, q)
    def magP(w: Double): Double = {
      def ev(c: Array[Double]): (Double, Double) =
        (c.indices.map(i => c(i) * math.cos(-i * w)).sum,
          c.indices.map(i => c(i) * math.sin(-i * w)).sum)
      val (br, bi) = ev(pb); val (ar, ai) = ev(pa)
      math.hypot(br, bi) / math.hypot(ar, ai)
    }
    assert(math.abs(magP(om) - 1.0) < 1e-12)
    assert(magP(0.0) < 1e-12 && magP(math.Pi) < 1e-12)
    // complementarity: |H_notch|² + |H_peak|² = 1 at every frequency
    // (allpass-decomposition identity of the RBJ pair)
    for (w <- Seq(0.3, 0.7, om, 1.9, 2.8))
      assert(math.abs(mag(w) * mag(w) + magP(w) * magP(w) - 1.0) < 1e-9,
        s"complementarity at $w")
  }

  test("remez: equiripple lowpass — alternation, symmetry, beats firwin") {
    val n = 31
    val bands = Array(0.0, 0.2, 0.25, 0.5)
    val h = Design.remez(n, bands, Array(1.0, 0.0))
    assert(h.length == n)
    // type-I linear phase: exact tap symmetry
    for (i <- 0 until n / 2)
      assert(math.abs(h(i) - h(n - 1 - i)) < 1e-9, s"tap asymmetry at $i")
    def mag(taps: Array[Double], f: Double): Double = {
      val w = 2.0 * math.Pi * f
      val re = taps.indices.map(i => taps(i) * math.cos(-i * w)).sum
      val im = taps.indices.map(i => taps(i) * math.sin(-i * w)).sum
      math.hypot(re, im)
    }
    val passErr = (0 to 400).map(i => 0.2 * i / 400.0)
      .map(f => math.abs(mag(h, f) - 1.0)).max
    val stopErr = (0 to 400).map(i => 0.25 + 0.25 * i / 400.0)
      .map(f => mag(h, f)).max
    // optimal Chebyshev with equal weights: the two band ripples are
    // the SAME delta (equiripple) — allow 5% for grid resolution
    assert(math.abs(passErr - stopErr) / math.max(passErr, stopErr) < 0.05,
      f"not equiripple: pass $passErr%.6f stop $stopErr%.6f")
    assert(stopErr < 0.05, f"ripple too large for this spec: $stopErr%.6f")
    // optimality: firwin (hamming) at the same numtaps and centered
    // cutoff must have WORSE stopband attenuation past 0.25
    val fir = Design.firwinLowpass(n, 2.0 * 0.225) // firwin cutoff on fs=2
    val firStop = (0 to 400).map(i => 0.25 + 0.25 * i / 400.0)
      .map(f => mag(fir, f)).max
    assert(stopErr < firStop,
      f"remez ($stopErr%.6f) not better than firwin ($firStop%.6f)")
    // weighting: weight 10 on the stopband buys ~10x smaller stopband
    // ripple at the cost of passband ripple (delta_s = delta_p / 10)
    val hw = Design.remez(n, bands, Array(1.0, 0.0), Array(1.0, 10.0))
    val passW = (0 to 400).map(i => 0.2 * i / 400.0)
      .map(f => math.abs(mag(hw, f) - 1.0)).max
    val stopW = (0 to 400).map(i => 0.25 + 0.25 * i / 400.0)
      .map(f => mag(hw, f)).max
    assert(math.abs(passW / stopW - 10.0) < 1.0,
      f"weight ratio broken: pass $passW%.6f stop $stopW%.6f")
    // bandpass: three bands, desired [0, 1, 0]
    val bp = Design.remez(41, Array(0.0, 0.1, 0.15, 0.35, 0.4, 0.5),
      Array(0.0, 1.0, 0.0))
    val bpPass = (0 to 200).map(i => 0.15 + 0.2 * i / 200.0)
      .map(f => math.abs(mag(bp, f) - 1.0)).max
    val bpStop = math.max(
      (0 to 200).map(i => 0.1 * i / 200.0).map(f => mag(bp, f)).max,
      (0 to 200).map(i => 0.4 + 0.1 * i / 200.0).map(f => mag(bp, f)).max)
    assert(bpPass < 0.1 && bpStop < 0.1,
      f"bandpass ripples too large: pass $bpPass%.6f stop $bpStop%.6f")
    // a shared edge (zero-width transition band) duplicates cos-domain
    // grid abscissae → NaN taps if both get selected as extremals; the
    // design must reject it up front (ADVICE r10)
    intercept[IllegalArgumentException] {
      Design.remez(31, Array(0.0, 0.2, 0.2, 0.5), Array(1.0, 0.0))
    }
    intercept[IllegalArgumentException] { // zero-width band
      Design.remez(31, Array(0.0, 0.2, 0.25, 0.25), Array(1.0, 0.0))
    }
  }

  test("sosfreqz: cheby1 passband ripples within its rp band") {
    val rp = 1.0 // dB
    val sos = Design.cheby1Sos(8, rp, 0.3)
    val n = 1000
    val (w, re, im) = Design.sosfreqz(sos, n)
    val floor = math.pow(10.0, -rp / 20.0)
    for (k <- 0 until n if w(k) < 0.3 * math.Pi) {
      val m = math.hypot(re(k), im(k))
      assert(m <= 1.0 + 1e-9 && m >= floor - 1e-9,
        s"passband ripple bound broken at ${w(k)}: $m")
    }
  }
}

#!/usr/bin/env python3
"""Generate golden vectors for the graft.dsp kernel tests.

numpy-only (no scipy in this container). FFT-family goldens come from
numpy.fft (an independent implementation of the same published
semantics the reference wraps). Filter goldens come from naive
textbook difference equations written here — deliberately the simplest
possible direct-form implementation, structurally different from the
Scala DF2T kernels they check.

Output: src/test/resources/golden/*.txt, one `name: v v v ...` per line
(17 significant digits, lossless for float64).
"""
import os
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src/test/resources/golden")
os.makedirs(OUT, exist_ok=True)


def emit(f, name, arr):
    arr = np.asarray(arr, dtype=np.float64).ravel()
    f.write(name + ": " + " ".join("%.17g" % v for v in arr) + "\n")


rng = np.random.default_rng(42)

# ---------------------------------------------------------------- fft
with open(os.path.join(OUT, "fft.txt"), "w") as f:
    for n in (16, 15, 17, 64):
        x = rng.standard_normal(n)
        y = rng.standard_normal(n)
        emit(f, f"in_re_{n}", x)
        emit(f, f"in_im_{n}", y)
        z = x + 1j * y
        for norm in ("backward", "ortho", "forward"):
            F = np.fft.fft(z, norm=norm)
            emit(f, f"fft_{n}_{norm}_re", F.real)
            emit(f, f"fft_{n}_{norm}_im", F.imag)
            I = np.fft.ifft(z, norm=norm)
            emit(f, f"ifft_{n}_{norm}_re", I.real)
            emit(f, f"ifft_{n}_{norm}_im", I.imag)
        # n-crop / n-pad variants (backward norm)
        for m in (n // 2 + 1, 2 * n):
            F = np.fft.fft(z, n=m)
            emit(f, f"fftn_{n}_{m}_re", F.real)
            emit(f, f"fftn_{n}_{m}_im", F.imag)
        # real family
        R = np.fft.rfft(x)
        emit(f, f"rfft_{n}_re", R.real)
        emit(f, f"rfft_{n}_im", R.imag)
        emit(f, f"irfft_{n}", np.fft.irfft(R))          # back to even length
        emit(f, f"irfft_n_{n}", np.fft.irfft(R, n=n))   # exact length
        H = np.fft.hfft(z[: n // 2 + 1])
        emit(f, f"hfft_{n}", H)
        IH = np.fft.ihfft(x)
        emit(f, f"ihfft_{n}_re", IH.real)
        emit(f, f"ihfft_{n}_im", IH.imag)
        emit(f, f"fftfreq_{n}", np.fft.fftfreq(n, d=0.25))
        emit(f, f"rfftfreq_{n}", np.fft.rfftfreq(n, d=0.25))
        emit(f, f"fftshift_{n}", np.fft.fftshift(x))
        emit(f, f"ifftshift_{n}", np.fft.ifftshift(x))
    # ortho/forward norms for the real family (n=16 only)
    x16 = rng.standard_normal(16)
    emit(f, "in2_re_16", x16)
    for norm in ("ortho", "forward"):
        R = np.fft.rfft(x16, norm=norm)
        emit(f, f"rfft2_16_{norm}_re", R.real)
        emit(f, f"rfft2_16_{norm}_im", R.imag)
        emit(f, f"irfft2_16_{norm}", np.fft.irfft(R, norm=norm))
        H = np.fft.hfft(x16[:9] + 1j * rng.standard_normal(9), norm=norm) \
            if False else None
    # hfft/ihfft norm variants via identities on a fixed complex input
    zin = rng.standard_normal(9) + 1j * rng.standard_normal(9)
    emit(f, "hin_re_9", zin.real)
    emit(f, "hin_im_9", zin.imag)
    for norm in ("backward", "ortho", "forward"):
        emit(f, f"hfft_9_{norm}", np.fft.hfft(zin, norm=norm))
        IH = np.fft.ihfft(np.fft.hfft(zin), norm=norm)
        emit(f, f"ihfft_16_{norm}_re", IH.real)
        emit(f, f"ihfft_16_{norm}_im", IH.imag)

# ----------------------------------------------------------- convolve
# scipy.signal.convolve conventions: full = n1+n2-1; same = length n1
# centered on full (start (n2-1)//2); valid = max-min+1 (start min-1).
with open(os.path.join(OUT, "conv.txt"), "w") as f:
    for (n1, n2) in ((20, 5), (5, 20), (16, 16), (31, 7)):
        a = rng.standard_normal(n1)
        b = rng.standard_normal(n2)
        emit(f, f"a_{n1}_{n2}", a)
        emit(f, f"b_{n1}_{n2}", b)
        full = np.convolve(a, b)
        emit(f, f"conv_full_{n1}_{n2}", full)
        s = (n2 - 1) // 2
        emit(f, f"conv_same_{n1}_{n2}", full[s: s + n1])
        v = min(n1, n2) - 1
        emit(f, f"conv_valid_{n1}_{n2}", full[v: v + max(n1, n2) - min(n1, n2) + 1])
        emit(f, f"corr_full_{n1}_{n2}", np.convolve(a, b[::-1]))
    # complex convolve/correlate (scipy conventions; np.convolve handles
    # complex, and scipy's correlate(a, b) == convolve(a, conj(b[::-1]))).
    # Dedicated rng: appending draws to the shared stream would shift
    # every golden generated after this section.
    crng = np.random.default_rng(7)
    for (n1, n2) in ((20, 5), (16, 16), (7, 31)):
        ar = crng.standard_normal(n1); ai = crng.standard_normal(n1)
        br = crng.standard_normal(n2); bi = crng.standard_normal(n2)
        a = ar + 1j * ai
        b = br + 1j * bi
        emit(f, f"cxa_re_{n1}_{n2}", ar); emit(f, f"cxa_im_{n1}_{n2}", ai)
        emit(f, f"cxb_re_{n1}_{n2}", br); emit(f, f"cxb_im_{n1}_{n2}", bi)
        full = np.convolve(a, b)
        emit(f, f"cxconv_full_{n1}_{n2}_re", full.real)
        emit(f, f"cxconv_full_{n1}_{n2}_im", full.imag)
        s = (n2 - 1) // 2
        emit(f, f"cxconv_same_{n1}_{n2}_re", full[s: s + n1].real)
        emit(f, f"cxconv_same_{n1}_{n2}_im", full[s: s + n1].imag)
        v = min(n1, n2) - 1
        nv = max(n1, n2) - min(n1, n2) + 1
        emit(f, f"cxconv_valid_{n1}_{n2}_re", full[v: v + nv].real)
        emit(f, f"cxconv_valid_{n1}_{n2}_im", full[v: v + nv].imag)
        corr = np.convolve(a, np.conj(b[::-1]))
        emit(f, f"cxcorr_full_{n1}_{n2}_re", corr.real)
        emit(f, f"cxcorr_full_{n1}_{n2}_im", corr.imag)
    # 2-D case (small, direct quadratic reference)
    A = rng.standard_normal((6, 5))
    B = rng.standard_normal((3, 4))
    emit(f, "a2d", A)
    emit(f, "b2d", B)
    fullR, fullC = 6 + 3 - 1, 5 + 4 - 1
    out = np.zeros((fullR, fullC))
    for i in range(6):
        for j in range(5):
            out[i:i + 3, j:j + 4] += A[i, j] * B
    emit(f, "conv2d_full", out)
    emit(f, "conv2d_same", out[(3 - 1) // 2:(3 - 1) // 2 + 6,
                               (4 - 1) // 2:(4 - 1) // 2 + 5])

# ------------------------------------------------------------ filters
def lfilter_naive(b, a, x, zi=None):
    """Textbook direct-form I difference equation, O(n*order)."""
    b = np.asarray(b, dtype=float) / a[0]
    a = np.asarray(a, dtype=float) / a[0]
    # Convert zi (DF2T state) to equivalent output via scipy state-space
    # is messy — instead, when zi is given, we use the DF2T recurrence
    # directly (still an independent reimplementation in numpy).
    n = max(len(b), len(a))
    bb = np.zeros(n); bb[:len(b)] = b
    aa = np.zeros(n); aa[:len(a)] = a
    z = np.zeros(n - 1)
    if zi is not None:
        z[:len(zi)] = zi
    y = np.zeros(len(x))
    for t, xt in enumerate(x):
        yt = bb[0] * xt + (z[0] if n > 1 else 0.0)
        for k in range(n - 2):
            z[k] = bb[k + 1] * xt + z[k + 1] - aa[k + 1] * yt
        if n > 1:
            z[n - 2] = bb[n - 1] * xt - aa[n - 1] * yt
        y[t] = yt
    return y


def lfilter_df1(b, a, x):
    """Pure direct-form I (no shared state vector) — maximally
    independent check for the zero-state case."""
    b = np.asarray(b, dtype=float) / a[0]
    a = np.asarray(a, dtype=float) / a[0]
    y = np.zeros(len(x))
    for t in range(len(x)):
        s = 0.0
        for k in range(len(b)):
            if t - k >= 0:
                s += b[k] * x[t - k]
        for k in range(1, len(a)):
            if t - k >= 0:
                s -= a[k] * y[t - k]
        y[t] = s
    return y


def lfilter_zi_np(b, a):
    """scipy.signal.lfilter_zi via numpy.linalg (independent solver)."""
    n = max(len(b), len(a))
    bb = np.zeros(n); bb[:len(b)] = b
    aa = np.zeros(n); aa[:len(a)] = a
    bb, aa = bb / aa[0], aa / aa[0]
    m = n - 1
    companion = np.zeros((m, m))
    companion[0, :] = -aa[1:]
    companion[1:, :-1] = np.eye(m - 1)
    IminusA = np.eye(m) - companion.T
    Bvec = bb[1:] - aa[1:] * bb[0]
    return np.linalg.solve(IminusA, Bvec)


with open(os.path.join(OUT, "filt.txt"), "w") as f:
    x = rng.standard_normal(64)
    emit(f, "x_64", x)
    # a couple of fixed, hand-specified stable filters
    b1 = [0.2, 0.3, 0.1]
    a1 = [1.0, -0.5, 0.25]
    emit(f, "b1", b1)
    emit(f, "a1", a1)
    emit(f, "lfilter_1", lfilter_df1(b1, a1, x))
    emit(f, "lfilter_zi_1", lfilter_zi_np(b1, a1))
    zi1 = lfilter_zi_np(b1, a1) * x[0]
    emit(f, "lfilter_1_zi", lfilter_naive(b1, a1, x, zi1))
    b2 = [0.05, 0.1, 0.05]          # gentle lowpass biquad
    a2 = [1.0, -1.2, 0.45]
    emit(f, "b2", b2)
    emit(f, "a2", a2)
    emit(f, "lfilter_2", lfilter_df1(b2, a2, x))
    emit(f, "lfilter_zi_2", lfilter_zi_np(b2, a2))
    # sos cascade = the two biquads above in sequence (zero state):
    # independent check = sequential DF1 passes.
    emit(f, "sosfilt_12", lfilter_df1(b2, a2, lfilter_df1(b1, a1, x)))

print("golden vectors written to", OUT)

# ------------------------------------------------- hilbert / resample
def hilbert_np(x, N=None):
    """Published analytic-signal algorithm, via numpy.fft."""
    n = N or len(x)
    Xf = np.fft.fft(x, n)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1:n // 2] = 2
    else:
        h[0] = 1
        h[1:(n + 1) // 2] = 2
    return np.fft.ifft(Xf * h)


def periodic_window_np(name, n):
    """get_window(..., fftbins=True) equivalents, closed-form."""
    k = np.arange(n)
    t = 2 * np.pi * k / n
    if name == "boxcar":
        return np.ones(n)
    if name == "hann":
        return 0.5 - 0.5 * np.cos(t)
    if name == "hamming":
        return 0.54 - 0.46 * np.cos(t)
    if name == "blackman":
        return 0.42 - 0.5 * np.cos(t) + 0.08 * np.cos(2 * t)
    if name == "bartlett":
        return 1.0 - np.abs(2.0 * k / n - 1.0)
    raise ValueError(name)


def resample_np(x, num, window=None, domain="time"):
    """Published Fourier resampling algorithm (real input), numpy.fft,
    with the spectrum-window and freq-domain-input options."""
    nx = len(x)
    if domain == "time":
        X = np.fft.rfft(x)
    else:  # freq: x is a real-valued packed rfft spectrum
        X = np.asarray(x, dtype=complex)
    if window is not None:
        # array windows apply directly in Fourier order (dc-first, no
        # ifftshift) — scipy's array_like branch
        if isinstance(window, np.ndarray):
            W = window.astype(float)
        else:
            W = np.fft.ifftshift(periodic_window_np(window, nx))
        W_real = W.copy()
        W_real[1:] += W_real[-1:0:-1]
        W_real[1:] *= 0.5
        X = X * W_real[:len(X)]
    Y = np.zeros(num // 2 + 1, dtype=complex)
    N = min(num, nx)
    nyq = N // 2 + 1
    Y[:min(nyq, len(Y))] = X[:min(nyq, len(Y))]
    if N % 2 == 0:
        if num < nx:
            Y[N // 2] *= 2.0
        elif num > nx:
            Y[N // 2] *= 0.5
    y = np.fft.irfft(Y, num)
    return y * (float(num) / float(nx))


def firwin_np(numtaps, cutoff):
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * m)
    w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(numtaps) / (numtaps - 1))
    h = h * w
    return h / h.sum()


def filtfilt_np(b, a, x):
    ntaps = max(len(b), len(a))
    edge = 3 * ntaps
    n = len(x)
    assert edge < n
    ext = np.concatenate([2 * x[0] - x[1:edge + 1][::-1], x,
                          2 * x[-1] - x[-edge - 1:-1][::-1]])
    zi = lfilter_zi_np(b, a)
    fwd = lfilter_naive(b, a, ext, zi * ext[0])
    bwd = lfilter_naive(b, a, fwd[::-1], zi * fwd[-1])
    return bwd[::-1][edge:-edge]


with open(os.path.join(OUT, "spectral.txt"), "w") as f:
    for n in (64, 63):
        x = rng.standard_normal(n)
        emit(f, f"hx_{n}", x)
        h = hilbert_np(x)
        emit(f, f"hilbert_{n}_re", h.real)
        emit(f, f"hilbert_{n}_im", h.imag)
        hN = hilbert_np(x, N=80)
        emit(f, f"hilbertN_{n}_re", hN.real)
        emit(f, f"hilbertN_{n}_im", hN.imag)
        for num in (n // 2, n // 3, 2 * n, n):
            emit(f, f"resample_{n}_{num}", resample_np(x, num))
        for win in ("hann", "hamming", "blackman", "bartlett"):
            emit(f, f"resample_w_{win}_{n}", resample_np(x, n // 2, window=win))
            emit(f, f"resample_wu_{win}_{n}", resample_np(x, 2 * n, window=win))
        # freq-domain input: a real half-spectrum of nb bins
        xs = rng.standard_normal(n // 2 + 1)
        emit(f, f"rsfreq_x_{n}", xs)
        emit(f, f"resample_fr_{n}", resample_np(xs, n, domain="freq"))
        emit(f, f"resample_frw_{n}", resample_np(xs, n, window="hann", domain="freq"))
        # explicit Fourier-order vector window (deterministic formula,
        # NOT rng — keeps the rng stream byte-identical for the other
        # goldens)
        wv = 0.2 + 0.8 * np.abs(np.sin(3 * np.pi * np.arange(n) / n))
        emit(f, f"rswin_vec_{n}", wv)
        emit(f, f"resample_vec_{n}", resample_np(x, n // 2, window=wv))
        emit(f, f"resample_vecu_{n}", resample_np(x, 2 * n, window=wv))
    # decimate, FIR path: firwin(20q+1, 1/q) + filtfilt + [::q]
    x = rng.standard_normal(256)
    emit(f, "dx_256", x)
    for q in (2, 4):
        b = firwin_np(20 * q + 1, 1.0 / q)
        emit(f, f"firwin_{q}", b)
        # scipy decimate FIR zero_phase = resample_poly/upfirdn: one
        # centered pass of the linear-phase filter, zero-padded edges
        full = np.convolve(x, b)
        half = 10 * q
        n_out = -(-len(x) // q)
        emit(f, f"decimate_fir_{q}",
             [full[half + i * q] if half + i * q < len(full) else 0.0
              for i in range(n_out)])
        yl = lfilter_naive(b, [1.0], x)
        emit(f, f"decimate_fir_nzp_{q}", yl[::q])

# ------------------------------------------------------------- peaks
def prominence_np(x, peak, wlen=None):
    # scipy window rule: wlen clips the evaluated stretch to
    # peak +- wlen//2; wlen=None scans to the signal edges
    n = len(x)
    imin = max(peak - wlen // 2, 0) if wlen is not None else 0
    imax = min(peak + wlen // 2, n - 1) if wlen is not None else n - 1
    hp = x[peak]
    left_min, left_base = hp, peak
    i = peak
    while i >= imin and x[i] <= hp:
        if x[i] < left_min:
            left_min, left_base = x[i], i
        i -= 1
    right_min, right_base = hp, peak
    i = peak
    while i <= imax and x[i] <= hp:
        if x[i] < right_min:
            right_min, right_base = x[i], i
        i += 1
    return hp - max(left_min, right_min), left_base, right_base


def width_np(x, peak, rel_height=0.5, prom_data=None):
    # prom_data mirrors the scipy kwarg: a caller-supplied
    # (prominence, left_base, right_base) triple, e.g. from a
    # wlen-restricted prominence scan
    prom, lb, rb = prom_data if prom_data is not None else prominence_np(x, peak)
    height = x[peak] - prom * rel_height
    i = peak
    while lb < i and height < x[i]:
        i -= 1
    left_ip = float(i)
    if x[i] < height:
        left_ip += (height - x[i]) / (x[i + 1] - x[i])
    i = peak
    while i < rb and height < x[i]:
        i += 1
    right_ip = float(i)
    if x[i] < height:
        right_ip -= (height - x[i]) / (x[i - 1] - x[i])
    return right_ip - left_ip, height, left_ip, right_ip


with open(os.path.join(OUT, "peaks.txt"), "w") as f:
    # smooth multi-peak signal
    t = np.arange(200)
    x = (np.sin(2 * np.pi * t / 40) + 0.6 * np.sin(2 * np.pi * t / 13)
         + 0.05 * rng.standard_normal(200))
    emit(f, "px", x)
    peaks = [p for p in range(1, 199) if x[p - 1] < x[p] > x[p + 1]]
    emit(f, "ppeaks", peaks)
    for rel in (0.5, 1.0):
        rows = [width_np(x, p, rel) for p in peaks]
        proms = [prominence_np(x, p) for p in peaks]
        emit(f, f"widths_{rel}", [r[0] for r in rows])
        emit(f, f"wheights_{rel}", [r[1] for r in rows])
        emit(f, f"lips_{rel}", [r[2] for r in rows])
        emit(f, f"rips_{rel}", [r[3] for r in rows])
    emit(f, "proms", [p[0] for p in (prominence_np(x, p) for p in peaks)])
    emit(f, "lbases", [prominence_np(x, p)[1] for p in peaks])
    emit(f, "rbases", [prominence_np(x, p)[2] for p in peaks])

    # wlen-restricted prominences and the widths computed from that
    # prominence_data — the round-4 feature surface, produced by the
    # SAME scan as the unrestricted vectors (wlen/prom_data params)
    for wlen in (11, 25):
        pw = [prominence_np(x, p, wlen=wlen) for p in peaks]
        emit(f, f"proms_wlen{wlen}", [p[0] for p in pw])
        emit(f, f"lbases_wlen{wlen}", [p[1] for p in pw])
        emit(f, f"rbases_wlen{wlen}", [p[2] for p in pw])
        rows = [width_np(x, p, 0.5, prom_data=pd) for p, pd in zip(peaks, pw)]
        emit(f, f"widths_wlen{wlen}", [r[0] for r in rows])
        emit(f, f"wheights_wlen{wlen}", [r[1] for r in rows])
        emit(f, f"lips_wlen{wlen}", [r[2] for r in rows])
        emit(f, f"rips_wlen{wlen}", [r[3] for r in rows])


# -------------------------------------------------------------- welch
# Averaged-periodogram reference, written directly from the published
# Welch definition (independent of the Scala kernel's buffer-reuse
# structure): segment, constant-detrend, taper, rfft, |X|^2 mean,
# density scaling with one-sided doubling.
def welch_np(x, nperseg, hop, wts, fs, demean=True):
    n = len(x)
    nb = nperseg // 2 + 1
    acc = np.zeros(nb)
    nseg = 0
    st = 0
    while st + nperseg <= n:
        seg = np.asarray(x[st:st + nperseg], dtype=np.float64)
        if demean:
            seg = seg - seg.mean()
        F = np.fft.rfft(seg * wts)
        acc += np.abs(F) ** 2
        nseg += 1
        st += hop
    acc /= fs * np.sum(wts ** 2) * nseg
    if nperseg % 2 == 0:
        acc[1:-1] *= 2
    else:
        acc[1:] *= 2
    return acc


# Cross-spectral reference, same published definition: conj(X)*Y per
# segment, averaged, welch scaling. coherence from the three estimates.
def csd_np(x, y, nperseg, hop, wts, fs, demean=True):
    n = len(x)
    acc = np.zeros(nperseg // 2 + 1, dtype=np.complex128)
    nseg = 0
    st = 0
    while st + nperseg <= n:
        sx = np.asarray(x[st:st + nperseg], dtype=np.float64)
        sy = np.asarray(y[st:st + nperseg], dtype=np.float64)
        if demean:
            sx = sx - sx.mean()
            sy = sy - sy.mean()
        acc += np.conj(np.fft.rfft(sx * wts)) * np.fft.rfft(sy * wts)
        nseg += 1
        st += hop
    acc /= fs * np.sum(wts ** 2) * nseg
    if nperseg % 2 == 0:
        acc[1:-1] *= 2
    else:
        acc[1:] *= 2
    return acc


with open(os.path.join(OUT, "welch.txt"), "w") as f:
    for n in (200, 127):
        # a slope on top of noise so linear vs constant detrend differ
        x = rng.standard_normal(n) + 0.003 * np.arange(n)
        emit(f, f"wx_{n}", x)
        emit(f, f"detrend_const_{n}", x - x.mean())
        t = np.arange(n)
        coef = np.polyfit(t, x, 1)  # lstsq path, unlike the kernel's closed form
        emit(f, f"detrend_lin_{n}", x - np.polyval(coef, t))
        for nperseg, hop in ((32, 16), (25, 10)):
            wts = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nperseg) / nperseg)
            emit(f, f"welch_hann_{n}_{nperseg}_{hop}",
                 welch_np(x, nperseg, hop, wts, fs=2.0))
            emit(f, f"welch_box_{n}_{nperseg}_{hop}",
                 welch_np(x, nperseg, hop, np.ones(nperseg), fs=2.0,
                          demean=False))
        # second channel: filtered+lagged mix of x plus fresh noise, so
        # the cross-spectrum has nontrivial phase and coherence < 1
        y = np.zeros(n)
        y[1:] = 0.7 * x[:-1]
        y += 0.3 * rng.standard_normal(n)
        emit(f, f"wy_{n}", y)
        for nperseg, hop in ((32, 16), (25, 10)):
            wts = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nperseg) / nperseg)
            P = csd_np(x, y, nperseg, hop, wts, fs=2.0)
            emit(f, f"csd_hann_{n}_{nperseg}_{hop}_re", P.real)
            emit(f, f"csd_hann_{n}_{nperseg}_{hop}_im", P.imag)
            pxx = welch_np(x, nperseg, hop, wts, fs=2.0)
            pyy = welch_np(y, nperseg, hop, wts, fs=2.0)
            emit(f, f"coh_hann_{n}_{nperseg}_{hop}",
                 np.abs(P) ** 2 / (pxx * pyy))


# ---------------------------------------------------------- medfilt/wiener
# References written from the published definitions with numpy array
# ops (convolve/median), unlike the kernels' index loops.
def medfilt_np(x, k):
    ho = k // 2
    xp = np.concatenate([np.zeros(ho), x, np.zeros(ho)])
    return np.array([np.median(xp[i:i + k]) for i in range(len(x))])


def wiener_np(x, size, noise=None):
    ho = size // 2
    xp = np.concatenate([np.zeros(ho), x, np.zeros(ho)])
    ones = np.ones(size)
    lmean = np.convolve(xp, ones, "valid") / size
    lvar = np.convolve(xp ** 2, ones, "valid") / size - lmean ** 2
    if noise is None:
        noise = lvar.mean()
    with np.errstate(divide="ignore", invalid="ignore"):
        res = lmean + (x - lmean) * (1.0 - noise / lvar)
    return np.where(lvar < noise, lmean, res)


with open(os.path.join(OUT, "medfilt.txt"), "w") as f:
    for n in (100, 37):
        x = np.round(rng.standard_normal(n) * 8) / 4  # ties exercise the sort
        emit(f, f"mx_{n}", x)
        for k in (3, 5, 9):
            emit(f, f"medfilt_{n}_{k}", medfilt_np(x, k))
        for size in (3, 7):
            emit(f, f"wiener_{n}_{size}", wiener_np(x, size))
            emit(f, f"wiener_{n}_{size}_n01", wiener_np(x, size, noise=0.1))


# --------------------------------------------------------------- savgol
# Per-window numpy polyfit reference — independent of the kernel's
# normal-equation coefficient derivation.
def savgol_np(x, w, p, mode):
    ho = w // 2
    n = len(x)
    out = np.zeros(n)
    grid = np.arange(-ho, ho + 1)
    if mode == "constant":
        xp = np.concatenate([np.zeros(ho), x, np.zeros(ho)])
        for i in range(n):
            coef = np.polyfit(grid, xp[i:i + w], p)
            out[i] = np.polyval(coef, 0.0)
    else:  # interp
        for i in range(n):
            if i < ho:
                base, t = 0, i - ho
            elif i >= n - ho:
                base, t = n - w, i - (n - 1 - ho)
            else:
                base, t = i - ho, 0
            coef = np.polyfit(grid, x[base:base + w], p)
            out[i] = np.polyval(coef, float(t))
    return out


with open(os.path.join(OUT, "savgol.txt"), "w") as f:
    srng = np.random.default_rng(19)
    for n in (80, 23):
        x = np.cumsum(srng.standard_normal(n))  # smooth-ish walk
        emit(f, f"sgx_{n}", x)
        for (w, p) in ((5, 2), (7, 3), (9, 4)):
            emit(f, f"savgol_const_{n}_{w}_{p}", savgol_np(x, w, p, "constant"))
            emit(f, f"savgol_interp_{n}_{w}_{p}", savgol_np(x, w, p, "interp"))


# --------------------------------------------------------- upfirdn/poly
# Literal-definition references: zero-stuff, full convolve, stride.
def upfirdn_np(h, x, up, down):
    n = len(x)
    xu = np.zeros((n - 1) * up + 1)
    xu[::up] = x
    full = np.convolve(xu, h)
    return full[::down]


def resample_poly_np(x, up, down, beta=5.0):
    g = np.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x.copy()
    n = len(x)
    n_out = n * up // down + bool((n * up) % down)
    max_rate = max(up, down)
    half_len = 10 * max_rate
    m = 2 * half_len + 1
    alpha = 0.5 * (m - 1)
    cutoff = 1.0 / max_rate
    idx = np.arange(m) - alpha
    hh = cutoff * np.sinc(cutoff * idx) * np.kaiser(m, beta)
    hh /= hh.sum()
    hh *= up
    n_pre_pad = down - half_len % down
    n_pre_remove = half_len // down + 1  # == (half_len + n_pre_pad) // down
    def out_len(len_h):
        return ((n - 1) * up + len_h + down - 1) // down
    n_post_pad = 0
    while out_len(len(hh) + n_pre_pad + n_post_pad) < n_out + n_pre_remove:
        n_post_pad += 1
    hh = np.concatenate([np.zeros(n_pre_pad), hh, np.zeros(n_post_pad)])
    y = upfirdn_np(hh, x, up, down)
    return y[n_pre_remove:n_pre_remove + n_out]


with open(os.path.join(OUT, "upfirdn.txt"), "w") as f:
    urng = np.random.default_rng(23)
    for n in (50, 17):
        x = urng.standard_normal(n)
        emit(f, f"ux_{n}", x)
        h = np.array([0.25, 0.5, 1.0, 0.5, 0.25])
        for (up, down) in ((3, 2), (2, 3), (1, 4), (4, 1)):
            emit(f, f"upfirdn_{n}_{up}_{down}", upfirdn_np(h, x, up, down))
        for (up, down) in ((3, 2), (2, 3), (5, 7)):
            emit(f, f"rpoly_{n}_{up}_{down}", resample_poly_np(x, up, down))
    # kaiser window itself (checks besselI0 + the window formula)
    emit(f, "kaiser_21_5", np.kaiser(21, 5.0))
    emit(f, "kaiser_8_14", np.kaiser(8, 14.0))

"""Port of the conformance quality gate (reference: src/opus_compare.c).

Band-energy-weighted spectral distortion over 480-sample windows with
frequency/temporal masking; pass iff Q >= 0.  This is the acceptance metric
for RFC 8251-style vectors (SURVEY.md §4 tier 3).

Convention quirk preserved from the reference: the *reference* signal is
always read as interleaved stereo; for mono comparisons it is downmixed
(the official .dec test vectors are stereo files).
"""

from __future__ import annotations

import numpy as np

NBANDS = 21
NFREQS = 240
BANDS = np.array([0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56,
                  68, 80, 96, 120, 156, 200])
TEST_WIN_SIZE = 480
TEST_WIN_STEP = 120


def _band_energy(x, bands, nbands, nchannels, nframes, window_sz, step,
                 downsample):
    """Returns (band_e [nframes, nbands, ch] or None, ps [nframes, f, ch])."""
    n = window_sz
    win = (0.5 - 0.5 * np.cos((2 * np.pi / (n - 1)) * np.arange(n))
           ).astype(np.float32)
    ps_sz = n // 2
    nfreq = int(bands[nbands])
    frames = np.stack([x[i * step:i * step + n, :] for i in range(nframes)])
    wx = frames * win[None, :, None]          # [F, n, ch]
    spec = np.fft.rfft(wx.astype(np.float64), axis=1)[:, :nfreq, :]
    ps = (np.abs(spec) ** 2).astype(np.float64) * (downsample ** 2) + 100000.0
    band_e = np.empty((nframes, nbands, nchannels))
    for bi in range(nbands):
        lo, hi = int(bands[bi]), int(bands[bi + 1])
        band_e[:, bi, :] = ps[:, lo:hi, :].sum(axis=1) / (hi - lo)
    full_ps = np.zeros((nframes, ps_sz, nchannels))
    full_ps[:, :nfreq, :] = ps
    return band_e, full_ps


def compare(ref_stereo: np.ndarray, test: np.ndarray, channels: int = 1,
            rate: int = 48000):
    """ref_stereo: int16 [n*2] interleaved stereo reference;
    test: int16 [m*channels] decoded output at `rate`.
    Returns (err, Q)."""
    downsample = 48000 // rate
    ybands = {8000: 13, 12000: 15, 16000: 17, 24000: 19, 48000: 21}[rate]
    yfreqs = NFREQS // downsample

    xr = ref_stereo.astype(np.float32).reshape(-1, 2)
    if channels == 1:
        x = (0.5 * (xr[:, 0] + xr[:, 1]))[:, None]
    else:
        x = xr
    y = test.astype(np.float32).reshape(-1, channels)

    xlength = len(x)
    ylength = len(y)
    if xlength != ylength * downsample:
        raise ValueError(f"sample counts do not match "
                         f"({xlength} != {ylength}*{downsample})")
    if xlength < TEST_WIN_SIZE:
        raise ValueError("insufficient samples")
    nframes = (xlength - TEST_WIN_SIZE + TEST_WIN_STEP) // TEST_WIN_STEP

    xb, X = _band_energy(x, BANDS, NBANDS, channels, nframes,
                         TEST_WIN_SIZE, TEST_WIN_STEP, 1)
    _, Y = _band_energy(y, BANDS, ybands, channels, nframes,
                        TEST_WIN_SIZE // downsample,
                        TEST_WIN_STEP // downsample, downsample)

    # masking, per frame like the reference (crosstalk from frame xi-1 feeds
    # the temporal recursion of frame xi)
    for xi in range(nframes):
        for bi in range(1, NBANDS):
            xb[xi, bi, :] += 0.1 * xb[xi, bi - 1, :]
        for bi in range(NBANDS - 2, -1, -1):
            xb[xi, bi, :] += 0.03 * xb[xi, bi + 1, :]
        if xi > 0:
            xb[xi] += 0.5 * xb[xi - 1]
        if channels == 2:
            l = xb[xi, :, 0].copy()
            r = xb[xi, :, 1].copy()
            xb[xi, :, 0] += 0.01 * r
            xb[xi, :, 1] += 0.01 * l

    for bi in range(ybands):
        lo, hi = int(BANDS[bi]), int(BANDS[bi + 1])
        X[:, lo:hi, :] += 0.1 * xb[:, bi:bi + 1, :]
        Y[:, lo:hi, :] += 0.1 * xb[:, bi:bi + 1, :]

    # two-frame averaging
    nf = int(BANDS[ybands])
    Xa = X[:, :nf, :].copy()
    Ya = Y[:, :nf, :].copy()
    Xa[1:] = X[1:, :nf, :] + X[:-1, :nf, :]
    Ya[1:] = Y[1:, :nf, :] + Y[:-1, :nf, :]

    if rate == 48000:
        max_compare = int(BANDS[NBANDS])
    elif rate == 12000:
        max_compare = int(BANDS[ybands])
    else:
        max_compare = int(BANDS[ybands]) - 3

    err = 0.0
    re = Ya / Xa
    im = re - np.log(re) - 1
    # reduced sensitivity around the SILK/CELT crossover
    im[:, 79:min(82, nf), :] *= 0.1
    if nf > 80:
        im[:, 80, :] *= 0.1
    for xi in range(nframes):
        ef = 0.0
        for bi in range(ybands):
            lo = int(BANDS[bi])
            hi = min(int(BANDS[bi + 1]), max_compare)
            if hi <= lo:
                continue
            eb = float(im[xi, lo:hi, :].sum())
            eb /= (BANDS[bi + 1] - BANDS[bi]) * channels
            ef += eb * eb
        ef /= NBANDS
        ef *= ef
        err += ef * ef
    err = (err / nframes) ** (1.0 / 16)
    q = 100 * (1 - 0.5 * np.log(1 + err) / np.log(1.13))
    return err, q


# ---------------------------------------------------------------------------
# QEXT conformance comparator (reference: src/qext_compare.c): extends the
# gate to 96 kHz (28 Bark-derived bands to 48 kHz) with a dual err4/err16
# metric, deemphasis-shaped noise floor, and full-bandwidth RMS.

QEXT_NBANDS = 28
QEXT_BANDS = np.array([0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40,
                       48, 56, 68, 80, 96, 120, 156, 200, 240, 280, 320,
                       360, 400, 440, 480])
QEXT_NFREQS = 480
QEXT_WIN = 960
QEXT_STEP = 240


def _qext_band_energy(x, bands, nbands, nch, nframes, win_sz, step,
                      downsample):
    """(reference: band_energy qext_compare.c:130; Blackman-Harris
    window, +0.1 power floor)"""
    n = win_sz
    ph = (np.arange(n) + 0.5) / n
    win = (0.35875 - 0.48829 * np.cos(2 * np.pi * ph)
           + 0.14128 * np.cos(4 * np.pi * ph)
           - 0.01168 * np.cos(6 * np.pi * ph))
    nfreq = int(bands[nbands])
    frames = np.stack([x[i * step:i * step + n, :] for i in range(nframes)])
    wx = frames * win[None, :, None]
    spec = np.fft.rfft(wx.astype(np.float64), axis=1)[:, :nfreq, :]
    ps = (np.abs(spec * downsample) ** 2) + 0.1
    band_e = np.empty((nframes, nbands, nch))
    for bi in range(nbands):
        lo, hi = int(bands[bi]), int(bands[bi + 1])
        band_e[:, bi, :] = ps[:, lo:hi, :].sum(axis=1) / (hi - lo)
    full = np.zeros((nframes, n // 2, nch))
    full[:, :nfreq, :] = ps
    return band_e, full


def qext_compare(ref_stereo: np.ndarray, test: np.ndarray, channels: int = 1,
                 rate: int = 96000, base_rate: int = 96000):
    """Returns (err4, err16, rms) (reference: qext_compare.c main).
    ref_stereo: int16-valued [n*2] interleaved stereo reference at
    base_rate; test: int16-valued [m*channels] at `rate`.  rms is -1
    unless stereo full-rate."""
    if base_rate == 96000:
        nbands, bands = QEXT_NBANDS, QEXT_BANDS
        nfreqs, win_sz, step = QEXT_NFREQS, QEXT_WIN, QEXT_STEP
    else:
        nbands, bands = 22, QEXT_BANDS[:23]
        nfreqs, win_sz, step = 240, 480, 120
    ybands = {8000: 13, 12000: 15, 16000: 17, 24000: 19, 48000: 22,
              96000: QEXT_NBANDS}[rate]
    if rate == base_rate:
        ybands = nbands
    downsample = base_rate // rate
    yfreqs = nfreqs // downsample

    xr = np.asarray(ref_stereo, np.float64).reshape(-1, 2)
    x = (0.5 * (xr[:, 0] + xr[:, 1]))[:, None] if channels == 1 else xr
    y = np.asarray(test, np.float64).reshape(-1, channels)
    xlength, ylength = len(x), len(y)
    if xlength != ylength * downsample:
        raise ValueError("sample counts do not match")
    if xlength < win_sz:
        raise ValueError("insufficient samples")
    rms = -1.0
    if channels == 2 and downsample == 1:
        rms = float(np.sqrt(np.mean((x - y) ** 2)))
    nframes = (xlength - win_sz + step) // step

    xb, X = _qext_band_energy(x, bands, nbands, channels, nframes,
                              win_sz, step, 1)
    _, Y = _qext_band_energy(y, bands, ybands, channels, nframes,
                             win_sz // downsample, step // downsample,
                             downsample)
    # 105 dB instantaneous dynamic range cap
    max_e = xb.max(axis=1, keepdims=True)
    np.maximum(xb, 3.16e-10 * max_e, out=xb)
    # masking (frequency, forward+backward temporal, crosstalk)
    for xi in range(nframes):
        for bi in range(1, nbands):
            xb[xi, bi, :] += 0.1 * xb[xi, bi - 1, :]
        for bi in range(nbands - 2, -1, -1):
            xb[xi, bi, :] += 0.03 * xb[xi, bi + 1, :]
        if xi > 0:
            xb[xi] += 0.5 * xb[xi - 1]
    for xi in range(nframes - 2, -1, -1):
        xb[xi] += 0.1 * xb[xi + 1]
    if channels == 2:
        l = xb[:, :, 0].copy()
        r = xb[:, :, 1].copy()
        xb[:, :, 0] += 0.000001 * r
        xb[:, :, 1] += 0.000001 * l
    for bi in range(ybands):
        lo, hi = int(bands[bi]), int(bands[bi + 1])
        X[:, lo:hi, :] += 0.1 * xb[:, bi:bi + 1, :]
        Y[:, lo:hi, :] += 0.1 * xb[:, bi:bi + 1, :]
    nf = int(bands[ybands])
    Xa = X[:, :nf, :].copy()
    Ya = Y[:, :nf, :].copy()
    Xa[1:] = X[1:, :nf, :] + X[:-1, :nf, :]
    Ya[1:] = Y[1:, :nf, :] + Y[:-1, :nf, :]

    if rate == base_rate:
        max_compare = int(bands[nbands])
    elif rate == 12000:
        max_compare = int(bands[ybands])
    else:
        max_compare = int(bands[ybands]) - 3

    freqs = np.arange(nf) * np.pi / 240.0
    thresh = 0.1 / (0.15 * 0.15 + freqs * freqs)
    w_band = 0.5 + 0.5 * np.tanh(0.5 * (22 - np.arange(ybands)))
    err4 = err16 = 0.0
    for xi in range(nframes):
        ef2 = ef4 = 0.0
        for bi in range(ybands):
            lo = int(bands[bi])
            hi = min(int(bands[bi + 1]), max_compare)
            if hi <= lo:
                eb2 = eb4 = 0.0
            else:
                th = thresh[lo:hi, None]
                re = (Ya[xi, lo:hi, :] + th) / (Xa[xi, lo:hi, :] + th)
                im2 = (re - np.log(re) - 1) * w_band[bi]
                re = (Ya[xi, lo:hi, :] + 10 * th) \
                    / (Xa[xi, lo:hi, :] + 10 * th)
                im4 = (re - np.log(re) - 1) * w_band[bi]
                eb2 = float(im2.sum())
                eb4 = float(im4.sum())
            eb2 /= (bands[bi + 1] - bands[bi]) * channels
            eb4 /= (bands[bi + 1] - bands[bi]) * channels
            ef2 += eb2
            ef4 += eb4 * eb4
        ef2 /= nbands
        ef4 /= nbands
        ef4 *= ef4
        err4 += ef2 * ef2
        err16 += ef4 * ef4
    err4 = (err4 / nframes) ** 0.25
    err16 = (err16 / nframes) ** (1.0 / 16)
    return err4, err16, rms

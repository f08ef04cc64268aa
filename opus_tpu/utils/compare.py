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

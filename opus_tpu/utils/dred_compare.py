"""DRED quality comparator: psychoacoustic audio distance (err4/err16 +
pitch correlation error) and feature-file MSE, for gating DRED and deep
PLC output quality.

Numpy re-implementation of the reference tool (dnn/dred_compare.c):
 - compare_audio: HP-filter both signals, short-time Blackman-Harris
   spectra (640/160 at 16 kHz), psychoacoustic spreading (-10/-25
   dB/Bark decay, dnn/dred_compare.c:229-249), temporal masking, then
   band-weighted loudness-domain L4/L16 errors (dnn/dred_compare.c:
   479-539) plus a normalized pitch-correlation error (:254-279).
 - compare_features: per-feature MSE over 20-dim f32 feature frames with
   a voiced-only pitch term (dnn/dred_compare.c:555-625).

All spectral work is one rfft over a strided frame matrix; the spreading
recurrences are first-order IIRs along the frequency axis (lfilter-free,
plain scans) — this is a host-side QA tool, not a TPU path.
"""

from __future__ import annotations

import numpy as np

NBANDS = 17
NFREQS = 320
TEST_WIN_SIZE = 640
TEST_WIN_STEP = 160
BANDS = np.array(
    [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
     272, 320])
PITCH_MIN = 32
PITCH_MAX = 256
PITCH_FRAME = 320
LOUDNESS = 0.2
NB_FEATURES = 20


def hp_filter(x: np.ndarray) -> np.ndarray:
    """The reference's input high-pass biquad (dnn/dred_compare.c:71-82):
    y[i] = x[i] + mem0;  mem0 = mem1 + (b0*x - a0*y);  mem1 = b1*x - a1*y
    with a=[-1.97354, 0.97417], b=[-2, 1]."""
    a = (-1.97354, 0.97417)
    b = (-2.0, 1.0)
    y = np.empty_like(x, dtype=np.float64)
    m0 = m1 = 0.0
    for i, xi in enumerate(x.astype(np.float64)):
        yi = xi + m0
        m0 = m1 + (b[0] * xi - a[0] * yi)
        m1 = b[1] * xi - a[1] * yi
        y[i] = yi
    return y


def _psydecay(nfreqs: int = NFREQS, fs: int = 16000):
    """-10 dB/Bark (right) and -25 dB/Bark (left) per-bin decay factors
    (dnn/dred_compare.c:229-249, via the Vorbis freq->Bark derivative)."""
    i = np.arange(nfreqs)
    f = fs * i / (2.0 * nfreqs)
    deriv = (8.288e-8 * f) / (3.4225e-16 * f ** 4 + 1) \
        + .009694 / (5.476e-7 * f * f + 1) + 1e-4
    deriv *= fs / (2.0 * nfreqs)
    return np.power(0.0031623, deriv), np.power(0.1, deriv)


def _spectrum(x: np.ndarray, nframes: int) -> np.ndarray:
    """[nframes, NFREQS] windowed power spectra + 0.1 floor
    (dnn/dred_compare.c:166-208; DC bin excluded like the C loop,
    which starts accumulating at band edge 0 -> bins [0,320))."""
    n = TEST_WIN_SIZE
    j = (np.arange(n) + 0.5) / n
    win = 0.35875 - 0.48829 * np.cos(2 * np.pi * j) \
        + 0.14128 * np.cos(4 * np.pi * j) - 0.01168 * np.cos(6 * np.pi * j)
    idx = np.arange(nframes)[:, None] * TEST_WIN_STEP + np.arange(n)
    frames = x[idx] * win
    # mini_kiss_fftr returns DFT/2 (celt/mini_kfft.c:489 MINI_HALF_OF)
    spec = np.fft.rfft(frames, axis=1)[:, :NFREQS] * 0.5
    return (spec.real ** 2 + spec.imag ** 2) + 0.1


def _xcorr_frame(x: np.ndarray, start: int) -> np.ndarray:
    """Normalized pitch xcorr for the frame starting at sample `start`
    (dnn/dred_compare.c:261-279): first-difference-filtered (1 - .8z^-1)
    over [start-PITCH_MAX-1, start+PITCH_FRAME)."""
    seg = x[start - PITCH_MAX - 1:start + PITCH_FRAME]
    filt = seg[1:] - 0.8 * seg[:-1]          # [PITCH_FRAME+PITCH_MAX]
    cur = filt[PITCH_MAX:]
    xx = float(cur @ cur)
    lags = np.arange(PITCH_MAX + 1)
    sl = np.stack([filt[PITCH_MAX - i:PITCH_MAX - i + PITCH_FRAME]
                   for i in lags])
    xy = sl @ cur
    yy = np.einsum("ij,ij->i", sl, sl)
    return xy / np.sqrt(xx * yy + PITCH_FRAME)


def compare_audio(x: np.ndarray, y: np.ndarray, skip: int = 0):
    """Psychoacoustic distance between 16 kHz mono signals in int16
    scale. Returns (err4, err16, pitch_error) exactly as the reference
    tool prints them (dnn/dred_compare.c compare_audio)."""
    y = y[skip:]
    n = min(len(x), len(y))
    x, y = hp_filter(x[:n]), hp_filter(y[:n])
    if n < TEST_WIN_SIZE:
        raise ValueError("insufficient sample data")
    nframes = (n - TEST_WIN_SIZE + TEST_WIN_STEP) // TEST_WIN_STEP

    pitch_error = 0.0
    pitch_count = 0
    for xi in range(2, nframes - 2):
        xc = _xcorr_frame(x, xi * TEST_WIN_STEP)
        yc = _xcorr_frame(y, xi * TEST_WIN_STEP)
        pitch = PITCH_MIN + int(np.argmax(xc[PITCH_MIN:PITCH_MAX + 1]))
        if xc[pitch] > .7:
            pitch_error += abs(xc[pitch] - yc[pitch])
            pitch_count += 1
    pitch_error = pitch_error / pitch_count if pitch_count else 0.0

    X = _spectrum(x, nframes)
    Y = _spectrum(y, nframes)

    decay_l, decay_r = _psydecay()
    norm = np.ones(NFREQS)
    for j in range(1, NFREQS):
        norm[j] = 1 + decay_r[j] * norm[j - 1]
    for j in range(NFREQS - 2, -1, -1):
        norm[j] = norm[j] + decay_l[j] * norm[j + 1]
    norm = 1.0 / norm
    for S in (X, Y):
        for j in range(1, NFREQS):
            S[:, j] += decay_r[j] * S[:, j - 1]
        for j in range(NFREQS - 2, -1, -1):
            S[:, j] += decay_l[j] * S[:, j + 1]
        S *= norm

    # 80 dB instantaneous dynamic range floor, then forward (-3 dB/2.5ms)
    # and backward (-10 dB/2.5ms) temporal masking
    max_e = X.max(axis=1, keepdims=True)
    np.maximum(X, 1e-8 * max_e, out=X)
    np.maximum(Y, 1e-8 * max_e, out=Y)
    for xi in range(1, nframes):
        X[xi] += .5 * X[xi - 1]
        Y[xi] += .5 * Y[xi - 1]
    for xi in range(nframes - 3, -1, -1):
        X[xi] += .1 * X[xi + 1]
        Y[xi] += .1 * Y[xi + 1]

    f = np.arange(NFREQS) * np.pi / 960
    thresh = .1 / (.15 * .15 + f * f)
    w = 1.0 / (BANDS[1:] - BANDS[:-1])

    d2 = (np.power(Y + thresh, LOUDNESS)
          - np.power(X + thresh, LOUDNESS)) ** 2
    t2 = np.power(X + thresh, 2 * LOUDNESS)
    d4 = (np.power(Y + 10 * thresh, LOUDNESS)
          - np.power(X + 10 * thresh, LOUDNESS)) ** 2

    err4 = err16 = t_tot = 0.0
    for xi in range(nframes):
        eb2 = np.add.reduceat(d2[xi], BANDS[:-1]) * w * w
        eb4 = np.add.reduceat(d4[xi], BANDS[:-1]) * w * w
        tb2 = np.add.reduceat(t2[xi], BANDS[:-1]) * w * w
        ef2 = eb2.sum() / NBANDS
        ef4 = (eb4 ** 2).sum() / NBANDS
        err4 += ef2 * ef2
        err16 += (ef4 * ef4) ** 2
        t_tot += tb2.sum() / NBANDS
    err4 = 100 * (err4 / nframes) ** 0.25 / np.sqrt(t_tot)
    err16 = 100 * (err16 / nframes) ** (1.0 / 16) / np.sqrt(t_tot)
    return float(err4), float(err16), float(pitch_error)


def compare_features(x: np.ndarray, y: np.ndarray):
    """Feature-domain comparison over [N, 20] float32 frames. Returns
    (total, max, pitch) per dnn/dred_compare.c:616-625: RMS over summed
    per-feature MSEs (pitch feature 18 excluded), max per-feature RMSE,
    and mean |pitch| error over frames with voicing (feature 19) > .2."""
    n = min(len(x), len(y))
    x, y = np.asarray(x[:n], np.float64), np.asarray(y[:n], np.float64)
    mse = np.mean((x - y) ** 2, axis=0)
    voiced = x[:, NB_FEATURES - 1] > .2
    pitch_error = (np.mean(np.abs(x[voiced, NB_FEATURES - 2]
                                  - y[voiced, NB_FEATURES - 2]))
                   if voiced.any() else 0.0)
    keep = np.arange(NB_FEATURES) != NB_FEATURES - 2
    tot_error = float(np.sqrt(mse[keep].sum()))
    max_error = float(np.sqrt(mse[keep].max()))
    return tot_error, max_error, float(pitch_error)


def read_pcm_file(path: str, fmt: str = "s16") -> np.ndarray:
    """Raw PCM file -> float in int16 scale (dnn/dred_compare.c:84-163;
    the HP filter is applied by compare_audio, not here)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if fmt == "s16":
        return raw.view("<i2").astype(np.float64)
    if fmt == "s24":
        b = raw.reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = ((v & 0xFFFFFF) ^ 0x800000) - 0x800000
        return v.astype(np.float64) / 256.0
    if fmt == "f32":
        return raw.view("<f4").astype(np.float64) * 32768.0
    raise ValueError(f"unknown format {fmt!r}")

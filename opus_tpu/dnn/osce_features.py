"""OSCE feature calculation from SILK decoder state (reference:
dnn/osce_features.c).

Per 5 ms subframe, 93 features: 64-band log spectrum of the LPC
synthesis filter (clean spec), 18-band cepstrum of the decoded signal
(noisy cepstrum), 5-tap autocorrelation around the pitch lag, the 5
LTP coefficients, and the log subframe gain; plus per-frame numbits
(raw + smoothed) and post-processed pitch lags."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

OSCE_SPEC_WINDOW_SIZE = 320
OSCE_SPEC_NUM_FREQS = 161
OSCE_FEATURES_MAX_HISTORY = 350
OSCE_FEATURE_DIM = 93
OSCE_CLEAN_SPEC_START = 0
OSCE_CLEAN_SPEC_NUM_BANDS = 64
OSCE_NOISY_CEPSTRUM_START = 64
OSCE_NOISY_SPEC_NUM_BANDS = 18
OSCE_ACORR_START = 82
OSCE_LTP_START = 87
OSCE_LOG_GAIN_START = 92
OSCE_NO_PITCH_VALUE = 7
OSCE_PITCH_HANGOVER = 0
TYPE_VOICED = 2

# (reference: center_bins_clean/noisy, band_weights_* osce_features.c:44)
CENTER_BINS_CLEAN = np.array([
    0, 2, 5, 8, 10, 12, 15, 18, 20, 22, 25, 28, 30, 33, 35, 38, 40, 42,
    45, 48, 50, 52, 55, 58, 60, 62, 65, 68, 70, 73, 75, 78, 80, 82, 85,
    88, 90, 92, 95, 98, 100, 102, 105, 108, 110, 112, 115, 118, 120,
    122, 125, 128, 130, 132, 135, 138, 140, 142, 145, 148, 150, 152,
    155, 160])
CENTER_BINS_NOISY = np.array([0, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48,
                              56, 64, 80, 96, 112, 136, 160])


def _band_weights(center_bins):
    """weight_b = 2/support, with +1 at the edge bands (reproduces the
    checked-in tables, osce_features.c:72-97; validated in tests)."""
    n = len(center_bins)
    w = np.zeros(n)
    for b in range(n):
        lo = center_bins[b - 1] if b > 0 else center_bins[0]
        hi = center_bins[b + 1] if b < n - 1 else center_bins[-1]
        edge = 1 if b in (0, n - 1) else 0
        w[b] = 2.0 / (hi - lo + edge)
    return w


BAND_WEIGHTS_CLEAN = _band_weights(CENTER_BINS_CLEAN)
BAND_WEIGHTS_NOISY = _band_weights(CENTER_BINS_NOISY)

# analysis window sin((i+.5)*pi/320) (reference table osce_features.c:116)
OSCE_WINDOW = np.sin((np.arange(OSCE_SPEC_WINDOW_SIZE) + 0.5) * np.pi
                     / OSCE_SPEC_WINDOW_SIZE).astype(np.float32)

# orthonormal DCT-II, matches dnn/freq.c dct()
_ii, _jj = np.meshgrid(np.arange(18), np.arange(18), indexing="ij")
_DCT18 = np.cos((_ii + 0.5) * _jj * np.pi / 18)
_DCT18[:, 0] *= np.sqrt(0.5)
del _ii, _jj


def apply_filterbank(x, center_bins, band_weights):
    """(reference: apply_filterbank osce_features.c:126)"""
    n = len(center_bins)
    out = np.zeros(n)
    for b in range(n - 1):
        i = np.arange(center_bins[b], center_bins[b + 1])
        frac = (center_bins[b + 1] - i) / (center_bins[b + 1]
                                           - center_bins[b])
        out[b] += band_weights[b] * np.sum(frac * x[i])
        out[b + 1] += band_weights[b + 1] * np.sum((1 - frac) * x[i])
    out[n - 1] += band_weights[n - 1] * x[center_bins[n - 1]]
    return out


def mag_spec_320(x) -> np.ndarray:
    """Unnormalized one-sided magnitude spectrum (reference:
    mag_spec_320_onesided osce_features.c:150: kiss forward scales by
    1/N, then the result is multiplied back by N)."""
    X = np.fft.fft(np.asarray(x, np.float64), OSCE_SPEC_WINDOW_SIZE)
    return np.abs(X[:OSCE_SPEC_NUM_FREQS])


def calculate_log_spectrum_from_lpc(a_q12, lpc_order) -> np.ndarray:
    """(reference: calculate_log_spectrum_from_lpc
    osce_features.c:229)"""
    buf = np.zeros(OSCE_SPEC_WINDOW_SIZE)
    buf[0] = 1.0
    buf[1:lpc_order + 1] = -np.asarray(a_q12[:lpc_order],
                                       np.float64) / 4096.0
    mag = mag_spec_320(buf)
    inv = 1.0 / (mag + 1e-9)
    spec = apply_filterbank(inv, CENTER_BINS_CLEAN, BAND_WEIGHTS_CLEAN)
    return (0.3 * np.log(spec + 1e-9)).astype(np.float32)


def calculate_cepstrum(signal) -> np.ndarray:
    """(reference: calculate_cepstrum osce_features.c:259); signal is
    the 320 samples ENDING at the current subframe."""
    win = OSCE_WINDOW * np.asarray(signal, np.float64)
    mag = mag_spec_320(win)
    spec = apply_filterbank(mag, CENTER_BINS_NOISY, BAND_WEIGHTS_NOISY)
    logs = np.log(spec + 1e-9)
    return ((logs @ _DCT18) * np.sqrt(2.0 / 18)).astype(np.float32)


def calculate_acorr(signal, lag) -> np.ndarray:
    """5-tap normalized autocorrelation around the pitch lag
    (reference: calculate_acorr osce_features.c:292).  signal is
    indexable at [-lag-2, 80)."""
    out = np.empty(5, np.float32)
    x = np.asarray(signal, np.float64)
    base = len(x) - 80
    cur = x[base:]
    xx = float(np.dot(cur, cur))
    for k in range(-2, 3):
        seg = x[base - lag + k:base - lag + k + 80]
        yy = float(np.dot(seg, seg))
        xy = float(np.dot(cur, seg))
        out[k + 2] = xy / np.sqrt(xx * yy + 1e-9)
    return out


class OSCEFeatureState(NamedTuple):
    numbits_smooth: float
    pitch_hangover_count: int
    last_lag: int
    last_type: int
    signal_history: np.ndarray     # [350]


def init_feature_state() -> OSCEFeatureState:
    return OSCEFeatureState(0.0, 0, 0, 0,
                            np.zeros(OSCE_FEATURES_MAX_HISTORY,
                                     np.float32))


def pitch_postprocessing(st: OSCEFeatureState, lag: int, sig_type: int):
    """(reference: pitch_postprocessing osce_features.c:314; hangover
    disabled to match the deployed python training code)."""
    if sig_type != TYPE_VOICED:
        new_lag = OSCE_NO_PITCH_VALUE
        hangover = 0
        last_lag = st.last_lag
    else:
        new_lag = lag
        last_lag = lag
        hangover = 0
    return st._replace(last_lag=last_lag, last_type=sig_type,
                       pitch_hangover_count=hangover), new_lag


def calculate_features(st: OSCEFeatureState, xq: np.ndarray,
                       num_bits: int, pred_coef_q12, pitch_lags,
                       ltp_coef_q14, gains_q16, signal_type: int,
                       lpc_order: int, nb_subframes: int = 4):
    """(reference: osce_calculate_features osce_features.c:368).
    xq: int16 decoded speech [80*nb_subframes].  pred_coef_q12:
    [2][lpc_order].  Returns (state, features [4,93], numbits [2],
    periods [4])."""
    num_samples = nb_subframes * 80
    numbits_smooth = 0.9 * st.numbits_smooth + 0.1 * num_bits
    numbits = np.array([num_bits, numbits_smooth], np.float32)
    buffer = np.zeros(OSCE_FEATURES_MAX_HISTORY + num_samples,
                      np.float32)
    buffer[:OSCE_FEATURES_MAX_HISTORY] = st.signal_history
    buffer[OSCE_FEATURES_MAX_HISTORY:] = \
        np.asarray(xq[:num_samples], np.float32) / 32768.0
    features = np.zeros((nb_subframes, OSCE_FEATURE_DIM), np.float32)
    periods = np.zeros(nb_subframes, np.int32)
    state = st._replace(numbits_smooth=float(numbits_smooth))
    for k in range(nb_subframes):
        fstart = OSCE_FEATURES_MAX_HISTORY + k * 80
        if k % 2 == 0:
            features[k, :64] = calculate_log_spectrum_from_lpc(
                pred_coef_q12[k >> 1], lpc_order)
            features[k, 64:82] = calculate_cepstrum(
                buffer[fstart - 160:fstart + 160])
        else:
            features[k, :64] = features[k - 1, :64]
            features[k, 64:82] = features[k - 1, 64:82]
        state, periods[k] = pitch_postprocessing(
            state, int(pitch_lags[k]), signal_type)
        features[k, 82:87] = calculate_acorr(
            buffer[:fstart + 80], int(periods[k]))
        features[k, 87:92] = np.asarray(
            ltp_coef_q14[k * 5:(k + 1) * 5], np.float32) / 16384.0
        features[k, 92] = np.log(gains_q16[k] / 65536.0 + 1e-9)
    state = state._replace(
        signal_history=buffer[num_samples:num_samples
                              + OSCE_FEATURES_MAX_HISTORY].copy())
    return state, features, numbits, periods

"""LPCNet feature extraction (reference: dnn/freq.c, dnn/lpcnet_enc.c,
dnn/burg.c; tables from dnn/dump_lpcnet_tables.c).

Per 10 ms / 160-sample 16 kHz frame: 36 features = 18 Burg-flavored
band cepstra + dnn pitch + pitch correlation + 16 LPC coefficients.
DRED and the deep-PLC/FARGAN path consume the first 20.

This module is numpy float32/float64 (it mirrors the reference's
scalar/double math exactly for parity); the per-stream batching on TPU
happens one level up, where feature frames feed the batched DNN stacks.
The pitch estimate is pluggable: compute_frame_features takes the
pitchdnn model/state from opus_tpu.dnn.pitchdnn.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import pitchdnn as pdnn

LPC_ORDER = 16
PREEMPHASIS = 0.85
FRAME_SIZE = 160
OVERLAP_SIZE = 160
TRAINING_OFFSET = 80
WINDOW_SIZE = FRAME_SIZE + OVERLAP_SIZE          # 320
FREQ_SIZE = WINDOW_SIZE // 2 + 1                 # 161
NB_BANDS = 18
NB_FEATURES = 20
NB_TOTAL_FEATURES = 36
WINDOW_SIZE_5MS = 4
PITCH_MIN_PERIOD = pdnn.PITCH_MIN_PERIOD
PITCH_MAX_PERIOD = pdnn.PITCH_MAX_PERIOD
PITCH_IF_MAX_FREQ = pdnn.PITCH_IF_MAX_FREQ

# (reference: eband5ms dnn/freq.c:45)
EBAND5MS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20,
                     24, 28, 34, 40])
# (reference: compensation dnn/freq.c:50)
_COMPENSATION = np.array([0.8, 1, 1, 1, 1, 1, 1, 1, 0.666667, 0.5, 0.5,
                          0.5, 0.333333, 0.25, 0.25, 0.2, 0.166667,
                          0.173913], np.float32)

# tables (reference: dump_lpcnet_tables.c:84-100)
_i = np.arange(OVERLAP_SIZE)
HALF_WINDOW = np.sin(
    0.5 * np.pi * np.sin(0.5 * np.pi * (_i + 0.5) / OVERLAP_SIZE) ** 2
).astype(np.float32)
_ii, _jj = np.meshgrid(np.arange(NB_BANDS), np.arange(NB_BANDS),
                       indexing="ij")
DCT_TABLE = np.cos((_ii + 0.5) * _jj * np.pi / NB_BANDS)
DCT_TABLE[:, 0] *= np.sqrt(0.5)
DCT_TABLE = DCT_TABLE.astype(np.float32)
del _i, _ii, _jj

# triangular band interpolation matrix [FREQ bins x NB_BANDS]
def _band_matrix():
    m = np.zeros((FREQ_SIZE, NB_BANDS), np.float64)
    for b in range(NB_BANDS - 1):
        size = (EBAND5MS[b + 1] - EBAND5MS[b]) * WINDOW_SIZE_5MS
        for j in range(size):
            frac = j / size
            m[EBAND5MS[b] * WINDOW_SIZE_5MS + j, b] += 1 - frac
            m[EBAND5MS[b] * WINDOW_SIZE_5MS + j, b + 1] += frac
    m[:, 0] *= 2
    m[:, NB_BANDS - 1] *= 2
    return m

_BAND_M = _band_matrix()


def forward_transform(x: np.ndarray) -> np.ndarray:
    """320-point FFT with kiss_fft's forward 1/N scaling (reference:
    forward_transform dnn/freq.c:239).  Returns FREQ_SIZE bins."""
    return (np.fft.fft(np.asarray(x, np.float64)) / WINDOW_SIZE)[
        :FREQ_SIZE]


def compute_band_energy(X: np.ndarray) -> np.ndarray:
    """(reference: lpcn_compute_band_energy dnn/freq.c:126)"""
    p = (X.real ** 2 + X.imag ** 2)
    return (p @ _BAND_M).astype(np.float32)


def compute_band_energy_inverse(X: np.ndarray) -> np.ndarray:
    """(reference: compute_band_energy_inverse dnn/freq.c:54)"""
    p = 1.0 / (X.real ** 2 + X.imag ** 2 + 1e-9)
    return (p @ _BAND_M).astype(np.float32)


def dct18(x: np.ndarray) -> np.ndarray:
    """(reference: dct dnn/freq.c:223)"""
    return (x @ DCT_TABLE) * np.sqrt(2.0 / NB_BANDS)


def idct18(x: np.ndarray) -> np.ndarray:
    return (x @ DCT_TABLE.T) * np.sqrt(2.0 / NB_BANDS)


def burg_analysis(x: np.ndarray, min_inv_gain: float, subfr_length: int,
                  nb_subfr: int, order: int):
    """Burg's method with max-gain limiting, double precision
    (reference: silk_burg_analysis dnn/burg.c:97).  Returns (A, residual
    energy)."""
    x = np.asarray(x, np.float32)
    C0 = float(np.sum(x[:nb_subfr * subfr_length].astype(np.float64)
                      ** 2))
    C_first = np.zeros(order)
    for s in range(nb_subfr):
        xp = x[s * subfr_length:(s + 1) * subfr_length].astype(
            np.float64)
        for n in range(1, order + 1):
            C_first[n - 1] += np.dot(xp[:subfr_length - n], xp[n:])
    C_last = C_first.copy()
    CAf = np.zeros(order + 1)
    CAb = np.zeros(order + 1)
    CAb[0] = CAf[0] = C0 + 1e-5 * C0 + 1e-9
    Af = np.zeros(order)
    inv_gain = 1.0
    reached_max = False
    for n in range(order):
        for s in range(nb_subfr):
            xp = x[s * subfr_length:(s + 1) * subfr_length].astype(
                np.float64)
            tmp1 = xp[n]
            tmp2 = xp[subfr_length - n - 1]
            for k in range(n):
                C_first[k] -= xp[n] * xp[n - k - 1]
                C_last[k] -= xp[subfr_length - n - 1] \
                    * xp[subfr_length - n + k]
                tmp1 += xp[n - k - 1] * Af[k]
                tmp2 += xp[subfr_length - n + k] * Af[k]
            for k in range(n + 1):
                CAf[k] -= tmp1 * xp[n - k]
                CAb[k] -= tmp2 * xp[subfr_length - n + k - 1]
        tmp1 = C_first[n]
        tmp2 = C_last[n]
        for k in range(n):
            tmp1 += C_last[n - k - 1] * Af[k]
            tmp2 += C_first[n - k - 1] * Af[k]
        CAf[n + 1] = tmp1
        CAb[n + 1] = tmp2
        num = CAb[n + 1]
        nrg_b, nrg_f = CAb[0], CAf[0]
        for k in range(n):
            num += CAb[n - k] * Af[k]
            nrg_b += CAb[k + 1] * Af[k]
            nrg_f += CAf[k + 1] * Af[k]
        rc = -2.0 * num / (nrg_f + nrg_b)
        tmp1 = inv_gain * (1.0 - rc * rc)
        if tmp1 <= min_inv_gain:
            rc = np.sqrt(1.0 - min_inv_gain / inv_gain)
            if num > 0:
                rc = -rc
            inv_gain = min_inv_gain
            reached_max = True
        else:
            inv_gain = tmp1
        for k in range((n + 1) >> 1):
            t1, t2 = Af[k], Af[n - k - 1]
            Af[k] = t1 + rc * t2
            Af[n - k - 1] = t2 + rc * t1
        Af[n] = rc
        if reached_max:
            Af[n + 1:] = 0
            break
        for k in range(n + 2):
            t1 = CAf[k]
            CAf[k] += rc * CAb[n - k + 1]
            CAb[n - k + 1] += rc * t1
    if reached_max:
        A = (-Af).astype(np.float32)
        for s in range(nb_subfr):
            xp = x[s * subfr_length:s * subfr_length + order].astype(
                np.float64)
            C0 -= float(np.sum(xp * xp))
        nrg_f = C0 * inv_gain
    else:
        nrg_f = CAf[0]
        tmp1 = 1.0
        A = np.empty(order, np.float32)
        for k in range(order):
            nrg_f += CAf[k + 1] * Af[k]
            tmp1 += Af[k] * Af[k]
            A[k] = -Af[k]
        nrg_f -= 1e-5 * C0 * tmp1
    return A, max(0.0, float(nrg_f))


def _lpcn_lpc(ac: np.ndarray, order: int):
    """Levinson-Durbin with 30 dB bail-out (reference: lpcn_lpc
    dnn/freq.c:81)."""
    lpc = np.zeros(order, np.float64)
    error = float(ac[0])
    if ac[0] != 0:
        for i in range(order):
            rr = 0.0
            for j in range(i):
                rr += lpc[j] * ac[i - j]
            rr += ac[i + 1]
            r = -rr / error
            lpc[i] = r
            for j in range((i + 1) >> 1):
                t1, t2 = lpc[j], lpc[i - 1 - j]
                lpc[j] = t1 + r * t2
                lpc[i - 1 - j] = t2 + r * t1
            error -= r * r * error
            if error < 0.001 * ac[0]:
                break
    return lpc.astype(np.float32), error


def _interp_band_gain(bandE: np.ndarray) -> np.ndarray:
    """(reference: interp_band_gain dnn/freq.c:205)"""
    g = np.zeros(FREQ_SIZE, np.float64)
    for b in range(NB_BANDS - 1):
        size = (EBAND5MS[b + 1] - EBAND5MS[b]) * WINDOW_SIZE_5MS
        j = np.arange(size)
        frac = j / size
        g[EBAND5MS[b] * WINDOW_SIZE_5MS + j] = \
            (1 - frac) * bandE[b] + frac * bandE[b + 1]
    return g


def lpc_from_bands(Ex: np.ndarray):
    """(reference: lpc_from_bands dnn/freq.c:270)"""
    Xr = _interp_band_gain(Ex)
    Xr[FREQ_SIZE - 1] = 0
    full = np.concatenate([Xr, Xr[-2:0:-1]])
    x_auto = np.real(np.fft.ifft(full))    # kiss inverse: no 1/N in ref
    # kiss float inverse_transform has no scaling; np.fft.ifft has 1/N
    x_auto = x_auto * WINDOW_SIZE
    ac = x_auto[:LPC_ORDER + 1].copy()
    ac[0] += ac[0] * 1e-4 + 320 / 12 / 38.0
    ac[1:] *= (1 - 6e-5 * np.arange(1, LPC_ORDER + 1) ** 2)
    return _lpcn_lpc(ac, LPC_ORDER)


def lpc_from_cepstrum(cepstrum: np.ndarray):
    """(reference: lpc_from_cepstrum dnn/freq.c:305)"""
    tmp = np.asarray(cepstrum[:NB_BANDS], np.float32).copy()
    tmp[0] += 4
    Ex = 10.0 ** idct18(tmp) * _COMPENSATION
    return lpc_from_bands(Ex)


def compute_burg_cepstrum(pcm: np.ndarray, length: int,
                          order: int) -> np.ndarray:
    """(reference: compute_burg_cepstrum dnn/freq.c:159)"""
    burg_in = pcm[1:length] - PREEMPHASIS * pcm[:length - 1]
    lpc, g = burg_analysis(burg_in, 1e-3, length - 1, 1, order)
    g /= length - 2 * (order - 1)
    x = np.zeros(WINDOW_SIZE, np.float32)
    x[0] = 1
    x[1:order + 1] = -lpc * 0.995 ** np.arange(1, order + 1)
    X = forward_transform(x)
    Eburg = compute_band_energy_inverse(X)
    Eburg = Eburg * (0.45 * g / float(WINDOW_SIZE) ** 3)
    Ly = np.empty(NB_BANDS, np.float32)
    log_max, follow = -2.0, -2.0
    for i in range(NB_BANDS):
        v = np.log10(1e-2 + Eburg[i])
        v = max(log_max - 8, max(follow - 2.5, v))
        log_max = max(log_max, v)
        follow = max(follow - 2.5, v)
        Ly[i] = v
    ceps = dct18(Ly)
    ceps[0] -= 4
    return ceps


def burg_cepstral_analysis(x: np.ndarray) -> np.ndarray:
    """Two half-frame cepstra -> mean/diff (reference:
    burg_cepstral_analysis dnn/freq.c:183).  Returns [2*NB_BANDS]."""
    c0 = compute_burg_cepstrum(x[:FRAME_SIZE // 2], FRAME_SIZE // 2,
                               LPC_ORDER)
    c1 = compute_burg_cepstrum(x[FRAME_SIZE // 2:FRAME_SIZE],
                               FRAME_SIZE // 2, LPC_ORDER)
    return np.concatenate([0.5 * (c0 + c1), c0 - c1])


def celt_fir(x_hist: np.ndarray, num: np.ndarray,
             n: int, order: int) -> np.ndarray:
    """y[i] = x[i] + sum_j num[j]*x[i-j-1] (reference: celt_fir_c
    celt/celt_lpc.c:146).  x_hist has `order` history samples first."""
    y = x_hist[order:order + n].astype(np.float64).copy()
    for j in range(order):
        y += num[j] * x_hist[order - 1 - j:order - 1 - j + n]
    return y.astype(np.float32)


class FeatureState(NamedTuple):
    analysis_mem: np.ndarray       # [OVERLAP]
    mem_preemph: float
    prev_if: np.ndarray            # [PITCH_IF_MAX_FREQ] complex
    pitch_mem: np.ndarray          # [LPC_ORDER]
    pitch_filt: float
    exc_buf: np.ndarray            # [PITCH_MAX_PERIOD + FRAME]
    lp_buf: np.ndarray             # [PITCH_MAX_PERIOD + FRAME]
    lp_mem: np.ndarray             # [2]
    dnn: pdnn.PitchDNNState


def init_state() -> FeatureState:
    return FeatureState(
        analysis_mem=np.zeros(OVERLAP_SIZE, np.float32),
        mem_preemph=0.0,
        prev_if=np.zeros(PITCH_IF_MAX_FREQ, np.complex128),
        pitch_mem=np.zeros(LPC_ORDER, np.float32),
        pitch_filt=0.0,
        exc_buf=np.zeros(PITCH_MAX_PERIOD + FRAME_SIZE, np.float32),
        lp_buf=np.zeros(PITCH_MAX_PERIOD + FRAME_SIZE, np.float32),
        lp_mem=np.zeros(2, np.float64),
        dnn=pdnn.init_state())


def _biquad(x: np.ndarray, mem: np.ndarray, b, a) -> np.ndarray:
    """(reference: biquad dnn/lpcnet_enc.c:85)"""
    y = np.empty_like(x)
    m0, m1 = float(mem[0]), float(mem[1])
    for i in range(len(x)):
        xi = float(x[i])
        yi = xi + m0
        m00 = m0
        m0 = (b[0] - a[0]) * xi + m1 - a[0] * m0
        m1 = (b[1] - a[1]) * xi + 1e-30 - a[1] * m00
        y[i] = yi
    mem[0], mem[1] = m0, m1
    return y


_LP_B = (-0.84946, 1.0)
_LP_A = (-1.54220, 0.70781)


def compute_frame_features(st: FeatureState, pcm: np.ndarray,
                           model: pdnn.PitchDNNModel):
    """One 160-sample frame -> 36 features (reference:
    compute_frame_features dnn/lpcnet_enc.c:107 + preemphasis in
    lpcnet_compute_single_frame_features_impl :209).  Returns
    (new_state, features[36])."""
    x = np.asarray(pcm, np.float32).copy()
    # preemphasis (lpcnet_enc.c:199)
    mem = st.mem_preemph
    for i in range(FRAME_SIZE):
        yi = x[i] + mem
        mem = -PREEMPHASIS * x[i]
        x[i] = yi
    feats = np.zeros(NB_TOTAL_FEATURES, np.float32)
    aligned = np.empty(FRAME_SIZE, np.float32)
    aligned[:TRAINING_OFFSET] = \
        st.analysis_mem[OVERLAP_SIZE - TRAINING_OFFSET:]
    # frame analysis: window + FFT + band energies
    win = np.concatenate([st.analysis_mem, x]).astype(np.float64)
    win[:OVERLAP_SIZE] *= HALF_WINDOW
    win[WINDOW_SIZE - OVERLAP_SIZE:] *= HALF_WINDOW[::-1]
    X = forward_transform(win)
    Ex = compute_band_energy(X)
    analysis_mem = x[FRAME_SIZE - OVERLAP_SIZE:].copy()
    # instantaneous-frequency features (lpcnet_enc.c:116)
    if_feat = np.zeros(pdnn.PITCH_IF_FEATURES, np.float32)
    if_feat[0] = np.clip(
        (1 / 64) * (10 * np.log10(1e-15 + X[0].real ** 2) - 6), -1, 1)
    prod = X[1:PITCH_IF_MAX_FREQ] * np.conj(st.prev_if[1:])
    norm = 1.0 / np.sqrt(1e-15 + prod.real ** 2 + prod.imag ** 2)
    prod = prod * norm
    i = np.arange(1, PITCH_IF_MAX_FREQ)
    if_feat[3 * i - 2] = prod.real
    if_feat[3 * i - 1] = prod.imag
    if_feat[3 * i] = np.clip(
        (1 / 64) * (10 * np.log10(1e-15 + np.abs(
            X[1:PITCH_IF_MAX_FREQ]) ** 2) - 6), -1, 1)
    prev_if = X[:PITCH_IF_MAX_FREQ].copy()
    # cepstrum
    Ly = np.empty(NB_BANDS, np.float32)
    log_max, follow = -2.0, -2.0
    for b in range(NB_BANDS):
        v = np.log10(1e-2 + Ex[b])
        v = max(log_max - 8, max(follow - 2.5, v))
        log_max = max(log_max, v)
        follow = max(follow - 2.5, v)
        Ly[b] = v
    feats[:NB_BANDS] = dct18(Ly)
    feats[0] -= 4
    lpc, _ = lpc_from_cepstrum(feats[:NB_BANDS])
    feats[NB_BANDS + 2:NB_BANDS + 2 + LPC_ORDER] = lpc
    # pitch buffers (lpcnet_enc.c:135-152)
    exc_buf = np.roll(st.exc_buf, -FRAME_SIZE)
    lp_buf = np.roll(st.lp_buf, -FRAME_SIZE)
    aligned[TRAINING_OFFSET:] = x[:FRAME_SIZE - TRAINING_OFFSET]
    xh = np.concatenate([st.pitch_mem, aligned])
    pitch_mem = aligned[FRAME_SIZE - LPC_ORDER:].copy()
    lp_buf[PITCH_MAX_PERIOD:] = celt_fir(xh, lpc, FRAME_SIZE, LPC_ORDER)
    filt = st.pitch_filt
    for i in range(FRAME_SIZE):
        exc_buf[PITCH_MAX_PERIOD + i] = \
            lp_buf[PITCH_MAX_PERIOD + i] + 0.7 * filt
        filt = lp_buf[PITCH_MAX_PERIOD + i]
    lp_mem = st.lp_mem.copy()
    lp_buf[PITCH_MAX_PERIOD:] = _biquad(lp_buf[PITCH_MAX_PERIOD:],
                                        lp_mem, _LP_B, _LP_A)
    # normalized xcorr features (lpcnet_enc.c:154-185)
    nlag = PITCH_MAX_PERIOD - PITCH_MIN_PERIOD
    cur = exc_buf[PITCH_MAX_PERIOD:].astype(np.float64)
    xcorr = np.array([np.dot(cur, exc_buf[i:i + FRAME_SIZE]
                             .astype(np.float64))
                      for i in range(nlag)])
    ener0 = float(np.dot(cur, cur))
    ener1 = float(np.dot(exc_buf[:FRAME_SIZE].astype(np.float64),
                         exc_buf[:FRAME_SIZE].astype(np.float64)))
    xcf = np.empty(nlag, np.float32)
    for i in range(nlag):
        xcf[i] = 2 * xcorr[i] / (1 + ener0 + ener1)
        ener1 += float(exc_buf[i + FRAME_SIZE]) ** 2 \
            - float(exc_buf[i]) ** 2
    dnn_state, dnn_pitch = pdnn.compute_pitch(model, st.dnn, if_feat,
                                              xcf)
    dnn_pitch = float(dnn_pitch)
    pitch = int(np.floor(
        0.5 + 256.0 / 2.0 ** ((1.0 / 60) * ((dnn_pitch + 1.5) * 60))))
    lpb = lp_buf.astype(np.float64)
    xx = float(np.dot(lpb[PITCH_MAX_PERIOD:], lpb[PITCH_MAX_PERIOD:]))
    yy = float(np.dot(lpb[PITCH_MAX_PERIOD - pitch:
                          PITCH_MAX_PERIOD - pitch + FRAME_SIZE],
                      lpb[PITCH_MAX_PERIOD - pitch:
                          PITCH_MAX_PERIOD - pitch + FRAME_SIZE]))
    xy = float(np.dot(lpb[PITCH_MAX_PERIOD:],
                      lpb[PITCH_MAX_PERIOD - pitch:
                          PITCH_MAX_PERIOD - pitch + FRAME_SIZE]))
    frame_corr = xy / np.sqrt(1 + xx * yy)
    frame_corr = np.log(1 + np.exp(5 * frame_corr)) \
        / np.log(1 + np.exp(5.0))
    feats[NB_BANDS] = dnn_pitch
    feats[NB_BANDS + 1] = frame_corr - 0.5
    new_st = FeatureState(analysis_mem, mem, prev_if, pitch_mem, filt,
                          exc_buf, lp_buf, lp_mem, dnn_state)
    return new_st, feats

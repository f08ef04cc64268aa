"""SILK encoder float analysis (reference: silk/float/*.c).

Everything here is encoder-side float math whose outputs feed the exact
fixed-point quantizers in opus_tpu.silk.encoder; none of it needs to be
bit-identical to the reference (any valid encoder decision is legal)."""

from __future__ import annotations

import math

import numpy as np

from . import tables as T
from . import tables_data as TD
from .macros import (SILK_FIX_CONST, SMLAWB, SMULBB, SMULWB, wrap32,
                     lin2log, log2lin)
from .tables import (LTP_ORDER, PE_MIN_LAG_MS, PE_MAX_LAG_MS, MAX_NB_SUBFR,
                     TYPE_VOICED)

# tuning_parameters.h
FIND_PITCH_WHITE_NOISE_FRACTION = 1e-3
FIND_PITCH_BANDWIDTH_EXPANSION = 0.99
FIND_LPC_COND_FAC = 1e-5
BANDWIDTH_EXPANSION = 0.94
SHAPE_WHITE_NOISE_FRACTION = 3e-5
HARMONIC_SHAPING = 0.3
HIGH_RATE_OR_LOW_QUALITY_HARMONIC_SHAPING = 0.2
HP_NOISE_COEF = 0.25
HARM_HP_NOISE_COEF = 0.35
LOW_FREQ_SHAPING = 4.0
LOW_QUALITY_LOW_FREQ_SHAPING_DECR = 0.5
SUBFR_SMTH_COEF = 0.4
LAMBDA_OFFSET = 1.2
LAMBDA_SPEECH_ACT = -0.2
LAMBDA_DELAYED_DECISIONS = -0.05
LAMBDA_INPUT_QUALITY = -0.1
LAMBDA_CODING_QUALITY = -0.2
LAMBDA_QUANT_OFFSET = 0.8
BG_SNR_DECR_dB = 2.0
HARM_SNR_INCR_dB = 2.0
ENERGY_VARIATION_THRESHOLD_QNT_OFFSET = 0.6
LTP_CORR_INV_MAX = 0.03
MAX_SUM_LOG_GAIN_DB = 250.0


def sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


def apply_sine_window(x, win_type):
    """(reference: apply_sine_window_FLP.c).  Returns windowed copy."""
    length = len(x)
    freq = math.pi / (length + 1)
    c = 2.0 - freq * freq
    if win_type < 2:
        s0, s1 = 0.0, freq
    else:
        s0, s1 = 1.0, 0.5 * c
    out = np.empty(length)
    for k in range(0, length, 4):
        out[k] = x[k] * 0.5 * (s0 + s1)
        out[k + 1] = x[k + 1] * s1
        s0 = c * s1 - s0
        out[k + 2] = x[k + 2] * 0.5 * (s1 + s0)
        out[k + 3] = x[k + 3] * s0
        s1 = c * s0 - s1
    return out


def autocorrelation(x, order):
    n = len(x)
    return np.array([float(np.dot(x[:n - k], x[k:])) for k in range(order + 1)])


def schur(auto_corr, order):
    """Returns (refl_coefs, residual_energy)."""
    c0 = auto_corr[:order + 1].astype(np.float64).copy()
    c1 = c0.copy()
    rc = np.zeros(order)
    for k in range(order):
        rc_tmp = -c0[k + 1] / max(c1[0], 1e-9)
        rc[k] = rc_tmp
        for n in range(order - k):
            ctmp1 = c0[n + k + 1]
            ctmp2 = c1[n]
            c0[n + k + 1] = ctmp1 + ctmp2 * rc_tmp
            c1[n] = ctmp2 + ctmp1 * rc_tmp
    return rc, float(c1[0])


def k2a(rc, order):
    a = np.zeros(order)
    for k in range(order):
        rck = rc[k]
        for n in range((k + 1) >> 1):
            t1, t2 = a[n], a[k - n - 1]
            a[n] = t1 + t2 * rck
            a[k - n - 1] = t2 + t1 * rck
        a[k] = -rck
    return a


def bwexpander_flp(ar, chirp):
    c = chirp
    for i in range(len(ar) - 1):
        ar[i] *= c
        c *= chirp
    ar[-1] *= c


def lpc_analysis_filter_flp(x, a, order):
    """Residual r[n] = x[n] - sum a[k] x[n-1-k]; first `order` outputs zero."""
    n = len(x)
    res = np.zeros(n)
    if n > order:
        pred = np.zeros(n - order)
        for k in range(order):
            pred += a[k] * x[order - 1 - k:n - 1 - k]
        res[order:] = x[order:] - pred
    return res


def warped_autocorrelation(x, warping, order):
    """(reference: warped_autocorrelation_FLP.c)"""
    state = np.zeros(order + 1)
    c = np.zeros(order + 1)
    for xn in x:
        tmp1 = xn
        for i in range(0, order, 2):
            tmp2 = state[i] + warping * state[i + 1] - warping * tmp1
            state[i] = tmp1
            c[i] += state[0] * tmp1
            tmp1 = state[i + 1] + warping * state[i + 2] - warping * tmp2
            state[i + 1] = tmp2
            c[i + 1] += state[0] * tmp2
        state[order] = tmp1
        c[order] += state[0] * tmp1
    return c


def burg_modified(x, min_inv_gain, subfr_length, nb_subfr, order):
    """Returns (A, residual_energy) (reference: burg_modified_FLP.c)."""
    c0 = float(sum(np.dot(x[s * subfr_length:(s + 1) * subfr_length],
                          x[s * subfr_length:(s + 1) * subfr_length])
                   for s in range(nb_subfr)))
    c_first = np.zeros(order)
    for s in range(nb_subfr):
        xs = x[s * subfr_length:(s + 1) * subfr_length]
        for n in range(1, order + 1):
            c_first[n - 1] += float(np.dot(xs[:subfr_length - n], xs[n:]))
    c_last = c_first.copy()
    caf = np.zeros(order + 1)
    cab = np.zeros(order + 1)
    caf[0] = cab[0] = c0 + FIND_LPC_COND_FAC * c0 + 1e-9
    af = np.zeros(order)
    inv_gain = 1.0
    reached_max_gain = False
    for n in range(order):
        for s in range(nb_subfr):
            xs = x[s * subfr_length:(s + 1) * subfr_length]
            tmp1 = xs[n]
            tmp2 = xs[subfr_length - n - 1]
            for k in range(n):
                c_first[k] -= xs[n] * xs[n - k - 1]
                c_last[k] -= xs[subfr_length - n - 1] * xs[subfr_length - n + k]
                atmp = af[k]
                tmp1 += xs[n - k - 1] * atmp
                tmp2 += xs[subfr_length - n + k] * atmp
            for k in range(n + 1):
                caf[k] -= tmp1 * xs[n - k]
                cab[k] -= tmp2 * xs[subfr_length - n + k - 1]
        tmp1 = c_first[n]
        tmp2 = c_last[n]
        for k in range(n):
            atmp = af[k]
            tmp1 += c_last[n - k - 1] * atmp
            tmp2 += c_first[n - k - 1] * atmp
        caf[n + 1] = tmp1
        cab[n + 1] = tmp2
        num = cab[n + 1]
        nrg_b = cab[0]
        nrg_f = caf[0]
        for k in range(n):
            atmp = af[k]
            num += cab[n - k] * atmp
            nrg_b += cab[k + 1] * atmp
            nrg_f += caf[k + 1] * atmp
        rc = -2.0 * num / (nrg_f + nrg_b)
        tmp1 = inv_gain * (1.0 - rc * rc)
        if tmp1 <= min_inv_gain:
            rc = math.sqrt(1.0 - min_inv_gain / inv_gain)
            if num > 0:
                rc = -rc
            inv_gain = min_inv_gain
            reached_max_gain = True
        else:
            inv_gain = tmp1
        for k in range((n + 1) >> 1):
            t1, t2 = af[k], af[n - k - 1]
            af[k] = t1 + rc * t2
            af[n - k - 1] = t2 + rc * t1
        af[n] = rc
        if reached_max_gain:
            af[n + 1:] = 0.0
            break
        for k in range(n + 2):
            t1 = caf[k]
            caf[k] += rc * cab[n - k + 1]
            cab[n - k + 1] += rc * t1
    if reached_max_gain:
        a = -af
        for s in range(nb_subfr):
            c0 -= float(np.dot(x[s * subfr_length:s * subfr_length + order],
                               x[s * subfr_length:s * subfr_length + order]))
        nrg_f = c0 * inv_gain
    else:
        nrg_f = caf[0]
        tmp1 = 1.0
        for k in range(order):
            nrg_f += caf[k + 1] * af[k]
            tmp1 += af[k] * af[k]
        nrg_f -= FIND_LPC_COND_FAC * c0 * tmp1
        a = -af
    return a, float(nrg_f)


def find_pitch_lags(state, x_buf, res_out):
    """Pitch pre-analysis: windowed LPC + residual
    (reference: find_pitch_lags_FLP.c).  Returns (res, pred_gain)."""
    buf_len = state.la_pitch + state.frame_length + state.ltp_mem_length
    pw = state.pitch_lpc_win_length
    xseg = x_buf[buf_len - pw:buf_len]
    la = state.la_pitch
    wsig = np.concatenate([
        apply_sine_window(xseg[:la], 1),
        xseg[la:pw - la],
        apply_sine_window(xseg[pw - la:], 2)])
    order = state.pitch_estimation_lpc_order
    ac = autocorrelation(wsig, order)
    ac[0] += ac[0] * FIND_PITCH_WHITE_NOISE_FRACTION + 1
    rc, res_nrg = schur(ac, order)
    pred_gain = ac[0] / max(res_nrg, 1.0)
    a = k2a(rc, order)
    bwexpander_flp(a, FIND_PITCH_BANDWIDTH_EXPANSION)
    res = lpc_analysis_filter_flp(x_buf[:buf_len], a, order)
    res_out[:buf_len] = res
    return pred_gain


def _float2short(x):
    return np.clip(np.rint(np.asarray(x, np.float64)), -32768,
                   32767).astype(np.int64)


def _resampler_down2(x16):
    """silk_resampler_down2 (reference: silk/resampler_down2.c:36), fresh
    zero state; exact int32 math."""
    c0, c1 = 9872, 39809 - 65536
    s0 = s1 = 0
    n2 = len(x16) >> 1
    out = np.zeros(n2, np.int64)
    for k in range(n2):
        in32 = int(x16[2 * k]) << 10
        y = in32 - s0
        xx = SMULWB(y, c1) + y
        out32 = s0 + xx
        s0 = in32 + xx
        in32 = int(x16[2 * k + 1]) << 10
        y = in32 - s1
        xx = SMULWB(y, c0)
        out32 = out32 + s1 + xx
        s1 = in32 + xx
        out[k] = max(-32768, min(32767, (out32 + 1024) >> 11))
    return out


_RESAMPLER_2_3_COEFS_LQ = (-2797, -6507, 4697, 10739, 1567, 8276)


def _resampler_down2_3(x16):
    """silk_resampler_down2_3 (reference: silk/resampler_down2_3.c:46),
    fresh zero state."""
    cf = _RESAMPLER_2_3_COEFS_LQ
    n = len(x16)
    buf = np.zeros(n + 4, np.int64)
    # second-order AR filter, output Q8 (silk_resampler_private_AR2)
    s0 = s1 = 0
    for k in range(n):
        out32 = s0 + (int(x16[k]) << 8)
        buf[4 + k] = out32
        out32 <<= 2
        s0 = SMLAWB(s1, out32, cf[0])
        s1 = SMULWB(out32, cf[1])
    out = []
    i = 0
    counter = n
    while counter > 2:
        b = buf[i:i + 5]
        r = SMULWB(int(b[0]), cf[2])
        r = SMLAWB(r, int(b[1]), cf[3])
        r = SMLAWB(r, int(b[2]), cf[5])
        r = SMLAWB(r, int(b[3]), cf[4])
        out.append(max(-32768, min(32767, (r + 32) >> 6)))
        r = SMULWB(int(b[1]), cf[4])
        r = SMLAWB(r, int(b[2]), cf[5])
        r = SMLAWB(r, int(b[3]), cf[3])
        r = SMLAWB(r, int(b[4]), cf[2])
        out.append(max(-32768, min(32767, (r + 32) >> 6)))
        i += 3
        counter -= 3
    return np.asarray(out, np.int64)


NB_CBK_SEARCHS_STAGE3 = (16, 24, 34)
LAG_RANGE_STAGE3 = [[[TD.LAG_RANGE_STAGE3[(c * 4 + k) * 2 + e]
                      for e in range(2)] for k in range(4)]
                    for c in range(3)]
LAG_RANGE_STAGE3_10MS = [[-3, 7], [-2, 7]]
PE_SHORTLAG_BIAS = 0.2
PE_PREVLAG_BIAS = 0.2
PE_FLATCONTOUR_BIAS = 0.05
PE_NB_STAGE3_LAGS = 5


def pitch_analysis(res, fs_khz, nb_subfr, thres1, thres2, pe_complexity,
                   prev_lag, prev_ltp_corr):
    """3-stage decimated open-loop pitch search (reference:
    silk_pitch_analysis_core_FLP float/pitch_analysis_core_FLP.c:69).

    res: LPC residual, laid out [20 ms history | nb_subfr*5 ms frame] at
    fs_khz.  Returns (voiced, lag_index, contour_index, pitchL, ltp_corr).
    """
    f32 = np.float32
    frame_length = (20 + nb_subfr * 5) * fs_khz
    frame = np.asarray(res[:frame_length], np.float64)
    sf_length = 5 * fs_khz
    sf4, sf8 = 20, 40
    min_lag, max_lag = 2 * fs_khz, 18 * fs_khz - 1
    min4, max4 = 8, 72
    min8, max8 = 16, 143

    # decimate to 8 kHz then 4 kHz (exact int16 chain like the reference)
    x16 = _float2short(frame)
    if fs_khz == 16:
        f8 = _resampler_down2(x16)
    elif fs_khz == 12:
        f8 = _resampler_down2_3(x16)
    else:
        f8 = x16
    f4 = _resampler_down2(f8).astype(np.float64)
    # low-pass: x[i] += x[i-1], int16-saturating like the reference
    for i in range(len(f4) - 1, 0, -1):
        v = int(f4[i]) + int(f4[i - 1])
        f4[i] = max(-32768, min(32767, v))

    # ---- stage 1: 4 kHz, correlations over 10 ms chunks ----
    n4 = len(f4)
    c1 = np.zeros(max4 + 1, f32)
    t0 = 4 * sf4
    for k in range(nb_subfr >> 1):
        target = f4[t0 + k * sf8:t0 + (k + 1) * sf8]
        e_t = float(np.dot(target, target))
        for d in range(min4, max4 + 1):
            basis = f4[t0 + k * sf8 - d:t0 + (k + 1) * sf8 - d]
            cc = float(np.dot(target, basis))
            nrm = e_t + float(np.dot(basis, basis)) + sf8 * 4000.0
            c1[d] += f32(2 * cc / nrm)
    for d in range(max4, min4 - 1, -1):
        c1[d] -= c1[d] * d / f32(4096.0)

    length_d_srch = 4 + 2 * pe_complexity
    vals = c1[min4:max4 + 1]
    order = np.argsort(-vals, kind="stable")[:length_d_srch]
    svals = vals[order]
    cmax = float(svals[0])
    if cmax < 0.2:
        return False, 0, 0, [0] * nb_subfr, 0.0
    threshold = thres1 * cmax
    d_srch = []
    for i in range(length_d_srch):
        if svals[i] > threshold:
            d_srch.append((int(order[i]) + min4) << 1)
        else:
            break
    length_d_srch = len(d_srch)

    d_comp = np.zeros(max8 + 10, np.int64)
    for d in d_srch:
        d_comp[d] = 1
    for i in range(max8 + 3, min8 - 1, -1):
        d_comp[i] += d_comp[i - 1] + d_comp[i - 2]
    d_srch = [i for i in range(min8, max8 + 1) if d_comp[i + 1] > 0]
    for i in range(max8 + 3, min8 - 1, -1):
        d_comp[i] += d_comp[i - 1] + d_comp[i - 2] + d_comp[i - 3]
    d_comp_l = [i - 2 for i in range(min8, max8 + 4) if d_comp[i] > 0]

    # ---- stage 2: 8 kHz on surviving lag sections ----
    f8f = f8.astype(np.float64)
    c2 = np.zeros((nb_subfr, max8 + 5), f32)
    t0_8 = 20 * 8
    for k in range(nb_subfr):
        target = f8f[t0_8 + k * sf8:t0_8 + (k + 1) * sf8]
        e_t = float(np.dot(target, target)) + 1.0
        for d in d_comp_l:
            basis = f8f[t0_8 + k * sf8 - d:t0_8 + (k + 1) * sf8 - d]
            cc = float(np.dot(basis, target))
            if cc > 0.0:
                e_b = float(np.dot(basis, basis))
                c2[k, d] = f32(2 * cc / (e_b + e_t))

    if nb_subfr == 4:
        cbk_size = T.PE_NB_CBKS_STAGE2_EXT
        lag_cb = T.CB_LAGS_STAGE2
        nb_cbk = (T.PE_NB_CBKS_STAGE2_EXT
                  if fs_khz == 8 and pe_complexity > 0
                  else T.PE_NB_CBKS_STAGE2)
    else:
        cbk_size = T.PE_NB_CBKS_STAGE2_10MS
        lag_cb = T.CB_LAGS_STAGE2_10MS
        nb_cbk = T.PE_NB_CBKS_STAGE2_10MS

    prev_lag8 = prev_lag
    if prev_lag8 > 0:
        if fs_khz == 12:
            prev_lag8 = (prev_lag8 << 1) // 3
        elif fs_khz == 16:
            prev_lag8 >>= 1
        prev_lag_log2 = math.log2(float(prev_lag8))
    else:
        prev_lag_log2 = 0.0

    ccmax, ccmax_b = 0.0, -1000.0
    cbimax, lag = 0, -1
    for d in d_srch:
        cc = [sum(float(c2[i, d + lag_cb[i][j]]) for i in range(nb_subfr))
              for j in range(nb_cbk)]
        ccmax_new = max(cc)
        cbimax_new = cc.index(ccmax_new)
        lag_log2 = math.log2(float(d))
        ccmax_new_b = ccmax_new - PE_SHORTLAG_BIAS * nb_subfr * lag_log2
        if prev_lag8 > 0:
            dl2 = (lag_log2 - prev_lag_log2) ** 2
            ccmax_new_b -= (PE_PREVLAG_BIAS * nb_subfr * prev_ltp_corr
                            * dl2 / (dl2 + 0.5))
        if ccmax_new_b > ccmax_b and ccmax_new > nb_subfr * thres2:
            ccmax_b = ccmax_new_b
            ccmax = ccmax_new
            lag = d
            cbimax = cbimax_new
    if lag == -1:
        return False, 0, 0, [0] * nb_subfr, 0.0

    ltp_corr = ccmax / nb_subfr
    if fs_khz > 8:
        # ---- stage 3: full rate around the stage-2 winner ----
        if fs_khz == 12:
            lag = (lag * 3 + 1) >> 1
        else:
            lag <<= 1
        lag = min(max(lag, min_lag), max_lag)
        start_lag = max(lag - 2, min_lag)
        end_lag = min(lag + 2, max_lag)
        lag_new = lag
        cbimax = 0
        ccmax = -1000.0
        contour_bias = PE_FLATCONTOUR_BIAS / lag
        if nb_subfr == 4:
            nb_cbk3 = NB_CBK_SEARCHS_STAGE3[pe_complexity]
            lag_cb3 = T.CB_LAGS_STAGE3
            lag_rng = LAG_RANGE_STAGE3[pe_complexity]
        else:
            nb_cbk3 = T.PE_NB_CBKS_STAGE3_10MS
            lag_cb3 = T.CB_LAGS_STAGE3_10MS
            lag_rng = LAG_RANGE_STAGE3_10MS
        t0f = 20 * fs_khz
        energy_tmp = float(np.dot(frame[t0f:t0f + nb_subfr * sf_length],
                                  frame[t0f:t0f + nb_subfr * sf_length])) \
            + 1.0
        # per-subframe correlations/energies over the full contour span
        cc3 = {}
        en3 = {}
        for k in range(nb_subfr):
            tk = frame[t0f + k * sf_length:t0f + (k + 1) * sf_length]
            lo, hi = lag_rng[k][0], lag_rng[k][1]
            for off in range(lo, hi + PE_NB_STAGE3_LAGS):
                b0 = t0f + k * sf_length - (start_lag + off)
                basis = frame[b0:b0 + sf_length]
                cc3[(k, off)] = float(np.dot(tk, basis))
                en3[(k, off)] = float(np.dot(basis, basis)) + 1e-3
        for m, d in enumerate(range(start_lag, end_lag + 1)):
            for j in range(nb_cbk3):
                cc = 0.0
                en = energy_tmp
                for k in range(nb_subfr):
                    off = lag_cb3[k][j] + m
                    cc += cc3[(k, off)]
                    en += en3[(k, off)]
                if cc > 0.0:
                    ccmax_new = float(f32(2 * cc / en))
                    ccmax_new *= 1.0 - contour_bias * j
                else:
                    ccmax_new = 0.0
                if ccmax_new > ccmax and d + T.CB_LAGS_STAGE3[0][j] <= max_lag:
                    ccmax = ccmax_new
                    lag_new = d
                    cbimax = j
        pitch_out = [min(max(lag_new + lag_cb3[k][cbimax], min_lag),
                         18 * fs_khz) for k in range(nb_subfr)]
        return True, lag_new - min_lag, cbimax, pitch_out, ltp_corr
    else:
        pitch_out = [min(max(lag + lag_cb[k][cbimax], min8), 18 * 8)
                     for k in range(nb_subfr)]
        return True, lag - min8, cbimax, pitch_out, ltp_corr


def find_ltp(res, pitch_l, subfr_length, nb_subfr, frame_start):
    """Returns (XX [nb,5,5], xX [nb,5]) (reference: find_LTP_FLP.c)."""
    XX = np.zeros((nb_subfr, LTP_ORDER, LTP_ORDER))
    xX = np.zeros((nb_subfr, LTP_ORDER))
    for k in range(nb_subfr):
        r0 = frame_start + k * subfr_length
        lag_base = r0 - (pitch_l[k] + LTP_ORDER // 2)
        # design matrix: column i is res[lag_base+i : lag_base+i+sublen]?
        # reference corrMatrix over vector starting at lag_ptr with order 5:
        # X[i][j] = corr of delayed versions
        segs = np.stack([res[lag_base + LTP_ORDER - 1 - i:
                             lag_base + LTP_ORDER - 1 - i + subfr_length]
                         for i in range(LTP_ORDER)])
        tgt = res[r0:r0 + subfr_length]
        XX[k] = segs @ segs.T
        xX[k] = segs @ tgt
        xx = float(np.dot(res[r0:r0 + subfr_length + LTP_ORDER],
                          res[r0:r0 + subfr_length + LTP_ORDER]))
        temp = 1.0 / max(xx, LTP_CORR_INV_MAX * 0.5
                         * (XX[k][0, 0] + XX[k][4, 4]) + 1.0)
        XX[k] *= temp
        xX[k] *= temp
    return XX, xX


_INT32_MAX = 2 ** 31 - 1


def _vq_wmat_ec(XX_q17, xX_q17, cb_q7, cb_gain_q7, cl_q5, subfr_len,
                max_gain_q7, L):
    """(reference: silk_VQ_WMat_EC_c silk/VQ_WMat_EC.c:38).
    Returns (ind, res_nrg_q15, rate_dist_q8, gain_q7)."""
    neg_xX_q24 = [wrap32(-(xX_q17[i] << 7)) for i in range(5)]
    best_rate_dist = _INT32_MAX
    best_res_nrg = _INT32_MAX
    best_ind = 0
    best_gain = 0
    for k in range(L):
        row = cb_q7[k]
        gain_tmp_q7 = cb_gain_q7[k]
        sum1_q15 = SILK_FIX_CONST(1.001, 15)
        penalty = max(gain_tmp_q7 - max_gain_q7, 0) << 11
        s2 = wrap32(neg_xX_q24[0] + XX_q17[1] * row[1] + XX_q17[2] * row[2]
                    + XX_q17[3] * row[3] + XX_q17[4] * row[4])
        s2 = wrap32((s2 << 1) + XX_q17[0] * row[0])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[0])
        s2 = wrap32(neg_xX_q24[1] + XX_q17[7] * row[2] + XX_q17[8] * row[3]
                    + XX_q17[9] * row[4])
        s2 = wrap32((s2 << 1) + XX_q17[6] * row[1])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[1])
        s2 = wrap32(neg_xX_q24[2] + XX_q17[13] * row[3]
                    + XX_q17[14] * row[4])
        s2 = wrap32((s2 << 1) + XX_q17[12] * row[2])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[2])
        s2 = wrap32(neg_xX_q24[3] + XX_q17[19] * row[4])
        s2 = wrap32((s2 << 1) + XX_q17[18] * row[3])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[3])
        s2 = wrap32(neg_xX_q24[4] << 1)
        s2 = wrap32(s2 + XX_q17[24] * row[4])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[4])
        if sum1_q15 >= 0:
            bits_res_q8 = SMULBB(subfr_len,
                                 lin2log(sum1_q15 + penalty) - (15 << 7))
            bits_tot_q8 = bits_res_q8 + (cl_q5[k] << 2)
            if bits_tot_q8 <= best_rate_dist:
                best_rate_dist = bits_tot_q8
                best_res_nrg = sum1_q15 + penalty
                best_ind = k
                best_gain = gain_tmp_q7
    return best_ind, best_res_nrg, best_rate_dist, best_gain


def quant_ltp_gains(XX, xX, subfr_length, nb_subfr, sum_log_gain_q7):
    """LTP gain VQ (reference: silk_quant_LTP_gains quant_LTP_gains.c:39 via
    the FLP wrapper wrappers_FLP.c:175: float corr scaled to Q17).
    Returns (b_q14 flat list, cbk_indices, per_index, pred_gain_db,
    new_sum_log_gain_q7)."""
    gain_safety = SILK_FIX_CONST(0.4, 7)
    # Q17 conversion happens in float32 like the reference FLP wrapper
    # (wrappers_FLP.c:194: silk_float2int( XX[i] * 131072.0f ))
    XX_q17 = [np.rint(np.asarray(XX[j], np.float32).reshape(-1)
                      * np.float32(131072.0)).astype(np.int64).tolist()
              for j in range(nb_subfr)]
    xX_q17 = [np.rint(np.asarray(xX[j], np.float32)
                      * np.float32(131072.0)).astype(np.int64).tolist()
              for j in range(nb_subfr)]
    cls = (TD.LTP_GAIN_BITS_Q5_0, TD.LTP_GAIN_BITS_Q5_1,
           TD.LTP_GAIN_BITS_Q5_2)
    gain_cbs = (TD.LTP_GAIN_VQ_0_GAIN, TD.LTP_GAIN_VQ_1_GAIN,
                TD.LTP_GAIN_VQ_2_GAIN)
    min_rate_dist = _INT32_MAX
    best = (0, [0] * nb_subfr, sum_log_gain_q7)
    best_res_nrg = _INT32_MAX
    for k in range(3):
        cbk = T.LTP_VQ_PTRS_Q7[k]
        res_nrg = 0
        rate_dist = 0
        slg = sum_log_gain_q7
        idxs = []
        for j in range(nb_subfr):
            max_gain_q7 = log2lin(
                (SILK_FIX_CONST(250.0 / 6.0, 7) - slg)
                + SILK_FIX_CONST(7, 7)) - gain_safety
            ind, rn, rd, gain_q7 = _vq_wmat_ec(
                XX_q17[j], xX_q17[j], cbk, gain_cbs[k], cls[k],
                subfr_length, max_gain_q7, len(cbk))
            idxs.append(ind)
            # silk_ADD_POS_SAT32: anything with the sign bit set (including
            # genuinely negative sums) saturates to INT32_MAX
            res_nrg = (res_nrg + rn) \
                if not ((res_nrg + rn) & 0x80000000) else _INT32_MAX
            rate_dist = (rate_dist + rd) \
                if not ((rate_dist + rd) & 0x80000000) else _INT32_MAX
            slg = max(0, slg + lin2log(gain_safety + gain_q7)
                      - SILK_FIX_CONST(7, 7))
        if rate_dist <= min_rate_dist:
            min_rate_dist = rate_dist
            best = (k, idxs, slg)
        # NB: the reference computes pred gain from the LAST codebook's
        # accumulated residual (quant_LTP_gains.c:121-131 reads res_nrg_Q15
        # after the k loop, which still holds iteration k=2's value), not
        # the chosen codebook's -- reproduced as-is for parity.
        best_res_nrg = res_nrg
    kcb, idxs, new_slg = best
    b_q14 = []
    for j in range(nb_subfr):
        row = T.LTP_VQ_PTRS_Q7[kcb][idxs[j]]
        b_q14.extend([v << 7 for v in row])
    best_res_nrg >>= 1 if nb_subfr == 2 else 2
    pred_gain_db_q7 = SMULBB(-3, lin2log(best_res_nrg) - (15 << 7))
    return b_q14, idxs, kcb, pred_gain_db_q7 / 128.0, new_slg


def ltp_analysis_filter(x, x_base, b_q14, pitch_l, inv_gains, subfr_length,
                        nb_subfr, pre_length):
    """(reference: LTP_analysis_filter_FLP.c).  x indexed from x_base -
    pre_length - max_lag; returns LPC input with prepended samples."""
    out = np.zeros(nb_subfr * (subfr_length + pre_length))
    for k in range(nb_subfr):
        base = x_base + k * subfr_length
        btmp = np.array(b_q14[k * LTP_ORDER:(k + 1) * LTP_ORDER],
                        dtype=np.float64) / 16384.0
        seg = x[base - pre_length:base + subfr_length].copy()
        lag = pitch_l[k]
        for i in range(len(seg)):
            t = base - pre_length + i
            pred = 0.0
            for j in range(LTP_ORDER):
                pred += btmp[j] * x[t - lag + LTP_ORDER // 2 - j]
            seg[i] -= pred
        out[k * (subfr_length + pre_length):
            (k + 1) * (subfr_length + pre_length)] = seg * inv_gains[k]
    return out


def residual_energy(x_pre, pred_coef, gains, subfr_length, nb_subfr, order):
    """(reference: residual_energy_FLP.c).  Returns per-subframe energies."""
    nrgs = np.zeros(nb_subfr)
    shift = order + subfr_length
    for k in range(0, nb_subfr, 2):
        seg = x_pre[k * shift:k * shift + 2 * shift]
        lpc_res = lpc_analysis_filter_flp(seg, pred_coef[k >> 1], order)
        nrgs[k] = (gains[k] ** 2) * float(
            np.dot(lpc_res[order:order + subfr_length],
                   lpc_res[order:order + subfr_length]))
        if k + 1 < nb_subfr:
            seg2 = lpc_res[shift + order:shift + order + subfr_length]
            nrgs[k + 1] = (gains[k + 1] ** 2) * float(np.dot(seg2, seg2))
    return nrgs


def simple_vad(state, frame):
    """Simplified VAD producing speech_activity_Q8, tilt and band quality
    (the reference's silk_VAD_GetSA_Q8 is a 4-band fixed-point SNR tracker;
    this float version keeps the same outputs/ranges)."""
    fs = state.fs_kHz * 1000
    x = frame.astype(np.float64)
    energy = float(np.dot(x, x)) / max(1, len(x))
    # split in two halves of the spectrum with a simple 1-pole
    lp = np.empty_like(x)
    acc = state.vad_lp_state
    c = 0.25
    for i in range(len(x)):
        acc += c * (x[i] - acc)
        lp[i] = acc
    state.vad_lp_state = acc
    hp = x - lp
    e_lp = float(np.dot(lp, lp)) / max(1, len(x))
    e_hp = float(np.dot(hp, hp)) / max(1, len(x))
    # track noise floor
    if state.vad_noise_level is None:
        state.vad_noise_level = energy + 1.0
    nl = state.vad_noise_level
    if energy < nl:
        state.vad_noise_level = 0.8 * nl + 0.2 * energy + 1e-9
    else:
        state.vad_noise_level = min(nl * 1.02 + 1e-9, nl + 0.05 * energy + 1e-9)
    snr = 10.0 * math.log10((energy + 1.0) / (state.vad_noise_level + 1.0))
    activity = sigmoid(0.5 * (snr - 4.0))
    speech_activity_q8 = int(max(0, min(255, round(activity * 256))))
    tilt = (e_lp - e_hp) / (e_lp + e_hp + 1.0)
    input_tilt_q15 = int(max(-32768, min(32767, round(tilt * 32768 / 2))))
    q = sigmoid(0.25 * (snr - 8.0))
    quality_q15 = int(max(0, min(32767, round(q * 32768))))
    return speech_activity_q8, input_tilt_q15, [quality_q15] * 4

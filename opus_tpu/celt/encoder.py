"""CELT encoder (reference: celt/celt_encoder.c).

Per-stream scalar encode driver in numpy float64.  Encoder-side decisions
(transient detection, pitch, dynalloc, VBR target...) are free choices of any
valid encoder — they need not match the reference bit-for-bit; the produced
bitstream must decode identically on our decoder and the reference decoder
(final_range is the oracle).  Analysis (tonality GRU) is wired as invalid for
now; comes with the opus-level encoder.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..bitstream.range_coder import RangeEncoder, ec_tell, ec_tell_frac, ilog
from . import bands as B
from . import alloc as A
from .cwrs import BITRES
from .energy import (amp2log2, compute_band_energies, normalise_bands,
                     quant_coarse_energy, quant_fine_energy,
                     quant_energy_finalise)
from .modes import (CeltMode, mode_create, compute_qext_mode,
                    NB_QEXT_BANDS)
from .pitch import pitch_downsample, pitch_search, remove_doubling
from .tables import (SPREAD_NONE, SPREAD_NORMAL, SPREAD_AGGRESSIVE,
                     TF_SELECT_TABLE, SPREAD_ICDF, TAPSET_ICDF, TRIM_ICDF,
                     COMB_GAINS, COMBFILTER_MAXPERIOD, COMBFILTER_MINPERIOD,
                     E_MEANS)
from .decoder import resampling_factor

CELT_SIG_SCALE = 32768.0
OPUS_BITRATE_MAX = -1


def celt_preemphasis(pcm, inp, n, cc, upsample, coef, mem, clip):
    """(reference: celt_preemphasis celt_encoder.c:557); pcm is the strided
    channel view, inp gets N samples.  coef is the mode's 4-entry preemph
    tuple; coef[1] != 0 selects the 2nd-order filter of the custom-rate
    and 96 kHz QEXT modes (celt_encoder.c:608-634)."""
    coef0 = coef[0]
    m = mem[0]
    if coef[1] == 0 and upsample == 1 and not clip:
        x = pcm[:n] * CELT_SIG_SCALE
        # y[i] = x[i] - m_i ; m_{i+1} = coef0*x[i]
        inp[:n] = x - np.concatenate(([m], coef0 * x[:-1]))
        mem[0] = coef0 * x[-1]
        return
    nu = n // upsample
    inp[:n] = 0
    inp[:nu * upsample:upsample] = pcm[:nu] * CELT_SIG_SCALE
    if clip:
        np.clip(inp[:nu * upsample:upsample], -65536., 65536.,
                out=inp[:nu * upsample:upsample])
    # sparse signal: only every `upsample`-th sample nonzero
    xs = inp[:n].copy()
    acc = m
    if coef[1] != 0:
        coef1 = coef[1]
        coef2 = coef[2]
        for i in range(n):
            tmp = coef2 * xs[i]
            inp[i] = tmp + acc
            acc = coef1 * inp[i] - coef0 * tmp
    else:
        for i in range(n):
            v = xs[i]
            inp[i] = v - acc
            acc = coef0 * v
    mem[0] = acc


_INV_TABLE = (
    255, 255, 156, 110, 86, 70, 59, 51, 45, 40, 37, 33, 31, 28, 26, 25,
    23, 22, 21, 20, 19, 18, 17, 16, 16, 15, 15, 14, 13, 13, 12, 12,
    12, 12, 11, 11, 11, 10, 10, 10, 9, 9, 9, 9, 9, 9, 8, 8,
    8, 8, 8, 7, 7, 7, 7, 7, 7, 6, 6, 6, 6, 6, 6, 6,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 2)


def transient_analysis(inp, length, cc, allow_weak_transients,
                       tone_freq, toneishness):
    """Returns (is_transient, tf_estimate, tf_chan, weak_transient)
    (reference: transient_analysis celt_encoder.c:267)."""
    forward_decay = .03125 if allow_weak_transients else .0625
    len2 = length // 2
    mask_metric = 0
    tf_chan = 0
    weak_transient = 0
    for c in range(cc):
        x = inp[c]
        tmp = np.zeros(length)
        mem0 = mem1 = 0.0
        for i in range(length):
            xi = x[i]
            y = mem0 + xi
            mem00 = mem0
            mem0 = mem0 - xi + .5 * mem1
            mem1 = xi - mem00
            tmp[i] = y
        tmp[:12] = 0
        # forward pass
        t2 = np.zeros(len2)
        mean = 0.0
        mem0 = 0.0
        for i in range(len2):
            x2 = tmp[2 * i] * tmp[2 * i] + tmp[2 * i + 1] * tmp[2 * i + 1]
            mean += x2
            mem0 = x2 + (1. - forward_decay) * mem0
            t2[i] = forward_decay * mem0
        # backward pass
        mem0 = 0.0
        max_e = 0.0
        for i in range(len2 - 1, -1, -1):
            mem0 = t2[i] + 0.875 * mem0
            t2[i] = 0.125 * mem0
            max_e = max(max_e, 0.125 * mem0)
        mean = math.sqrt(mean * max_e * .5 * len2)
        norm = len2 / (1e-15 + .5 * mean) / 2
        unmask = 0
        for i in range(12, len2 - 5, 4):
            idx = int(max(0, min(127, math.floor(64 * norm * (t2[i] + 1e-15)))))
            unmask += _INV_TABLE[idx]
        unmask = 64 * unmask * 4 // (6 * (len2 - 17))
        if unmask > mask_metric:
            tf_chan = c
            mask_metric = unmask
    is_transient = mask_metric > 200
    if toneishness > .98 and tone_freq < 0.026:
        is_transient = 0
        mask_metric = 0
    if allow_weak_transients and is_transient and mask_metric < 600:
        is_transient = 0
        weak_transient = 1
    tf_max = max(0.0, math.sqrt(27 * mask_metric) - 42)
    tf_estimate = math.sqrt(max(0.0, .0069 * min(163., tf_max) - .139))
    return int(is_transient), tf_estimate, tf_chan, weak_transient


def patch_transient_decision(new_e, old_e, nb, start, end, c):
    spread_old = np.zeros(26)
    if c == 1:
        spread_old[start] = old_e[start]
        for i in range(start + 1, end):
            spread_old[i] = max(spread_old[i - 1] - 1.0, old_e[i])
    else:
        spread_old[start] = max(old_e[start], old_e[start + nb])
        for i in range(start + 1, end):
            spread_old[i] = max(spread_old[i - 1] - 1.0,
                                max(old_e[i], old_e[i + nb]))
    for i in range(end - 2, start - 1, -1):
        spread_old[i] = max(spread_old[i], spread_old[i + 1] - 1.0)
    mean_diff = 0.0
    for ch in range(c):
        for i in range(max(2, start), end - 1):
            x1 = max(0.0, new_e[i + ch * nb])
            x2 = max(0.0, spread_old[i])
            mean_diff += max(0.0, x1 - x2)
    mean_diff /= c * (end - 1 - max(2, start))
    return mean_diff > 1.0


def tone_lpc(x, length, delay):
    """Returns lpc[2] or None (reference: tone_lpc celt_encoder.c:1306)."""
    r00 = float(np.dot(x[:length - 2 * delay], x[:length - 2 * delay]))
    r01 = float(np.dot(x[:length - 2 * delay], x[delay:length - delay]))
    r02 = float(np.dot(x[:length - 2 * delay], x[2 * delay:length]))
    edges = float(np.dot(x[length - 2 * delay:length - delay],
                         x[length - 2 * delay:length - delay])
                  - np.dot(x[:delay], x[:delay]))
    r11 = r00 + edges
    edges = float(np.dot(x[length - delay:length], x[length - delay:length])
                  - np.dot(x[delay:2 * delay], x[delay:2 * delay]))
    r22 = r11 + edges
    edges = float(np.dot(x[length - 2 * delay:length - delay],
                         x[length - delay:length])
                  - np.dot(x[:delay], x[delay:2 * delay]))
    r12 = r01 + edges
    R00 = r00 + r22
    R01 = r01 + r12
    R11 = 2 * r11
    R02 = 2 * r02
    R12 = r12 + r01
    den = R00 * R11 - R01 * R01
    if den <= 0 or den < .001 * R00 * R11:
        # includes the all-zero-signal case (den == R00*R11 == 0), where the
        # reference's float division yields NaN and no tone is detected
        return None
    lpc1 = (R02 * R11 - R01 * R12) / den
    lpc1 = max(-1.0, min(1.0, lpc1))
    lpc0 = (R00 * R12 - R02 * R01) / den
    lpc0 = max(-1.999999, min(1.999999, lpc0))
    return [lpc0, lpc1]


def tone_detect(inp, cc, n, fs):
    """Returns (freq_rad, toneishness)."""
    if cc == 2:
        x = .5 * (inp[0][:n] + inp[1][:n]) / 4.0
    else:
        x = inp[0][:n] / 4.0
    delay = 1
    lpc = tone_lpc(x, n, delay)
    while delay <= fs // 3000 and (lpc is None
                                   or (lpc[0] > 1.0 and lpc[1] < 0)):
        delay *= 2
        lpc = tone_lpc(x, n, delay)
    if lpc is not None and lpc[0] * lpc[0] + 3.999999 * lpc[1] < 0:
        toneishness = -lpc[1]
        freq = math.acos(.5 * lpc[0]) / delay
    else:
        freq = -1.0
        toneishness = 0.0
    return freq, toneishness


def comb_filter_sep(y, ybase, x, xbase, t0, t1, n, g0, g1, tapset0, tapset1,
                    window, overlap):
    """Separate-buffer comb filter (FIR when y != x)
    (reference: comb_filter celt/celt.c:238)."""
    if g0 == 0 and g1 == 0:
        if y is not x or ybase != xbase:
            y[ybase:ybase + n] = x[xbase:xbase + n]
        return
    if overlap == 240:
        # 96 kHz QEXT: filter the even/odd polyphase streams at the
        # coded 48 kHz-scale period; needs 2*COMBFILTER_MAXPERIOD of
        # history below xbase (reference: comb_filter_qext celt.c:198)
        n2 = n // 2
        for sph in range(2):
            xseg = x[xbase - 2 * COMBFILTER_MAXPERIOD + sph:xbase + n:2]
            yseg = np.empty(n2)
            comb_filter_sep(yseg, 0, xseg, COMBFILTER_MAXPERIOD, t0, t1,
                            n2, g0, g1, tapset0, tapset1,
                            window[sph::2][:120] if window is not None
                            else None, overlap // 2)
            y[ybase + sph:ybase + n:2] = yseg
        return
    t0 = max(t0, COMBFILTER_MINPERIOD)
    t1 = max(t1, COMBFILTER_MINPERIOD)
    g00 = g0 * COMB_GAINS[tapset0][0]
    g01 = g0 * COMB_GAINS[tapset0][1]
    g02 = g0 * COMB_GAINS[tapset0][2]
    g10 = g1 * COMB_GAINS[tapset1][0]
    g11 = g1 * COMB_GAINS[tapset1][1]
    g12 = g1 * COMB_GAINS[tapset1][2]
    ov = overlap
    if g0 == g1 and t0 == t1 and tapset0 == tapset1:
        ov = 0
    x1 = x[xbase - t1 + 1]
    x2 = x[xbase - t1]
    x3 = x[xbase - t1 - 1]
    x4 = x[xbase - t1 - 2]
    for i in range(ov):
        x0 = x[xbase + i - t1 + 2]
        f = window[i] * window[i]
        y[ybase + i] = (x[xbase + i]
                        + (1 - f) * g00 * x[xbase + i - t0]
                        + (1 - f) * g01 * (x[xbase + i - t0 + 1]
                                           + x[xbase + i - t0 - 1])
                        + (1 - f) * g02 * (x[xbase + i - t0 + 2]
                                           + x[xbase + i - t0 - 2])
                        + f * g10 * x2
                        + f * g11 * (x1 + x3)
                        + f * g12 * (x0 + x4))
        x4 = x3
        x3 = x2
        x2 = x1
        x1 = x0
    if g1 == 0:
        if (y is not x or ybase != xbase) and ov < n:
            y[ybase + ov:ybase + n] = x[xbase + ov:xbase + n]
        return
    idx = np.arange(xbase + ov, xbase + n)
    y[ybase + ov:ybase + n] = (x[idx]
                               + g10 * x[idx - t1]
                               + g11 * (x[idx - t1 + 1] + x[idx - t1 - 1])
                               + g12 * (x[idx - t1 + 2] + x[idx - t1 - 2]))


def hysteresis_decision(val, thresholds, hysteresis, n, prev):
    i = 0
    while i < n:
        if val < thresholds[i]:
            break
        i += 1
    if i > prev and val < thresholds[prev] + hysteresis[prev]:
        i = prev
    if i < prev and val > thresholds[prev - 1] - hysteresis[prev - 1]:
        i = prev
    return i


def l1_metric(tmp, n, lm, bias):
    l1 = float(np.abs(tmp[:n]).sum())
    return l1 + lm * bias * l1


def tf_analysis(mode: CeltMode, length, is_transient, tf_res, lam, x, n0, lm,
                tf_estimate, tf_chan, importance):
    """(reference: tf_analysis celt_encoder.c:663)"""
    bias = .04 * max(-.25, .5 - tf_estimate)
    metric = [0] * length
    for i in range(length):
        n = (mode.eBands[i + 1] - mode.eBands[i]) << lm
        narrow = (mode.eBands[i + 1] - mode.eBands[i]) == 1
        tmp = x[tf_chan * n0 + (mode.eBands[i] << lm):
                tf_chan * n0 + (mode.eBands[i] << lm) + n].copy()
        best_l1 = l1_metric(tmp, n, lm if is_transient else 0, bias)
        best_level = 0
        if is_transient and not narrow:
            tmp1 = tmp.copy()
            B.haar1(tmp1, n >> lm, 1 << lm)
            l1 = l1_metric(tmp1, n, lm + 1, bias)
            if l1 < best_l1:
                best_l1 = l1
                best_level = -1
        for k in range(lm + (0 if (is_transient or narrow) else 1)):
            bb = (lm - k - 1) if is_transient else (k + 1)
            B.haar1(tmp, n >> k, 1 << k)
            l1 = l1_metric(tmp, n, bb, bias)
            if l1 < best_l1:
                best_l1 = l1
                best_level = k + 1
        metric[i] = 2 * best_level if is_transient else -2 * best_level
        if narrow and (metric[i] == 0 or metric[i] == -2 * lm):
            metric[i] -= 1

    tf_select = 0
    selcost = [0, 0]
    for sel in range(2):
        cost0 = importance[0] * abs(
            metric[0] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * sel])
        cost1 = importance[0] * abs(
            metric[0] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * sel + 1]) \
            + (0 if is_transient else lam)
        for i in range(1, length):
            curr0 = min(cost0, cost1 + lam)
            curr1 = min(cost0 + lam, cost1)
            cost0 = curr0 + importance[i] * abs(
                metric[i] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * sel])
            cost1 = curr1 + importance[i] * abs(
                metric[i] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * sel + 1])
        selcost[sel] = min(cost0, cost1)
    if selcost[1] < selcost[0] and is_transient:
        tf_select = 1
    path0 = [0] * length
    path1 = [0] * length
    cost0 = importance[0] * abs(
        metric[0] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * tf_select])
    cost1 = importance[0] * abs(
        metric[0] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * tf_select + 1]) \
        + (0 if is_transient else lam)
    for i in range(1, length):
        from0 = cost0
        from1 = cost1 + lam
        if from0 < from1:
            curr0 = from0
            path0[i] = 0
        else:
            curr0 = from1
            path0[i] = 1
        from0 = cost0 + lam
        from1 = cost1
        if from0 < from1:
            curr1 = from0
            path1[i] = 0
        else:
            curr1 = from1
            path1[i] = 1
        cost0 = curr0 + importance[i] * abs(
            metric[i] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * tf_select])
        cost1 = curr1 + importance[i] * abs(
            metric[i] - 2 * TF_SELECT_TABLE[lm][4 * is_transient + 2 * tf_select + 1])
    tf_res[length - 1] = 0 if cost0 < cost1 else 1
    for i in range(length - 2, -1, -1):
        tf_res[i] = path1[i + 1] if tf_res[i + 1] == 1 else path0[i + 1]
    return tf_select


def tf_encode(start, end, is_transient, tf_res, lm, tf_select, enc):
    budget = enc.storage * 8
    tell = ec_tell(enc)
    logp = 2 if is_transient else 4
    tf_select_rsv = 1 if (lm > 0 and tell + logp + 1 <= budget) else 0
    budget -= tf_select_rsv
    curr = tf_changed = 0
    for i in range(start, end):
        if tell + logp <= budget:
            enc.enc_bit_logp(tf_res[i] ^ curr, logp)
            tell = ec_tell(enc)
            curr = tf_res[i]
            tf_changed |= curr
        else:
            tf_res[i] = curr
        logp = 4 if is_transient else 5
    if tf_select_rsv and \
            TF_SELECT_TABLE[lm][4 * is_transient + 0 + tf_changed] != \
            TF_SELECT_TABLE[lm][4 * is_transient + 2 + tf_changed]:
        enc.enc_bit_logp(tf_select, 1)
    else:
        tf_select = 0
    for i in range(start, end):
        tf_res[i] = TF_SELECT_TABLE[lm][4 * is_transient + 2 * tf_select
                                        + tf_res[i]]


def spreading_decision(mode: CeltMode, x, state, update_hf, end, c, m,
                       spread_weight):
    """state: dict with average, hf_average, tapset_decision, last_decision
    (reference: spreading_decision bands.c:470)."""
    n0 = m * mode.shortMdctSize
    if m * (mode.eBands[end] - mode.eBands[end - 1]) <= 8:
        return SPREAD_NONE
    sum_ = 0
    nb_bands = 0
    hf_sum = 0
    for ch in range(c):
        for i in range(end):
            n = m * (mode.eBands[i + 1] - mode.eBands[i])
            if n <= 8:
                continue
            seg = x[m * mode.eBands[i] + ch * n0:
                    m * mode.eBands[i] + ch * n0 + n]
            x2n = seg * seg * n
            tcount0 = int(np.count_nonzero(x2n < .25))
            tcount1 = int(np.count_nonzero(x2n < .0625))
            tcount2 = int(np.count_nonzero(x2n < .015625))
            if i > mode.nbEBands - 4:
                hf_sum += 32 * (tcount1 + tcount0) // n
            tmp = ((2 * tcount2 >= n) + (2 * tcount1 >= n)
                   + (2 * tcount0 >= n))
            sum_ += tmp * spread_weight[i]
            nb_bands += spread_weight[i]
    if update_hf:
        if hf_sum:
            hf_sum //= c * (4 - mode.nbEBands + end)
        state["hf_average"] = (state["hf_average"] + hf_sum) >> 1
        hf_sum = state["hf_average"]
        if state["tapset_decision"] == 2:
            hf_sum += 4
        elif state["tapset_decision"] == 0:
            hf_sum -= 4
        if hf_sum > 22:
            state["tapset_decision"] = 2
        elif hf_sum > 18:
            state["tapset_decision"] = 1
        else:
            state["tapset_decision"] = 0
    assert nb_bands > 0
    sum_ = (sum_ << 8) // nb_bands
    sum_ = (sum_ + state["average"]) >> 1
    state["average"] = sum_
    sum_ = (3 * sum_ + (((3 - state["last_decision"]) << 7) + 64) + 2) >> 2
    if sum_ < 80:
        decision = SPREAD_AGGRESSIVE
    elif sum_ < 256:
        decision = SPREAD_NORMAL
    elif sum_ < 384:
        decision = 1  # SPREAD_LIGHT
    else:
        decision = SPREAD_NONE
    return decision


def stereo_analysis(mode: CeltMode, x, lm, n0):
    sum_lr = 1e-15
    sum_ms = 1e-15
    for i in range(13):
        lo = mode.eBands[i] << lm
        hi = mode.eBands[i + 1] << lm
        l = x[lo:hi]
        r = x[n0 + lo:n0 + hi]
        sum_lr += float(np.abs(l).sum() + np.abs(r).sum())
        sum_ms += float(np.abs(l + r).sum() + np.abs(l - r).sum())
    sum_ms *= 0.707107
    thetas = 13
    if lm <= 1:
        thetas -= 8
    return ((mode.eBands[13] << (lm + 1)) + thetas) * sum_ms \
        > (mode.eBands[13] << (lm + 1)) * sum_lr


def alloc_trim_analysis(mode: CeltMode, x, band_log_e, end, lm, c, n0,
                        stereo_saving, tf_estimate, intensity, surround_trim,
                        equiv_rate, analysis=None):
    """Returns (trim_index, new_stereo_saving)."""
    trim = 5.0
    if equiv_rate < 64000:
        trim = 4.0
    elif equiv_rate < 80000:
        frac = (equiv_rate - 64000) >> 10
        trim = 4.0 + (1.0 / 16) * frac
    if c == 2:
        sum_ = 0.0
        for i in range(8):
            lo = mode.eBands[i] << lm
            hi = mode.eBands[i + 1] << lm
            sum_ += float(np.dot(x[lo:hi], x[n0 + lo:n0 + hi]))
        sum_ = .125 * sum_  # 1/8
        sum_ = min(1.0, abs(sum_))
        min_xc = sum_
        for i in range(8, intensity):
            lo = mode.eBands[i] << lm
            hi = mode.eBands[i + 1] << lm
            partial = float(np.dot(x[lo:hi], x[n0 + lo:n0 + hi]))
            min_xc = min(min_xc, abs(partial))
        min_xc = min(1.0, abs(min_xc))
        log_xc = math.log2(1.001 - sum_ * sum_)
        log_xc2 = max(.5 * log_xc, math.log2(1.001 - min_xc * min_xc))
        trim += max(-4.0, .75 * log_xc)
        stereo_saving = min(stereo_saving + .25, -.5 * log_xc2)
    diff = 0.0
    for ch in range(c):
        for i in range(end - 1):
            diff += band_log_e[i + ch * mode.nbEBands] * (2 + 2 * i - end)
    diff /= c * (end - 1)
    trim -= max(-2.0, min(2.0, (diff + 1.0) / 6))
    trim -= surround_trim
    trim -= 2 * tf_estimate
    if analysis is not None and analysis.valid:
        # (reference: celt_encoder.c:935)
        trim -= max(-2.0, min(2.0, 2.0 * (analysis.tonality_slope + .05)))
    trim_index = int(math.floor(.5 + trim))
    trim_index = max(0, min(10, trim_index))
    return trim_index, stereo_saving


def compute_vbr(mode: CeltMode, base_target, lm, bitrate, last_coded_bands,
                c, intensity, constrained_vbr, stereo_saving, tot_boost,
                tf_estimate, pitch_change, max_depth, temporal_vbr,
                analysis=None, lfe=0, has_surround_mask=0,
                surround_masking=0.0):
    nb = mode.nbEBands
    eb = mode.eBands
    coded_bands = last_coded_bands if last_coded_bands else nb
    coded_bins = eb[coded_bands] << lm
    if c == 2:
        coded_bins += eb[min(intensity, coded_bands)] << lm
    target = base_target
    if analysis is not None and analysis.valid \
            and analysis.activity < .4:
        # (reference: celt_encoder.c:1632)
        target -= int((coded_bins << BITRES) * (.4 - analysis.activity))
    if c == 2:
        coded_stereo_bands = min(intensity, coded_bands)
        coded_stereo_dof = (eb[coded_stereo_bands] << lm) - coded_stereo_bands
        max_frac = 0.8 * coded_stereo_dof / coded_bins
        ss = min(stereo_saving, 1.0)
        target -= int(min(max_frac * target,
                          (ss - 0.1) * (coded_stereo_dof << BITRES)))
    target += tot_boost - (19 << lm)
    tf_calibration = 0.044
    target += int(2 * (tf_estimate - tf_calibration) * target)
    if analysis is not None and analysis.valid and not lfe:
        # tonality boost compensating for the average (:1658-1670)
        tonal = max(0.0, analysis.tonality - .15) - 0.12
        tonal_target = target + int((coded_bins << BITRES) * 1.2 * tonal)
        if pitch_change:
            tonal_target += int((coded_bins << BITRES) * .8)
        target = tonal_target
    if has_surround_mask and not lfe:
        # (reference: celt_encoder.c:1676-1681)
        surround_target = target + int(surround_masking
                                       * (coded_bins << BITRES))
        target = max(target // 4, surround_target)
    bins = eb[nb - 2] << lm
    floor_depth = int((c * bins << BITRES) * max_depth)
    floor_depth = max(floor_depth, target >> 2)
    target = min(target, floor_depth)
    if (not has_surround_mask or lfe) and constrained_vbr:
        target = base_target + int(0.67 * (target - base_target))
    if not has_surround_mask and tf_estimate < .2:
        amount = .0000031 * max(0, min(32000, 96000 - bitrate))
        tvbr_factor = temporal_vbr * amount
        target += int(tvbr_factor * target)
    target = min(2 * base_target, target)
    return target


@dataclass
class CeltEncoder:
    mode: CeltMode
    channels: int
    stream_channels: int
    upsample: int = 1
    start: int = 0
    end: int = 21
    bitrate: int = OPUS_BITRATE_MAX
    vbr: int = 0
    constrained_vbr: int = 0
    complexity: int = 9
    lsb_depth: int = 24
    loss_rate: int = 0
    lfe: int = 0
    disable_pf: int = 0
    force_intra: int = 0
    clip: int = 1
    disable_inv: int = 0
    # AnalysisInfo from the tonality analyzer (reference:
    # CELT_SET_ANALYSIS ctl; fields used at celt_encoder.c:935,1226,
    # 1494,1632,1658)
    analysis: object = None
    # per-band surround energy mask (reference: OPUS_SET_ENERGY_MASK)
    energy_mask: object = None
    # quality extensions (reference: OPUS_SET_QEXT; celt_encoder.c:2535)
    enable_qext: int = 0
    qext_oldBandE: object = None    # [2*NB_QEXT_BANDS] coarse-energy state
    qext_payload: bytes | None = None   # ID byte + ext stream (per frame)
    rng: int = 0
    # spectral state
    spread_decision: int = SPREAD_NORMAL
    delayedIntra: float = 1.0
    tonal_average: int = 256
    hf_average: int = 0
    tapset_decision: int = 0
    prefilter_period: int = 0
    prefilter_gain: float = 0.0
    prefilter_tapset: int = 0
    prefilter_period_old: int = 0
    prefilter_gain_old: float = 0.0
    prefilter_tapset_old: int = 0
    consec_transient: int = 0
    vbr_reservoir: int = 0
    vbr_drift: int = 0
    vbr_offset: int = 0
    vbr_count: int = 0
    intensity: int = 0
    lastCodedBands: int = 0
    stereo_saving: float = 0.0
    overlap_max: float = 0.0
    spec_avg: float = 0.0
    silk_info_offset: int = 0  # silk_info.offset for hybrid
    silk_info_signal_type: int = 0
    in_mem: np.ndarray = None
    prefilter_mem: np.ndarray = None
    oldBandE: np.ndarray = None
    oldLogE: np.ndarray = None
    oldLogE2: np.ndarray = None
    energyError: np.ndarray = None
    preemph_memE: np.ndarray = None

    @classmethod
    def create(cls, fs: int, channels: int):
        # the 96 kHz QEXT family runs on its own mode; everything else
        # runs the standard 48 kHz mode with upsampling
        if fs == 96000:
            mode = mode_create(96000, 1920)
        else:
            mode = mode_create(48000, 960)
        st = cls(mode=mode, channels=channels, stream_channels=channels)
        st.upsample = 1 if fs == 96000 else resampling_factor(fs)
        st.end = mode.effEBands
        st.disable_inv = 1 if channels == 1 else 0
        st.reset()
        return st

    def reset(self):
        cc = self.channels
        nb = self.mode.nbEBands
        ov = self.mode.overlap
        self.in_mem = np.zeros((cc, ov))
        qscale = 2 if (self.mode.Fs == 96000
                       and self.mode.shortMdctSize in (240, 180)) else 1
        self.prefilter_mem = np.zeros((cc, qscale * COMBFILTER_MAXPERIOD))
        self.oldBandE = np.zeros(cc * nb)
        self.oldLogE = np.full(cc * nb, -28.0)
        self.oldLogE2 = np.full(cc * nb, -28.0)
        self.energyError = np.zeros(cc * nb)
        self.qext_oldBandE = np.zeros(2 * NB_QEXT_BANDS)
        self.qext_payload = None
        self.preemph_memE = np.zeros((cc, 1))
        self.rng = 0
        self.delayedIntra = 1.0
        self.spread_decision = SPREAD_NORMAL
        self.tonal_average = 256
        self.hf_average = 0
        self.tapset_decision = 0
        self.prefilter_period = self.prefilter_period_old = 0
        self.prefilter_gain = self.prefilter_gain_old = 0.0
        self.prefilter_tapset = self.prefilter_tapset_old = 0
        self.consec_transient = 0
        self.vbr_reservoir = self.vbr_drift = self.vbr_offset = 0
        self.vbr_count = 0
        self.intensity = 0
        self.lastCodedBands = 0
        self.stereo_saving = 0.0
        self.overlap_max = 0.0
        self.spec_avg = 0.0

    # ------------------------------------------------------------------
    def encode_with_ec(self, pcm: np.ndarray, frame_size: int,
                       nb_compressed_bytes: int,
                       enc: RangeEncoder | None = None) -> int:
        """pcm: float [-1,1] interleaved [frame*CC].  Returns byte count
        (when enc is None a new buffer is created at self.last_payload)."""
        mode = self.mode
        nbE = mode.nbEBands
        overlap = mode.overlap
        eBands = mode.eBands
        start = self.start
        end = self.end
        hybrid = start != 0
        CC = self.channels
        C = self.stream_channels
        tf_estimate = 0.0

        if nb_compressed_bytes < 2 or pcm is None:
            return -1
        frame_size *= self.upsample
        lm = 0
        while lm <= mode.maxLM:
            if mode.shortMdctSize << lm == frame_size:
                break
            lm += 1
        if lm > mode.maxLM:
            return -1
        M = 1 << lm
        N = M * mode.shortMdctSize

        if enc is None:
            tell0_frac = tell = 1
            nb_filled_bytes = 0
        else:
            tell0_frac = ec_tell_frac(enc)
            tell = ec_tell(enc)
            nb_filled_bytes = (tell + 4) >> 3
        nb_compressed_bytes = min(nb_compressed_bytes,
                                  3825 if self.enable_qext else 1275)

        if self.vbr and self.bitrate != OPUS_BITRATE_MAX:
            vbr_rate = (self.bitrate * 6 // (6 * mode.Fs // frame_size)) << BITRES
            effective_bytes = vbr_rate >> (3 + BITRES)
        else:
            vbr_rate = 0
            tmp = self.bitrate * frame_size
            if tell > 1:
                tmp += tell * mode.Fs
            if self.bitrate != OPUS_BITRATE_MAX:
                nb_compressed_bytes = max(2, min(
                    nb_compressed_bytes,
                    (tmp + 4 * mode.Fs) // (8 * mode.Fs)))
                if enc is not None:
                    enc.shrink(nb_compressed_bytes)
            effective_bytes = nb_compressed_bytes - nb_filled_bytes
        nb_available_bytes = nb_compressed_bytes - nb_filled_bytes
        equiv_rate = (nb_compressed_bytes * 8 * 50 << (3 - lm)) \
            - (40 * C + 20) * ((400 >> lm) - 50)
        if self.bitrate != OPUS_BITRATE_MAX:
            equiv_rate = min(equiv_rate,
                             self.bitrate - (40 * C + 20) * ((400 >> lm) - 50))

        if enc is None:
            enc = RangeEncoder(nb_compressed_bytes)
            self._own_enc = enc

        if vbr_rate > 0 and self.constrained_vbr:
            vbr_bound = vbr_rate
            max_allowed = min(max(2 if tell == 1 else 0,
                                  (vbr_rate + vbr_bound - self.vbr_reservoir)
                                  >> (BITRES + 3)),
                              nb_available_bytes)
            if max_allowed < nb_available_bytes:
                nb_compressed_bytes = nb_filled_bytes + max_allowed
                nb_available_bytes = max_allowed
                enc.shrink(nb_compressed_bytes)
        total_bits = nb_compressed_bytes * 8

        eff_end = min(end, mode.effEBands)

        inp = np.zeros((CC, N + overlap))
        head = pcm[:CC * (N - overlap) // self.upsample]
        tail = pcm[CC * (N - overlap) // self.upsample:]
        sample_max = max(self.overlap_max,
                         float(np.abs(head).max()) if len(head) else 0.0)
        self.overlap_max = float(np.abs(tail).max()) if len(tail) else 0.0
        sample_max = max(sample_max, self.overlap_max)
        silence = sample_max <= 1.0 / (1 << self.lsb_depth)
        if tell == 1:
            enc.enc_bit_logp(1 if silence else 0, 15)
        else:
            silence = 0
        if silence:
            if vbr_rate > 0:
                effective_bytes = nb_compressed_bytes = \
                    min(nb_compressed_bytes, nb_filled_bytes + 2)
                total_bits = nb_compressed_bytes * 8
                nb_available_bytes = 2
                enc.shrink(nb_compressed_bytes)
            tell = nb_compressed_bytes * 8
            enc.nbits_total += tell - ec_tell(enc)

        for c in range(CC):
            need_clip = self.clip and sample_max > 2.0  # 65536/32768
            celt_preemphasis(pcm[c::CC], inp[c, overlap:], N, CC,
                             self.upsample, mode.preemph,
                             self.preemph_memE[c], need_clip)
            inp[c, :overlap] = self.prefilter_mem[c, -overlap:]

        tone_freq, toneishness = tone_detect(inp, CC, N + overlap, mode.Fs)
        is_transient = 0
        short_blocks = 0
        weak_transient = 0
        tf_chan = 0
        if self.complexity >= 1 and not self.lfe:
            allow_weak = hybrid and effective_bytes < 15 \
                and self.silk_info_signal_type != 2
            is_transient, tf_estimate, tf_chan, weak_transient = \
                transient_analysis(inp[:, overlap:], N, CC, allow_weak,
                                   tone_freq, toneishness)
        toneishness = min(toneishness, 1.0 - tf_estimate)

        # prefilter
        enabled = ((self.lfe and nb_available_bytes > 3)
                   or nb_available_bytes > 12 * C) and not hybrid \
            and not silence and tell + 16 <= total_bits and not self.disable_pf
        prefilter_tapset = self.tapset_decision
        pf_on, pitch_index, gain1, qg = self._run_prefilter(
            inp, CC, N, prefilter_tapset, enabled, tf_estimate,
            nb_available_bytes, tone_freq, toneishness)
        pitch_change = 0
        if (gain1 > .4 or self.prefilter_gain > .4) and \
                (pitch_index > 1.26 * self.prefilter_period
                 or pitch_index < .79 * self.prefilter_period):
            pitch_change = 1
        if pf_on == 0:
            if not hybrid and tell + 16 <= total_bits:
                enc.enc_bit_logp(0, 1)
        else:
            enc.enc_bit_logp(1, 1)
            pitch_index += 1
            octave = ilog(pitch_index) - 5
            enc.enc_uint(octave, 6)
            enc.enc_bits(pitch_index - (16 << octave), 4 + octave)
            pitch_index -= 1
            enc.enc_bits(qg, 3)
            enc.enc_icdf(prefilter_tapset, TAPSET_ICDF, 2)

        transient_got_disabled = 0
        if lm > 0 and ec_tell(enc) + 3 <= total_bits:
            if is_transient:
                short_blocks = M
        else:
            is_transient = 0
            transient_got_disabled = 1

        freq = np.zeros(CC * N)
        band_e = np.zeros(nbE * CC)
        band_log_e = np.zeros(nbE * CC)
        band_log_e2 = np.zeros(C * nbE)

        second_mdct = short_blocks and self.complexity >= 8
        if second_mdct:
            self._compute_mdcts(0, inp, freq, C, CC, lm)
            compute_band_energies(mode, freq, band_e, eff_end, C, lm)
            amp2log2(mode, eff_end, end, band_e, band_log_e2, C)
            for c in range(C):
                band_log_e2[nbE * c:nbE * c + end] += .5 * lm

        self._compute_mdcts(short_blocks, inp, freq, C, CC, lm)
        if CC == 2 and C == 1:
            tf_chan = 0
        compute_band_energies(mode, freq, band_e, eff_end, C, lm)
        amp2log2(mode, eff_end, end, band_e, band_log_e, C)

        surround_dynalloc = np.zeros(C * nbE)
        surround_trim = 0.0
        surround_masking = 0.0
        # surround masking between channels (reference:
        # celt_encoder.c:2112-2186; energy_mask set by the multistream
        # encoder's surround_analysis)
        if not hybrid and self.energy_mask is not None and not self.lfe:
            eBands = mode.eBands
            mask_end = max(2, self.lastCodedBands)
            mask_avg = 0.0
            diff = 0.0
            count = 0
            for c in range(C):
                for i in range(mask_end):
                    m = max(min(self.energy_mask[nbE * c + i], .25), -2.0)
                    if m > 0:
                        m = .5 * m
                    w = eBands[i + 1] - eBands[i]
                    mask_avg += m * w
                    count += w
                    diff += m * (1 + 2 * i - mask_end)
            mask_avg = mask_avg / count + .2
            diff = diff * 6 / (C * (mask_end - 1) * (mask_end + 1)
                               * mask_end)
            diff = .5 * diff
            diff = max(min(diff, .031), -.031)
            midband = 0
            while eBands[midband + 1] < eBands[mask_end] // 2:
                midband += 1
            count_dynalloc = 0
            for i in range(mask_end):
                lin = mask_avg + diff * (i - midband)
                if C == 2:
                    unmask = max(self.energy_mask[i],
                                 self.energy_mask[nbE + i])
                else:
                    unmask = self.energy_mask[i]
                unmask = min(unmask, 0.0) - lin
                if unmask > .25:
                    surround_dynalloc[i] = unmask - .25
                    count_dynalloc += 1
            if count_dynalloc >= 3:
                mask_avg += .25
                if mask_avg > 0:
                    mask_avg = 0.0
                    diff = 0.0
                    surround_dynalloc[:mask_end] = 0.0
                else:
                    surround_dynalloc[:mask_end] = np.maximum(
                        0.0, surround_dynalloc[:mask_end] - .25)
            mask_avg += .2
            surround_trim = 64 * diff
            surround_masking = mask_avg
        # temporal VBR
        temporal_vbr = 0.0
        if not self.lfe:
            follow = -10.0
            frame_avg = 0.0
            offset = .5 * lm if short_blocks else 0.0
            for i in range(start, end):
                follow = max(follow - 1.0, band_log_e[i] - offset)
                if C == 2:
                    follow = max(follow, band_log_e[i + nbE] - offset)
                frame_avg += follow
            frame_avg /= (end - start)
            temporal_vbr = frame_avg - self.spec_avg
            temporal_vbr = min(3.0, max(-1.5, temporal_vbr))
            self.spec_avg += .02 * temporal_vbr

        if not second_mdct:
            band_log_e2[:C * nbE] = band_log_e[:C * nbE]

        if lm > 0 and ec_tell(enc) + 3 <= total_bits and not is_transient \
                and self.complexity >= 5 and not self.lfe and not hybrid:
            if patch_transient_decision(band_log_e, self.oldBandE, nbE,
                                        start, end, C):
                is_transient = 1
                short_blocks = M
                self._compute_mdcts(short_blocks, inp, freq, C, CC, lm)
                compute_band_energies(mode, freq, band_e, eff_end, C, lm)
                amp2log2(mode, eff_end, end, band_e, band_log_e, C)
                for c in range(C):
                    band_log_e2[nbE * c:nbE * c + end] += .5 * lm
                tf_estimate = .2

        if lm > 0 and ec_tell(enc) + 3 <= total_bits:
            enc.enc_bit_logp(is_transient, 3)

        X = np.zeros(C * N)
        normalise_bands(mode, freq, X, band_e, eff_end, C, M)

        enable_tf_analysis = effective_bytes >= 15 * C and not hybrid \
            and self.complexity >= 2 and not self.lfe and toneishness < .98

        offsets = [0] * nbE
        importance = [0] * nbE
        spread_weight = [0] * nbE
        max_depth, tot_boost = self._dynalloc_analysis(
            band_log_e, band_log_e2, nbE, start, end, C, offsets,
            self.lsb_depth, mode.logN, is_transient, self.vbr,
            self.constrained_vbr, eBands, lm, effective_bytes,
            surround_dynalloc, importance, spread_weight, tone_freq,
            toneishness)

        tf_res = [0] * nbE
        if enable_tf_analysis:
            lam = max(80, 20480 // effective_bytes + 2)
            tf_select = tf_analysis(mode, eff_end, is_transient, tf_res, lam,
                                    X, N, lm, tf_estimate, tf_chan, importance)
            for i in range(eff_end, end):
                tf_res[i] = tf_res[eff_end - 1]
        elif hybrid and weak_transient:
            for i in range(end):
                tf_res[i] = 1
            tf_select = 0
        elif hybrid and effective_bytes < 15 and self.silk_info_signal_type != 2:
            for i in range(end):
                tf_res[i] = 0
            tf_select = is_transient
        else:
            for i in range(end):
                tf_res[i] = is_transient
            tf_select = 0

        error = [0.0] * (C * nbE)
        for c in range(C):
            for i in range(start, end):
                if abs(band_log_e[i + c * nbE] - self.oldBandE[i + c * nbE]) < 2.0:
                    band_log_e[i + c * nbE] -= .25 * self.energyError[i + c * nbE]
        self.delayedIntra = quant_coarse_energy(
            mode, start, end, eff_end, band_log_e, self.oldBandE, total_bits,
            error, enc, C, lm, nb_available_bytes, self.force_intra,
            self.delayedIntra, self.complexity >= 4, self.loss_rate, self.lfe)

        tf_encode(start, end, is_transient, tf_res, lm, tf_select, enc)

        if ec_tell(enc) + 4 <= total_bits:
            if self.lfe:
                self.tapset_decision = 0
                self.spread_decision = SPREAD_NORMAL
            elif hybrid:
                if self.complexity == 0:
                    self.spread_decision = SPREAD_NONE
                elif is_transient:
                    self.spread_decision = SPREAD_NORMAL
                else:
                    self.spread_decision = SPREAD_AGGRESSIVE
            elif short_blocks or self.complexity < 3 \
                    or nb_available_bytes < 10 * C:
                if self.complexity == 0:
                    self.spread_decision = SPREAD_NONE
                else:
                    self.spread_decision = SPREAD_NORMAL
            else:
                sd_state = {"average": self.tonal_average,
                            "hf_average": self.hf_average,
                            "tapset_decision": self.tapset_decision,
                            "last_decision": self.spread_decision}
                self.spread_decision = spreading_decision(
                    mode, X, sd_state, pf_on and not short_blocks, eff_end,
                    C, M, spread_weight)
                self.tonal_average = sd_state["average"]
                self.hf_average = sd_state["hf_average"]
                self.tapset_decision = sd_state["tapset_decision"]
            enc.enc_icdf(self.spread_decision, SPREAD_ICDF, 5)
        else:
            self.spread_decision = SPREAD_NORMAL

        if self.lfe:
            offsets[0] = min(8, effective_bytes // 3)
        cap = A.init_caps(mode, lm, C)

        dynalloc_logp = 6
        total_bits <<= BITRES
        total_boost = 0
        tell_frac = ec_tell_frac(enc)
        for i in range(start, end):
            width = C * (eBands[i + 1] - eBands[i]) << lm
            quanta = min(width << BITRES, max(6 << BITRES, width))
            dynalloc_loop_logp = dynalloc_logp
            boost = 0
            j = 0
            while tell_frac + (dynalloc_loop_logp << BITRES) \
                    < total_bits - total_boost and boost < cap[i]:
                flag = 1 if j < offsets[i] else 0
                enc.enc_bit_logp(flag, dynalloc_loop_logp)
                tell_frac = ec_tell_frac(enc)
                if not flag:
                    break
                boost += quanta
                total_boost += quanta
                dynalloc_loop_logp = 1
                j += 1
            if j:
                dynalloc_logp = max(2, dynalloc_logp - 1)
            offsets[i] = boost

        dual_stereo = 0
        if C == 2:
            intensity_thresholds = (1, 2, 3, 4, 5, 6, 7, 8, 16, 24, 36, 44,
                                    50, 56, 62, 67, 72, 79, 88, 106, 134)
            intensity_histeresis = (1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2,
                                    2, 3, 3, 4, 5, 6, 8, 8)
            if lm != 0:
                dual_stereo = int(stereo_analysis(mode, X, lm, N))
            self.intensity = hysteresis_decision(
                equiv_rate / 1000, intensity_thresholds,
                intensity_histeresis, 21, self.intensity)
            self.intensity = min(end, max(start, self.intensity))

        alloc_trim = 5
        if tell_frac + (6 << BITRES) <= total_bits - total_boost:
            if start > 0 or self.lfe:
                self.stereo_saving = 0.0
                alloc_trim = 5
            else:
                alloc_trim, self.stereo_saving = alloc_trim_analysis(
                    mode, X, band_log_e, end, lm, C, N, self.stereo_saving,
                    tf_estimate, self.intensity, surround_trim, equiv_rate,
                    analysis=self.analysis)
            enc.enc_icdf(alloc_trim, TRIM_ICDF, 7)
            tell_frac = ec_tell_frac(enc)

        min_allowed = ((tell_frac + total_boost + (1 << (BITRES + 3)) - 1)
                       >> (BITRES + 3)) + 2
        if hybrid:
            min_allowed = max(min_allowed,
                              (tell0_frac + (37 << BITRES) + total_boost
                               + (1 << (BITRES + 3)) - 1) >> (BITRES + 3))

        if vbr_rate > 0:
            lm_diff = mode.maxLM - lm
            nb_compressed_bytes = min(
                nb_compressed_bytes,
                (3825 if self.enable_qext else 1275) >> (3 - lm))
            if not hybrid:
                base_target = vbr_rate - ((40 * C + 20) << BITRES)
            else:
                base_target = max(0, vbr_rate - ((9 * C + 4) << BITRES))
            if self.constrained_vbr:
                base_target += self.vbr_offset >> lm_diff
            if not hybrid:
                target = compute_vbr(mode, base_target, lm, equiv_rate,
                                     self.lastCodedBands, C, self.intensity,
                                     self.constrained_vbr, self.stereo_saving,
                                     tot_boost, tf_estimate, pitch_change,
                                     max_depth, temporal_vbr,
                                     analysis=self.analysis, lfe=self.lfe,
                                     has_surround_mask=int(
                                         self.energy_mask is not None),
                                     surround_masking=surround_masking)
            else:
                target = base_target
                if self.silk_info_offset < 100:
                    target += 12 << BITRES >> (3 - lm)
                if self.silk_info_offset > 100:
                    target -= 18 << BITRES >> (3 - lm)
                target += int((tf_estimate - .25) * (50 << BITRES))
                if tf_estimate > .7:
                    target = max(target, 50 << BITRES)
            target = target + tell_frac
            nb_available_bytes = (target + (1 << (BITRES + 2))) >> (BITRES + 3)
            nb_available_bytes = max(min_allowed, nb_available_bytes)
            nb_available_bytes = min(nb_compressed_bytes, nb_available_bytes)
            delta = target - vbr_rate
            target = nb_available_bytes << (BITRES + 3)
            if silence:
                nb_available_bytes = 2
                target = 2 * 8 << BITRES
                delta = 0
            if self.vbr_count < 970:
                self.vbr_count += 1
                alpha = 1.0 / (self.vbr_count + 20)
            else:
                alpha = .001
            if self.constrained_vbr:
                self.vbr_reservoir += target - vbr_rate
                self.vbr_drift += int(alpha * ((delta * (1 << lm_diff))
                                               - self.vbr_offset
                                               - self.vbr_drift))
                self.vbr_offset = -self.vbr_drift
            if self.constrained_vbr and self.vbr_reservoir < 0:
                adjust = (-self.vbr_reservoir) // (8 << BITRES)
                nb_available_bytes += 0 if silence else adjust
                self.vbr_reservoir = 0
            nb_compressed_bytes = min(nb_compressed_bytes, nb_available_bytes)
            enc.shrink(nb_compressed_bytes)

        # ---- quality extensions: split the byte budget into the main
        # payload and the extension payload (reference:
        # celt_encoder.c:2535-2596) ----
        qext_bytes = 0
        ext_enc = None
        qext_mode = None
        qext_end = 0
        qext_intensity = 0
        qext_dual_stereo = 0
        self.qext_payload = None
        if self.enable_qext:
            qext_scale = 2 if (mode.Fs == 96000
                               and mode.shortMdctSize in (240, 180)) else 1
            # no extension bits below 80 kb/s per channel; 80% of the excess
            offset_b = (C * 80000 * 6 // (6 * mode.Fs // frame_size)) // 8
            qext_bytes = max(nb_compressed_bytes - 1275,
                             max(0, (nb_compressed_bytes - offset_b) * 4 // 5))
            if qext_bytes > 20:
                qext_bytes = max(nb_compressed_bytes - 1275,
                                 max(21, qext_bytes))
            padding_len_bytes = (qext_bytes + 253) // 254
            qext_bytes = min(qext_bytes, nb_compressed_bytes - min_allowed
                             - padding_len_bytes - 1)
            padding_len_bytes = (qext_bytes + 253) // 254
            if qext_bytes > 20:
                nb_compressed_bytes = nb_compressed_bytes - qext_bytes \
                    - padding_len_bytes - 1
                enc.shrink(nb_compressed_bytes)
                qext_bytes -= 1   # extension ID byte
                ext_enc = RangeEncoder(qext_bytes)
                if end == nbE and mode.Fs in (48000, 96000) \
                        and mode.shortMdctSize in (120 * qext_scale,
                                                   90 * qext_scale):
                    qext_mode = compute_qext_mode(mode)
                    qext_end = NB_QEXT_BANDS if qext_scale == 2 else 2
                    ext_enc.enc_bit_logp(
                        1 if qext_end == NB_QEXT_BANDS else 0, 1)
            else:
                qext_bytes = 0
                nb_compressed_bytes = min(nb_compressed_bytes, 1275)
                enc.shrink(nb_compressed_bytes)

        # allocation
        bits = (nb_compressed_bytes * 8 << BITRES) - ec_tell_frac(enc) - 1
        anti_collapse_rsv = (1 << BITRES) if (
            is_transient and lm >= 2 and bits >= ((lm + 2) << BITRES)) else 0
        bits -= anti_collapse_rsv
        signal_bandwidth = end - 1
        if self.lfe:
            signal_bandwidth = 1
        (coded_bands, balance, pulses, fine_quant, fine_priority,
         self.intensity, dual_stereo) = A.compute_allocation(
            mode, start, end, offsets, cap, alloc_trim, self.intensity,
            dual_stereo, bits, C, lm, enc, encode=True,
            prev=self.lastCodedBands, signal_bandwidth=signal_bandwidth)
        if self.lastCodedBands:
            self.lastCodedBands = min(self.lastCodedBands + 1,
                                      max(self.lastCodedBands - 1,
                                          coded_bands))
        else:
            self.lastCodedBands = coded_bands

        quant_fine_energy(mode, start, end, self.oldBandE, error, None,
                          fine_quant, enc, C)
        self.energyError[:] = 0

        # QEXT: extension-band energies + extra allocation + main-band
        # fine-energy refinement (reference: celt_encoder.c:2641-2668)
        extra_pulses = [0] * (nbE + NB_QEXT_BANDS)
        extra_quant = [0] * (nbE + NB_QEXT_BANDS)
        qext_band_e = np.zeros(2 * NB_QEXT_BANDS)
        qext_band_log_e = np.zeros(2 * NB_QEXT_BANDS)
        qext_error = np.zeros(C * NB_QEXT_BANDS)
        error_bak = None
        if ext_enc is not None:
            if qext_mode is not None:
                compute_band_energies(qext_mode, freq, qext_band_e,
                                      qext_end, C, lm)
                normalise_bands(qext_mode, freq, X, qext_band_e, qext_end,
                                C, M)
                amp2log2(qext_mode, qext_end, qext_end, qext_band_e,
                         qext_band_log_e, C)
                if C == 2:
                    # (reference: encode_qext_stereo_params
                    #  celt_encoder.c:1720)
                    qext_intensity = qext_end
                    qext_dual_stereo = dual_stereo
                    ext_enc.enc_uint(qext_intensity, qext_end + 1)
                    if qext_intensity != 0:
                        ext_enc.enc_bit_logp(qext_dual_stereo, 1)
                quant_coarse_energy(qext_mode, 0, qext_end, qext_end,
                                    qext_band_log_e, self.qext_oldBandE,
                                    qext_bytes * 8, qext_error, ext_enc,
                                    C, lm, qext_bytes, self.force_intra,
                                    0.0, self.complexity >= 4,
                                    self.loss_rate, self.lfe)
            qext_bits = (qext_bytes * 8 << BITRES) \
                - ext_enc.tell_frac() - 1
            A.clt_compute_extra_allocation_encode(
                mode, qext_mode, start, end, qext_end, band_log_e,
                qext_band_log_e, qext_bits, extra_pulses, extra_quant,
                C, lm, ext_enc, tone_freq, toneishness)
            error_bak = error.copy()
            quant_fine_energy(mode, start, end, self.oldBandE, error,
                              fine_quant, extra_quant, ext_enc, C)

        collapse_masks = np.zeros(C * nbE, dtype=np.int64)
        x_ = X[:N]
        y_ = X[N:] if C == 2 else None
        self.rng = B.quant_all_bands(
            1, mode, start, end, x_, y_, collapse_masks, band_e, pulses,
            short_blocks, self.spread_decision, dual_stereo, self.intensity,
            tf_res, nb_compressed_bytes * (8 << BITRES) - anti_collapse_rsv,
            balance, enc, lm, coded_bands, self.rng, self.complexity,
            self.disable_inv,
            ext_ec=ext_enc, extra_pulses=extra_pulses,
            ext_total_bits=qext_bytes * (8 << BITRES),
            cap=cap if ext_enc is not None else None)

        if qext_mode is not None:
            # code the 20-48 kHz extension bands (reference:
            # celt_encoder.c:2680-2696)
            ext_balance = qext_bytes * (8 << BITRES) - ext_enc.tell_frac()
            for i in range(qext_end):
                ext_balance -= extra_pulses[nbE + i] \
                    + C * (extra_quant[nbE + i] << BITRES)
            quant_fine_energy(qext_mode, 0, qext_end, self.qext_oldBandE,
                              qext_error, None, extra_quant[nbE:], ext_enc,
                              C)
            qext_collapse = np.zeros(C * NB_QEXT_BANDS, dtype=np.int64)
            zeros_tf = [0] * NB_QEXT_BANDS
            dummy_ext = RangeEncoder(0)
            self.rng = B.quant_all_bands(
                1, qext_mode, 0, qext_end, x_, y_, qext_collapse,
                qext_band_e, extra_pulses[nbE:], short_blocks,
                self.spread_decision, qext_dual_stereo, qext_intensity,
                zeros_tf, qext_bytes * (8 << BITRES), ext_balance, ext_enc,
                lm, qext_end, self.rng, self.complexity, self.disable_inv,
                ext_ec=dummy_ext, extra_pulses=[0] * NB_QEXT_BANDS,
                ext_total_bits=0, cap=None)

        if anti_collapse_rsv > 0:
            anti_collapse_on = 1 if self.consec_transient < 2 else 0
            enc.enc_bits(anti_collapse_on, 1)
        if qext_bytes == 0:
            quant_energy_finalise(mode, start, end, self.oldBandE, error,
                                  fine_quant, fine_priority,
                                  nb_compressed_bytes * 8 - ec_tell(enc),
                                  enc, C)
        else:
            # with extension refinement the finalise bits are coded from
            # the pre-refinement error without updating the energy state
            # (reference: celt_encoder.c:2717-2718)
            quant_energy_finalise(mode, start, end, None, error_bak,
                                  fine_quant, fine_priority,
                                  nb_compressed_bytes * 8 - ec_tell(enc),
                                  enc, C)
        for c in range(C):
            for i in range(start, end):
                self.energyError[i + c * nbE] = max(-0.5,
                                                    min(0.5,
                                                        error[i + c * nbE]))

        if silence:
            self.oldBandE[:C * nbE] = -28.0

        self.prefilter_period = pitch_index
        self.prefilter_gain = gain1
        self.prefilter_tapset = prefilter_tapset

        if CC == 2 and C == 1:
            self.oldBandE[nbE:2 * nbE] = self.oldBandE[:nbE]
        if not is_transient:
            self.oldLogE2[:] = self.oldLogE
            self.oldLogE[:] = self.oldBandE
        else:
            np.minimum(self.oldLogE, self.oldBandE, out=self.oldLogE)
        for c in range(CC):
            for i in range(0, start):
                self.oldBandE[c * nbE + i] = 0
                self.oldLogE[c * nbE + i] = self.oldLogE2[c * nbE + i] = -28.0
            for i in range(end, nbE):
                self.oldBandE[c * nbE + i] = 0
                self.oldLogE[c * nbE + i] = self.oldLogE2[c * nbE + i] = -28.0

        if is_transient or transient_got_disabled:
            self.consec_transient += 1
        else:
            self.consec_transient = 0
        self.rng = enc.rng
        enc.done()
        if ext_enc is not None:
            ext_enc.done()
            self.rng = self.rng ^ ext_enc.rng   # (celt_encoder.c:2820)
            self.qext_payload = bytes([124 << 1]) \
                + bytes(ext_enc.buf[:qext_bytes])
        if enc.error:
            return -3
        return nb_compressed_bytes

    # ------------------------------------------------------------------
    def _compute_mdcts(self, short_blocks, inp, freq, c_coded, cc, lm):
        """(reference: compute_mdcts celt_encoder.c:511)"""
        from ..ops.mdct import _forward_basis
        mode = self.mode
        overlap = mode.overlap
        if short_blocks:
            bblocks = short_blocks
            n = mode.shortMdctSize
        else:
            bblocks = 1
            n = mode.shortMdctSize << lm
        basis = _forward_basis(n, overlap).astype(np.float64)
        nn = bblocks * n
        for c in range(cc):
            for b in range(bblocks):
                seg = inp[c, b * n:b * n + n + overlap]
                spec = seg @ basis
                freq[c * nn + b::bblocks][:n] = spec
        if cc == 2 and c_coded == 1:
            freq[:nn] = .5 * freq[:nn] + .5 * freq[nn:2 * nn]
        if self.upsample != 1:
            for c in range(c_coded):
                bound = nn // self.upsample
                freq[c * nn:c * nn + bound] *= self.upsample
                freq[c * nn + bound:(c + 1) * nn] = 0

    # ------------------------------------------------------------------
    def _run_prefilter(self, inp, cc, n, prefilter_tapset, enabled,
                       tf_estimate, nb_available_bytes, tone_freq,
                       toneishness):
        """(reference: run_prefilter celt_encoder.c:1415)"""
        mode = self.mode
        overlap = mode.overlap
        qscale = 2 if (mode.Fs == 96000
                       and mode.shortMdctSize in (240, 180)) else 1
        max_period = qscale * COMBFILTER_MAXPERIOD
        min_period = qscale * COMBFILTER_MINPERIOD
        pre = np.zeros((cc, n + max_period))
        for c in range(cc):
            pre[c, :max_period] = self.prefilter_mem[c]
            pre[c, max_period:] = inp[c, overlap:overlap + n]

        if enabled and toneishness > .99:
            # tone frequencies are judged at the 48 kHz-equivalent scale
            # and the resulting period is already at the coded scale
            # (reference: celt_encoder.c:1444-1453 QEXT_SCALE(tone_freq))
            multiple = 1
            tf = tone_freq
            if qscale * tf >= 3.1416:
                tf = 3.141593 - tf
            while qscale * tf >= multiple * 0.39:
                multiple += 1
            if qscale * tf > 0.006148:
                pitch_index = min(int(math.floor(.5 + 2 * math.pi * multiple
                                                 / (qscale * tf))),
                                  COMBFILTER_MAXPERIOD - 2)
            else:
                pitch_index = COMBFILTER_MINPERIOD
            gain1 = .75
        elif enabled and self.complexity >= 5:
            pitch_len = (max_period + n) >> 1
            x_lp = pitch_downsample([pre[c] for c in range(cc)], pitch_len)
            pitch_index = pitch_search(x_lp[max_period >> 1:], x_lp, n,
                                       max_period - 3 * min_period)
            pitch_index = max_period - pitch_index
            gain1, pitch_index = remove_doubling(
                x_lp, max_period, min_period, n, pitch_index,
                self.prefilter_period, self.prefilter_gain)
            if pitch_index > max_period - 2 * qscale:
                pitch_index = max_period - 2 * qscale
            # the pitch is coded (and the comb applied) at the 48 kHz
            # scale (reference: celt_encoder.c:1476-1479)
            pitch_index //= qscale
            gain1 = .7 * gain1
            if self.loss_rate > 2:
                gain1 = .5 * gain1
            if self.loss_rate > 4:
                gain1 = .5 * gain1
            if self.loss_rate > 8:
                gain1 = 0
        else:
            gain1 = 0.0
            pitch_index = COMBFILTER_MINPERIOD
        if self.analysis is not None and self.analysis.valid:
            # (reference: celt_encoder.c:1494)
            gain1 = gain1 * self.analysis.max_pitch_ratio

        pf_threshold = .2
        if abs(pitch_index - self.prefilter_period) * 10 > pitch_index:
            pf_threshold += .2
            if tf_estimate > .98:
                gain1 = 0.0
        if nb_available_bytes < 25:
            pf_threshold += .1
        if nb_available_bytes < 35:
            pf_threshold += .1
        if self.prefilter_gain > .4:
            pf_threshold -= .1
        if self.prefilter_gain > .55:
            pf_threshold -= .1
        pf_threshold = max(pf_threshold, .2)
        if gain1 < pf_threshold:
            gain1 = 0.0
            pf_on = 0
            qg = 0
        else:
            if abs(gain1 - self.prefilter_gain) < .1:
                gain1 = self.prefilter_gain
            qg = int(math.floor(.5 + gain1 * 32 / 3)) - 1
            qg = max(0, min(7, qg))
            gain1 = 0.09375 * (qg + 1)
            pf_on = 1

        window = mode.window.astype(np.float64)
        before = np.zeros(cc)
        after = np.zeros(cc)
        for c in range(cc):
            offset = mode.shortMdctSize - overlap
            self.prefilter_period = max(self.prefilter_period,
                                        COMBFILTER_MINPERIOD)
            inp[c, :overlap] = self.in_mem[c]
            before[c] = float(np.abs(inp[c, overlap:overlap + n]).sum())
            if offset:
                comb_filter_sep(inp[c], overlap, pre[c], max_period,
                                self.prefilter_period, self.prefilter_period,
                                offset, -self.prefilter_gain,
                                -self.prefilter_gain, self.prefilter_tapset,
                                self.prefilter_tapset, None, 0)
            comb_filter_sep(inp[c], overlap + offset, pre[c],
                            max_period + offset, self.prefilter_period,
                            pitch_index, n - offset, -self.prefilter_gain,
                            -gain1, self.prefilter_tapset, prefilter_tapset,
                            window, overlap)
            after[c] = float(np.abs(inp[c, overlap:overlap + n]).sum())

        cancel_pitch = 0
        if cc == 2:
            thresh0 = .25 * gain1 * before[0] + .01 * before[1]
            thresh1 = .25 * gain1 * before[1] + .01 * before[0]
            if after[0] - before[0] > thresh0 or after[1] - before[1] > thresh1:
                cancel_pitch = 1
            if before[0] - after[0] < thresh0 and before[1] - after[1] < thresh1:
                cancel_pitch = 1
        else:
            if after[0] > before[0]:
                cancel_pitch = 1
        if cancel_pitch:
            for c in range(cc):
                offset = mode.shortMdctSize - overlap
                inp[c, overlap:overlap + n] = pre[c, max_period:max_period + n]
                comb_filter_sep(inp[c], overlap + offset, pre[c],
                                max_period + offset, self.prefilter_period,
                                pitch_index, overlap, -self.prefilter_gain,
                                -0.0, self.prefilter_tapset, prefilter_tapset,
                                window, overlap)
            gain1 = 0.0
            pf_on = 0
            qg = 0

        for c in range(cc):
            self.in_mem[c] = inp[c, n:n + overlap]
            if n > max_period:
                self.prefilter_mem[c] = pre[c, n:n + max_period]
            else:
                self.prefilter_mem[c, :max_period - n] = \
                    self.prefilter_mem[c, n:]
                self.prefilter_mem[c, max_period - n:] = \
                    pre[c, max_period:max_period + n]
        return pf_on, pitch_index, gain1, qg

    # ------------------------------------------------------------------
    def _dynalloc_analysis(self, band_log_e, band_log_e2, nbE, start, end, C,
                           offsets, lsb_depth, logN, is_transient, vbr,
                           constrained_vbr, eBands, lm, effective_bytes,
                           surround_dynalloc, importance, spread_weight,
                           tone_freq, toneishness):
        """(reference: dynalloc_analysis celt_encoder.c:1049).
        Returns (maxDepth, tot_boost)."""
        tot_boost = 0
        follower = np.zeros(C * nbE)
        noise_floor = np.zeros(nbE)
        for i in range(end):
            noise_floor[i] = 0.0625 * logN[i] + .5 + (9 - lsb_depth) \
                - E_MEANS[i] + .0062 * (i + 5) * (i + 5)
        max_depth = -31.9
        for c in range(C):
            for i in range(end):
                max_depth = max(max_depth,
                                band_log_e[c * nbE + i] - noise_floor[i])
        # spread weights from a simple masking model
        mask = np.zeros(nbE)
        for i in range(end):
            mask[i] = band_log_e[i] - noise_floor[i]
        if C == 2:
            for i in range(end):
                mask[i] = max(mask[i], band_log_e[nbE + i] - noise_floor[i])
        sig = mask[:end].copy()
        for i in range(1, end):
            mask[i] = max(mask[i], mask[i - 1] - 2.0)
        for i in range(end - 2, -1, -1):
            mask[i] = max(mask[i], mask[i + 1] - 3.0)
        for i in range(end):
            smr = sig[i] - max(max(0.0, max_depth - 12.0), mask[i])
            shift = min(5, max(0, -int(math.floor(.5 + smr))))
            spread_weight[i] = 32 >> shift

        if effective_bytes >= 30 + 5 * lm and not self.lfe:
            last = 0
            for c in range(C):
                band_log_e3 = band_log_e2[c * nbE:c * nbE + end].copy()
                if lm == 0:
                    for i in range(min(8, end)):
                        band_log_e3[i] = max(band_log_e2[c * nbE + i],
                                             self.oldBandE[c * nbE + i])
                f = follower[c * nbE:]
                f[0] = band_log_e3[0]
                for i in range(1, end):
                    if band_log_e3[i] > band_log_e3[i - 1] + .5:
                        last = i
                    f[i] = min(f[i - 1] + 1.5, band_log_e3[i])
                for i in range(last - 1, -1, -1):
                    f[i] = min(f[i], min(f[i + 1] + 2.0, band_log_e3[i]))
                offset = 1.0
                for i in range(2, end - 2):
                    f[i] = max(f[i], _median5(band_log_e3[i - 2:i + 3])
                               - offset)
                tmp = _median3(band_log_e3[0:3]) - offset
                f[0] = max(f[0], tmp)
                f[1] = max(f[1], tmp)
                tmp = _median3(band_log_e3[end - 3:end]) - offset
                f[end - 2] = max(f[end - 2], tmp)
                f[end - 1] = max(f[end - 1], tmp)
                for i in range(end):
                    f[i] = max(f[i], noise_floor[i])
            if C == 2:
                for i in range(start, end):
                    follower[nbE + i] = max(follower[nbE + i],
                                            follower[i] - 4.0)
                    follower[i] = max(follower[i], follower[nbE + i] - 4.0)
                    follower[i] = .5 * (max(0.0, band_log_e[i] - follower[i])
                                        + max(0.0, band_log_e[nbE + i]
                                              - follower[nbE + i]))
            else:
                for i in range(start, end):
                    follower[i] = max(0.0, band_log_e[i] - follower[i])
            for i in range(start, end):
                follower[i] = max(follower[i], surround_dynalloc[i])
            for i in range(start, end):
                importance[i] = int(math.floor(
                    .5 + 13 * 2 ** (min(follower[i], 4.0))))
            if (not vbr or constrained_vbr) and not is_transient:
                for i in range(start, end):
                    follower[i] = .5 * follower[i]
            for i in range(start, end):
                if i < 8:
                    follower[i] *= 2
                if i >= 12:
                    follower[i] = .5 * follower[i]
            if toneishness > .98 and tone_freq >= 0:
                freq_bin = int(math.floor(.5 + tone_freq * 120 / math.pi))
                for i in range(start, end):
                    if eBands[i] <= freq_bin <= eBands[i + 1]:
                        follower[i] += 2.0
                    if eBands[i] - 1 <= freq_bin <= eBands[i + 1] + 1:
                        follower[i] += 1.0
                    if eBands[i] - 2 <= freq_bin <= eBands[i + 1] + 2:
                        follower[i] += 1.0
                    if eBands[i] - 3 <= freq_bin <= eBands[i + 1] + 3:
                        follower[i] += .5
                if freq_bin >= eBands[end]:
                    follower[end - 1] += 2.0
                    follower[end - 2] += 1.0
            if self.analysis is not None and self.analysis.valid:
                # leakage boosts from the analyzer (:1226-1230)
                for i in range(start, min(19, end)):
                    follower[i] += (1.0 / 64) \
                        * float(self.analysis.leak_boost[i])
            if effective_bytes > 320:
                follower[0] += min(1.5, 1e-3 * (effective_bytes - 320))
            for i in range(start, end):
                follower[i] = min(follower[i], 4.0)
                width = C * (eBands[i + 1] - eBands[i]) << lm
                if width < 6:
                    boost = int(follower[i])
                    boost_bits = boost * width << BITRES
                elif width > 48:
                    boost = int(follower[i] * 8)
                    boost_bits = (boost * width << BITRES) // 8
                else:
                    boost = int(follower[i] * width / 6)
                    boost_bits = boost * 6 << BITRES
                if (not vbr or (constrained_vbr and not is_transient)) \
                        and (tot_boost + boost_bits) >> BITRES >> 3 \
                        > 2 * effective_bytes // 3:
                    capv = (2 * effective_bytes // 3) << BITRES << 3
                    offsets[i] = capv - tot_boost
                    tot_boost = capv
                    break
                else:
                    offsets[i] = boost
                    tot_boost += boost_bits
        else:
            for i in range(start, end):
                importance[i] = 13
        return max_depth, tot_boost


def _median5(x):
    return float(np.median(np.asarray(x[:5])))


def _median3(x):
    return float(np.median(np.asarray(x[:3])))

"""Pitch estimation for the CELT prefilter (reference: celt/pitch.c,
celt/celt_lpc.c).  Float implementation; encoder decisions only (does not
affect bitstream validity)."""

from __future__ import annotations

import math

import numpy as np


def _celt_autocorr(x: np.ndarray, lag: int) -> np.ndarray:
    n = len(x)
    return np.array([float(np.dot(x[:n - k], x[k:])) for k in range(lag + 1)])


def _celt_lpc(ac: np.ndarray, p: int) -> np.ndarray:
    """Levinson-Durbin (reference: celt/celt_lpc.c:37)."""
    lpc = np.zeros(p)
    error = ac[0]
    if ac[0] > 1e-10:
        for i in range(p):
            rr = 0.0
            for j in range(i):
                rr += lpc[j] * ac[i - j]
            rr += ac[i + 1]
            r = -rr / error
            lpc[i] = r
            for j in range((i + 1) >> 1):
                tmp1 = lpc[j]
                tmp2 = lpc[i - 1 - j]
                lpc[j] = tmp1 + r * tmp2
                lpc[i - 1 - j] = tmp2 + r * tmp1
            error = error - r * r * error
            if error <= 0.001 * ac[0]:
                break
    return lpc


def _fir5(x: np.ndarray, num: np.ndarray) -> None:
    mem = [0.0] * 5
    for i in range(len(x)):
        s = x[i] + num[0] * mem[0] + num[1] * mem[1] + num[2] * mem[2] \
            + num[3] * mem[3] + num[4] * mem[4]
        mem[4] = mem[3]
        mem[3] = mem[2]
        mem[2] = mem[1]
        mem[1] = mem[0]
        mem[0] = x[i]
        x[i] = s


def pitch_downsample(x_chans, length: int, factor: int = 2) -> np.ndarray:
    """factor-x downsample + LPC flattening (reference: pitch.c:140;
    the QEXT build adds the factor argument so 96 kHz buffers land in
    the common 48 kHz pitch domain).
    x_chans: list of per-channel signals indexed so x[factor*i +/- offset]
    valid for i < length."""
    offset = factor // 2
    x_lp = np.zeros(length)
    x0 = x_chans[0]
    i = np.arange(1, length)
    x_lp[1:] = .25 * x0[factor * i - offset] + .25 * x0[factor * i + offset] \
        + .5 * x0[factor * i]
    x_lp[0] = .25 * x0[offset] + .5 * x0[0]
    if len(x_chans) == 2:
        x1 = x_chans[1]
        x_lp[1:] += .25 * x1[factor * i - offset] + .25 * x1[factor * i + offset] \
            + .5 * x1[factor * i]
        x_lp[0] += .25 * x1[offset] + .5 * x1[0]

    ac = _celt_autocorr(x_lp, 4)
    ac[0] *= 1.0001
    for k in range(1, 5):
        ac[k] -= ac[k] * (.008 * k) * (.008 * k)
    lpc = _celt_lpc(ac, 4)
    tmp = 1.0
    for k in range(4):
        tmp = .9 * tmp
        lpc[k] = lpc[k] * tmp
    c1 = .8
    lpc2 = np.array([lpc[0] + .8, lpc[1] + c1 * lpc[0], lpc[2] + c1 * lpc[1],
                     lpc[3] + c1 * lpc[2], c1 * lpc[3]])
    _fir5(x_lp, lpc2)
    return x_lp


def _find_best_pitch(xcorr, y, length, max_pitch):
    best_num = [-1.0, -1.0]
    best_den = [0.0, 0.0]
    best_pitch = [0, 1]
    syy = 1.0 + float(np.dot(y[:length], y[:length]))
    for i in range(max_pitch):
        if xcorr[i] > 0:
            xcorr16 = xcorr[i] * 1e-12
            num = xcorr16 * xcorr16
            if num * best_den[1] > best_num[1] * syy:
                if num * best_den[0] > best_num[0] * syy:
                    best_num[1] = best_num[0]
                    best_den[1] = best_den[0]
                    best_pitch[1] = best_pitch[0]
                    best_num[0] = num
                    best_den[0] = syy
                    best_pitch[0] = i
                else:
                    best_num[1] = num
                    best_den[1] = syy
                    best_pitch[1] = i
        syy += y[i + length] * y[i + length] - y[i] * y[i]
        syy = max(1.0, syy)
    return best_pitch


def pitch_search(x_lp: np.ndarray, y: np.ndarray, length: int,
                 max_pitch: int) -> int:
    """(reference: pitch.c:310).  x_lp is the last `length/2` downsampled
    samples; y is the whole buffer (len (length+max_pitch)/2)."""
    lag = length + max_pitch
    x_lp4 = x_lp[:length >> 1:2]
    y_lp4 = y[:lag >> 1:2]

    # coarse search, 4x decimation: correlate via FFT-free numpy
    n4 = length >> 2
    mp4 = max_pitch >> 2
    xcorr4 = np.array([float(np.dot(x_lp4[:n4], y_lp4[i:i + n4]))
                       for i in range(mp4)])
    best = _find_best_pitch(xcorr4, y_lp4, n4, mp4)

    # finer search, 2x decimation
    n2 = length >> 1
    mp2 = max_pitch >> 1
    xcorr = np.zeros(mp2)
    for i in range(mp2):
        if abs(i - 2 * best[0]) > 2 and abs(i - 2 * best[1]) > 2:
            continue
        xcorr[i] = max(-1.0, float(np.dot(x_lp[:n2], y[i:i + n2])))
    best = _find_best_pitch(xcorr, y, n2, mp2)

    if 0 < best[0] < mp2 - 1:
        a, b, c = xcorr[best[0] - 1], xcorr[best[0]], xcorr[best[0] + 1]
        if (c - a) > .7 * (b - a):
            offset = 1
        elif (a - c) > .7 * (b - c):
            offset = -1
        else:
            offset = 0
    else:
        offset = 0
    return 2 * best[0] - offset


def _compute_pitch_gain(xy, xx, yy):
    return xy / math.sqrt(1 + xx * yy)


_SECOND_CHECK = (0, 0, 3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2)


def remove_doubling(x_full: np.ndarray, maxperiod: int, minperiod: int,
                    n: int, t0_: int, prev_period: int, prev_gain: float):
    """(reference: pitch.c:454).  x_full indexed with maxperiod history at the
    front.  Returns (gain, T0)."""
    minperiod0 = minperiod
    maxperiod //= 2
    minperiod //= 2
    t0 = t0_ // 2
    prev_period //= 2
    n //= 2
    base = maxperiod  # x[i] == x_full[base + i]
    if t0 >= maxperiod:
        t0 = maxperiod - 1

    T = T0 = t0
    x = x_full

    def dual_inner(off1, off2):
        seg = x[base:base + n]
        return (float(np.dot(seg, x[base - off1:base - off1 + n])),
                float(np.dot(seg, x[base - off2:base - off2 + n])))

    xx, xy = dual_inner(0, T0)
    yy_lookup = np.zeros(maxperiod + 1)
    yy_lookup[0] = xx
    yy = xx
    for i in range(1, maxperiod + 1):
        yy = yy + x[base - i] * x[base - i] - x[base + n - i] * x[base + n - i]
        yy_lookup[i] = max(0.0, yy)
    yy = yy_lookup[T0]
    best_xy = xy
    best_yy = yy
    g = g0 = _compute_pitch_gain(xy, xx, yy)
    for k in range(2, 16):
        t1 = (2 * T0 + k) // (2 * k)
        if t1 < minperiod:
            break
        if k == 2:
            t1b = T0 if t1 + T0 > maxperiod else T0 + t1
        else:
            t1b = (2 * _SECOND_CHECK[k] * T0 + k) // (2 * k)
        xy, xy2 = dual_inner(t1, t1b)
        xy_avg = .5 * (xy + xy2)
        yy_avg = .5 * (yy_lookup[t1] + yy_lookup[t1b])
        g1 = _compute_pitch_gain(xy_avg, xx, yy_avg)
        if abs(t1 - prev_period) <= 1:
            cont = prev_gain
        elif abs(t1 - prev_period) <= 2 and 5 * k * k < T0:
            cont = .5 * prev_gain
        else:
            cont = 0.0
        thresh = max(.3, .7 * g0 - cont)
        if t1 < 3 * minperiod:
            thresh = max(.4, .85 * g0 - cont)
        elif t1 < 2 * minperiod:
            thresh = max(.5, .9 * g0 - cont)
        if g1 > thresh:
            best_xy = xy_avg
            best_yy = yy_avg
            T = t1
            g = g1
    if T < minperiod * 2:
        t1 = T * 5 // 8
        t2 = T * 6 // 8
        xy, xy2 = dual_inner(t1, t2)
        g1 = _compute_pitch_gain(xy, xx, yy_lookup[t1])
        g2 = _compute_pitch_gain(xy2, xx, yy_lookup[t2])
        if g1 >= g or g2 >= g:
            g = 0.0
    best_xy = max(0.0, best_xy)
    pg = 1.0 if best_yy <= best_xy else best_xy / (best_yy + 1)
    xcorr = [float(np.dot(x[base:base + n],
                          x[base - (T + kk - 1):base - (T + kk - 1) + n]))
             for kk in range(3)]
    if (xcorr[2] - xcorr[0]) > .7 * (xcorr[1] - xcorr[0]):
        offset = 1
    elif (xcorr[0] - xcorr[2]) > .7 * (xcorr[1] - xcorr[2]):
        offset = -1
    else:
        offset = 0
    if pg > g:
        pg = g
    t0_out = 2 * T + offset
    if t0_out < minperiod0:
        t0_out = minperiod0
    return pg, t0_out

"""CELT band shape coding: PVQ bands with theta splitting, folding, Hadamard
time/frequency reorganisation, anti-collapse (reference: celt/bands.c,
celt/vq.c).

Host-side scalar implementation operating on numpy float32/float64 views;
this is the per-stream *symbol* path.  All coded decisions are exact integer
math; the float parts only shape the reconstruction (conformance tolerates
float noise).  The batched TPU reconstruction lives in opus_tpu.models.

Currently implements the decode (and resynthesis) direction; encode entry
points land with the CELT encoder.
"""

from __future__ import annotations

import math

import numpy as np

from .cwrs import BITRES, decode_pulses, encode_pulses, pvq_v
from .modes import (CeltMode, bits2pulses, pulses2bits, get_pulses,
                    QTHETA_OFFSET, QTHETA_OFFSET_TWOPHASE)
from .tables import (SPREAD_NONE, SPREAD_AGGRESSIVE, E_MEANS)

NORM_SCALING = 1.0
EPSILON = 1e-15

ORDERY_TABLE = {
    2: (1, 0),
    4: (3, 0, 2, 1),
    8: (7, 0, 4, 3, 6, 1, 5, 2),
    16: (15, 0, 8, 7, 12, 3, 11, 4, 14, 1, 9, 6, 13, 2, 10, 5),
}

BIT_INTERLEAVE_TABLE = (0, 1, 1, 1, 2, 3, 3, 3, 2, 3, 3, 3, 2, 3, 3, 3)
BIT_DEINTERLEAVE_TABLE = (0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
                          0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF)

EXP2_TABLE8 = (16384, 17866, 19483, 21247, 23170, 25267, 27554, 30048)


def celt_lcg_rand(seed: int) -> int:
    return (1664525 * seed + 1013904223) & 0xFFFFFFFF


def bitexact_cos(x: int) -> int:
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + _frac_mul16(
        x2, -7651 + _frac_mul16(x2, 8277 + _frac_mul16(-626, x2)))
    return 1 + x2


def _frac_mul16(a: int, b: int) -> int:
    # FRAC_MUL16: (16384 + a*b) >> 15 with int16 wrap semantics
    v = (16384 + a * b) >> 15
    return v


def bitexact_log2tan(isin: int, icos: int) -> int:
    lc = icos.bit_length()
    ls = isin.bit_length()
    icos <<= 15 - lc
    isin <<= 15 - ls
    return ((ls - lc) * (1 << 11)
            + _frac_mul16(isin, _frac_mul16(isin, -2597) + 7932)
            - _frac_mul16(icos, _frac_mul16(icos, -2597) + 7932))


def haar1(x: np.ndarray, n0: int, stride: int) -> None:
    n0 >>= 1
    s = math.sqrt(0.5)
    for i in range(stride):
        idx0 = stride * 2 * np.arange(n0) + i
        idx1 = idx0 + stride
        t1 = s * x[idx0]
        t2 = s * x[idx1]
        x[idx0] = t1 + t2
        x[idx1] = t1 - t2


def deinterleave_hadamard(x: np.ndarray, n0: int, stride: int, hadamard: bool):
    n = n0 * stride
    src = x[:n].reshape(n0, stride)
    if hadamard:
        ordery = ORDERY_TABLE[stride]
        tmp = np.empty((stride, n0), dtype=x.dtype)
        for i in range(stride):
            tmp[ordery[i]] = src[:, i]
    else:
        tmp = src.T.copy()
    x[:n] = tmp.reshape(n)


def interleave_hadamard(x: np.ndarray, n0: int, stride: int, hadamard: bool):
    n = n0 * stride
    tmp = np.empty((n0, stride), dtype=x.dtype)
    src = x[:n].reshape(stride, n0)
    if hadamard:
        ordery = ORDERY_TABLE[stride]
        for i in range(stride):
            tmp[:, i] = src[ordery[i]]
    else:
        tmp[:, :] = src.T
    x[:n] = tmp.reshape(n)


def compute_qn(n: int, b: int, offset: int, pulse_cap: int, stereo: bool) -> int:
    n2 = 2 * n - 1
    if stereo and n == 2:
        n2 -= 1
    qb = (b + n2 * offset) // n2 if b + n2 * offset >= 0 else -((-(b + n2 * offset)) // n2)
    qb = min(b - pulse_cap - (4 << BITRES), qb)
    qb = min(8 << BITRES, qb)
    if qb < (1 << BITRES >> 1):
        qn = 1
    else:
        qn = EXP2_TABLE8[qb & 0x7] >> (14 - (qb >> BITRES))
        qn = ((qn + 1) >> 1) << 1
    assert qn <= 256
    return qn


def exp_rotation(x: np.ndarray, length: int, direction: int, stride: int,
                 k: int, spread: int) -> None:
    """(reference: celt/vq.c:104)"""
    SPREAD_FACTOR = (15, 10, 5)
    if 2 * k >= length or spread == SPREAD_NONE:
        return
    factor = SPREAD_FACTOR[spread - 1]
    gain = 1.0 * length / (length + factor * k)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))
    stride2 = 0
    if length >= 8 * stride:
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) < length:
            stride2 += 1
    length //= stride
    for i in range(stride):
        seg = x[i * length:(i + 1) * length]
        if direction < 0:
            if stride2:
                _exp_rotation1(seg, length, stride2, s, c)
            _exp_rotation1(seg, length, 1, c, s)
        else:
            _exp_rotation1(seg, length, 1, c, -s)
            if stride2:
                _exp_rotation1(seg, length, stride2, s, -c)


def _exp_rotation1(x: np.ndarray, length: int, stride: int, c: float, s: float):
    ms = -s
    for i in range(length - stride):
        x1 = x[i]
        x2 = x[i + stride]
        x[i + stride] = c * x2 + s * x1
        x[i] = c * x1 + ms * x2
    for i in range(length - 2 * stride - 1, -1, -1):
        x1 = x[i]
        x2 = x[i + stride]
        x[i + stride] = c * x2 + s * x1
        x[i] = c * x1 + ms * x2


def extract_collapse_mask(iy, n: int, b: int) -> int:
    if b <= 1:
        return 1
    n0 = n // b
    mask = 0
    for i in range(b):
        tmp = 0
        for j in range(n0):
            tmp |= 1 if iy[i * n0 + j] != 0 else 0
        mask |= tmp << i
    return mask


def normalise_residual(iy, x: np.ndarray, n: int, ryy: float, gain: float):
    g = gain / math.sqrt(ryy)
    for i in range(n):
        x[i] = iy[i] * g


def renormalise_vector(x: np.ndarray, n: int, gain: float) -> None:
    e = EPSILON + float(np.dot(x[:n], x[:n]))
    g = gain / math.sqrt(e)
    x[:n] *= g


def alg_unquant(x: np.ndarray, n: int, k: int, spread: int, b: int,
                dec, gain: float) -> int:
    """PVQ decode (reference: alg_unquant celt/vq.c:621)."""
    assert k > 0 and n > 1
    iy = decode_pulses(dec, n, k)
    ryy = float(sum(v * v for v in iy))
    normalise_residual(iy, x, n, ryy, gain)
    exp_rotation(x, n, -1, b, k, spread)
    return extract_collapse_mask(iy, n, b)


def alg_quant(x: np.ndarray, n: int, k: int, spread: int, b: int,
              enc, gain: float, resynth: bool) -> int:
    """PVQ encode (reference: alg_quant celt/vq.c:552)."""
    assert k > 0 and n > 1
    exp_rotation(x, n, 1, b, k, spread)
    iy, yy = op_pvq_search(x, k, n)
    mask = extract_collapse_mask(iy, n, b)
    encode_pulses(enc, iy, n, k)
    if resynth:
        normalise_residual(iy, x, n, yy, gain)
        exp_rotation(x, n, -1, b, k, spread)
    return mask


def op_pvq_search(x: np.ndarray, k: int, n: int):
    """Greedy L1-projection + argmax pulse search (reference: op_pvq_search_c
    celt/vq.c:205).  Float math only shapes the encoder's choice of iy, which
    is then entropy-coded exactly.  Also writes |x| back like the reference
    (callers re-synthesize over it)."""
    xa = np.abs(x[:n]).astype(np.float64)
    signs = np.where(x[:n] < 0, -1, 1).astype(np.int64)
    x[:n] = xa
    iy = np.zeros(n, dtype=np.int64)
    y = np.zeros(n, dtype=np.float64)   # carries 2*iy during the search
    xy = 0.0
    yy = 0.0
    pulses_left = k
    if k > (n >> 1):
        sum_ = float(xa.sum())
        if not (sum_ > EPSILON and sum_ < 64):
            xa[0] = 1.0
            xa[1:] = 0.0
            sum_ = 1.0
            x[:n] = xa
        rcp = (k + 0.8) / sum_
        iy = np.floor(rcp * xa).astype(np.int64)
        y = iy.astype(np.float64)
        yy = float(np.dot(y, y))
        xy = float(np.dot(xa, y))
        y *= 2.0
        pulses_left = k - int(iy.sum())
    if pulses_left > n + 3:
        tmp = float(pulses_left)
        yy += tmp * tmp + tmp * y[0]
        iy[0] += pulses_left
        pulses_left = 0
    for _ in range(pulses_left):
        yy += 1.0
        rxy = (xy + xa) ** 2
        ryy = yy + y
        # argmax rxy/ryy with first-index tie-break (strict > like reference)
        best = 0
        best_num = rxy[0]
        best_den = ryy[0]
        for j in range(1, n):
            if best_den * rxy[j] > ryy[j] * best_num:
                best_num = rxy[j]
                best_den = ryy[j]
                best = j
        xy += xa[best]
        yy += y[best]
        y[best] += 2.0
        iy[best] += 1
    iy *= signs
    return [int(v) for v in iy], float(np.dot(iy, iy))


def _cdiv(a: int, b: int) -> int:
    """C-style truncating integer division."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def celt_cos_norm2(x: float) -> float:
    """cos(pi/2 * x) polynomial approximation
    (reference: celt_cos_norm2 mathops.h:192)."""
    x -= 4 * math.floor(0.25 * (x + 1))
    sign = 1 - 2 * (x > 1)
    x -= 2 * (x > 1)
    x2 = x * x
    return sign * (9.999999403953552246093750000000e-01 + x2 * (
        -1.233698248863220214843750000000 + x2 * (
            2.536507546901702880859375000000e-01 + x2 * (
                -2.08106283098459243774414062500e-02 + x2 *
                8.581906440667808055877685546875e-04))))


def ec_dec_refine(dec, up: int, extra_bits: int, use_entropy: bool) -> int:
    """(reference: ec_dec_refine vq.c:538)"""
    large = dec.dec_bit_logp(3 if use_entropy else 1)
    if large:
        sign = dec.dec_bits(1)
        refine = dec.dec_bits(extra_bits - 1) + up // 2 + 1
        if sign:
            refine = -refine
    else:
        refine = dec.dec_bits(extra_bits) - up // 2
    return refine


def alg_unquant_ext(x: np.ndarray, n: int, k: int, spread: int, b: int,
                    dec, gain: float, ext_dec, extra_bits: int) -> int:
    """PVQ decode with QEXT resolution refinement: the main stream's pulse
    vector is scaled up by up=(2^extra_bits)-1 and per-coefficient
    corrections are read from the extension stream
    (reference: alg_unquant QEXT paths vq.c:623-694)."""
    assert k > 0 and n > 1
    iy = decode_pulses(dec, n, k)
    up = (1 << extra_bits) - 1
    if n == 2:
        refine = ext_dec.dec_uint(up) - (up - 1) // 2
        iy[0] *= up
        iy[1] *= up
        if iy[1] == 0:
            iy[1] = -refine if iy[0] > 0 else refine
            iy[0] += -refine if refine * iy[0] > 0 else refine
        elif iy[1] > 0:
            iy[0] += refine
            iy[1] -= refine * (1 if iy[0] > 0 else -1)
        else:
            iy[0] -= refine
            iy[1] -= refine * (1 if iy[0] > 0 else -1)
    else:
        use_entropy = (ext_dec.storage * 8 - ext_dec.tell()) >             (n - 1) * (extra_bits + 3) + 1
        refine = [ec_dec_refine(ext_dec, up, extra_bits, use_entropy)
                  for _ in range(n - 1)]
        if iy[n - 1] == 0:
            sign = ext_dec.dec_bits(1)
        else:
            sign = 1 if iy[n - 1] < 0 else 0
        for i in range(n - 1):
            iy[i] = iy[i] * up + refine[i]
        last = up * k - sum(abs(v) for v in iy[:n - 1])
        iy[n - 1] = -last if sign else last
    ryy = float(sum(v * v for v in iy))
    normalise_residual(iy, x, n, ryy, gain)
    exp_rotation(x, n, -1, b, k, spread)
    return extract_collapse_mask(iy, n, b)


def ec_enc_refine(enc, refine: int, up: int, extra_bits: int,
                  use_entropy: bool) -> None:
    """(reference: ec_enc_refine vq.c:524)"""
    large = abs(refine) > up // 2 and refine != up // 2 + 1
    enc.enc_bit_logp(1 if large else 0, 3 if use_entropy else 1)
    if large:
        enc.enc_bits(1 if refine < 0 else 0, 1)
        enc.enc_bits(abs(refine) - up // 2 - 1, extra_bits - 1)
    else:
        enc.enc_bits(refine + up // 2, extra_bits)


def _op_pvq_search_n2(x, k: int, up: int):
    """2-D search at base and up-scaled resolution (reference:
    op_pvq_search_N2 vq.c:379, float path).  Returns (iy, up_iy, refine,
    yy)."""
    ssum = abs(x[0]) + abs(x[1])
    if ssum < EPSILON:
        return [k, 0], [up * k, 0], 0, float(k) * k * up * up
    rcp = 1.0 / ssum
    iy0 = int(math.floor(0.5 + k * x[0] * rcp))
    up_iy0 = int(math.floor(0.5 + up * k * x[0] * rcp))
    up_iy0 = max(up * iy0 - (up - 1) // 2,
                 min(up * iy0 + (up - 1) // 2, up_iy0))
    offset = up_iy0 - up * iy0
    iy1 = k - abs(iy0)
    up_iy1 = up * k - abs(up_iy0)
    if x[1] < 0:
        iy1 = -iy1
        up_iy1 = -up_iy1
        offset = -offset
    yy = float(up_iy0) * up_iy0 + float(up_iy1) * up_iy1
    return [iy0, iy1], [up_iy0, up_iy1], offset, yy


def _op_pvq_refine(xn, iy, iy0, k: int, up: int, margin: int,
                   n: int) -> bool:
    """L1-projection rounding refinement (reference: op_pvq_refine
    vq.c:426, float path).  Returns True on failure."""
    rounding = [0.0] * n
    for i in range(n):
        tmp = k * xn[i]
        iy[i] = int(math.floor(0.5 + tmp))
        rounding[i] = tmp - iy[i]
    if iy is not iy0:
        for i in range(n):
            iy[i] = min(up * iy0[i] + up - 1, max(up * iy0[i] - up + 1,
                                                  iy[i]))
    iysum = sum(iy)
    if abs(iysum - k) > 32:
        return True
    direc = 1 if iysum < k else -1
    while iysum != k:
        roundval = -1000000.0 * direc
        roundpos = 0
        for i in range(n):
            if ((rounding[i] - roundval) * direc > 0
                    and abs(iy[i] - up * iy0[i]) < (margin - 1)
                    and not (direc == -1 and iy[i] == 0)):
                roundval = rounding[i]
                roundpos = i
        iy[roundpos] += direc
        rounding[roundpos] -= direc
        iysum += direc
    return False


def _op_pvq_search_extra(x, k: int, up: int, n: int):
    """General-N two-resolution search (reference: op_pvq_search_extra
    vq.c:469, float path).  Returns (iy, up_iy, refine, yy)."""
    ssum = float(np.sum(np.abs(x[:n])))
    xn = [0.0] * n
    failed = ssum < EPSILON
    if not failed:
        rcp = 1.0 / ssum
        for i in range(n):
            xn[i] = abs(x[i]) * rcp
    iy = [0] * n
    up_iy = [0] * n
    failed = failed or _op_pvq_refine(xn, iy, iy, k, 1, k + 1, n)
    failed = failed or _op_pvq_refine(xn, up_iy, iy, up * k, up, up, n)
    if failed:
        iy = [k] + [0] * (n - 1)
        up_iy = [up * k] + [0] * (n - 1)
    yy = 0.0
    refine = [0] * n
    for i in range(n):
        yy += float(up_iy[i]) * up_iy[i]
        if x[i] < 0:
            iy[i] = -iy[i]
            up_iy[i] = -up_iy[i]
        refine[i] = up_iy[i] - up * iy[i]
    return iy, up_iy, refine, yy


def alg_quant_ext(x, n, k, spread, b, enc, gain, resynth, ext_enc,
                  extra_bits) -> int:
    """PVQ encode with QEXT resolution refinement (reference: alg_quant
    vq.c:573-603): codes the base pulse vector in the main stream and
    per-coefficient corrections at up=(2^extra_bits)-1 resolution in the
    extension stream."""
    assert k > 0 and n > 1
    exp_rotation(x, n, 1, b, k, spread)
    up = (1 << extra_bits) - 1
    if n == 2:
        iy, up_iy, refine, yy = _op_pvq_search_n2(x, k, up)
        mask = extract_collapse_mask(up_iy, n, b)
        encode_pulses(enc, iy, n, k)
        ext_enc.enc_uint(refine + (up - 1) // 2, up)
    else:
        iy, up_iy, refine, yy = _op_pvq_search_extra(x, k, up, n)
        mask = extract_collapse_mask(up_iy, n, b)
        encode_pulses(enc, iy, n, k)
        use_entropy = (ext_enc.storage * 8 - ext_enc.tell()) > \
            (n - 1) * (extra_bits + 3) + 1
        for i in range(n - 1):
            ec_enc_refine(ext_enc, refine[i], up, extra_bits, use_entropy)
        if iy[n - 1] == 0:
            ext_enc.enc_bits(1 if up_iy[n - 1] < 0 else 0, 1)
    if resynth:
        normalise_residual(up_iy, x, n, yy, gain)
        exp_rotation(x, n, -1, b, k, spread)
    return mask


def cubic_synthesis(x: np.ndarray, iy, n: int, k: int, face: int, sign: int,
                    gain: float) -> None:
    """(reference: cubic_synthesis vq.c:745, float path)"""
    for i in range(n):
        x[i] = float((1 + 2 * iy[i]) - k)
    x[face] = -k if sign else k
    ssum = float(np.dot(x[:n], x[:n]))
    mag = 1.0 / math.sqrt(ssum)
    x[:n] *= mag * gain


def cubic_unquant(x: np.ndarray, n: int, res: int, b: int, dec,
                  gain: float) -> int:
    """Cube-surface VQ decode used for the QEXT bands
    (reference: cubic_unquant vq.c:844)."""
    k = 1 << res
    if b != 1:
        k = max(1, k - 1)
    if k == 1:
        x[:n] = 0.0
        return 0
    face = dec.dec_uint(n)
    sign = dec.dec_bits(1)
    iy = [0] * n
    for i in range(n):
        if i != face:
            iy[i] = dec.dec_bits(res)
    iy[face] = 0
    cubic_synthesis(x, iy, n, k, face, sign, gain)
    return (1 << b) - 1


def cubic_quant(x: np.ndarray, n: int, res: int, b: int, enc, gain: float,
                resynth: bool) -> int:
    """Cube-surface VQ encode (reference: cubic_quant vq.c:788, float)."""
    k = 1 << res
    if b != 1:
        k = max(1, k - 1)
    if k == 1:
        if resynth:
            x[:n] = 0.0
        return 0
    face = 0
    faceval = -1.0
    for i in range(n):
        if abs(x[i]) > faceval:
            faceval = abs(x[i])
            face = i
    sign = 1 if x[face] < 0 else 0
    enc.enc_uint(face, n)
    enc.enc_bits(sign, 1)
    norm = 0.5 * k / (faceval + EPSILON)
    iy = [min(k - 1, int(math.floor((x[i] + faceval) * norm)))
          for i in range(n)]
    for i in range(n):
        if i != face:
            enc.enc_bits(iy[i], res)
    if resynth:
        cubic_synthesis(x, iy, n, k, face, sign, gain)
    return (1 << b) - 1


def stereo_split(x: np.ndarray, y: np.ndarray, n: int) -> None:
    s = math.sqrt(0.5)
    l = s * x[:n]
    r = s * y[:n]
    x[:n] = l + r
    y[:n] = r - l


def stereo_merge(x: np.ndarray, y: np.ndarray, mid: float, n: int) -> None:
    xp = float(np.dot(y[:n], x[:n]))
    side = float(np.dot(y[:n], y[:n]))
    xp = mid * xp
    el = mid * mid + side - 2 * xp
    er = mid * mid + side + 2 * xp
    if er < 6e-4 or el < 6e-4:
        y[:n] = x[:n]
        return
    lgain = 1.0 / math.sqrt(el)
    rgain = 1.0 / math.sqrt(er)
    for j in range(n):
        l = mid * x[j]
        r = y[j]
        x[j] = lgain * (l - r)
        y[j] = rgain * (l + r)


def intensity_stereo(mode: CeltMode, x: np.ndarray, y: np.ndarray,
                     bandE, band_id: int, n: int) -> None:
    left = bandE[band_id]
    right = bandE[band_id + mode.nbEBands]
    norm = EPSILON + math.sqrt(EPSILON + left * left + right * right)
    a1 = left / norm
    a2 = right / norm
    x[:n] = a1 * x[:n] + a2 * y[:n]


class BandCtx:
    __slots__ = ("encode", "resynth", "m", "i", "intensity", "spread",
                 "tf_change", "ec", "remaining_bits", "bandE", "seed",
                 "theta_round", "disable_inv", "avoid_split_noise",
                 "ext_ec", "ext_total_bits", "extra_bands")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class SplitCtx:
    __slots__ = ("inv", "imid", "iside", "delta", "itheta", "qalloc",
                 "itheta_q30")


def compute_theta(ctx: BandCtx, sctx: SplitCtx, x, y, n, b, bb, b0, lm,
                  stereo, fill, ext_b=0):
    """Returns (b, fill, ext_b) updated (reference: compute_theta
    bands.c:700; QEXT theta refinement bands.c:842-864)."""
    itheta = 0
    itheta_q30 = 0
    inv = 0
    encode = ctx.encode
    m = ctx.m
    i = ctx.i
    ec = ctx.ec

    pulse_cap = m.logN[i] + lm * (1 << BITRES)
    offset = (pulse_cap >> 1) - (QTHETA_OFFSET_TWOPHASE if stereo and n == 2
                                 else QTHETA_OFFSET)
    qn = compute_qn(n, b, offset, pulse_cap, stereo)
    if stereo and i >= ctx.intensity:
        qn = 1
    if encode:
        itheta = stereo_itheta(x, y, stereo, n)
    tell = ec.tell_frac()
    if qn != 1:
        if encode:
            if not stereo or ctx.theta_round == 0:
                itheta = (itheta * qn + 8192) >> 14
                if (not stereo and ctx.avoid_split_noise
                        and 0 < itheta < qn):
                    unquantized = (itheta * 16384) // qn
                    imid = bitexact_cos(unquantized)
                    iside = bitexact_cos(16384 - unquantized)
                    delta = _frac_mul16((n - 1) << 7,
                                        bitexact_log2tan(iside, imid))
                    if delta > b:
                        itheta = qn
                    elif delta < -b:
                        itheta = 0
            else:
                bias = 32767 // qn if itheta > 8192 else -32767 // qn
                down = min(qn - 1, max(0, (itheta * qn + bias) >> 14))
                itheta = down if ctx.theta_round < 0 else down + 1
        # entropy-code the angle
        if stereo and n > 2:
            p0 = 3
            x0 = qn // 2
            ft = p0 * (x0 + 1) + x0
            if encode:
                xq = itheta
                fl = p0 * xq if xq <= x0 else (xq - 1 - x0) + (x0 + 1) * p0
                fh = p0 * (xq + 1) if xq <= x0 else (xq - x0) + (x0 + 1) * p0
                ec.encode(fl, fh, ft)
            else:
                fs = ec.decode(ft)
                if fs < (x0 + 1) * p0:
                    xq = fs // p0
                else:
                    xq = x0 + 1 + (fs - (x0 + 1) * p0)
                fl = p0 * xq if xq <= x0 else (xq - 1 - x0) + (x0 + 1) * p0
                fh = p0 * (xq + 1) if xq <= x0 else (xq - x0) + (x0 + 1) * p0
                ec.update(fl, fh, ft)
                itheta = xq
        elif b0 > 1 or stereo:
            if encode:
                ec.enc_uint(itheta, qn + 1)
            else:
                itheta = ec.dec_uint(qn + 1)
        else:
            # triangular pdf
            ft = ((qn >> 1) + 1) * ((qn >> 1) + 1)
            if encode:
                if itheta <= (qn >> 1):
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                ec.encode(fl, fl + fs, ft)
            else:
                fm = ec.decode(ft)
                if fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1):
                    itheta = (math.isqrt(8 * fm + 1) - 1) >> 1
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    itheta = (2 * (qn + 1) - math.isqrt(8 * (ft - fm - 1) + 1)) >> 1
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                ec.update(fl, fl + fs, ft)
        assert itheta >= 0
        itheta = itheta * 16384 // qn
        if ctx.ext_ec is not None:
            # QEXT: refine the angle with extra precision from the
            # extension stream (reference: bands.c:842-864)
            ext_b = min(ext_b, ctx.ext_total_bits - ctx.ext_ec.tell_frac())
            if (ext_b >= 2 * n << BITRES
                    and ctx.ext_total_bits - ctx.ext_ec.tell_frac() - 1
                    > 2 << BITRES):
                ext_tell = ctx.ext_ec.tell_frac()
                extra_bits = min(14, max(2, _sudiv(ext_b,
                                                   (2 * n - 1) << BITRES)))
                if encode:
                    q30 = stereo_itheta_q30(x, y, stereo, n) - (itheta << 16)
                    q30 = (q30 * qn * ((1 << extra_bits) - 1)
                           + (1 << 29)) >> 30
                    q30 += (1 << (extra_bits - 1)) - 1
                    q30 = max(0, min((1 << extra_bits) - 2, q30))
                    ctx.ext_ec.enc_uint(q30, (1 << extra_bits) - 1)
                    itheta_q30 = q30
                else:
                    itheta_q30 = ctx.ext_ec.dec_uint((1 << extra_bits) - 1)
                itheta_q30 -= (1 << (extra_bits - 1)) - 1
                itheta_q30 = (itheta << 16) + _cdiv(
                    itheta_q30 * (1 << 30), qn * ((1 << extra_bits) - 1))
                itheta_q30 = max(0, min(itheta_q30, 1 << 30))
                ext_b -= ctx.ext_ec.tell_frac() - ext_tell
            else:
                itheta_q30 = itheta << 16
        else:
            itheta_q30 = itheta << 16
        if encode and stereo:
            if itheta == 0:
                intensity_stereo(m, x, y, ctx.bandE, i, n)
            else:
                stereo_split(x, y, n)
    elif stereo:
        if encode:
            inv = 1 if (itheta > 8192 and not ctx.disable_inv) else 0
            if inv:
                y[:n] = -y[:n]
            intensity_stereo(m, x, y, ctx.bandE, i, n)
        if b > 2 << BITRES and ctx.remaining_bits > 2 << BITRES:
            if encode:
                ec.enc_bit_logp(inv, 2)
            else:
                inv = ec.dec_bit_logp(2)
        else:
            inv = 0
        if ctx.disable_inv:
            inv = 0
        itheta = 0
        itheta_q30 = 0
    qalloc = ec.tell_frac() - tell
    b -= qalloc

    if itheta == 0:
        imid = 32767
        iside = 0
        fill &= (1 << bb) - 1
        delta = -16384
    elif itheta == 16384:
        imid = 0
        iside = 32767
        fill &= ((1 << bb) - 1) << bb
        delta = 16384
    else:
        imid = bitexact_cos(itheta)
        iside = bitexact_cos(16384 - itheta)
        delta = _frac_mul16((n - 1) << 7, bitexact_log2tan(iside, imid))

    sctx.inv = inv
    sctx.imid = imid
    sctx.iside = iside
    sctx.delta = delta
    sctx.itheta = itheta
    sctx.itheta_q30 = itheta_q30
    sctx.qalloc = qalloc
    return b, fill, ext_b


def stereo_itheta(x, y, stereo, n) -> int:
    """Q14 angle between mid and side (reference: vq.c:724).

    Float-domain atan2 like the reference float build."""
    emid = eside = EPSILON
    if stereo:
        for j in range(n):
            m = x[j] + y[j]
            s = x[j] - y[j]
            emid += m * m
            eside += s * s
    else:
        emid += float(np.dot(x[:n], x[:n]))
        eside += float(np.dot(y[:n], y[:n]))
    mid = math.sqrt(emid)
    side = math.sqrt(eside)
    return int(math.floor(0.5 + 16384 * 0.63662 * math.atan2(side, mid)))


def stereo_itheta_q30(x, y, stereo, n) -> int:
    """Q30 angle (reference: stereo_itheta vq.c:724, float build)."""
    emid = eside = EPSILON
    if stereo:
        for j in range(n):
            m = x[j] + y[j]
            s = x[j] - y[j]
            emid += m * m
            eside += s * s
    else:
        emid += float(np.dot(x[:n], x[:n]))
        eside += float(np.dot(y[:n], y[:n]))
    return int(math.floor(0.5 + 65536.0 * 16384 * (2 / math.pi)
                          * math.atan2(math.sqrt(eside), math.sqrt(emid))))


def quant_band_n1(ctx: BandCtx, x, y, lowband_out) -> int:
    ec = ctx.ec
    vectors = [x] if y is None else [x, y]
    for v in vectors:
        sign = 0
        if ctx.remaining_bits >= 1 << BITRES:
            if ctx.encode:
                sign = 1 if v[0] < 0 else 0
                ec.enc_bits(sign, 1)
            else:
                sign = ec.dec_bits(1)
            ctx.remaining_bits -= 1 << BITRES
        if ctx.resynth:
            v[0] = -NORM_SCALING if sign else NORM_SCALING
    if lowband_out is not None:
        lowband_out[0] = x[0]
    return 1


def quant_partition(ctx: BandCtx, x, n, b, bb, lowband, lm, gain, fill,
                    ext_b=0) -> int:
    """(reference: quant_partition bands.c:973; QEXT refinement paths
    bands.c:1082-1135)"""
    m = ctx.m
    i = ctx.i
    encode = ctx.encode
    ec = ctx.ec
    b0 = bb
    cm = 0

    cache_off = int(m.cache.index[(lm + 1) * m.nbEBands + i])
    cache = m.cache.bits
    if lm != -1 and b > int(cache[cache_off + int(cache[cache_off])]) + 12 and n > 2:
        n >>= 1
        y = x[n:]
        lm -= 1
        if bb == 1:
            fill = (fill & 1) | (fill << 1)
        bb = (bb + 1) >> 1
        sctx = SplitCtx()
        b, fill, ext_b = compute_theta(ctx, sctx, x, y, n, b, bb, b0, lm, 0,
                                       fill, ext_b)
        imid = sctx.imid
        iside = sctx.iside
        delta = sctx.delta
        itheta = sctx.itheta
        qalloc = sctx.qalloc
        if ctx.ext_ec is not None:
            # QEXT builds derive the gains from the (possibly refined)
            # Q30 angle (reference: bands.c:1037-1038)
            mid = celt_cos_norm2(sctx.itheta_q30 * (1.0 / (1 << 30)))
            side = celt_cos_norm2(1.0 - sctx.itheta_q30 * (1.0 / (1 << 30)))
        else:
            mid = imid / 32768.0
            side = iside / 32768.0

        if b0 > 1 and (itheta & 0x3fff):
            if itheta > 8192:
                delta -= delta >> (4 - lm)
            else:
                delta = min(0, delta + (n << BITRES >> (5 - lm)))
        mbits = max(0, min(b, (b - delta) // 2))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc

        next_lowband2 = lowband[n:] if lowband is not None else None

        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = quant_partition(ctx, x, n, mbits, bb, lowband, lm,
                                 gain * mid, fill, ext_b // 2)
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= quant_partition(ctx, y, n, sbits, bb, next_lowband2, lm,
                                  gain * side, fill >> bb,
                                  ext_b // 2) << (b0 >> 1)
        else:
            cm = quant_partition(ctx, y, n, sbits, bb, next_lowband2, lm,
                                 gain * side, fill >> bb,
                                 ext_b // 2) << (b0 >> 1)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= quant_partition(ctx, x, n, mbits, bb, lowband, lm,
                                  gain * mid, fill, ext_b // 2)
    else:
        # basic no-split case
        extra_bits = 0
        if ctx.ext_ec is not None:
            # extra per-coefficient resolution from the extension stream
            # (reference: bands.c:1085-1093)
            extra_bits = _sudiv(ext_b, n - 1) >> BITRES
            ext_rem = ctx.ext_total_bits - ctx.ext_ec.tell_frac()
            if ext_rem < ((extra_bits + 1) * (n - 1) + n) << BITRES:
                extra_bits = max(
                    (_sudiv(ext_rem - (n << BITRES), n - 1) >> BITRES) - 1, 0)
            extra_bits = min(14, extra_bits)
        q = bits2pulses(m, i, lm, b)
        curr_bits = pulses2bits(m, i, lm, q)
        ctx.remaining_bits -= curr_bits
        while ctx.remaining_bits < 0 and q > 0:
            ctx.remaining_bits += curr_bits
            q -= 1
            curr_bits = pulses2bits(m, i, lm, q)
            ctx.remaining_bits -= curr_bits
        if q != 0:
            k = get_pulses(q)
            if encode:
                if extra_bits >= 2:
                    cm = alg_quant_ext(x, n, k, ctx.spread, bb, ec, gain,
                                       ctx.resynth, ctx.ext_ec, extra_bits)
                else:
                    cm = alg_quant(x, n, k, ctx.spread, bb, ec, gain,
                                   ctx.resynth)
            else:
                if extra_bits >= 2:
                    cm = alg_unquant_ext(x, n, k, ctx.spread, bb, ec, gain,
                                         ctx.ext_ec, extra_bits)
                else:
                    cm = alg_unquant(x, n, k, ctx.spread, bb, ec, gain)
        elif ctx.ext_ec is not None and ext_b > 2 * n << BITRES:
            # no main-stream pulses but enough extension bits: cube VQ
            # (reference: bands.c:1122-1132)
            extra_bits = _sudiv(ext_b, n - 1) >> BITRES
            ext_rem = ctx.ext_total_bits - ctx.ext_ec.tell_frac()
            if ext_rem < ((extra_bits + 1) * (n - 1) + n) << BITRES:
                extra_bits = max(
                    (_sudiv(ext_rem - (n << BITRES), n - 1) >> BITRES) - 1, 0)
            extra_bits = min(14, extra_bits)
            if encode:
                cm = cubic_quant(x, n, extra_bits, bb, ctx.ext_ec, gain,
                                 ctx.resynth)
            else:
                cm = cubic_unquant(x, n, extra_bits, bb, ctx.ext_ec, gain)
        else:
            if ctx.resynth:
                cm_mask = (1 << bb) - 1
                fill &= cm_mask
                if not fill:
                    x[:n] = 0
                else:
                    if lowband is None:
                        # noise
                        for j in range(n):
                            ctx.seed = celt_lcg_rand(ctx.seed)
                            signed = ctx.seed - 0x100000000 if ctx.seed & 0x80000000 else ctx.seed
                            x[j] = float(signed >> 20)
                        cm = cm_mask
                    else:
                        for j in range(n):
                            ctx.seed = celt_lcg_rand(ctx.seed)
                            tmp = 1.0 / 256
                            tmp = tmp if (ctx.seed & 0x8000) else -tmp
                            x[j] = lowband[j] + tmp
                        cm = fill
                    renormalise_vector(x, n, gain)
    return cm


def cubic_quant_partition(ctx: BandCtx, x, n, b, bb, ec, lm, gain,
                          resynth, encode) -> int:
    """Recursive cube VQ over a QEXT band (reference:
    cubic_quant_partition bands.c:1180)."""
    assert lm >= 0
    ctx.remaining_bits = ctx.ec.storage * 8 * 8 - ctx.ec.tell_frac()
    b = min(b, ctx.remaining_bits)
    if lm == 0 or b <= 2 * n << BITRES:
        b = min(b + ((n - 1) << BITRES) // 2, ctx.remaining_bits)
        res = _sudiv(b - (1 << BITRES) - ctx.m.logN[ctx.i]
                     - (lm << BITRES) - 1, n - 1) >> BITRES
        res = min(14, max(0, res))
        if encode:
            ret = cubic_quant(x, n, res, bb, ec, gain, resynth)
        else:
            ret = cubic_unquant(x, n, res, bb, ec, gain)
        ctx.remaining_bits = ctx.ec.storage * 8 * 8 - ctx.ec.tell_frac()
        return ret
    n0 = n
    n >>= 1
    y = x[n:]
    lm -= 1
    bb = (bb + 1) >> 1
    theta_res = min(16, (b >> BITRES) // (n0 - 1) + 1)
    if encode:
        q30 = stereo_itheta_q30(x, y, 0, n)
        qtheta = (q30 + (1 << (29 - theta_res))) >> (30 - theta_res)
        ec.enc_uint(qtheta, (1 << theta_res) + 1)
    else:
        qtheta = ec.dec_uint((1 << theta_res) + 1)
    itheta_q30 = qtheta << (30 - theta_res)
    b -= theta_res << BITRES
    delta = (n0 - 1) * 23 * ((itheta_q30 >> 16) - 8192) >> (17 - BITRES)
    g1 = celt_cos_norm2(itheta_q30 * (1.0 / (1 << 30)))
    g2 = celt_cos_norm2(1.0 - itheta_q30 * (1.0 / (1 << 30)))
    if itheta_q30 == 0:
        b1, b2 = b, 0
    elif itheta_q30 == 1 << 30:
        b1, b2 = 0, b
    else:
        b1 = min(b, max(0, (b - delta) // 2))
        b2 = b - b1
    cm = cubic_quant_partition(ctx, x, n, b1, bb, ec, lm, gain * g1,
                               resynth, encode)
    cm |= cubic_quant_partition(ctx, y, n, b2, bb, ec, lm, gain * g2,
                                resynth, encode)
    return cm


def quant_band(ctx: BandCtx, x, n, b, bb, lowband, lm, lowband_out, gain,
               lowband_scratch, fill, ext_b=0) -> int:
    """Mono band (reference: quant_band bands.c:1245)."""
    n0 = n
    n_b = n
    b0 = bb
    time_divide = 0
    recombine = 0
    encode = ctx.encode
    tf_change = ctx.tf_change
    long_blocks = b0 == 1
    n_b //= bb

    if n == 1:
        return quant_band_n1(ctx, x, None, lowband_out)

    if tf_change > 0:
        recombine = tf_change

    if (lowband_scratch is not None and lowband is not None
            and (recombine or ((n_b & 1) == 0 and tf_change < 0) or b0 > 1)):
        lowband_scratch[:n] = lowband[:n]
        lowband = lowband_scratch

    for k in range(recombine):
        if encode:
            haar1(x, n >> k, 1 << k)
        if lowband is not None:
            haar1(lowband, n >> k, 1 << k)
        fill = (BIT_INTERLEAVE_TABLE[fill & 0xF]
                | BIT_INTERLEAVE_TABLE[fill >> 4] << 2)
    bb >>= recombine
    n_b <<= recombine

    while (n_b & 1) == 0 and tf_change < 0:
        if encode:
            haar1(x, n_b, bb)
        if lowband is not None:
            haar1(lowband, n_b, bb)
        fill |= fill << bb
        bb <<= 1
        n_b >>= 1
        time_divide += 1
        tf_change += 1
    b0 = bb
    n_b0 = n_b

    if b0 > 1:
        if encode:
            deinterleave_hadamard(x, n_b >> recombine, b0 << recombine,
                                  long_blocks)
        if lowband is not None:
            deinterleave_hadamard(lowband, n_b >> recombine,
                                  b0 << recombine, long_blocks)

    if ctx.extra_bands and b > (3 * n << BITRES) + (ctx.m.logN[ctx.i]
                                                    + 8 + 8 * lm):
        # QEXT band: entire content cube-coded (reference: bands.c:1328-1331)
        cm = cubic_quant_partition(ctx, x, n, b, bb, ctx.ec, lm, gain,
                                   ctx.resynth, encode)
    else:
        cm = quant_partition(ctx, x, n, b, bb, lowband, lm, gain, fill,
                             ext_b)

    if ctx.resynth:
        if b0 > 1:
            interleave_hadamard(x, n_b >> recombine, b0 << recombine,
                                long_blocks)
        n_b = n_b0
        bb = b0
        for _ in range(time_divide):
            bb >>= 1
            n_b <<= 1
            cm |= cm >> bb
            haar1(x, n_b, bb)
        for k in range(recombine):
            cm = BIT_DEINTERLEAVE_TABLE[cm]
            haar1(x, n0 >> k, 1 << k)
        bb <<= recombine

        if lowband_out is not None:
            nrm = math.sqrt(n0)
            lowband_out[:n0] = nrm * x[:n0]
        cm &= (1 << bb) - 1
    return cm


MIN_STEREO_ENERGY = 1e-10


def quant_band_stereo(ctx: BandCtx, x, y, n, b, bb, lowband, lm, lowband_out,
                      lowband_scratch, fill, ext_b=0, cap=None) -> int:
    """Stereo band (reference: quant_band_stereo bands.c:1387; QEXT
    mid/side extra-bit reallocation bands.c:1516-1554)."""
    encode = ctx.encode
    ec = ctx.ec
    if n == 1:
        return quant_band_n1(ctx, x, y, lowband_out)

    orig_fill = fill
    if encode:
        if (ctx.bandE[ctx.i] < MIN_STEREO_ENERGY
                or ctx.bandE[ctx.m.nbEBands + ctx.i] < MIN_STEREO_ENERGY):
            if ctx.bandE[ctx.i] > ctx.bandE[ctx.m.nbEBands + ctx.i]:
                y[:n] = x[:n]
            else:
                x[:n] = y[:n]

    sctx = SplitCtx()
    b, fill, ext_b = compute_theta(ctx, sctx, x, y, n, b, bb, bb, lm, 1,
                                   fill, ext_b)
    inv = sctx.inv
    imid = sctx.imid
    iside = sctx.iside
    delta = sctx.delta
    itheta = sctx.itheta
    qalloc = sctx.qalloc
    if ctx.ext_ec is not None:
        mid = celt_cos_norm2(sctx.itheta_q30 * (1.0 / (1 << 30)))
        side = celt_cos_norm2(1.0 - sctx.itheta_q30 * (1.0 / (1 << 30)))
    else:
        mid = imid / 32768.0
        side = iside / 32768.0

    if n == 2:
        mbits = b
        sbits = 0
        if itheta != 0 and itheta != 16384:
            sbits = 1 << BITRES
        mbits -= sbits
        c = 1 if itheta > 8192 else 0
        ctx.remaining_bits -= qalloc + sbits
        x2 = y if c else x
        y2 = x if c else y
        sign = 0
        if sbits:
            if encode:
                sign = 1 if (x2[0] * y2[1] - x2[1] * y2[0]) < 0 else 0
                ec.enc_bits(sign, 1)
            else:
                sign = ec.dec_bits(1)
        sign = 1 - 2 * sign
        cm = quant_band(ctx, x2, n, mbits, bb, lowband, lm, lowband_out, 1.0,
                        lowband_scratch, orig_fill, ext_b)
        y2[0] = -sign * x2[1]
        y2[1] = sign * x2[0]
        if ctx.resynth:
            x[0] *= mid
            x[1] *= mid
            y[0] *= side
            y[1] *= side
            tmp = x[0]
            x[0] = tmp - y[0]
            y[0] = tmp + y[0]
            tmp = x[1]
            x[1] = tmp - y[1]
            y[1] = tmp + y[1]
    else:
        mbits = max(0, min(b, (b - delta) // 2))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc
        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            qext_extra = 0
            if cap is not None and ext_b != 0:
                # reallocate unusable mid bits to mid refinement
                # (reference: bands.c:1516-1519)
                qext_extra = max(0, min(ext_b // 2, mbits - cap[ctx.i] // 2))
            cm = quant_band(ctx, x, n, mbits, bb, lowband, lm, lowband_out,
                            1.0, lowband_scratch, fill,
                            ext_b // 2 + qext_extra)
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            if ctx.extra_bands:
                sbits = min(sbits, ctx.remaining_bits)
            cm |= quant_band(ctx, y, n, sbits, bb, None, lm, None, side,
                             None, fill >> bb, ext_b // 2 - qext_extra)
        else:
            qext_extra = 0
            if cap is not None and ext_b != 0:
                # reallocate unusable side bits (reference: bands.c:1536-1539)
                qext_extra = max(0, min(ext_b // 2, sbits - cap[ctx.i] // 2))
            cm = quant_band(ctx, y, n, sbits, bb, None, lm, None, side,
                            None, fill >> bb, ext_b // 2 + qext_extra)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            if ctx.extra_bands:
                mbits = min(mbits, ctx.remaining_bits)
            cm |= quant_band(ctx, x, n, mbits, bb, lowband, lm, lowband_out,
                             1.0, lowband_scratch, fill,
                             ext_b // 2 - qext_extra)

    if ctx.resynth:
        if n != 2:
            stereo_merge(x, y, mid, n)
        if inv:
            y[:n] = -y[:n]
    return cm


def special_hybrid_folding(m: CeltMode, norm, norm2, start, M, dual_stereo):
    eb = m.eBands
    n1 = M * (eb[start + 1] - eb[start])
    n2 = M * (eb[start + 2] - eb[start + 1])
    norm[n1:n2] = norm[2 * n1 - n2:n1]
    if dual_stereo:
        norm2[n1:n2] = norm2[2 * n1 - n2:n1]


def quant_all_bands(encode, m: CeltMode, start, end, x_, y_, collapse_masks,
                    bandE, pulses, shortBlocks, spread, dual_stereo,
                    intensity, tf_res, total_bits, balance, ec, lm,
                    coded_bands, seed, complexity=0, disable_inv=0,
                    ext_ec=None, extra_pulses=None, ext_total_bits=0,
                    cap=None):
    """(reference: quant_all_bands bands.c:1589).  Returns new seed.

    x_/y_: [M*eBands[nbEBands]] norm arrays (per channel), modified in place.
    QEXT: ext_ec is the extension-payload range coder, extra_pulses the
    per-band refinement allocation, cap the main allocation caps; when
    cap is None and ext_ec is set, the call codes the extension bands
    themselves (ctx.extra_bands; reference bands.c:1673-1676).
    """
    eBands = m.eBands
    M = 1 << lm
    B = M if shortBlocks else 1
    norm_offset = M * eBands[start]
    c = 2 if y_ is not None else 1
    norm_total = M * eBands[m.nbEBands - 1] - norm_offset
    _norm = np.zeros(c * norm_total, dtype=x_.dtype)
    norm = _norm[:norm_total]
    norm2 = _norm[norm_total:] if c == 2 else None

    resynth = not encode
    lowband_scratch = x_[M * eBands[m.effEBands - 1]:]

    lowband_offset = 0
    update_lowband = True
    ctx = BandCtx(encode=encode, resynth=resynth, m=m, i=0,
                  intensity=intensity, spread=spread, tf_change=0, ec=ec,
                  remaining_bits=0, bandE=bandE, seed=seed, theta_round=0,
                  disable_inv=disable_inv, avoid_split_noise=B > 1,
                  ext_ec=ext_ec, ext_total_bits=ext_total_bits,
                  extra_bands=(ext_ec is not None and cap is None))
    ext_balance = 0
    ext_tell = 0
    ext_b = 0

    for i in range(start, end):
        ctx.i = i
        last = i == end - 1
        x = x_[M * eBands[i]:]
        y = y_[M * eBands[i]:] if y_ is not None else None
        n = M * eBands[i + 1] - M * eBands[i]
        tell = ec.tell_frac()

        if i != start:
            balance -= tell
        remaining_bits = total_bits - tell - 1
        ctx.remaining_bits = remaining_bits
        if ext_ec is not None:
            # running balance of unspent extension bits (bands.c:1713-1727)
            if i != start:
                ext_balance += extra_pulses[i - 1] + ext_tell
            ext_tell = ext_ec.tell_frac()
            if i != start:
                ext_balance -= ext_tell
            if i <= coded_bands - 1:
                ext_curr_balance = _sudiv(ext_balance,
                                          min(3, coded_bands - i))
                ext_b = max(0, min(16383, min(
                    ext_total_bits - ext_tell,
                    extra_pulses[i] + ext_curr_balance)))
            else:
                ext_b = 0
        if i <= coded_bands - 1:
            curr_balance = _sudiv(balance, min(3, coded_bands - i))
            b = max(0, min(16383, min(remaining_bits + 1,
                                      pulses[i] + curr_balance)))
        else:
            b = 0

        if (resynth and (M * eBands[i] - n >= M * eBands[start]
                         or i == start + 1)
                and (update_lowband or lowband_offset == 0)):
            lowband_offset = i
        if i == start + 1:
            special_hybrid_folding(m, norm, norm2, start, M, dual_stereo)

        tf_change = tf_res[i]
        ctx.tf_change = tf_change
        this_scratch = lowband_scratch
        if i >= m.effEBands:
            x = norm
            if y_ is not None:
                y = norm2
            this_scratch = None
        if last:
            this_scratch = None

        if lowband_offset != 0 and (spread != SPREAD_AGGRESSIVE or B > 1
                                    or tf_change < 0):
            effective_lowband = max(0, M * eBands[lowband_offset]
                                    - norm_offset - n)
            fold_start = lowband_offset
            while True:
                fold_start -= 1
                if M * eBands[fold_start] <= effective_lowband + norm_offset:
                    break
            fold_end = lowband_offset - 1
            while True:
                fold_end += 1
                if not (fold_end < i
                        and M * eBands[fold_end] < effective_lowband
                        + norm_offset + n):
                    break
            x_cm = y_cm = 0
            fold_i = fold_start
            while True:
                x_cm |= collapse_masks[fold_i * c + 0]
                y_cm |= collapse_masks[fold_i * c + c - 1]
                fold_i += 1
                if fold_i >= fold_end:
                    break
        else:
            effective_lowband = -1
            x_cm = y_cm = (1 << B) - 1

        if dual_stereo and i == intensity:
            dual_stereo = 0
            if resynth:
                for j in range(M * eBands[i] - norm_offset):
                    norm[j] = 0.5 * (norm[j] + norm2[j])

        lowband = norm[effective_lowband:] if effective_lowband != -1 else None
        lowband2 = norm2[effective_lowband:] if (effective_lowband != -1
                                                 and norm2 is not None) else None
        lowband_out = (None if last else
                       norm[M * eBands[i] - norm_offset:])
        lowband_out2 = (None if last or norm2 is None else
                        norm2[M * eBands[i] - norm_offset:])

        if dual_stereo:
            x_cm = quant_band(ctx, x, n, b // 2, B, lowband, lm, lowband_out,
                              1.0, this_scratch, x_cm, ext_b // 2)
            y_cm = quant_band(ctx, y, n, b // 2, B, lowband2, lm,
                              lowband_out2, 1.0, this_scratch, y_cm,
                              ext_b // 2)
        else:
            if y is not None:
                ctx.theta_round = 0
                x_cm = quant_band_stereo(ctx, x, y, n, b, B, lowband, lm,
                                         lowband_out, this_scratch,
                                         x_cm | y_cm, ext_b, cap)
            else:
                x_cm = quant_band(ctx, x, n, b, B, lowband, lm, lowband_out,
                                  1.0, this_scratch, x_cm | y_cm, ext_b)
            y_cm = x_cm
        collapse_masks[i * c + 0] = x_cm & 0xFF
        collapse_masks[i * c + c - 1] = y_cm & 0xFF
        balance += pulses[i] + tell
        update_lowband = b > (n << BITRES)
        ctx.avoid_split_noise = False

    return ctx.seed


def _sudiv(n: int, d: int) -> int:
    """C-style truncating division."""
    q = abs(n) // d
    return -q if n < 0 else q


def anti_collapse(m: CeltMode, x_, collapse_masks, lm, c, size, start, end,
                  logE, prev1logE, prev2logE, pulses, seed, encode=False):
    """(reference: anti_collapse bands.c:259)"""
    for i in range(start, end):
        n0 = m.eBands[i + 1] - m.eBands[i]
        depth = ((1 + pulses[i]) // n0) >> lm
        thresh = 0.5 * math.exp2(-0.125 * depth)
        sqrt_1 = 1.0 / math.sqrt(n0 << lm)
        for ch in range(c):
            prev1 = prev1logE[ch * m.nbEBands + i]
            prev2 = prev2logE[ch * m.nbEBands + i]
            if not encode and c == 1:
                prev1 = max(prev1, prev1logE[m.nbEBands + i])
                prev2 = max(prev2, prev2logE[m.nbEBands + i])
            ediff = logE[ch * m.nbEBands + i] - min(prev1, prev2)
            ediff = max(0.0, ediff)
            r = 2.0 * math.exp2(-ediff)
            if lm == 3:
                r *= 1.41421356
            r = min(thresh, r)
            r = r * sqrt_1
            x = x_[ch * size + (m.eBands[i] << lm):]
            renormalize = False
            for k in range(1 << lm):
                if not (collapse_masks[i * c + ch] & (1 << k)):
                    for j in range(n0):
                        seed = celt_lcg_rand(seed)
                        x[(j << lm) + k] = r if (seed & 0x8000) else -r
                    renormalize = True
            if renormalize:
                renormalise_vector(x, n0 << lm, 1.0)
    return seed


def denormalise_bands(m: CeltMode, x, freq, band_log_e, start, end, M,
                      downsample, silence):
    """(reference: denormalise_bands bands.c:188)"""
    n = M * m.shortMdctSize
    bound = M * m.eBands[end]
    if downsample != 1:
        bound = min(bound, n // downsample)
    if silence:
        bound = 0
        start = end = 0
    if start != 0:
        # only zero below the start band when coding starts above DC; a
        # QEXT-mode call (eBands[0]=100, start=0) must preserve the main
        # bands already written (reference: bands.c:208-214)
        freq[:M * m.eBands[start]] = 0
    for i in range(start, end):
        j = M * m.eBands[i]
        band_end = M * m.eBands[i + 1]
        lg = band_log_e[i] + E_MEANS[i]
        g = math.exp2(min(32.0, lg))
        freq[j:band_end] = x[j:band_end] * g
    freq[bound:n] = 0

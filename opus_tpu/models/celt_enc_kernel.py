"""Fused mono CELT ENCODE symbol pass as ONE Pallas TPU kernel — the
encode twin of celt_dec_kernel.py.

celt_enc_fused.py traces the encode band recursion + per-symbol range
encoder inline: ~0.7M StableHLO lines at 20 ms, beyond the compile
budget.  Here the whole tell-dependent symbol pass — coarse energy
(two-pass intra/inter with DRY tell-tracker trials + masked real
passes), tf encode, spread, dynalloc emission, trim, allocation, fine
energy, the PVQ band tree (theta quant, exp_rotation, greedy pulse
search, CWRS index, ec_enc_uint), anti-collapse flag, energy finalise
and ec_enc_done — runs inside a single `pallas_call`, with the band
tree linearized over celt_dec_kernel's preorder node program
(lax.fori_loop + lax.switch; the encode tree needs no pop events: no
resynth, no collapse masks).

The bitstream comes out as rc_enc_kernel's deferred-carry digit/end
page buffers; carry resolution + byte assembly happen in XLA
(rc_enc_kernel.finalize).  The analysis front end (preemph/MDCT/band
energies, transient, tf/dynalloc/spread/trim analysis) and the three
header bits stay in XLA — they are tell-independent (header tells are
deterministic under CBR) and reuse celt_enc_fused verbatim.

The tell-dependent plan stages REUSE celt_enc_fused's functions
(_coarse_impl, _tf_encode, _compute_allocation_enc, _quant_fine_energy,
_quant_energy_finalise): they are written against the range_plan `V`
API, so a V-compatible facade over rc_enc_kernel (class VK) lets the
same code drive the in-kernel encoder — one implementation, two
execution tiers.  A numpy-eager unrolled mode (kernel_mode=False)
drives the identical math on [B] lanes for CPU differential tests.

Scope: mono, CBR, prefilter-off, 48 kHz, LM >= 2 (celt_enc_fused keeps
the unrolled-XLA path for 2.5/5 ms).  Like the fused encoder, float32
decisions may differ from the float64 scalar encoder on ties; every
stream is a valid CELT stream (decode-validity gates in tests).

Reference: celt_encode_with_ec celt/celt_encoder.c:1726,
quant_coarse_energy quant_bands.c:260, tf_encode celt_encoder.c:824,
dynalloc celt_encoder.c:2365, interp_bits2pulses rate.c:249,
quant_all_bands bands.c:1589, compute_theta bands.c:700, op_pvq_search
vq.c:205, icwrs cwrs.c:444, ec_enc_done entenc.c:219."""

from __future__ import annotations

import math
from contextlib import contextmanager

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..celt.modes import get_pulses
from ..ops import rc_enc_kernel as RE
from ..ops.rc_kernel import i32, u32, _sel
from . import celt_enc_fused as EF
from .celt_enc_fused import EncTabs, BITRES, MAX_FINE_BITS
from .celt_dec_fused import (
    _lit_lookup, _tree_sum, _frac_mul16, _bitexact_cos,
    _bitexact_log2tan, _compute_qn_vec, _sudiv, _band_variants,
    QTHETA_OFFSET, SPREAD_NONE, SPREAD_NORMAL, SPREAD_ICDF, TRIM_ICDF,
    _u_col, _v_row, _U32_SAT)
from .celt_dec_kernel import (
    KTabs, NF_DEPTH, NF_OFF, NF_ISV1, NF, SH, LANES, NMAX, _kfit,
    _halve, _wrap_in_matrix, _lit_u32)

f32 = jnp.float32


# ===================================================================== #
# V facade: range_plan API over rc_enc_kernel                           #
# ===================================================================== #

class VK:
    """range_plan-compatible facade over the kernel-safe encoder with
    bound digit/end buffers.  dry=True gives the exact tell tracker
    (rng/nbits evolve; nothing written) for decision trials."""

    def __init__(self, dig: RE.PageBuf, end: RE.PageBuf,
                 dry: bool = False):
        self.dig = dig
        self.end = end
        self.dry = dry

    def re_encode(self, e, fl, fh, ft, active=None):
        return RE.re_encode(e, self.dig, fl, fh, ft, active,
                            dry=self.dry)

    def re_encode_bin(self, e, fl, fh, bits, active=None):
        return RE.re_encode_bin(e, self.dig, fl, fh, bits, active,
                                dry=self.dry)

    def re_enc_bit_logp(self, e, bit, logp, active=None):
        return RE.re_enc_bit_logp(e, self.dig, bit, logp, active,
                                  dry=self.dry)

    def re_enc_icdf(self, e, s, icdf, ftb, active=None):
        tab = tuple(int(v) for v in np.asarray(icdf).reshape(-1))
        return RE.re_enc_icdf(e, self.dig, s, tab, ftb, active,
                              dry=self.dry)

    def re_enc_bits(self, e, fl, bits, active=None):
        return RE.re_enc_bits(e, self.end, fl, bits, active,
                              dry=self.dry)

    def re_enc_uint(self, e, fl, ft, active=None):
        return RE.re_enc_uint(e, self.dig, self.end, fl, ft, active,
                              dry=self.dry)

    @staticmethod
    def re_tell(e):
        return RE.re_tell(e)

    @staticmethod
    def re_tell_frac(e):
        return RE.re_tell_frac(e)


@contextmanager
def _with_V(vk: VK):
    """Trace-time rebind of celt_enc_fused's module-level coder so its
    plan functions drive the kernel-safe encoder."""
    old = EF.V
    EF.V = vk
    try:
        yield
    finally:
        EF.V = old


# ===================================================================== #
# atan2 without transcendental support                                  #
# ===================================================================== #

def _atan2p(y, x):
    """atan2 for y, x >= 0 (x > 0) as a half-angle-reduced odd
    polynomial — Mosaic has no atan lowering.  |err| < 2e-7 rad, far
    inside the itheta rounding margin (vq.c stereo_itheta)."""
    swap = y > x
    num = jnp.minimum(y, x)
    den = jnp.maximum(jnp.maximum(y, x), f32(1e-30))
    r = num / den
    z = r / (f32(1.0) + jnp.sqrt(f32(1.0) + r * r))
    z2 = z * z
    p = f32(1 / 13.0)
    for c in (-1 / 11.0, 1 / 9.0, -1 / 7.0, 1 / 5.0, -1 / 3.0, 1.0):
        p = p * z2 + f32(c)
    a = f32(2.0) * z * p
    return _sel(swap, f32(0.5 * math.pi) - a, a)


# ===================================================================== #
# leaf register helpers (encode)                                        #
# ===================================================================== #

def _exp_rotation1_regs(xs, length: int, stride: int, c, s):
    xs = list(xs)
    ms = -s
    for i in range(length - stride):
        x1, x2 = xs[i], xs[i + stride]
        xs[i + stride] = c * x2 + s * x1
        xs[i] = c * x1 + ms * x2
    for i in range(length - 2 * stride - 1, -1, -1):
        x1, x2 = xs[i], xs[i + stride]
        xs[i + stride] = c * x2 + s * x1
        xs[i] = c * x1 + ms * x2
    return xs


def _exp_rotation_enc(xs, n: int, stride_lanes, stride_vals, k, spread,
                      active):
    """exp_rotation direction=+1 (vq.c:104): stride-1 pass with
    (c, -s), then the stride2 pass with (s, -c) — the decode order
    reversed."""
    factor = _sel(spread == 1, f32(15.0),
                  _sel(spread == 2, f32(10.0), f32(5.0)))
    kf = k.astype(f32)
    gain = f32(1.0) * n / (n + factor * kf)
    theta = f32(0.5) * gain * gain
    c = jnp.cos(f32(0.5 * math.pi) * theta)
    s = jnp.cos(f32(0.5 * math.pi) * (f32(1.0) - theta))
    do = active & (spread != SPREAD_NONE) & (2 * k < n)
    out = list(xs)
    for sv in stride_vals:
        if n < sv:
            continue
        stride2 = 0
        if n >= 8 * sv:
            stride2 = 1
            while (stride2 * stride2 + stride2) * sv + (sv >> 2) < n:
                stride2 += 1
        length = n // sv
        cur = list(xs)
        for seg in range(sv):
            sub = cur[seg * length:(seg + 1) * length]
            sub = _exp_rotation1_regs(sub, length, 1, c, -s)
            if stride2:
                sub = _exp_rotation1_regs(sub, length, stride2, s, -c)
            cur[seg * length:(seg + 1) * length] = sub
        m = do & (stride_lanes == sv)
        out = [_sel(m, cv, ov) for cv, ov in zip(cur, out)]
    return out


def _pvq_search_regs(xs, n: int, k, kcap: int, active):
    """op_pvq_search (vq.c:205) on a list of n [sh] f32 regs.  Returns
    list of n signed i32 regs."""
    xa = [jnp.abs(x) for x in xs]
    signs = [_sel(x < 0, -1, 1) for x in xs]
    sum_ = _tree_sum(xa)
    proj = active & (k > (n >> 1))
    bad = proj & ~((sum_ > f32(1e-15)) & (sum_ < f32(64.0)))
    xa = [_sel(bad, f32(1.0) if j == 0 else f32(0.0), x)
          for j, x in enumerate(xa)]
    sum_ = _sel(bad, f32(1.0), sum_)
    rcp = (k.astype(f32) + f32(0.8)) / sum_
    iy = [_sel(proj, jnp.floor(rcp * x).astype(i32), 0) for x in xa]
    yy = _tree_sum([(y * y).astype(f32) for y in iy])
    xy = _tree_sum([x * y.astype(f32) for x, y in zip(xa, iy)])
    pulses_left = _sel(proj, k - _tree_sum(iy), k)
    dump = active & (pulses_left > n + 3)
    tmpf = pulses_left.astype(f32)
    yy = _sel(dump, yy + tmpf * tmpf + tmpf * 2.0 * iy[0].astype(f32),
              yy)
    iy[0] = iy[0] + _sel(dump, pulses_left, 0)
    pulses_left = _sel(dump, 0, pulses_left)
    cap = min(kcap, n + 3)

    def body(t, carry):
        xy, yy, *iy = carry
        act = active & (t < pulses_left)
        yy1 = yy + f32(1.0)
        # per-position scores; argmax = first max (jnp.argmax order)
        best_s = None
        best_j = None
        for j in range(n):
            rxy = xy + xa[j]
            score = (rxy * rxy) / (yy1 + f32(2.0) * iy[j].astype(f32))
            if best_s is None:
                best_s = score
                best_j = jnp.zeros_like(iy[0])
            else:
                better = score > best_s
                best_s = _sel(better, score, best_s)
                best_j = _sel(better, j, best_j)
        xy2 = xy
        yy2 = yy1
        iy2 = list(iy)
        for j in range(n):
            hit = best_j == j
            xy2 = _sel(hit, xy + xa[j], xy2)
            yy2 = _sel(hit, yy1 + f32(2.0) * iy[j].astype(f32), yy2)
            iy2[j] = iy[j] + (hit & act).astype(i32)
        return (_sel(act, xy2, xy), _sel(act, yy2, yy), *iy2)

    out = jax.lax.fori_loop(0, cap, body, (xy, yy, *iy))
    iy = list(out[2:])
    return [y * s for y, s in zip(iy, signs)]


def _icwrs_regs(iy, n: int, kcap: int):
    """icwrs (cwrs.c:444) on register lists: codebook index from
    exclusive/inclusive suffix magnitude sums + literal U columns."""
    ay = [jnp.abs(y) for y in iy]
    idx = (iy[n - 1] < 0).astype(u32)
    t_incl = ay[n - 1]
    kcols = kcap + 3
    for j in range(n - 2, -1, -1):
        s_excl = t_incl                      # sum_{t>j} |y_t|
        t_incl = t_incl + ay[j]
        nj = n - j
        col = _u_col(nj, kcap + 2)
        idx = idx + _lit_u32(col, jnp.clip(s_excl, 0, kcols - 1))
        neg = iy[j] < 0
        g2 = _lit_u32(col, jnp.clip(t_incl + 1, 0, kcols - 1))
        idx = idx + _sel(neg, g2, u32(0))
    return idx


def _encode_pulses_regs(vk: VK, e, iy, n: int, kq, kcap: int, active):
    """encode_pulses (cwrs.c:462): icwrs index + enc_uint(V(n, k))."""
    idx = _icwrs_regs(iy, n, kcap)
    vrow = _v_row(n, kcap)
    ft = _lit_u32(vrow, jnp.clip(kq, 0, kcap))
    return vk.re_enc_uint(e, idx.astype(i32), ft.astype(i32), active)


# ===================================================================== #
# theta encode (register form of _compute_theta_mono_enc)               #
# ===================================================================== #

def _theta_encode(vk: VK, e, rb, tabs, band: int, n2: int, b, bb2, b0,
                  lm2: int, emid, eside, avoid_sn, active):
    pulse_cap = tabs.logN[band] + lm2 * (1 << BITRES)
    offset = (pulse_cap >> 1) - QTHETA_OFFSET
    qn = _compute_qn_vec(n2, b, offset, pulse_cap)
    tell0 = vk.re_tell_frac(e)
    itheta_raw = jnp.floor(
        f32(0.5) + f32(16384 * 0.63662)
        * _atan2p(jnp.sqrt(eside), jnp.sqrt(emid))).astype(i32)
    has_theta = active & (qn != 1)
    itheta = (itheta_raw * qn + 8192) >> 14
    asn = has_theta & avoid_sn & (itheta > 0) & (itheta < qn)
    unq = (itheta * 16384) // jnp.maximum(qn, 1)
    imid_a = _bitexact_cos(unq)
    iside_a = _bitexact_cos(16384 - unq)
    delta_a = _frac_mul16(jnp.full_like(unq, (n2 - 1) << 7),
                          _bitexact_log2tan(iside_a, imid_a))
    itheta = _sel(asn & (delta_a > b), qn,
                  _sel(asn & (delta_a < -b), 0, itheta))
    uin = has_theta & (b0 > 1)
    e = vk.re_enc_uint(e, itheta, qn + 1, uin)
    tri = has_theta & (b0 <= 1)
    qh = qn >> 1
    ft = (qh + 1) * (qh + 1)
    low = itheta <= qh
    fs_t = _sel(low, itheta + 1, qn + 1 - itheta)
    fl_t = _sel(low, (itheta * (itheta + 1)) >> 1,
                ft - (((qn + 1 - itheta) * (qn + 2 - itheta)) >> 1))
    e = vk.re_encode(e, fl_t, fl_t + fs_t, ft, tri)
    itheta_q14 = (itheta * 16384) // jnp.maximum(qn, 1)
    itheta_q14 = _sel(has_theta, itheta_q14, itheta_raw)
    qalloc = vk.re_tell_frac(e) - tell0
    b = b - qalloc
    rb = rb - _sel(active, qalloc, 0)

    th0 = itheta_q14 == 0
    th1 = itheta_q14 == 16384
    imid = _sel(th0, 32767, _sel(th1, 0, _bitexact_cos(itheta_q14)))
    iside = _sel(th0, 0, _sel(th1, 32767,
                              _bitexact_cos(16384 - itheta_q14)))
    delta_m = _frac_mul16(jnp.full_like(itheta_q14, (n2 - 1) << 7),
                          _bitexact_log2tan(iside, imid))
    delta = _sel(th0, -16384, _sel(th1, 16384, delta_m))
    return b, rb, itheta_q14, delta, e


# ===================================================================== #
# X window adapter (VMEM ref in the kernel / list on CPU)               #
# ===================================================================== #

class _Win:
    """The per-band X working window: a [NMAX, 8, 128] VMEM ref inside
    the kernel, a mutable python list of [B] rows in unrolled mode."""

    def __init__(self, store, is_ref: bool):
        self.store = store
        self.is_ref = is_ref

    def read(self, off, nd: int):
        if self.is_ref:
            w = self.store[pl.ds(off, nd)]
            return [w[j] for j in range(nd)]
        return [self.store[off + j] for j in range(nd)]

    def write0(self, rows):
        if self.is_ref:
            self.store[0:len(rows)] = jnp.stack(rows)
        else:
            for j, r in enumerate(rows):
                self.store[j] = r

    def swap_halves(self, off, n2: int, mask):
        if self.is_ref:
            m = mask[None]
            lo = self.store[pl.ds(off, n2)]
            hi = self.store[pl.ds(off + n2, n2)]
            self.store[pl.ds(off, n2)] = jnp.where(m, hi, lo)
            self.store[pl.ds(off + n2, n2)] = jnp.where(m, lo, hi)
        else:
            for j in range(n2):
                lo = self.store[off + j]
                hi = self.store[off + n2 + j]
                self.store[off + j] = _sel(mask, hi, lo)
                self.store[off + n2 + j] = _sel(mask, lo, hi)


# ===================================================================== #
# the per-band encode tree                                              #
# ===================================================================== #

def _tree_band_enc(tabs: KTabs, band: int, nodes_ref, xw: _Win, vk: VK,
                   e, rb, spread, bb_root, b_band, avoid_sn,
                   active_band, zi):
    """Band `band`'s split tree over the preorder node table.  Encode
    needs no pop events (no resynth/cm); the v1 budget uses the parent
    rb snapshot from the push.  Returns (e, rb)."""
    n_root = tabs.band_n[band]
    maxd = tabs.band_depth[band]
    lm = tabs.lm
    nbase = tabs.band_node_base[band]
    n_nodes = (tabs.band_node_base[band + 1] if band + 1 < tabs.nb
               else tabs.n_nodes) - nbase
    kernel_mode = xw.is_ref
    zb = zi != 0
    zf = zi.astype(f32)

    def make_branch(dd: int):
        nd = n_root >> dd
        lmd = lm - dd
        can_split = (lmd != -1) and (nd > 2)
        row = tabs.cache_rows[(lmd, band)]
        L = row[0]
        kcap = min(int(get_pulses(L)), 128, _kfit(nd) + 1)
        bvals = tabs.band_bvals[band][dd]

        def branch(carry, off, isv1):
            e, rb, st = carry
            st = {k: list(v) for k, v in st.items()}
            if dd == 0:
                active = active_band
                b = b_band
                bb = bb_root
            else:
                p = dd - 1
                active = st["split"][p] != 0
                swap = st["swap"][p] != 0
                bb = _halve(bb_root, dd)
                isv1b = isv1 == 1
                b_v0 = _sel(swap, st["sbits"][p], st["mbits"][p])
                spent = st["rb0"][p] - rb
                rebalance = b_v0 - spent
                anchor = _sel(swap, 16384, 0)
                extra = _sel(active & (rebalance > (3 << BITRES))
                             & (st["itheta"][p] != anchor),
                             rebalance - (3 << BITRES), 0)
                b_v1 = _sel(swap, st["mbits"][p], st["sbits"][p]) + extra
                b = jnp.where(isv1b, b_v1, b_v0)

            if can_split:
                thr = row[L] + 12
                split = active & (b > thr)
                n2 = nd >> 1
                bb2 = (bb + 1) >> 1
                halves = xw.read(off, nd)
                xs_m = halves[:n2]
                xs_s = halves[n2:]
                emid = _tree_sum([x * x for x in xs_m]) + f32(1e-15)
                eside = _tree_sum([x * x for x in xs_s]) + f32(1e-15)
                b2, rb, itheta, delta, e = _theta_encode(
                    vk, e, rb, tabs, band, n2, b, bb2, bb, lmd - 1,
                    emid, eside, avoid_sn, split)
                nonzero_th = (itheta & 0x3fff) != 0
                lm2 = lmd - 1
                d_hi = delta - (delta >> (4 - lm2))
                d_lo = jnp.minimum(0, delta + (n2 << BITRES >> (5 - lm2)))
                delta = _sel((bb > 1) & nonzero_th,
                             _sel(itheta > 8192, d_hi, d_lo), delta)
                mbits = jnp.maximum(0, jnp.minimum(b2, (b2 - delta) // 2))
                sbits = b2 - mbits
                swap_n = split & (mbits < sbits)
                st["split"][dd] = split.astype(i32)
                st["swap"][dd] = swap_n.astype(i32)
                st["mbits"][dd] = mbits
                st["sbits"][dd] = sbits
                st["itheta"][dd] = itheta
                st["rb0"][dd] = rb
                xw.swap_halves(off, n2, split & swap_n)
            else:
                split = zb

            # ---- leaf: bits -> k -> rotate/search/icwrs ----
            leaf_act = active & ~split
            bm1 = b - 1
            rowlits = row[1:L + 1]
            lo = _tree_sum([(bm1 > r).astype(i32) for r in rowlits])
            hi = jnp.minimum(lo + 1, L)
            lo_val = _sel(lo == 0, -1,
                          _lit_lookup(list(row), jnp.clip(lo, 0, L)))
            hi_val = _lit_lookup(list(row), hi)
            q = _sel(bm1 - lo_val <= hi_val - bm1, lo, hi)
            c_fit = _tree_sum([(rb >= r + 1).astype(i32)
                               for r in rowlits])
            q = jnp.minimum(q, jnp.maximum(c_fit, 0))
            q = jnp.maximum(q, 0)
            bits_used = _sel(q > 0,
                             _lit_lookup(list(row), jnp.clip(q, 0, L))
                             + 1, 0)
            rb = rb - _sel(leaf_act, bits_used, 0)
            kq = _sel(q < 8, q,
                      (8 + (q & 7)) << jnp.maximum((q >> 3) - 1, 0)
                      .astype(u32))
            pvq = leaf_act & (kq != 0)
            xs = xw.read(off, nd)
            xs = _exp_rotation_enc(xs, nd, bb, bvals, kq, spread, pvq)
            iy = _pvq_search_regs(xs, nd, kq, kcap, pvq)
            e = _encode_pulses_regs(vk, e, iy, nd, kq, kcap, pvq)
            return e, rb, st
        return branch

    branches = [make_branch(dd) for dd in range(maxd + 1)]
    st0 = dict(split=[zi] * maxd, swap=[zi] * maxd, mbits=[zi] * maxd,
               sbits=[zi] * maxd, itheta=[zi] * maxd, rb0=[zi] * maxd)

    if kernel_mode:
        def body(t, carry):
            gi = nbase + t
            depth = nodes_ref[gi, NF_DEPTH]
            off = nodes_ref[gi, NF_OFF]
            isv1 = nodes_ref[gi, NF_ISV1]
            return jax.lax.switch(depth, branches, carry, off, isv1)

        e, rb, _st = jax.lax.fori_loop(0, n_nodes, body, (e, rb, st0))
    else:
        carry = (e, rb, st0)
        for t in range(n_nodes):
            rec = tabs.nodes[nbase + t]
            carry = branches[int(rec[NF_DEPTH])](
                carry, int(rec[NF_OFF]), int(rec[NF_ISV1]))
        e, rb, _st = carry
    return e, rb


# ===================================================================== #
# coarse energy: dry trials + masked real passes                        #
# ===================================================================== #

def _quant_coarse_energy_k(vk: VK, e, x_bands, old_e, budget, lm: int,
                           nbytes: int, delayed_intra, tabs, active):
    """quant_coarse_energy (quant_bands.c:260) without plan-coder
    re_select: both trials run DRY (exact tells, no writes), the pick
    replays for real on disjoint lane masks."""
    from .celt_enc_fused import (_coarse_impl, E_PROB_MODEL, PRED_COEF,
                                 BETA_COEF, BETA_INTRA)
    nb = tabs.nb
    intra_bias = (budget.astype(f32) * delayed_intra
                  * f32(0) / f32(512)).astype(i32)      # loss_rate 0
    dist = _tree_sum([jnp.minimum((x - o) * (x - o), 200.0)
                      for x, o in zip(x_bands, old_e)])
    new_distortion = jnp.minimum(dist, 200.0)
    tell0 = vk.re_tell(e)
    two_pass = active & (tell0 + 3 <= budget)
    max_decay = jnp.minimum(16.0, f32(0.125 * nbytes)) \
        + jnp.zeros_like(delayed_intra)
    pm_intra = E_PROB_MODEL[tabs.lm][1]
    pm_inter = E_PROB_MODEL[tabs.lm][0]
    one = jnp.ones(tell0.shape, i32)
    zero = jnp.zeros_like(one)

    dry = VK(vk.dig, vk.end, dry=True)
    with _with_V(dry):
        e1, old1, err1, bad1 = _coarse_impl(
            e, x_bands, old_e, budget, tell0, pm_intra, 0.0, BETA_INTRA,
            one, max_decay, nb, two_pass)
        tell_intra = vk.re_tell_frac(e1)
        e2, _o2, _e2, bad2 = _coarse_impl(
            e, x_bands, old_e, budget, tell0, pm_inter,
            PRED_COEF[tabs.lm], BETA_COEF[tabs.lm], zero, max_decay,
            nb, active)
        tell_inter = vk.re_tell_frac(e2)
    pick_intra = two_pass & (
        (bad1 < bad2)
        | ((bad1 == bad2) & (tell_inter + intra_bias > tell_intra)))

    with _with_V(vk):
        e, old_i, err_i, _b1 = _coarse_impl(
            e, x_bands, old_e, budget, tell0, pm_intra, 0.0, BETA_INTRA,
            one, max_decay, nb, pick_intra)
        e, old_n, err_n, _b2 = _coarse_impl(
            e, x_bands, old_e, budget, tell0, pm_inter,
            PRED_COEF[tabs.lm], BETA_COEF[tabs.lm], zero, max_decay,
            nb, active & ~pick_intra)
    old_out = [_sel(pick_intra, a, b) for a, b in zip(old_i, old_n)]
    err_out = [_sel(pick_intra, a, b) for a, b in zip(err_i, err_n)]
    pc = PRED_COEF[tabs.lm]
    new_di = _sel(pick_intra, new_distortion,
                  f32(pc * pc) * delayed_intra + new_distortion)
    return e, old_out, err_out, new_di, pick_intra


# ===================================================================== #
# static tables                                                         #
# ===================================================================== #

class ETabs(KTabs):
    """KTabs' node program + the encode-side input-wrap matrices."""

    def __init__(self, fs: int, frame_size: int):
        super().__init__(fs, frame_size)
        # replace the decode wrapper matrices with input-side only
        rows = []
        self.ewmat_off = []
        cur = 0
        for band in range(self.nb):
            n = self.band_n[band]
            offs = []
            for v in self.band_var[band]:
                wi = _wrap_in_matrix(n, v)
                if np.allclose(wi, np.eye(n)):
                    offs.append(None)
                else:
                    rows.append(wi)
                    offs.append(cur)
                    cur += n
            self.ewmat_off.append(offs)
        if rows:
            wm = np.zeros((cur, NMAX), np.float32)
            r0 = 0
            for w in rows:
                wm[r0:r0 + w.shape[0], :w.shape[1]] = w
                r0 += w.shape[0]
            self.ewmats = wm
        else:
            self.ewmats = np.zeros((1, NMAX), np.float32)
        self.enc = EncTabs(fs, frame_size)


# ===================================================================== #
# the in-kernel symbol pass (shared with the unrolled CPU mode)         #
# ===================================================================== #

def _wrap_rows(tabs: ETabs, wm_src, band: int, vslot: int, rows,
               kernel_mode: bool):
    """Input-side tf/Hadamard transform of one band window as a basis
    matmul (bands.c:623/650 collapsed; see _wrap_in_matrix)."""
    n = tabs.band_n[band]
    off = tabs.ewmat_off[band][vslot]
    if off is None:
        return rows
    if kernel_mode:
        mat = wm_src[off:off + n, :n]
        x = jnp.stack(rows)
        out = jax.lax.dot_general(
            mat, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        return [out[j] for j in range(n)]
    mat = wm_src[off:off + n, :n]                 # np array
    x = jnp.stack(rows)                           # [n, B]
    out = jnp.asarray(mat).T @ x
    return [out[j] for j in range(n)]


def _symbol_pass(tabs: ETabs, vk: VK, e, x_rows_fn, wm_src, nodes_ref,
                 xw: _Win, ins, nbytes: int, zi):
    """Everything from coarse energy to ec_enc_done, one lane tile.

    ins: dict of [sh] regs (live, is_transient, tf_res[nb], tf_select,
    spread_calc, trim_calc, offsets_cnt[nb], prev_cb, consec_transient,
    ble_b[nb], old_e[nb], delayed_intra).  x_rows_fn(base, n) yields
    the band's X rows.  Returns an out dict."""
    etabs = tabs.enc
    nb = tabs.nb
    lm = tabs.lm
    kernel_mode = xw.is_ref
    active = ins["live"]
    is_transient = ins["is_transient"] != 0
    total_bits = nbytes * 8
    budget = jnp.full_like(zi, total_bits)

    # ---- coarse energy (two-pass trial) ----
    e, old_e, error, new_di, pick_intra = _quant_coarse_energy_k(
        vk, e, ins["ble_b"], ins["old_e"], budget, lm, nbytes,
        ins["delayed_intra"], etabs, active)

    # ---- tf encode ----
    with _with_V(vk):
        e, tf_vals, tf_select = EF._tf_encode(
            e, ins["tf_res"], ins["tf_select"], is_transient, etabs,
            budget, active)

    # ---- spread (celt_encoder.c:2332-2364; analysis value from XLA) --
    can_sp = active & (vk.re_tell(e) + 4 <= total_bits)
    use_calc = can_sp & ~is_transient & (nbytes >= 10)
    spread = _sel(use_calc, ins["spread_calc"],
                  jnp.full_like(zi, SPREAD_NORMAL))
    e = vk.re_enc_icdf(e, spread, SPREAD_ICDF, 5, can_sp)

    # ---- dynalloc boost emission (celt_encoder.c:2365-2391) ----
    dyn_logp = jnp.full_like(zi, 6)
    total_bits8 = total_bits << BITRES
    total_boost = zi
    tell_frac = vk.re_tell_frac(e)
    offsets = [None] * nb
    for i in range(nb):
        width = int(etabs.width[i])
        quanta = EF._quanta(width)
        cap_i = int(etabs.caps[i])
        dlp = dyn_logp
        boost = zi
        alive = active
        coded_any = zi != 0
        for j in range(cap_i // quanta + 1):
            can = alive & (tell_frac + (dlp << BITRES)
                           < total_bits8 - total_boost) & (boost < cap_i)
            flag = can & (j < ins["offsets_cnt"][i])
            e = vk.re_enc_bit_logp(e, flag.astype(i32), dlp, can)
            tell_frac = vk.re_tell_frac(e)
            boost = boost + _sel(flag, quanta, 0)
            total_boost = total_boost + _sel(flag, quanta, 0)
            dlp = _sel(flag, jnp.ones_like(dlp), dlp)
            coded_any = coded_any | flag
            alive = flag
        dyn_logp = _sel(coded_any, jnp.maximum(2, dyn_logp - 1),
                        dyn_logp)
        offsets[i] = boost

    # ---- trim ----
    can_trim = active & (tell_frac + (6 << BITRES)
                         <= total_bits8 - total_boost)
    trim = _sel(can_trim, ins["trim_calc"], 5)
    e = vk.re_enc_icdf(e, trim, TRIM_ICDF, 7, can_trim)
    tell_frac = vk.re_tell_frac(e)

    # ---- allocation ----
    bits = total_bits8 - tell_frac - 1
    anti_rsv = _sel(is_transient & (lm >= 2)
                    & (bits >= ((lm + 2) << BITRES)), 1 << BITRES, 0)
    bits = bits - anti_rsv
    with _with_V(vk):
        e, coded_bands, balance, pulses, ebits, fine_priority = \
            EF._compute_allocation_enc(e, etabs, offsets, trim, bits,
                                       ins["prev_cb"], active)
        # ---- fine energy ----
        e, error, old_e = EF._quant_fine_energy(e, error, ebits, old_e,
                                                nbytes, nb, active)

    # ---- PVQ band pass over the node program ----
    total_bits8b = jnp.full_like(zi, nbytes * (8 << BITRES)) - anti_rsv
    bb_transient = _sel(is_transient, tabs.M, 1)
    for i in range(nb):
        n = tabs.band_n[i]
        base = tabs.band_base[i]
        tell = vk.re_tell_frac(e)
        if i != 0:
            balance = balance - tell
        remaining_bits = total_bits8b - tell - 1
        rb = remaining_bits
        in_coded = i <= coded_bands - 1
        den = jnp.minimum(3, jnp.maximum(coded_bands - i, 1))
        curr_balance = _sudiv(balance, den)
        b = _sel(in_coded,
                 jnp.clip(jnp.minimum(remaining_bits + 1,
                                      pulses[i] + curr_balance),
                          0, 16383), 0)

        rows = x_rows_fn(base, n)
        variants = tabs.band_var[i]
        masks = [active & (is_transient == (v["tv"] == 1))
                 & (tf_vals[i] == v["tfv"]) for v in variants]
        rows_f = rows
        bb_lanes = zi
        for vs, (v, mmask) in enumerate(zip(variants, masks)):
            rv = _wrap_rows(tabs, wm_src, i, vs, rows, kernel_mode)
            if kernel_mode:
                rows_f = [jnp.where(mmask, a, b_)
                          for a, b_ in zip(rv, rows_f)]
            else:
                rows_f = [_sel(mmask, a, b_)
                          for a, b_ in zip(rv, rows_f)]
            bb_lanes = _sel(mmask, v["b0_final"], bb_lanes)
        xw.write0(rows_f)

        avoid = is_transient if i == 0 else (zi != 0)
        e, rb = _tree_band_enc(tabs, i, nodes_ref, xw, vk, e, rb,
                               spread, bb_lanes, b, avoid, active, zi)
        balance = balance + pulses[i] + tell

    # ---- anti-collapse flag ----
    has_rsv = active & (anti_rsv > 0)
    ac_on = (ins["consec_transient"] < 2).astype(i32)
    e = vk.re_enc_bits(e, _sel(has_rsv, ac_on, 0),
                       _sel(has_rsv, 1, 0), has_rsv)

    # ---- energy finalise + done ----
    bits_left = nbytes * 8 - vk.re_tell(e)
    with _with_V(vk):
        e, error = EF._quant_energy_finalise(e, error, ebits,
                                             fine_priority, bits_left,
                                             nb, active)
    e = RE.re_done(e, vk.dig, active)
    return dict(e=e, old_e=old_e, error=error, delayed_intra=new_di,
                pick_intra=pick_intra, coded_bands=coded_bands,
                spread=spread, can_sp=can_sp, use_calc=use_calc)


# ===================================================================== #
# pallas kernel                                                         #
# ===================================================================== #

_NI_FIX = 7      # live, is_transient, tf_select, spread_calc,
                 # trim_calc, prev_cb, consec_transient


def _unpack_ins(tabs: ETabs, fvals, ivals):
    nb = tabs.nb
    return dict(
        ble_b=[fvals[i] for i in range(nb)],
        old_e=[fvals[nb + i] for i in range(nb)],
        delayed_intra=fvals[2 * nb],
        live=ivals[0] != 0, is_transient=ivals[1],
        tf_select=ivals[2], spread_calc=ivals[3], trim_calc=ivals[4],
        prev_cb=ivals[5], consec_transient=ivals[6],
        tf_res=[ivals[_NI_FIX + i] for i in range(nb)],
        offsets_cnt=[ivals[_NI_FIX + nb + i] for i in range(nb)])


def _enc_frame_kernel(tabs: ETabs, nbytes: int, nodes_ref, wm_ref,
                      x_ref, fin_ref, iin_ref, esi_ref, esu_ref,
                      dig_in_ref, end_in_ref,
                      dig_ref, end_ref, esi_o_ref, esu_o_ref,
                      fout_ref, iout_ref, xw_ref):
    nb = tabs.nb
    dig_ref[:] = dig_in_ref[:]
    end_ref[:] = end_in_ref[:]
    fvals = [fin_ref[i] for i in range(2 * nb + 1)]
    ivals = [iin_ref[i] for i in range(_NI_FIX + 2 * nb)]
    ins = _unpack_ins(tabs, fvals, ivals)
    zi = ivals[0] >> 31                   # concrete-layout zero
    e = dict(ndigits=esi_ref[0], nend=esi_ref[1], nend_bits=esi_ref[2],
             nbits_total=esi_ref[3], error=esi_ref[4],
             end_window=esu_ref[0], rng=esu_ref[1], val=esu_ref[2])
    dig = RE.PageBuf(dig_ref, is_ref=True)
    end = RE.PageBuf(end_ref, is_ref=True)
    vk = VK(dig, end)
    xw = _Win(xw_ref, is_ref=True)

    def x_rows(base, n):
        w = x_ref[base:base + n]
        return [w[j] for j in range(n)]

    out = _symbol_pass(tabs, vk, e, x_rows, wm_ref, nodes_ref, xw, ins,
                       nbytes, zi)
    e = out["e"]
    esi_o_ref[0] = e["ndigits"]
    esi_o_ref[1] = e["nend"]
    esi_o_ref[2] = e["nend_bits"]
    esi_o_ref[3] = e["nbits_total"]
    esi_o_ref[4] = e["error"]
    esu_o_ref[0] = e["end_window"]
    esu_o_ref[1] = e["rng"]
    esu_o_ref[2] = e["val"]
    for i in range(nb):
        fout_ref[i] = out["old_e"][i]
        fout_ref[nb + i] = out["error"][i]
    fout_ref[2 * nb] = out["delayed_intra"]
    iout_ref[0] = out["pick_intra"].astype(i32)
    iout_ref[1] = out["coded_bands"]
    iout_ref[2] = out["spread"]
    iout_ref[3] = out["can_sp"].astype(i32)
    iout_ref[4] = out["use_calc"].astype(i32)


def build_enc_frame_fn(tabs: ETabs, nbytes: int, R: int,
                       interpret: bool = False):
    """fn(X [NX,R,128] f32, fin [2nb+1,R,128] f32,
    iin [7+2nb,R,128] i32, esi [5,R,128] i32, esu [3,R,128] u32,
    dig [D,R,128] i32, end [E,R,128] i32) -> (dig, end, esi, esu,
    fout [2nb+1], iout [5])."""
    assert R % 8 == 0
    nb = tabs.nb
    NX = tabs.nx_rows
    D = nbytes + 4
    E = nbytes + 1
    grid = (R // 8,)
    nodes = jnp.asarray(tabs.nodes)
    wmats = jnp.asarray(tabs.ewmats)
    WRI = tabs.ewmats.shape[0]
    NI = _NI_FIX + 2 * nb
    NF_ROWS = 2 * nb + 1

    from functools import partial
    kern = partial(_enc_frame_kernel, tabs, nbytes)

    def bs(rows, dtype_rows=None):
        return pl.BlockSpec((rows, 8, 128), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tabs.n_nodes, NF), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((WRI, NMAX), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            bs(NX), bs(NF_ROWS), bs(NI), bs(5), bs(3), bs(D), bs(E),
        ],
        out_specs=[bs(D), bs(E), bs(5), bs(3), bs(NF_ROWS), bs(5)],
        out_shape=[
            jax.ShapeDtypeStruct((D, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((E, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((5, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((3, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((NF_ROWS, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((5, R, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NMAX, 8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(X, fin, iin, esi, esu, dig, end):
        return call(nodes, wmats, X, fin, iin, esi, esu, dig, end)
    return fn


# ===================================================================== #
# XLA front end: analysis DSP + header bits (celt_encoder.c:1936-2332)  #
# ===================================================================== #

def _front_end(pcm, state, tabs: ETabs, nbytes: int,
               lsb_depth: int = 24):
    """Everything tell-independent, verbatim from
    celt_enc_fused.fused_celt_encode_frame's front section, plus the
    three header bits through the kernel-safe encoder (their tells are
    deterministic under CBR).  Returns (e, dig, end, ins, X, front)."""
    etabs = tabs.enc
    nb = tabs.nb
    lm = tabs.lm
    m = tabs.M
    n = etabs.mode.shortMdctSize << lm
    bsz = pcm.shape[0]
    active = jnp.ones((bsz,), bool)
    total_bits = nbytes * 8
    eff_bytes = nbytes

    e = RE.re_init((bsz,))
    dig = RE.PageBuf(jnp.zeros((nbytes + 4, bsz), i32), is_ref=False)
    end = RE.PageBuf(jnp.zeros((nbytes + 1, bsz), i32), is_ref=False)
    vk = VK(dig, end)

    # ---- silence + clip ----
    ov_n = n - etabs.mode.overlap
    head_max = jnp.max(jnp.abs(pcm[:, :ov_n]), axis=1) if ov_n > 0 \
        else jnp.zeros((bsz,), f32)
    tail_max = jnp.max(jnp.abs(pcm[:, ov_n:]), axis=1)
    sample_max = jnp.maximum(state["overlap_max"],
                             jnp.maximum(head_max, tail_max))
    new_overlap_max = tail_max
    silence = sample_max <= (1.0 / (1 << lsb_depth))
    e = vk.re_enc_bit_logp(e, silence.astype(i32), 15, active)
    tell_now = vk.re_tell(e)
    e = dict(e)
    e["nbits_total"] = _sel(silence,
                            e["nbits_total"] + (total_bits - tell_now),
                            e["nbits_total"])

    clip_mask = sample_max > 2.0
    dsp = EF._encode_dsp(pcm, state["mem"], state["hist"], etabs,
                         clip_mask)
    is_transient, tf_estimate = EF._transient_analysis(
        dsp["full"][:, etabs.mode.overlap:], etabs)

    can_pf = active & (vk.re_tell(e) + 16 <= total_bits)
    e = vk.re_enc_bit_logp(e, jnp.zeros_like(tell_now), 1, can_pf)

    can_tr = (lm > 0) & (vk.re_tell(e) + 3 <= total_bits)
    transient_got_disabled = is_transient & ~can_tr
    is_transient = is_transient & can_tr

    ble_l = [dsp["ble_l"][:, i] for i in range(nb)]
    ble_s = [dsp["ble_s"][:, i] for i in range(nb)]
    ble = [_sel(is_transient, s, l) for l, s in zip(ble_l, ble_s)]

    follow = jnp.full_like(ble[0], -10.0)
    frame_avg = jnp.zeros_like(follow)
    offset_sb = _sel(is_transient, f32(0.5) * lm, f32(0.0))
    for i in range(nb):
        follow = jnp.maximum(follow - 1.0, ble[i] - offset_sb)
        frame_avg = frame_avg + follow
    frame_avg = frame_avg / nb
    temporal_vbr = jnp.clip(frame_avg - state["spec_avg"], -1.5, 3.0)
    new_spec_avg = state["spec_avg"] + f32(0.02) * temporal_vbr

    ble2 = list(ble)
    patch = can_tr & ~is_transient & EF._patch_transient(
        ble, state["old_band_e"], nb)
    is_transient = is_transient | patch
    ble = [_sel(patch, s, b_) for s, b_ in zip(ble_s, ble)]
    ble2 = [_sel(patch, l + f32(0.5) * lm, b_)
            for l, b_ in zip(ble_l, ble2)]
    tf_estimate = _sel(patch, f32(0.2), tf_estimate)

    e = vk.re_enc_bit_logp(e, is_transient.astype(i32), 3, can_tr)

    bm = jnp.asarray(etabs.band_map[:m * int(etabs.eBands[nb])])
    be = _sel(is_transient[:, None], dsp["be_s"], dsp["be_l"])
    freq = _sel(is_transient[:, None], dsp["freq_s"], dsp["freq_l"])
    ncoded = m * int(etabs.eBands[nb])
    X = freq[:, :ncoded] * (1.0 / (1e-27 + be))[:, bm]

    offsets_cnt, importance, spread_weight, _maxd, _tb = \
        EF._dynalloc_analysis(ble, ble2, etabs, is_transient, eff_bytes)
    lam = max(80, 20480 // eff_bytes + 2)
    tf_res, tf_select = EF._tf_analysis(X, etabs, is_transient,
                                        tf_estimate, lam, importance)

    ble_b = [
        _sel(jnp.abs(b_ - o) < 2.0, b_ - f32(0.25) * ee, b_)
        for b_, o, ee in zip(ble, state["old_band_e"],
                             state["energy_error"])]

    sp_state = dict(average=state["tonal_average"],
                    hf_average=state["hf_average"],
                    tapset_decision=state["tapset_decision"],
                    last_decision=state["spread_decision"])
    sp_calc, sp_new = EF._spreading_decision(
        X, etabs, spread_weight, jnp.zeros_like(active), sp_state)

    equiv_rate = nbytes * 8 * 50 * (1 << (3 - lm)) \
        - (40 + 20) * ((400 >> lm) - 50)
    trim_calc = EF._alloc_trim_analysis(ble, etabs, tf_estimate,
                                        equiv_rate)

    ins = dict(live=active, is_transient=is_transient.astype(i32),
               tf_select=tf_select, spread_calc=sp_calc,
               trim_calc=trim_calc, prev_cb=state["last_coded_bands"],
               consec_transient=state["consec_transient"],
               tf_res=tf_res, offsets_cnt=offsets_cnt, ble_b=ble_b,
               old_e=list(state["old_band_e"]),
               delayed_intra=state["delayed_intra"])
    front = dict(silence=silence, is_transient=is_transient,
                 transient_got_disabled=transient_got_disabled,
                 mem=dsp["mem"], hist=dsp["hist"],
                 overlap_max=new_overlap_max, spec_avg=new_spec_avg,
                 sp_new=sp_new)
    return e, dig, end, ins, X, front


def _assemble_state(state, front, old_e, error, delayed_intra,
                    coded_bands, spread_sel, can_sp, use_calc, nb):
    silence = front["silence"]
    is_transient = front["is_transient"]
    old_e = [_sel(silence, f32(-28.0), oe) for oe in old_e]
    ole = state["old_log_e"]
    ole2 = state["old_log_e2"]
    new_ole2 = [_sel(is_transient, o2, o1) for o1, o2 in zip(ole, ole2)]
    new_ole = [_sel(is_transient, jnp.minimum(o1, oe), oe)
               for o1, oe in zip(ole, old_e)]
    new_consec = _sel(is_transient | front["transient_got_disabled"],
                      state["consec_transient"] + 1, 0)
    lcb = state["last_coded_bands"]
    new_lcb = _sel(lcb != 0,
                   jnp.minimum(lcb + 1,
                               jnp.maximum(lcb - 1, coded_bands)),
                   coded_bands)
    sp_new = front["sp_new"]
    return dict(
        mem=front["mem"], hist=front["hist"],
        overlap_max=front["overlap_max"], spec_avg=front["spec_avg"],
        old_band_e=old_e, old_log_e=new_ole, old_log_e2=new_ole2,
        energy_error=[jnp.clip(er, -0.5, 0.5) for er in error],
        delayed_intra=delayed_intra, consec_transient=new_consec,
        last_coded_bands=new_lcb,
        tonal_average=_sel(use_calc != 0, sp_new["average"],
                           state["tonal_average"]),
        hf_average=state["hf_average"],
        tapset_decision=state["tapset_decision"],
        spread_decision=_sel(can_sp != 0, spread_sel,
                             SPREAD_NORMAL).astype(i32))


def kernel_celt_encode_frame(pcm, state, tabs: ETabs, nbytes: int,
                             frame_fn, R: int):
    """One batched CELT encode frame: XLA front end + the Pallas symbol
    kernel + XLA carry resolution.  pcm: [B, N] with B = R*128.
    Returns (payload [B, nbytes] u8, rng [B] u32, err [B], state)."""
    nb = tabs.nb
    bsz = pcm.shape[0]
    e, dig, end, ins, X, front = _front_end(pcm, state, tabs, nbytes)

    def rl(v, dt=None):
        v = jnp.asarray(v)
        return v.reshape(R, 128) if dt is None \
            else v.astype(dt).reshape(R, 128)

    Xk = X.T.reshape(tabs.nx_rows, R, 128)
    fin = jnp.stack([rl(v) for v in (ins["ble_b"] + ins["old_e"]
                                     + [ins["delayed_intra"]])])
    iin = jnp.stack([rl(v, i32) for v in (
        [ins["live"], ins["is_transient"], ins["tf_select"],
         ins["spread_calc"], ins["trim_calc"], ins["prev_cb"],
         ins["consec_transient"]] + ins["tf_res"]
        + ins["offsets_cnt"])])
    esi = jnp.stack([rl(e[k], i32) for k in
                     ("ndigits", "nend", "nend_bits", "nbits_total",
                      "error")])
    esu = jnp.stack([rl(e[k], u32) for k in
                     ("end_window", "rng", "val")])
    digk = dig.buf.reshape(-1, R, 128)
    endk = end.buf.reshape(-1, R, 128)

    dig_o, end_o, esi_o, esu_o, fout, iout = frame_fn(
        Xk, fin, iin, esi, esu, digk, endk)

    def fl(v):
        return v.reshape(-1)

    e_out = dict(ndigits=fl(esi_o[0]), nend=fl(esi_o[1]),
                 nend_bits=fl(esi_o[2]), nbits_total=fl(esi_o[3]),
                 error=fl(esi_o[4]), end_window=fl(esu_o[0]),
                 rng=fl(esu_o[1]), val=fl(esu_o[2]))
    payload, err, rng = RE.finalize(e_out, dig_o.reshape(-1, bsz),
                                    end_o.reshape(-1, bsz), nbytes)
    old_e = [fl(fout[i]) for i in range(nb)]
    error = [fl(fout[nb + i]) for i in range(nb)]
    new_state = _assemble_state(
        state, front, old_e, error, fl(fout[2 * nb]), fl(iout[1]),
        fl(iout[2]), fl(iout[3]), fl(iout[4]), nb)
    return payload, rng, err, new_state


def unrolled_encode_frame(pcm, state, tabs: ETabs, nbytes: int):
    """CPU differential twin: the SAME _symbol_pass on [B] lanes with
    the node program unrolled in python (run eagerly via tests/np_shim
    — the unrolled XLA graph is exactly what the kernel exists to
    avoid).  Returns (payload, rng, err, state)."""
    nb = tabs.nb
    e, dig, end, ins, X, front = _front_end(pcm, state, tabs, nbytes)
    vk = VK(dig, end)
    xw = _Win([jnp.zeros_like(X[:, 0])] * NMAX, is_ref=False)
    zi = jnp.zeros_like(ins["prev_cb"])

    def x_rows(base, n):
        return [X[:, base + j] for j in range(n)]

    out = _symbol_pass(tabs, vk, e, x_rows, tabs.ewmats, None, xw, ins,
                       nbytes, zi)
    payload, err, rng = RE.finalize(out["e"], vk.dig.buf, vk.end.buf,
                                    nbytes)
    new_state = _assemble_state(
        state, front, out["old_e"], out["error"],
        out["delayed_intra"], out["coded_bands"], out["spread"],
        out["can_sp"].astype(i32), out["use_calc"].astype(i32), nb)
    return payload, rng, err, new_state


class KernelCeltEncoder:
    """PCM-in -> CELT-packets-out mono CBR encoder with the Pallas
    symbol kernel (10/20 ms production path)."""

    def __init__(self, batch: int, fs: int = 48000,
                 frame_size: int = 960, nbytes: int = 160):
        assert batch % LANES == 0, "batch must be a multiple of 1024"
        self.batch = batch
        self.R = batch // 128
        self.tabs = ETabs(fs, frame_size)
        self.nbytes = nbytes
        from .celt_enc_fused import fused_celt_enc_init
        self.state = fused_celt_enc_init(batch, self.tabs.enc)
        frame_fn = build_enc_frame_fn(self.tabs, nbytes, self.R)
        self._step = jax.jit(
            lambda p, s: kernel_celt_encode_frame(
                p, s, self.tabs, nbytes, frame_fn, self.R))

    def encode(self, pcm: np.ndarray):
        payload, rng, err, self.state = self._step(
            jnp.asarray(pcm, jnp.float32), self.state)
        return np.asarray(payload), np.asarray(rng), np.asarray(err)

"""Fused mono CELT decode symbol pass as ONE Pallas TPU kernel.

celt_dec_fused.py traces the PVQ band-split recursion as a fully
unrolled graph: ~0.4M jaxpr eqns at 20 ms, which neither XLA nor any
runtime dispatcher digests.  This module is the TPU-native end state:
the whole per-frame symbol pass — range decode, coarse/fine energy, tf,
dynalloc, allocation, the band tree with PVQ/CWRS + folding, anti-
collapse and energy finalise — runs inside a single `pallas_call` per
frame, with the band-split recursion *linearized into a node program*:

  * each band's static split tree is walked by ONE `lax.fori_loop` over
    a preorder node table (SMEM); per-node dynamic data is 8 scalars,
    and `lax.switch` over the node's depth selects a branch whose
    shapes (n, lm, cache row, CWRS tables) are static,
  * the recursion's dataflow becomes an explicit per-lane stack: split/
    swap/theta/fill/bits land in depth-indexed register stacks; child
    results are combined by "pop" events after deepest-level nodes
    (mid/side swaps become masked half-exchanges of the X window),
  * the tf/Hadamard band wrappers (haar1 + (de)interleave chains,
    bands.c:623/650) collapse into per-variant basis matrices applied
    on the MXU (`dot_general`, HIGHEST precision),
  * all lanes are [8, 128] stream tiles: 1024 streams per grid step,
    the full VPU tile on every per-lane op; packet bytes are fetched
    with the gather-free page sweep (rc_kernel.masked_reads),
  * the plan phase (fused_plan) is traced inline on the same lane
    tiles — it is pure per-lane arithmetic and shares the range-coder
    state dict with the tree.

Integer state (range coder, allocation, CWRS indices, collapse masks)
is bit-exact with the scalar decoder; float output (X, energies)
matches to ULP-level tolerance (the wrapper matmuls and Mosaic
transcendentals reassociate float ops; symbols never depend on floats).

Scope: mono, start=0, LM >= 2 (10/20 ms at 48 kHz; the 2.5/5 ms frames
keep the unrolled XLA path in celt_dec_fused, which compiles fine at
those sizes).  Loss/PLC falls back to the scalar path as before.

Reference: celt/celt_decoder.c:1209-1560, bands.c:973 (quant_partition),
bands.c:1245 (quant_band), bands.c:1589 (quant_all_bands), cwrs.c:467
(cwrsi), vq.c:104 (exp_rotation), rate.c:249 (interp_bits2pulses).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..celt import cwrs
from ..celt.modes import get_pulses
from ..ops import rc_kernel as K
from ..ops.rc_kernel import i32, u32, _sel, _ilog
from .celt_dec_fused import (
    DecTabs, fused_plan, _lit_lookup, _tree_sum, _isqrt, _frac_mul16,
    _bitexact_cos, _bitexact_log2tan, _compute_qn_vec, _sudiv,
    _exp_rotation_dec, _collapse_mask, _renormalise, _fill_interleave,
    _band_variants, _hadamard_perm, _lcg_tabs, _u_col, _v_row,
    BIT_DEINTERLEAVE_TABLE, QTHETA_OFFSET, SPREAD_AGGRESSIVE, BITRES,
    MAX_FINE_BITS, _U32_SAT)

f32 = jnp.float32
SH = (8, 128)                 # lane tile: 1024 streams
LANES = SH[0] * SH[1]
NMAX = 176


# ===================================================================== #
# host-side tables                                                      #
# ===================================================================== #

def _np_haar1(x, n0, stride):
    b, n = x.shape
    reg = n0 * stride
    head = x[:, :reg].reshape(b, n0 // 2, 2, stride)
    t = math.sqrt(0.5) * head
    y = np.stack([t[:, :, 0, :] + t[:, :, 1, :],
                  t[:, :, 0, :] - t[:, :, 1, :]], axis=2)
    out = x.copy()
    out[:, :reg] = y.reshape(b, reg)
    return out


def _np_deint_hadamard(x, n0, stride, hadamard):
    b, n = x.shape
    m = x.reshape(b, n0, stride).transpose(0, 2, 1)
    m = m[:, _hadamard_perm(stride, hadamard, False), :]
    return m.reshape(b, n)


def _np_int_hadamard(x, n0, stride, hadamard):
    b, n = x.shape
    m = x.reshape(b, stride, n0)
    m = m[:, _hadamard_perm(stride, hadamard, True), :]
    return m.transpose(0, 2, 1).reshape(b, n)


def _wrap_in_matrix(n, v):
    """lb transform of _quant_band_mono's input side as an (n, n)
    matrix: row i = f(e_i), so f(lb_row) = lb_row @ M."""
    x = np.eye(n, dtype=np.float64)
    for kk in range(v["recombine"]):
        x = _np_haar1(x, n >> kk, 1 << kk)
    bb = v["B0"] >> v["recombine"]
    n_b = (n // v["B0"]) << v["recombine"]
    for _ in range(v["tdiv"]):
        x = _np_haar1(x, n_b, bb)
        bb <<= 1
        n_b >>= 1
    if v["b0_final"] > 1:
        x = _np_deint_hadamard(x, v["n_b0"] >> v["recombine"],
                               v["b0_final"] << v["recombine"], v["long"])
    return x.astype(np.float32)


def _wrap_out_matrix(n, v):
    """x resynth transform (output side) as an (n, n) matrix."""
    x = np.eye(n, dtype=np.float64)
    bb = v["b0_final"]
    n_b = v["n_b0"]
    if bb > 1:
        x = _np_int_hadamard(x, n_b >> v["recombine"],
                             bb << v["recombine"], v["long"])
    for _ in range(v["tdiv"]):
        bb >>= 1
        n_b <<= 1
        x = _np_haar1(x, n_b, bb)
    for kk in range(v["recombine"]):
        x = _np_haar1(x, n >> kk, 1 << kk)
    return x.astype(np.float32)


@lru_cache(maxsize=None)
def _kfit(n: int) -> int:
    """Largest k whose PVQ codebook V(n, k) still fits in 32 bits."""
    k = 1
    while k < 128 and cwrs.pvq_v(n, k + 1) <= _U32_SAT:
        k += 1
    return k


def _halve(x, times: int):
    for _ in range(times):
        x = (x + 1) >> 1
    return x


# node SMEM fields
NF_DEPTH, NF_OFF, NF_ISV1, NF_NPOPS = 0, 1, 2, 3
NF_POP0 = 4                   # pop parent offsets (up to 4)
NF_STORE = 8                  # final v0 cm store flag
NF = 9


class KTabs(DecTabs):
    """DecTabs + node program + wrapper matrices for the kernel."""

    def __init__(self, fs: int, frame_size: int):
        super().__init__(fs, frame_size)
        assert self.lm >= 2, "kernel path targets LM >= 2 (10/20 ms)"
        m = self.M
        eB = [int(v) for v in self.eBands]
        self.band_n = [m * (eB[i + 1] - eB[i]) for i in range(self.nb)]
        self.band_base = [m * eB[i] for i in range(self.nb)]
        self.norm_rows = m * eB[self.nb - 1]
        self.nx_rows = m * eB[self.nb]
        assert all(n >= 4 for n in self.band_n)

        # ---- per-band static tree info ----
        self.band_depth = []
        self.band_node_base = []
        nodes = []
        for band in range(self.nb):
            n = self.band_n[band]
            # deepest level: first level where n_d <= 2 or lm_d == -1
            d = 0
            while (self.lm - d) != -1 and (n >> d) > 2:
                d += 1
            maxd = d
            self.band_depth.append(maxd)
            self.band_node_base.append(len(nodes))
            # preorder walk of the full static tree
            def walk(depth, off, is_v1, out):
                rec = [depth, off, is_v1, 0, 0, 0, 0, 0, 0]
                out.append(rec)
                if depth < maxd:
                    half = (n >> depth) >> 1
                    walk(depth + 1, off, 0, out)
                    walk(depth + 1, off + half, 1, out)
                return out
            band_nodes = walk(0, 0, 0, [])
            # pop events: after each deepest-level node, completions
            # chain while the completed node is a v1 child.
            # reconstruct parent links from preorder structure
            stack = []   # (node_idx, depth)
            parent = {}
            for idx, rec in enumerate(band_nodes):
                depth = rec[0]
                while stack and stack[-1][1] >= depth:
                    stack.pop()
                if stack:
                    parent[idx] = stack[-1][0]
                stack.append((idx, depth))
            for idx, rec in enumerate(band_nodes):
                if rec[0] != maxd:
                    continue
                pops = []
                cur = idx
                while rec[0] - len(pops) > 0 and band_nodes[cur][2] == 1:
                    p = parent[cur]
                    pops.append(band_nodes[p][1])   # parent off
                    cur = p
                rec[NF_NPOPS] = len(pops)
                for j, po in enumerate(pops):
                    rec[NF_POP0 + j] = po
                # after the chain, if the last completed node is a v0
                # child (not the root), its cm is stored for the parent
                if band_nodes[cur][0] > 0 and band_nodes[cur][2] == 0:
                    rec[NF_STORE] = 1
            nodes.extend(band_nodes)
        self.nodes = np.asarray(nodes, np.int32)
        self.n_nodes = len(nodes)

        # ---- wrapper matrices + variant data ----
        self.band_var = []
        rows = []
        self.wmat_off = []       # per band: list of (in_off, out_off)
        cur = 0
        for band in range(self.nb):
            n = self.band_n[band]
            variants = _band_variants(self, n)
            self.band_var.append(variants)
            offs = []
            for v in variants:
                wi = _wrap_in_matrix(n, v)
                wo = _wrap_out_matrix(n, v)
                ioff = None if np.allclose(wi, np.eye(n)) else cur
                if ioff is not None:
                    rows.append(wi)
                    cur += n
                ooff = None if np.allclose(wo, np.eye(n)) else cur
                if ooff is not None:
                    rows.append(wo)
                    cur += n
                offs.append((ioff, ooff))
            self.wmat_off.append(offs)
        if rows:
            wm = np.zeros((cur, NMAX), np.float32)
            r0 = 0
            for w in rows:
                wm[r0:r0 + w.shape[0], :w.shape[1]] = w
                r0 += w.shape[0]
            self.wmats = wm
        else:
            self.wmats = np.zeros((1, NMAX), np.float32)

        # per-(band, depth) possible interleave factors
        self.band_bvals = []
        for band in range(self.nb):
            root = sorted({v["b0_final"] for v in self.band_var[band]})
            per_depth = []
            for d in range(self.band_depth[band] + 1):
                per_depth.append(tuple(sorted({_halve(v, d)
                                               for v in root})))
            self.band_bvals.append(per_depth)

        # fold-range descriptors (quant_all_bands lowband selection)
        self.band_fold = []
        for i in range(self.nb):
            n = self.band_n[i]
            los = []
            for lo in range(1, i + 1):
                if not ((m * eB[lo] - m * (eB[lo + 1] - eB[lo]) >= 0
                         and lo != 0) or lo == 1):
                    continue
                eff = max(0, m * eB[lo] - n)
                fs_ = lo
                while True:
                    fs_ -= 1
                    if m * eB[fs_] <= eff:
                        break
                fe_ = lo - 1
                while True:
                    fe_ += 1
                    if not (fe_ < i and m * eB[fe_] < eff + n):
                        break
                los.append((lo, eff, fs_, fe_))
            self.band_fold.append(los)


# ===================================================================== #
# literal-table reg helpers                                             #
# ===================================================================== #

def _lit_u32(lits, idx):
    """lits[idx] (u32 python ints) via a select chain; idx i32 clipped
    by the caller."""
    out = jnp.full(idx.shape, np.uint32(lits[0]), u32)
    for t, v in enumerate(lits[1:], 1):
        out = _sel(idx == t, u32(np.uint32(v)), out)
    return out


def _cwrsi_regs(n: int, k, idx, kcap: int):
    """cwrsi (cwrs.c:467): codebook index -> list of n pulse regs.

    Register-form twin of celt_dec_fused._cwrsi with the per-step
    U(:, nj) columns unrolled as literal operands (Mosaic has no
    per-lane gather).  k: [sh] i32 >= 1; idx: [sh] u32."""
    i = idx
    ys = []
    if n > 2:
        for j in range(n - 2):
            nj = n - j
            col = _u_col(nj, kcap + 1)
            q_static = (min(cwrs.pvq_u(nj, nj), _U32_SAT)
                        if nj <= kcap + 1 else _U32_SAT)
            is_a = k >= nj
            kc = jnp.clip(k, 0, kcap + 1)
            col_k = _lit_u32(col, kc)
            col_k1 = _lit_u32(col, jnp.clip(k + 1, 0, kcap + 1))
            s = i >= col_k1
            izero = (~is_a) & (col_k <= i) & (i < col_k1)
            i1 = i - _sel(izero, col_k, _sel(s, col_k1, u32(0)))
            cnt = _tree_sum([(i1 >= u32(np.uint32(c))).astype(i32)
                             for c in col[:kcap + 1]])
            upper = _sel(is_a, _sel(u32(np.uint32(q_static)) > i1,
                                    nj - 1, k), k - 1)
            upper = jnp.maximum(upper, 0)
            k_new = jnp.clip(cnt - 1, 0, upper)
            p_fin = _lit_u32(col, jnp.clip(k_new, 0, kcap + 1))
            i = _sel(izero, i1, i1 - p_fin)
            val = k - k_new
            ys.append(_sel(izero, 0, _sel(s, -val, val)))
            k = _sel(izero, k, k_new)
    p = (2 * k + 1).astype(u32)
    s = i >= p
    i = i - _sel(s, p, u32(0))
    k0 = k
    k2 = ((i + 1) >> 1).astype(i32)
    i = i - _sel(k2 > 0, (2 * k2 - 1).astype(u32), u32(0))
    val = k0 - k2
    ys.append(_sel(s, -val, val))
    ys.append(_sel(i != 0, -k2, k2))
    return ys


def _decode_pulses_regs(d, buf, lens, n: int, kq, kcap: int, active):
    """decode_pulses: dec_uint(V(n, k)) + cwrsi -> list of n regs."""
    vrow = _v_row(n, kcap)
    ft = _lit_u32(vrow, jnp.clip(kq, 0, kcap))
    idx, d = K.rk_dec_uint(d, buf, lens, ft.astype(i32), active)
    return _cwrsi_regs(n, jnp.maximum(kq, 1), idx.astype(u32), kcap), d


# ===================================================================== #
# theta decode (port of _compute_theta_mono, static n2/lm2)             #
# ===================================================================== #

def _theta_decode(d, buf, lens, rb, tabs, band, n2: int, b, bb2, b0,
                  lm2: int, fill, active):
    pulse_cap = tabs.logN[band] + lm2 * (1 << BITRES)
    offset = (pulse_cap >> 1) - QTHETA_OFFSET
    qn = _compute_qn_vec(n2, b, offset, pulse_cap)
    tell0 = K.rk_tell_frac(d)
    has_theta = active & (qn != 1)
    uin = has_theta & (b0 > 1)
    th_u, d = K.rk_dec_uint(d, buf, lens, qn + 1, uin)
    tri = has_theta & (b0 <= 1)
    qh = qn >> 1
    ft = (qh + 1) * (qh + 1)
    fm, d = K.rk_decode(d, ft, tri)
    low = fm < ((qh * (qh + 1)) >> 1)
    th_lo = (_isqrt(8 * fm + 1) - 1) >> 1
    th_hi = (2 * (qn + 1)
             - _isqrt(8 * jnp.maximum(ft - fm - 1, 0) + 1)) >> 1
    th_t = _sel(low, th_lo, th_hi)
    fs_t = _sel(low, th_t + 1, qn + 1 - th_t)
    fl_t = _sel(low, (th_t * (th_t + 1)) >> 1,
                ft - (((qn + 1 - th_t) * (qn + 2 - th_t)) >> 1))
    d = K.rk_update(d, buf, lens, fl_t, fl_t + fs_t, ft, tri)
    itheta = _sel(uin, th_u, _sel(tri, th_t, 0))
    itheta = (itheta * 16384) // jnp.maximum(qn, 1)
    qalloc = K.rk_tell_frac(d) - tell0
    b = b - qalloc
    rb = rb - _sel(active, qalloc, 0)

    th0 = itheta == 0
    th1 = itheta == 16384
    imid = _sel(th0, 32767, _sel(th1, 0, _bitexact_cos(itheta)))
    iside = _sel(th0, 0, _sel(th1, 32767, _bitexact_cos(16384 - itheta)))
    delta_m = _frac_mul16(jnp.full_like(itheta, (n2 - 1) << 7),
                          _bitexact_log2tan(iside, imid))
    delta = _sel(th0, -16384, _sel(th1, 16384, delta_m))
    fill = _sel(active & th0, fill & ((1 << bb2) - 1), fill)
    fill = _sel(active & th1, fill & (((1 << bb2) - 1) << bb2), fill)
    return b, rb, fill, itheta, imid, iside, delta, d


# ===================================================================== #
# the per-band tree interpreter                                         #
# ===================================================================== #

def _tree_band(tabs: KTabs, band: int, nodes_ref, x_ref, lb_ref, buf,
               lens, d, rb, seed, spread, bb_root, lb_has, b_band,
               fill_band, active_band):
    """Run band `band`'s split tree as a fori_loop over its preorder
    node table.  x_ref rows [band_base, band_base+n) receive the
    pre-resynth X; returns (cm, d, rb, seed)."""
    n_root = tabs.band_n[band]
    maxd = tabs.band_depth[band]
    base = tabs.band_base[band]
    lm = tabs.lm
    nbase = tabs.band_node_base[band]
    n_nodes = (tabs.band_node_base[band + 1] if band + 1 < tabs.nb
               else tabs.n_nodes) - nbase

    # concrete-layout zeros: Mosaic layout unification across the
    # lax.switch branches can't relayout a computed vector to a splat
    # (replicated) layout, so every value stored into the carry must be
    # derived from an input rather than a literal constant
    zi = lens >> 31            # 0 for the nonneg byte lengths
    zb = zi != 0
    zf = zi.astype(f32)

    def make_branch(dd: int):
        nd = n_root >> dd
        lmd = lm - dd
        can_split = (lmd != -1) and (nd > 2)
        row = tabs.cache_rows[(lmd, band)]
        L = row[0]
        # pulses cap from the cache row, tightened to the 32-bit
        # codebook limit for this n (valid streams satisfy it by the
        # cache-table construction; saturated entries above are inert)
        kcap = min(int(get_pulses(L)), 128, _kfit(nd) + 1)
        bvals = tabs.band_bvals[band][dd]

        def branch(carry, off, isv1, pops, store_flag, npops):
            d, rb, seed, cm_cur, st = carry
            st = {k: list(v) for k, v in st.items()}
            # ---- enter params ----
            if dd == 0:
                active = active_band
                b = b_band
                gain = f32(1.0) + zf      # concrete layout (see above)
                fill = fill_band
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
                g0 = st["gain"][p] * _sel(swap, st["side"][p],
                                          st["mid"][p])
                g1 = st["gain"][p] * _sel(swap, st["mid"][p],
                                          st["side"][p])
                gain = jnp.where(isv1b, g1, g0)
                f0 = _sel(swap, st["fill"][p] >> bb, st["fill"][p])
                f1 = _sel(swap, st["fill"][p], st["fill"][p] >> bb)
                fill = jnp.where(isv1b, f1, f0)

            # ---- split decision + theta ----
            if can_split:
                thr = row[L] + 12
                split = active & (b > thr)
                fill_pre = _sel(bb == 1, (fill & 1) | (fill << 1), fill)
                bb2 = (bb + 1) >> 1
                n2 = nd >> 1
                (b2, rb, fill_s, itheta, imid, iside, delta,
                 d) = _theta_decode(d, buf, lens, rb, tabs, band, n2, b,
                                    bb2, bb, lmd - 1, fill_pre, split)
                mid = imid.astype(f32) * f32(1.0 / 32768.0)
                side = iside.astype(f32) * f32(1.0 / 32768.0)
                nonzero_th = (itheta & 0x3fff) != 0
                lm2 = lmd - 1
                d_hi = delta - (delta >> (4 - lm2))
                d_lo = jnp.minimum(0, delta + (n2 << BITRES >> (5 - lm2)))
                delta = _sel((bb > 1) & nonzero_th,
                             _sel(itheta > 8192, d_hi, d_lo), delta)
                mbits = jnp.maximum(0, jnp.minimum(b2, (b2 - delta) // 2))
                sbits = b2 - mbits
                swap_n = split & (mbits < sbits)
                # push
                st["split"][dd] = split.astype(i32)
                st["swap"][dd] = swap_n.astype(i32)
                st["gain"][dd] = gain
                st["mid"][dd] = mid
                st["side"][dd] = side
                st["fill"][dd] = fill_s
                st["mbits"][dd] = mbits
                st["sbits"][dd] = sbits
                st["itheta"][dd] = itheta
                st["rb0"][dd] = rb
                # lb halves exchange for swap lanes (children then read
                # their static halves)
                m = (split & swap_n)[None]
                wlo = lb_ref[pl.ds(off, n2)]
                whi = lb_ref[pl.ds(off + n2, n2)]
                lb_ref[pl.ds(off, n2)] = jnp.where(m, whi, wlo)
                lb_ref[pl.ds(off + n2, n2)] = jnp.where(m, wlo, whi)
            else:
                split = zb

            # ---- leaf ----
            leaf_act = active & ~split
            bm1 = b - 1
            rowlits = row[1:L + 1]
            c_lo = _tree_sum([(bm1 > r).astype(i32) for r in rowlits])
            lo = c_lo
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
            iy, d = _decode_pulses_regs(d, buf, lens, nd, kq, kcap, pvq)
            ryy = _tree_sum([(y * y).astype(f32) for y in iy])
            g = gain * jax.lax.rsqrt(jnp.maximum(ryy, f32(1e-30)))
            x_pvq = [y.astype(f32) * g for y in iy]
            x_pvq = _exp_rotation_dec(x_pvq, nd, bb, bvals, kq, spread,
                                      pvq)
            cm_pvq = _collapse_mask(iy, nd, bb, bvals, pvq)

            # q == 0: noise / fold
            nf = leaf_act & (kq == 0)
            cm_mask = ((u32(1) << bb.astype(u32)) - 1).astype(i32)
            fillm = fill & cm_mask
            act_nf = nf & (fillm != 0)
            fold = act_nf & lb_has
            noise = act_nf & ~fold
            a_p, c_s = _lcg_tabs(nd)
            lbw = lb_ref[pl.ds(off, nd)]
            x_nf = []
            for j in range(nd):
                sj = u32(np.uint32(a_p[j + 1])) * seed \
                    + u32(np.uint32(c_s[j + 1]))
                nval = (sj.astype(i32) >> 20).astype(f32)
                fval = lbw[j] + _sel((sj & u32(0x8000)) != 0,
                                     f32(1.0 / 256), f32(-1.0 / 256))
                x_nf.append(jnp.where(fold, fval, nval))
            seed = _sel(act_nf, u32(np.uint32(a_p[nd])) * seed
                        + u32(np.uint32(c_s[nd])), seed)
            x_nf = _renormalise(x_nf, nd, gain, act_nf)
            cm_nf = _sel(fold, fillm, _sel(noise, cm_mask, 0))

            x_leaf = jnp.stack(
                [jnp.where(pvq, xp, jnp.where(act_nf, xn, f32(0.0)))
                 for xp, xn in zip(x_pvq, x_nf)])
            cm_leaf = _sel(pvq, cm_pvq, cm_nf)
            win = x_ref[pl.ds(base + off, nd)]
            x_ref[pl.ds(base + off, nd)] = jnp.where(
                leaf_act[None], x_leaf, win)
            st["cmleaf"][dd] = cm_leaf
            cm_cur = cm_leaf

            # ---- pops (only deepest-level nodes complete subtrees) --
            if dd == maxd:
                for jj in range(maxd):
                    dp = dd - 1 - jj
                    do = jj < npops
                    n2p = (n_root >> dp) >> 1
                    bbp = _halve(bb_root, dp)
                    sw = st["swap"][dp] != 0
                    splitp = st["split"][dp] != 0
                    cm_x = _sel(sw, cm_cur, st["cm0"][dp])
                    cm_y = _sel(sw, st["cm0"][dp], cm_cur)
                    comb = cm_x | (cm_y << (bbp >> 1).astype(u32))
                    cm_p = _sel(splitp, comb, st["cmleaf"][dp])
                    poff = pops[jj]
                    m = ((splitp & sw) & do)[None]
                    wlo = x_ref[pl.ds(base + poff, n2p)]
                    whi = x_ref[pl.ds(base + poff + n2p, n2p)]
                    x_ref[pl.ds(base + poff, n2p)] = jnp.where(
                        m, whi, wlo)
                    x_ref[pl.ds(base + poff + n2p, n2p)] = jnp.where(
                        m, wlo, whi)
                    cm_cur = jnp.where(do, cm_p, cm_cur)
                # final v0 store: slot = dd - npops - 1
                for kslot in range(maxd):
                    flag = (store_flag == 1) & (kslot == dd - 1 - npops)
                    st["cm0"][kslot] = jnp.where(flag, cm_cur,
                                                 st["cm0"][kslot])
            return d, rb, seed, cm_cur, st
        return branch

    branches = [make_branch(dd) for dd in range(maxd + 1)]

    # split/swap masks are carried as i32 (0/1): Mosaic cannot
    # legalize scf.for/scf.if with vector<i1> carries
    st0 = dict(
        split=[zi] * maxd, swap=[zi] * maxd, gain=[zf] * maxd,
        mid=[zf] * maxd, side=[zf] * maxd, fill=[zi] * maxd,
        mbits=[zi] * maxd, sbits=[zi] * maxd, itheta=[zi] * maxd,
        rb0=[zi] * maxd, cm0=[zi] * maxd,
        cmleaf=[zi] * (maxd + 1))

    def body(t, carry):
        gi = nbase + t
        depth = nodes_ref[gi, NF_DEPTH]
        off = nodes_ref[gi, NF_OFF]
        isv1 = nodes_ref[gi, NF_ISV1]
        npops = nodes_ref[gi, NF_NPOPS]
        pops = tuple(nodes_ref[gi, NF_POP0 + j] for j in range(4))
        store_flag = nodes_ref[gi, NF_STORE]
        return jax.lax.switch(depth, branches, carry, off, isv1, pops,
                              store_flag, npops)

    carry = (d, rb, seed, zi, st0)
    d, rb, seed, cm_cur, _st = jax.lax.fori_loop(0, n_nodes, body, carry)
    return cm_cur, d, rb, seed


# ===================================================================== #
# whole-frame kernel body                                               #
# ===================================================================== #

def _apply_wrap(tabs: KTabs, wm_ref, band: int, vslot: int, x, out_side):
    """Apply the (band, variant) wrapper matrix to x [n, 8, 128]."""
    n = tabs.band_n[band]
    ioff, ooff = tabs.wmat_off[band][vslot]
    off = ooff if out_side else ioff
    if off is None:
        return x
    mat = wm_ref[off:off + n, :n]
    return jax.lax.dot_general(
        mat, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)


def _frame_kernel(tabs: KTabs, nodes_ref, wm_ref, buf_ref, lens_ref,
                  olde_ref, prevmin_ref, seed_ref,
                  x_ref, e_ref, ints_ref, pfg_ref, rng_ref,
                  norm_ref, lb_ref):
    nb = tabs.nb
    M = tabs.M
    lm = tabs.lm
    buf = buf_ref[:]
    lens = lens_ref[:]
    active_all = jnp.ones(SH, bool)

    with K.masked_reads():
        # ---- plan: header, coarse energy, tf, dynalloc, allocation,
        # fine energy (celt_decoder.c:1209-1462) ----
        d = K.rk_init(buf, lens)
        old_e = [olde_ref[i] for i in range(nb)]
        plan, d = fused_plan(d, buf, lens, tabs, old_e, active_all)
        live = plan["live"]
        total_bits8 = (lens * 8 << BITRES) - plan["anti_collapse_rsv"]

        # ---- quant_all_bands (bands.c:1589), node-program form ----
        balance = plan["balance"]
        seed = seed_ref[:]
        transient = plan["is_transient"]
        B_lanes = _sel(transient != 0, M, 1)
        spread = plan["spread"]
        coded_bands = plan["coded_bands"]
        pulses = plan["pulses"]
        collapse = []
        lowband_offset = jnp.zeros(SH, i32)
        update_lowband = jnp.ones(SH, bool)
        rb = jnp.zeros(SH, i32)

        for i in range(nb):
            n = tabs.band_n[i]
            base = tabs.band_base[i]
            tell = K.rk_tell_frac(d)
            if i != 0:
                balance = balance - tell
            remaining_bits = total_bits8 - tell - 1
            rb = remaining_bits
            in_coded = i <= coded_bands - 1
            den = jnp.minimum(3, jnp.maximum(coded_bands - i, 1))
            curr_balance = _sudiv(balance, den)
            b = _sel(in_coded,
                     jnp.clip(jnp.minimum(remaining_bits + 1,
                                          pulses[i] + curr_balance),
                              0, 16383), 0)

            eligible = (M * tabs.eBands[i] - n >= 0 and i != 0) or i == 1
            if eligible:
                upd = live & (update_lowband | (lowband_offset == 0))
                lowband_offset = _sel(upd, i, lowband_offset)

            tf_change = plan["tf_res"][i]
            fold_cond = live & (lowband_offset != 0) \
                & ((spread != SPREAD_AGGRESSIVE) | (B_lanes > 1)
                   | (tf_change < 0))
            lbw = jnp.zeros((n,) + SH, f32)
            x_cm = _sel(fold_cond, 0,
                        ((u32(1) << B_lanes.astype(u32)) - 1).astype(i32))
            for lo, eff, fs_, fe_ in tabs.band_fold[i]:
                mv = fold_cond & (lowband_offset == lo)
                cmv = jnp.zeros(SH, i32)
                fi = fs_
                while True:
                    cmv = cmv | collapse[fi]
                    fi += 1
                    if fi >= fe_:
                        break
                win = norm_ref[eff:eff + n]
                lbw = jnp.where(mv[None], win, lbw)
                x_cm = _sel(mv, cmv, x_cm)
            lb_has = fold_cond

            # wrapper-in: per-variant lb matmul + fill/bb selects
            variants = tabs.band_var[i]
            masks = [live & (transient == v["tv"])
                     & (tf_change == v["tfv"]) for v in variants]
            lb_f = lbw
            fill_f = x_cm
            bb_lanes = jnp.zeros(SH, i32)
            for vs, (v, mmask) in enumerate(zip(variants, masks)):
                lbv = _apply_wrap(tabs, wm_ref, i, vs, lbw, False)
                fillv = x_cm
                for _kk in range(v["recombine"]):
                    fillv = _fill_interleave(fillv)
                bbv = v["B0"] >> v["recombine"]
                for _t in range(v["tdiv"]):
                    fillv = fillv | (fillv << bbv)
                    bbv <<= 1
                lb_f = jnp.where(mmask[None], lbv, lb_f)
                fill_f = _sel(mmask, fillv, fill_f)
                bb_lanes = _sel(mmask, v["b0_final"], bb_lanes)
            lb_ref[pl.ds(0, n)] = lb_f

            # the split tree
            cm, d, rb, seed = _tree_band(
                tabs, i, nodes_ref, x_ref, lb_ref, buf, lens, d, rb,
                seed, spread, bb_lanes, lb_has, b, fill_f, live)

            # wrapper-out: x resynth matmul + cm bit transforms
            xw = x_ref[base:base + n]
            x_out = xw
            cm_out = cm
            for vs, (v, mmask) in enumerate(zip(variants, masks)):
                xv = _apply_wrap(tabs, wm_ref, i, vs, xw, True)
                cmv = cm
                bbv = v["b0_final"]
                for _t in range(v["tdiv"]):
                    bbv >>= 1
                    cmv = cmv | (cmv >> bbv)
                for _kk in range(v["recombine"]):
                    cmv = _lit_lookup(BIT_DEINTERLEAVE_TABLE,
                                      jnp.clip(cmv, 0, 15))
                bbv <<= v["recombine"]
                cmv = cmv & ((1 << bbv) - 1)
                x_out = jnp.where(mmask[None], xv, x_out)
                cm_out = _sel(mmask, cmv, cm_out)
            x_ref[base:base + n] = jnp.where(live[None], x_out, f32(0.0))
            collapse.append(_sel(live, cm_out & 0xFF, 0))
            if i != nb - 1:
                norm_ref[base:base + n] = jnp.where(
                    live[None], f32(math.sqrt(n)) * x_out,
                    norm_ref[base:base + n])
            balance = balance + pulses[i] + tell
            update_lowband = b > (n << BITRES)

        # ---- anti-collapse bit + energy finalise ----
        ac_rsv = plan["anti_collapse_rsv"]
        ac_on, d = K.rk_dec_bits(
            d, buf, lens, jnp.where(live & (ac_rsv > 0), 1, 0),
            live & (ac_rsv > 0))
        energies = list(plan["energies"])
        bits_left = lens * 8 - K.rk_tell(d)
        for prio in (0, 1):
            for i in range(nb):
                can = live & (bits_left >= 1) \
                    & (plan["ebits"][i] < MAX_FINE_BITS) \
                    & (plan["fine_priority"][i] == prio)
                q2, d = K.rk_dec_bits(d, buf, lens,
                                      jnp.where(can, 1, 0), can)
                offv = (q2.astype(f32) - f32(0.5)) \
                    * jnp.exp2(-(plan["ebits"][i] + 1).astype(f32))
                energies[i] = _sel(can, energies[i] + offv, energies[i])
                bits_left = bits_left - can.astype(i32)

        # ---- anti-collapse (bands.c:259) ----
        do_ac = live & (ac_on != 0)
        kk = 1 << lm
        for i in range(nb):
            n0 = tabs.band_n[i] >> lm
            base = tabs.band_base[i]
            nband = tabs.band_n[i]
            depth = ((1 + pulses[i]) // n0) >> lm
            thresh = f32(0.5) * jnp.exp2(f32(-0.125) * depth.astype(f32))
            sqrt_1 = f32(1.0 / math.sqrt(n0 << lm))
            ediff = energies[i] - prevmin_ref[i]
            ediff = jnp.maximum(f32(0.0), ediff)
            r = f32(2.0) * jnp.exp2(-ediff)
            if lm == 3:
                r = r * f32(1.41421356)
            r = jnp.minimum(thresh, r) * sqrt_1
            a_p, c_s = _lcg_tabs(n0)
            seg = x_ref[base:base + nband]          # [n0*kk, 8, 128]
            seg4 = seg.reshape(n0, kk, *SH)
            any_miss = jnp.zeros(SH, bool)
            cols = []
            for kb in range(kk):
                miss = do_ac & (((collapse[i] >> kb) & 1) == 0)
                any_miss = any_miss | miss
                vals = []
                for j in range(n0):
                    sj = u32(np.uint32(a_p[j + 1])) * seed \
                        + u32(np.uint32(c_s[j + 1]))
                    v = _sel((sj & u32(0x8000)) != 0, r, -r)
                    vals.append(v)
                inj = jnp.stack(vals)                # [n0, 8, 128]
                cols.append(jnp.where(miss[None], inj, seg4[:, kb]))
                seed = _sel(miss, u32(np.uint32(a_p[n0])) * seed
                            + u32(np.uint32(c_s[n0])), seed)
            seg_new = jnp.stack(cols, axis=1).reshape(nband, *SH)
            e2 = jnp.sum(seg_new * seg_new, axis=0) + f32(1e-15)
            gr = jax.lax.rsqrt(e2)
            renorm = any_miss
            seg_out = jnp.where(renorm[None], seg_new * gr[None],
                                jnp.where(do_ac[None], seg_new, seg))
            x_ref[base:base + nband] = seg_out

        # ---- outputs ----
        for i in range(nb):
            e_ref[i] = energies[i]
        ints_ref[0] = plan["silence"]
        ints_ref[1] = plan["is_transient"]
        ints_ref[2] = plan["intra"]
        ints_ref[3] = ac_on
        ints_ref[4] = plan["pf_pitch"]
        ints_ref[5] = plan["pf_tapset"]
        ints_ref[6] = d["error"]
        ints_ref[7] = K.rk_tell(d)
        pfg_ref[:] = plan["pf_gain"]
        rng_ref[:] = d["rng"]


# ===================================================================== #
# pallas_call wrapper                                                   #
# ===================================================================== #

def build_frame_fn(tabs: KTabs, W: int, R: int, interpret: bool = False):
    """Returns fn(buf [W,R,128] i32, lens [R,128] i32,
    old_e [nb,R,128] f32, prevmin [nb,R,128] f32, seed [R,128] u32)
    -> dict(X [NX,R,128], energies [nb,R,128], ints [8,R,128],
    pf_gain [R,128], rng [R,128])."""
    assert R % 8 == 0
    nb = tabs.nb
    NX = tabs.nx_rows
    grid = (R // 8,)
    nodes = jnp.asarray(tabs.nodes)
    wmats = jnp.asarray(tabs.wmats)
    WR = tabs.wmats.shape[0]

    kern = partial(_frame_kernel, tabs)

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tabs.n_nodes, NF), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((WR, NMAX), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 8, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 8, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 8, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NX, 8, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 8, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NX, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tabs.norm_rows, 8, 128), jnp.float32),
            pltpu.VMEM((NMAX, 8, 128), jnp.float32),
        ],
        # the 20 ms table set (wrapper matrices + X/norm windows) tops
        # the default 16M scoped-vmem budget; v5e has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(buf, lens, old_e, prevmin, seed):
        x, e, ints, pfg, rng = call(nodes, wmats, buf, lens, old_e,
                                    prevmin, seed)
        return dict(X=x, energies=e, silence=ints[0],
                    is_transient=ints[1], intra=ints[2],
                    anti_collapse_on=ints[3], pf_pitch=ints[4],
                    pf_tapset=ints[5], error=ints[6], tell=ints[7],
                    pf_gain=pfg, rng=rng)
    return fn


# ===================================================================== #
# production wrapper: packets -> PCM with the kernel symbol pass        #
# ===================================================================== #

def kernel_celt_decode_to_pcm(buf, lens, state, tabs: KTabs, frame_fn):
    """One fully-on-device frame at 10/20 ms: the Pallas symbol kernel
    + the XLA synthesis stage (IMDCT/TDAC, postfilter, deemphasis).

    buf: [W, R, 128] packed words; lens: [R, 128]; state: the
    fused_celt_init_state dict (B = R*128 lanes, [B]-shaped leaves).
    Mirrors celt_dec_fused.fused_celt_decode_to_pcm
    (celt_decoder.c:1209-1614); returns (pcm [B, 1, N], new state,
    err [B])."""
    from .batched_decode import decode_step
    from ..celt.tables import COMB_GAINS, COMBFILTER_MINPERIOD

    r, lanes = lens.shape
    bsz = r * lanes
    nb = tabs.nb

    def to_rl(v):                      # [B] -> [R, 128]
        return v.reshape(r, lanes)

    def to_b(v):                       # [R, 128] -> [B]
        return v.reshape(bsz)

    old_e = jnp.stack([to_rl(e) for e in state["old_e"]])
    prevmin = jnp.stack([to_rl(jnp.minimum(p1, p2)) for p1, p2 in
                         zip(state["prev1"], state["prev2"])])
    out = frame_fn(buf, lens, old_e, prevmin, to_rl(state["seed"]))

    err = to_b(out["error"]) != 0
    silence = to_b(out["silence"]) != 0
    transient = to_b(out["is_transient"]) != 0
    energies = [to_b(out["energies"][i]) for i in range(nb)]

    n_full = tabs.mode.shortMdctSize << tabs.lm
    x = out["X"].reshape(tabs.nx_rows, bsz).T
    x = jnp.pad(x, ((0, 0), (0, n_full - x.shape[1])))[:, None, :]
    e_arr = jnp.stack(energies, axis=-1)[:, None, :]

    minp = COMBFILTER_MINPERIOD
    pf_pitch = to_b(out["pf_pitch"])
    pf_gain = to_b(out["pf_gain"])
    pf_tapset = to_b(out["pf_tapset"])
    pp = jnp.maximum(state["pf_period"], minp)
    ppo = jnp.maximum(state["pf_period_old"], minp)
    periods = jnp.stack([ppo, pp, jnp.maximum(pf_pitch, minp)],
                        axis=-1).astype(jnp.int32)
    comb = jnp.asarray(np.asarray(COMB_GAINS, np.float32))
    gains3 = jnp.stack([state["pf_gain_old"], state["pf_gain"],
                        pf_gain], axis=-1)
    tapsets3 = jnp.stack([state["pf_tapset_old"], state["pf_tapset"],
                          pf_tapset], axis=-1)
    tgains = gains3[..., None] * comb[tapsets3]

    pcm, dsp = decode_step(x, e_arr, transient, silence, periods,
                           tgains, state["dsp"], fs=tabs.mode.Fs,
                           frame_size=n_full, lm=tabs.lm, channels=1)

    e_sil = [_sel(silence, f32(-28.0), e) for e in energies]
    prev1 = state["prev1"]
    prev2 = state["prev2"]
    new_prev2 = [_sel(transient, p2, p1) for p1, p2 in zip(prev1, prev2)]
    new_prev1 = [_sel(transient, jnp.minimum(p1, e), e)
                 for p1, e in zip(prev1, e_sil)]
    new_state = dict(
        old_e=e_sil, prev1=new_prev1, prev2=new_prev2,
        seed=to_b(out["rng"]),
        pf_period_old=pf_pitch, pf_gain_old=pf_gain,
        pf_tapset_old=pf_tapset,
        pf_period=pf_pitch, pf_gain=pf_gain, pf_tapset=pf_tapset,
        dsp=dsp)
    return pcm, new_state, err


class KernelCeltDecoder:
    """Packets-in -> PCM-out mono CELT decoder with the Pallas symbol
    kernel (the 10/20 ms production path; FusedCeltDecoder keeps the
    unrolled-XLA path for 2.5/5 ms)."""

    def __init__(self, batch: int, fs: int = 48000,
                 frame_size: int = 960, max_payload: int = 384):
        assert batch % LANES == 0, "batch must be a multiple of 1024"
        self.batch = batch
        self.R = batch // 128
        self.tabs = KTabs(fs, frame_size)
        self.P = (max_payload + 3) // 4 * 4
        self.W = self.P // 4
        from .celt_dec_fused import fused_celt_init_state
        self.state = fused_celt_init_state(batch, self.tabs)
        frame_fn = build_frame_fn(self.tabs, self.W, self.R)
        self._step = jax.jit(
            lambda b, l, s: kernel_celt_decode_to_pcm(b, l, s,
                                                      self.tabs,
                                                      frame_fn))

    def pack(self, payloads):
        bufb = np.zeros((self.batch, self.P), np.uint32)
        lens = np.zeros(self.batch, np.int32)
        for i, p in enumerate(payloads):
            a = np.frombuffer(p, np.uint8)
            bufb[i, :len(a)] = a
            lens[i] = len(a)
        words = K.pack_words(bufb, self.P)        # [W, B]
        return (words.reshape(self.W, self.R, 128),
                lens.reshape(self.R, 128))

    def decode(self, payloads):
        buf, lens = self.pack(payloads)
        pcm, self.state, err = self._step(jnp.asarray(buf),
                                          jnp.asarray(lens), self.state)
        return np.asarray(pcm), np.asarray(err)

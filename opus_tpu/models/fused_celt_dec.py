"""Fully fused on-device CELT decoder: packets in, symbol tensors out,
with no host round trips.

This is the end state of the SURVEY.md §7 design: the whole decode —
range decoding, coarse/fine energy, tf, dynalloc, allocation, PVQ/CWRS,
band-split recursion with folding and anti-collapse — runs as masked
[B]-lane vector ops on the TPU (opus_tpu/ops/range_vec.py is the coder),
so thousands of streams decode per dispatch with the packets resident in
HBM.  Scope: mono, start=0, end=nbEBands, no loss handling (PLC falls
back to the scalar path).  Data-dependent loop bounds that valid streams
cannot exceed are enforced with masked iteration caps; a stream that
would exceed one sets its `error` lane and must be re-decoded on the
scalar path.

The scalar Python decoder / native C pass are the bit-exact oracles
Reference pipeline:
celt_decode_with_ec celt/celt_decoder.c:1619, quant_bands.c unquant_*,
rate.c:372 interp_bits2pulses, bands.c:1589 quant_all_bands,
cwrs.c:467 cwrsi, vq.c:621 alg_unquant, laplace.c ec_laplace_decode.

STATUS (work in progress): the planning pass below —
header/silence/postfilter, coarse energy (vectorized Laplace), tf,
dynalloc, trim, the full interp_bits2pulses/compute_allocation, and
fine energy — is assembled end-to-end in `fused_celt_plan`, with a
symbol-exactness test against the scalar decoder
(tests/test_fused_celt_plan.py, opt-in via
OPUS_TPU_RUN_FUSED_CELT_PLAN=1: the graph currently triggers a
pathological XLA CPU compile, see COMPONENTS.md round-3 item 2).  The
remaining stages (quant_all_bands split recursion with CWRS via the
dense U/V tables, anti-collapse, energy finalise) still route through
the native C symbol pass (opus_tpu/native/celt_dec.c).  Nothing here is
wired into the public decoders yet."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..celt.modes import mode_create
from ..celt import cwrs
from ..celt.tables import E_PROB_MODEL
from ..ops import range_vec as V
from ..ops.range_vec import i32, u32, _sel

BITRES = 3
MAX_FINE_BITS = 8
FINE_OFFSET = 21
QTHETA_OFFSET = 4
ALLOC_STEPS = 6
SPREAD_NONE = 0
SPREAD_NORMAL = 2
SPREAD_AGGRESSIVE = 3
LAPLACE_CAP = 40        # masked-iteration cap; overflow sets error

PRED_COEF = (29440 / 32768., 26112 / 32768., 21248 / 32768.,
             16384 / 32768.)
BETA_COEF = (30147 / 32768., 22282 / 32768., 12124 / 32768., 6554 / 32768.)
BETA_INTRA = 4915 / 32768.
SMALL_ENERGY_ICDF = np.array([2, 1, 0], np.uint8)
TRIM_ICDF = np.array([126, 124, 119, 109, 87, 41, 19, 9, 4, 2, 0],
                     np.uint8)
SPREAD_ICDF = np.array([25, 23, 2, 0], np.uint8)
TAPSET_ICDF = np.array([2, 1, 0], np.uint8)
TF_SELECT_TABLE = np.array([
    [0, -1, 0, -1, 0, -1, 0, -1],
    [0, -1, 0, -2, 1, 0, 1, -1],
    [0, -2, 0, -3, 2, 0, 1, -1],
    [0, -2, 0, -3, 3, 0, 1, -1]], np.int32)

_MAX_N = 208
_MAX_K = 132


def _build_uv():
    """U(n, k) and V(n, k) tables as dense [MAX_N, MAX_K] uint32.

    Entries beyond the 32-bit codebook range are clamped: CELT only ever
    uses (n, k) with V(n, k) < 2^32 (vq.c caps pulses accordingly)."""
    cap = 1 << 32
    u = np.zeros((_MAX_N, _MAX_K), np.uint32)
    v = np.zeros((_MAX_N, _MAX_K - 1), np.uint32)
    for n in range(_MAX_N):
        for k in range(_MAX_K):
            un = min(cwrs.pvq_u(n, k), cap - 1)
            u[n, k] = un
            if k > 0:
                v[n, k - 1] = min(int(u[n, k - 1]) + un, cap - 1)
    return u, v


_U_NP, _V_NP = _build_uv()


def _get_pulses_np(i):
    return i if i < 8 else (8 + (i & 7)) << ((i >> 3) - 1)


class _ModeTabs:
    """Static per-(mode, LM) tables used by the fused decoder."""

    def __init__(self, fs: int, frame_size: int):
        mode = mode_create(fs, frame_size)
        self.mode = mode
        lm = 0
        while mode.shortMdctSize << lm != frame_size:
            lm += 1
        self.lm = lm
        m = 1 << lm
        self.M = m
        nb = mode.nbEBands
        self.nb = nb
        self.eBands = np.asarray(mode.eBands[:nb + 1], np.int32)
        self.width = (self.eBands[1:] - self.eBands[:-1]) * m
        self.logN = np.asarray(mode.logN[:nb], np.int32)
        self.allocV = np.asarray(mode.allocVectors, np.uint8).reshape(
            mode.nbAllocVectors, nb).astype(np.int32)
        # caps (init_caps, C=1)
        caps8 = np.asarray(mode.cache.caps, np.uint8)
        self.caps = np.array(
            [(int(caps8[lm * 2 * nb + i]) + 64) * (self.width[i]) >> 2
             for i in range(nb)], np.int32)
        # bits cache rows per (band, lm_node); lm_node in [-1..lm]
        idx = np.asarray(mode.cache.index, np.int16).reshape(-1, nb)
        bits_tab = np.asarray(mode.cache.bits, np.uint8)
        self.cache_rows = {}
        for lmn in range(-1, lm + 1):
            for band in range(nb):
                off = int(idx[lmn + 1, band])
                ln = int(bits_tab[off])
                row = bits_tab[off:off + ln + 1].astype(np.int32)
                self.cache_rows[(lmn, band)] = row
        self.e_prob = np.zeros((2, 42), np.int32)
        for intra in range(2):
            self.e_prob[intra] = np.asarray(E_PROB_MODEL[lm][intra],
                                            np.int32)


def _bits2pulses(row: np.ndarray, bits):
    """Vectorized bits2pulses: 6-step binary search over the static
    cache row (reference: celt/rate.h, celt_dec.c:371)."""
    rowj = jnp.asarray(row)
    lo = jnp.zeros_like(bits)
    hi = jnp.full_like(bits, int(row[0]))
    bm1 = bits - 1
    for _ in range(6):
        mid = (lo + hi + 1) >> 1
        ge = rowj[mid] >= bm1
        hi = _sel(ge, mid, hi)
        lo = _sel(ge, lo, mid)
    lo_val = _sel(lo == 0, -1, rowj[lo])
    return _sel(bm1 - lo_val <= rowj[hi] - bm1, lo, hi)


def _pulses2bits(row: np.ndarray, pulses):
    rowj = jnp.asarray(row)
    return _sel(pulses == 0, 0, rowj[jnp.clip(pulses, 0, len(row) - 1)] + 1)


_GET_PULSES_NP = np.array([_get_pulses_np(i) for i in range(64)], np.int32)


def _laplace_decode_vec(d: V.RD, buf, lens, fs0, decay, active):
    """Vectorized ec_laplace_decode (laplace.c); fs0/decay: [B] i32."""
    fm, d = V.rd_decode(d, jnp.full_like(fs0, 32768), active)
    val = jnp.zeros_like(fm)
    fl = jnp.zeros_like(fm)
    fs = fs0
    ge = active & (fm >= fs0)
    val = _sel(ge, 1, 0)
    fl = _sel(ge, fs0, 0)
    ft1 = ((32768 - 2 * 16 - fs0) * (16384 - decay)) >> 15
    fs = _sel(ge, ft1 + 1, fs)
    def _lap_step(carry, _):
        fs, fl, val, running = carry
        cond = running & (fs > 1) & (fm >= fl + 2 * fs)
        fs2 = fs * 2
        fs = _sel(cond, (((fs2 - 2) * decay) >> 15) + 1, fs)
        fl = _sel(cond, fl + fs2, fl)
        val = _sel(cond, val + 1, val)
        return (fs, fl, val, cond), None

    (fs, fl, val, _run), _ = jax.lax.scan(
        _lap_step, (fs, fl, val, ge), None, length=LAPLACE_CAP)
    # cap check: if still running, flag error
    still = ge & (fs > 1) & (fm >= fl + 2 * fs)
    overflow = still
    di = _sel(ge & (fs <= 1), (fm - fl) >> 1, 0)
    val = val + di
    fl = fl + 2 * di
    neg = ge & (fm < fl + fs)
    val = _sel(ge, _sel(neg, -val, val), 0)
    fl = _sel(ge & ~neg, fl + fs, fl)
    fh = jnp.minimum(fl + fs, 32768)
    d = V.rd_update(d, buf, lens, fl, fh,
                    jnp.full_like(fl, 32768), active)
    d = d._replace(error=d.error | (overflow & active).astype(i32))
    return val, d

# ===================================================================== #
# header + energies + allocation (the "planning" symbol pass)           #
# ===================================================================== #

def _coarse_energy(d: V.RD, buf, lens, tabs: _ModeTabs, old_e, intra,
                   total_bits, active):
    """unquant_coarse_energy (quant_bands.c; celt_dec.c:255), mono."""
    lm = tabs.lm
    coef = _sel(intra.astype(bool), 0.0, PRED_COEF[lm])
    beta = _sel(intra.astype(bool), BETA_INTRA, BETA_COEF[lm])
    eprob = jnp.asarray(tabs.e_prob)          # [2, 42]
    intra_i = intra.astype(i32)
    prev = jnp.zeros(old_e.shape[0], jnp.float64)
    for i in range(tabs.nb):
        tell = V.rd_tell(d)
        big = active & (total_bits - tell >= 15)
        med = active & ~big & (total_bits - tell >= 2)
        tiny = active & ~big & ~med & (total_bits - tell >= 1)
        pi = 2 * min(i, 20)
        fs0 = eprob[intra_i, pi] << 7
        decay = eprob[intra_i, pi + 1] << 6
        qi_l, d = _laplace_decode_vec(d, buf, lens, fs0, decay, big)
        s_m, d = V.rd_dec_icdf(d, buf, lens, SMALL_ENERGY_ICDF, 2, med)
        qi_m = (s_m >> 1) ^ -(s_m & 1)
        b_t, d = V.rd_dec_bit_logp(d, buf, lens, 1, tiny)
        qi = _sel(big, qi_l, _sel(med, qi_m, _sel(tiny, -b_t, -1)))
        q = qi.astype(jnp.float64)
        old = jnp.maximum(old_e[:, i], -9.0)
        new_e = coef * old + prev + q
        old_e = old_e.at[:, i].set(_sel(active, new_e, old_e[:, i]))
        prev = _sel(active, prev + q - beta * q, prev)
    return old_e, d


def _tf_decode(d: V.RD, buf, lens, tabs: _ModeTabs, is_transient,
               total_bits, active):
    """tf_decode (celt_dec.c:333)."""
    lm = tabs.lm
    tsel = jnp.asarray(TF_SELECT_TABLE[lm])
    budget = total_bits
    tell = V.rd_tell(d)
    logp0 = _sel(is_transient, 2, 4)
    tf_select_rsv = (lm > 0) & (tell + logp0 + 1 <= budget)
    budget = budget - tf_select_rsv.astype(i32)
    curr = jnp.zeros_like(tell)
    tf_changed = jnp.zeros_like(tell)
    tf_res = []
    for i in range(tabs.nb):
        logp = logp0 if i == 0 else _sel(is_transient, 4, 5)
        can = active & (tell + logp <= budget)
        # per-stream logp: decode both variants masked (values 2/4 or 4/5)
        lo_logp = 2 if i == 0 else 4
        hi_logp = 4 if i == 0 else 5
        b_lo, d = V.rd_dec_bit_logp(d, buf, lens, lo_logp,
                                    can & is_transient.astype(bool)
                                    if i == 0 else
                                    can & is_transient.astype(bool))
        b_hi, d = V.rd_dec_bit_logp(d, buf, lens, hi_logp,
                                    can & ~is_transient.astype(bool))
        bit = _sel(is_transient.astype(bool), b_lo, b_hi)
        curr = _sel(can, curr ^ bit, curr)
        tell = V.rd_tell(d)
        tf_changed = tf_changed | curr
        tf_res.append(curr)
    it4 = 4 * is_transient.astype(i32)
    want = tsel[it4 + 0 + tf_changed] != tsel[it4 + 2 + tf_changed]
    sel_bit, d = V.rd_dec_bit_logp(d, buf, lens, 1,
                                   active & tf_select_rsv & want)
    tf_select = sel_bit
    tf = jnp.stack(tf_res, axis=1)            # [B, nb]
    out = tsel[it4[:, None] + 2 * tf_select[:, None] + tf]
    return out, d


def _dynalloc(d: V.RD, buf, lens, tabs: _ModeTabs, total_bits,
              nbytes: int, active):
    """dynalloc boost decode (celt_dec.c:1646); returns (offsets [B, nb],
    trim [B], state)."""
    nb = tabs.nb
    b = d.rng.shape[0]
    total_bits8 = jnp.full((b,), total_bits << BITRES, i32) \
        if np.isscalar(total_bits) else (total_bits << BITRES)
    tellf = V.rd_tell_frac(d)
    dynalloc_logp = jnp.full((b,), 6, i32)
    offsets = jnp.zeros((b, nb), i32)
    for i in range(nb):
        width = int(tabs.width[i])
        quanta = min(width << BITRES, max(6 << BITRES, width))
        cap_i = int(tabs.caps[i])
        trips = min((cap_i + quanta - 1) // quanta,
                    (nbytes * 8 << BITRES) // quanta + 1)

        # masked trip loop as a scan (keeps the graph small; the bit
        # decode takes a PER-LANE logp, so one read covers all streams)
        def _trip(carry, _):
            d, tellf, boost, tb8, loop_logp, running = carry
            can = running & (tellf + (loop_logp << BITRES) < tb8) \
                & (boost < cap_i)
            flag, d = V.rd_dec_bit_logp(
                d, buf, lens, loop_logp.astype(u32), can)
            tellf = V.rd_tell_frac(d)
            got = can & (flag != 0)
            boost = _sel(got, boost + quanta, boost)
            tb8 = _sel(got, tb8 - quanta, tb8)
            loop_logp = _sel(got, jnp.ones_like(loop_logp), loop_logp)
            return (d, tellf, boost, tb8, loop_logp, got), None

        carry = (d, tellf, jnp.zeros((b,), i32), total_bits8,
                 dynalloc_logp, active)
        (d, tellf, boost, total_bits8, _lp, _run), _ = jax.lax.scan(
            _trip, carry, None, length=trips)
        offsets = offsets.at[:, i].set(boost)
        dynalloc_logp = _sel(boost > 0,
                             jnp.maximum(dynalloc_logp - 1, 2),
                             dynalloc_logp)
    can_trim = active & (tellf + (6 << BITRES) <= total_bits8)
    trim_v, d = V.rd_dec_icdf(d, buf, lens, TRIM_ICDF, 7, can_trim)
    trim = _sel(can_trim, trim_v, 5)
    return offsets, trim, d


def _compute_allocation(d: V.RD, buf, lens, tabs: _ModeTabs, offsets,
                        trim, total,
                        active):
    """compute_allocation, mono decode (celt_dec.c:556)."""
    nb = tabs.nb
    b = total.shape[0]
    eB = tabs.eBands
    total = jnp.maximum(total, 0)
    skip_rsv = _sel(total >= (1 << BITRES), 1 << BITRES, 0)
    total = total - skip_rsv
    widths = (eB[1:] - eB[:-1]).astype(np.int32)
    thresh_np = np.maximum((3 * widths << tabs.lm << BITRES) >> 4,
                           1 << BITRES)
    thresh = jnp.broadcast_to(jnp.asarray(thresh_np), (b, nb))
    trim_off = ((widths[None, :] * (trim[:, None] - 5 - tabs.lm)
                 * (nb - 1 - np.arange(nb))[None, :]
                 * (1 << (tabs.lm + BITRES))) >> 6)
    one_wide = (widths << tabs.lm) == 1
    trim_off = trim_off - _sel(jnp.asarray(one_wide)[None, :],
                               1 << BITRES, 0)
    capj = jnp.broadcast_to(jnp.asarray(tabs.caps), (b, nb))
    allocV = jnp.asarray(tabs.allocV)        # [nv, nb]
    wj = jnp.asarray(widths)

    lo = jnp.ones((b,), i32)
    hi = jnp.full((b,), tabs.allocV.shape[0] - 1, i32)
    for _ in range(6):   # ilog2(nbAllocVectors=11) iterations suffice
        go = lo <= hi
        mid = (lo + hi) >> 1
        psum = jnp.zeros((b,), i32)
        done = jnp.zeros((b,), bool)
        for j in range(nb - 1, -1, -1):
            bitsj = (wj[j] * allocV[mid, j]) << tabs.lm >> 2
            bitsj = _sel(bitsj > 0,
                         jnp.maximum(bitsj + trim_off[:, j], 0), bitsj)
            bitsj = bitsj + offsets[:, j]
            use = (bitsj >= thresh[:, j]) | done
            psum = psum + _sel(use, jnp.minimum(bitsj, capj[:, j]),
                               _sel(bitsj >= (1 << BITRES),
                                    1 << BITRES, 0))
            done = done | use
        over = psum > total
        hi = _sel(go & over, mid - 1, hi)
        lo = _sel(go & ~over, mid + 1, lo)
    hi_f = lo
    lo_f = lo - 1
    bits1 = jnp.zeros((b, nb), i32)
    bits2 = jnp.zeros((b, nb), i32)
    skip_start = jnp.zeros((b,), i32)
    nv = tabs.allocV.shape[0]
    for j in range(nb):
        b1 = (wj[j] * allocV[jnp.clip(lo_f, 0, nv - 1), j]) \
            << tabs.lm >> 2
        b2_cap = capj[:, j]
        b2_tab = (wj[j] * allocV[jnp.clip(hi_f, 0, nv - 1), j]) \
            << tabs.lm >> 2
        b2 = _sel(hi_f >= nv, b2_cap, b2_tab)
        b1 = _sel(b1 > 0, jnp.maximum(b1 + trim_off[:, j], 0), b1)
        b2 = _sel(b2 > 0, jnp.maximum(b2 + trim_off[:, j], 0), b2)
        b1 = b1 + _sel(lo_f > 0, offsets[:, j], 0)
        b2 = b2 + offsets[:, j]
        skip_start = _sel(offsets[:, j] > 0,
                          jnp.full_like(skip_start, j), skip_start)
        b2 = jnp.maximum(b2 - b1, 0)
        bits1 = bits1.at[:, j].set(b1)
        bits2 = bits2.at[:, j].set(b2)
    # NOTE: skip_start is per stream but the skip loop below uses a
    # static python range; pass the dynamic value into the masked loop
    return _interp_vec(d, buf, lens, tabs, bits1, bits2, thresh, capj,
                       total, skip_rsv, skip_start, active)


def _interp_vec(d, buf, lens, tabs, bits1, bits2, thresh, capj, total,
                skip_rsv,
                skip_start, active):
    """interp_bits2pulses with a dynamic skip_start lane."""
    nb = tabs.nb
    b = total.shape[0]
    alloc_floor = 1 << BITRES
    eB = tabs.eBands
    lo = jnp.zeros((b,), i32)
    hi = jnp.full((b,), 1 << ALLOC_STEPS, i32)
    for _ in range(ALLOC_STEPS):
        mid = (lo + hi) >> 1
        psum = jnp.zeros((b,), i32)
        done = jnp.zeros((b,), bool)
        for j in range(nb - 1, -1, -1):
            tmp = bits1[:, j] + ((mid * bits2[:, j]) >> ALLOC_STEPS)
            use = (tmp >= thresh[:, j]) | done
            psum = psum + _sel(use, jnp.minimum(tmp, capj[:, j]),
                               _sel(tmp >= alloc_floor, alloc_floor, 0))
            done = done | use
        over = psum > total
        hi = _sel(over, mid, hi)
        lo = _sel(over, lo, mid)
    psum = jnp.zeros((b,), i32)
    done = jnp.zeros((b,), bool)
    bits = jnp.zeros((b, nb), i32)
    for j in range(nb - 1, -1, -1):
        tmp = bits1[:, j] + ((lo * bits2[:, j]) >> ALLOC_STEPS)
        low = (tmp < thresh[:, j]) & ~done
        tmp2 = _sel(low, _sel(tmp >= alloc_floor, alloc_floor, 0), tmp)
        done = done | ~low
        tmp2 = jnp.minimum(tmp2, capj[:, j])
        bits = bits.at[:, j].set(tmp2)
        psum = psum + tmp2

    coded_bands = jnp.full((b,), nb, i32)
    finished = ~active
    eBj = jnp.asarray(eB.astype(np.int32))
    for j in range(nb - 1, 0, -1):
        is_cur = (~finished) & (coded_bands == j + 1) & (j > skip_start)
        at_skip = (~finished) & (coded_bands == j + 1) & (j <= skip_start)
        finished = finished | at_skip
        left = total - psum
        den = int(eB[j + 1] - eB[0])
        percoeff = left // den
        leftr = left - den * percoeff
        rem = jnp.maximum(leftr - (int(eB[j]) - int(eB[0])), 0)
        band_width = int(eB[j + 1] - eB[j])
        band_bits = bits[:, j] + percoeff * band_width + rem
        th = jnp.maximum(thresh[:, j], alloc_floor + (1 << BITRES))
        reads = is_cur & (band_bits >= th)
        bit, d = V.rd_dec_bit_logp(d, buf, lens, 1, reads)
        stop = reads & (bit != 0)
        finished = finished | stop
        adj = reads & ~stop
        psum = _sel(adj, psum + (1 << BITRES), psum)
        band_bits = _sel(adj, band_bits - (1 << BITRES), band_bits)
        cont = is_cur & ~stop
        keep_floor = band_bits >= alloc_floor
        psum = _sel(cont, psum - bits[:, j]
                    + _sel(keep_floor, alloc_floor, 0), psum)
        bits = bits.at[:, j].set(
            _sel(cont, _sel(keep_floor, alloc_floor, 0), bits[:, j]))
        coded_bands = _sel(cont, coded_bands - 1, coded_bands)
    total = total + skip_rsv

    left = total - psum
    den = eBj[coded_bands] - int(eB[0])
    percoeff = left // den
    left = left - den * percoeff
    jidx = jnp.arange(nb)
    in_coded = jidx[None, :] < coded_bands[:, None]
    widths = jnp.asarray((eB[1:] - eB[:-1]).astype(np.int32))
    bits = bits + _sel(in_coded, percoeff[:, None] * widths[None, :], 0)
    for j in range(nb):
        take = jnp.minimum(left, int(eB[j + 1] - eB[j]))
        use = in_coded[:, j]
        bits = bits.at[:, j].add(_sel(use, take, 0))
        left = _sel(use, left - take, left)

    ebits = jnp.zeros((b, nb), i32)
    fine_priority = jnp.zeros((b, nb), i32)
    balance = jnp.zeros((b,), i32)
    logM = tabs.lm << BITRES
    for j in range(nb):
        n0 = int(eB[j + 1] - eB[j])
        n = n0 << tabs.lm
        in_c = in_coded[:, j]
        bitj = bits[:, j] + balance
        if n > 1:
            excess = jnp.maximum(bitj - capj[:, j], 0)
            bj = bitj - excess
            den_ = n
            nclogn = den_ * (int(tabs.logN[j]) + logM)
            offset = (nclogn >> 1) - den_ * FINE_OFFSET
            if n == 2:
                offset += den_ << BITRES >> 2
            off1 = _sel(bj + offset < (den_ * 2 << BITRES),
                        offset + (nclogn >> 2),
                        _sel(bj + offset < (den_ * 3 << BITRES),
                             offset + (nclogn >> 3), offset))
            eb_ = jnp.maximum(bj + off1 + (den_ << (BITRES - 1)), 0)
            eb_ = (eb_ // den_) >> BITRES
            eb_ = _sel(eb_ > (bj >> BITRES), bj >> BITRES, eb_)
            eb_ = jnp.minimum(eb_, MAX_FINE_BITS)
            fp = (eb_ * (den_ << BITRES) >= bj + off1).astype(i32)
            bj = bj - (eb_ << BITRES)
        else:
            excess = jnp.maximum(0, bitj - (1 << BITRES))
            bj = bitj - excess
            eb_ = jnp.zeros((b,), i32)
            fp = jnp.ones((b,), i32)
        has_ex = excess > 0
        extra_fine = jnp.minimum(excess >> BITRES, MAX_FINE_BITS - eb_)
        eb2 = eb_ + _sel(has_ex, extra_fine, 0)
        extra_bits = extra_fine << BITRES
        fp = _sel(has_ex, (extra_bits >= excess - balance).astype(i32), fp)
        excess2 = _sel(has_ex, excess - extra_bits, excess)
        unc_eb = bits[:, j] >> BITRES
        ebits = ebits.at[:, j].set(_sel(in_c, eb2, unc_eb))
        fine_priority = fine_priority.at[:, j].set(
            _sel(in_c, fp, (unc_eb < 1).astype(i32)))
        bits = bits.at[:, j].set(_sel(in_c, bj, 0))
        balance = _sel(in_c, excess2, balance)
    return coded_bands, balance, bits, ebits, fine_priority, d


# ===================================================================== #
# assembled planning pass: header -> allocation -> fine energy          #
# ===================================================================== #

@partial(jax.jit, static_argnames=("fs", "frame_size"))
def fused_celt_plan(buf, lens, old_e, *, fs: int = 48000,
                    frame_size: int = 960):
    """Decode the CELT frame "planning" symbols for a [B]-batch of
    packets on device: silence, postfilter, transient, intra, coarse
    energy, tf resolution, spread, dynalloc, trim, allocation and fine
    energy (reference order: celt_decode_with_ec
    celt/celt_decoder.c:1209-1462).  Mono, start=0, end=nbEBands.

    buf: [B, S] i32 payload bytes; lens: [B]; old_e: [B, nb] f64 energy
    memory.  Returns a dict of per-stream symbol tensors plus the
    decoder state `d` (for the coming PVQ stage) and the error lane."""
    tabs = _ModeTabs(fs, frame_size)
    nb = tabs.nb
    b = buf.shape[0]
    d = V.rd_init(buf, lens)
    active = jnp.ones((b,), bool)
    total_bits = lens * 8

    tell = V.rd_tell(d)
    sil_read = active & (tell == 1)
    sil_bit, d = V.rd_dec_bit_logp(d, buf, lens, 15, sil_read)
    silence = _sel(tell >= total_bits, 1, _sel(sil_read, sil_bit, 0))
    # silence consumes the rest of the frame (celt_decoder.c:1255)
    d = d._replace(nbits_total=_sel(silence != 0,
                                    total_bits - V.rd_tell(d)
                                    + d.nbits_total, d.nbits_total))
    live = active & (silence == 0)

    # ---- postfilter (start==0; celt_decoder.c:1262-1288) ----
    tell = V.rd_tell(d)
    pf_read = live & (tell + 16 <= total_bits)
    pf_on, d = V.rd_dec_bit_logp(d, buf, lens, 1, pf_read)
    pf = pf_read & (pf_on != 0)
    octave, d = V.rd_dec_uint(d, buf, lens, jnp.full((b,), 6, i32), pf)
    pbits, d = V.rd_dec_bits(d, buf, lens,
                             jnp.where(pf, 4 + octave, 0), pf)
    pf_pitch = _sel(pf, (16 << octave) + pbits - 1, 0)
    qg, d = V.rd_dec_bits(d, buf, lens, jnp.where(pf, 3, 0), pf)
    tp_read = pf & (V.rd_tell(d) + 2 <= total_bits)
    tapset, d = V.rd_dec_icdf(d, buf, lens, TAPSET_ICDF, 2, tp_read)
    pf_tapset = _sel(tp_read, tapset, 0)
    pf_gain = jnp.where(pf, 0.09375 * (qg + 1).astype(jnp.float64), 0.0)

    # ---- transient + intra (celt_decoder.c:1290-1302) ----
    tell = V.rd_tell(d)
    tr_read = live & (tell + 3 <= total_bits) if tabs.lm > 0 else \
        jnp.zeros((b,), bool)
    tr, d = V.rd_dec_bit_logp(d, buf, lens, 3, tr_read)
    is_transient = _sel(tr_read, tr, 0)
    tell = V.rd_tell(d)
    in_read = live & (tell + 3 <= total_bits)
    intra, d = V.rd_dec_bit_logp(d, buf, lens, 3, in_read)
    intra = _sel(in_read, intra, 0)

    # ---- coarse energy + tf + spread ----
    old_e, d = _coarse_energy(d, buf, lens, tabs, old_e, intra,
                              total_bits, live)
    tf_res, d = _tf_decode(d, buf, lens, tabs, is_transient != 0,
                           total_bits, live)
    tell = V.rd_tell(d)
    sp_read = live & (tell + 4 <= total_bits)
    spv, d = V.rd_dec_icdf(d, buf, lens, SPREAD_ICDF, 5, sp_read)
    spread = _sel(sp_read, spv, SPREAD_NORMAL)

    # ---- dynalloc + trim + allocation ----
    offsets, trim, d = _dynalloc(d, buf, lens, tabs, total_bits,
                                 int(buf.shape[1]), live)
    bits_left = (lens * 8 << BITRES) - V.rd_tell_frac(d) - 1
    ac_rsv = jnp.where((is_transient != 0) & (tabs.lm >= 2)
                       & (bits_left >= ((tabs.lm + 2) << BITRES)),
                       1 << BITRES, 0)
    bits_left = bits_left - ac_rsv
    (coded_bands, balance, pulses, ebits, fine_priority, d) = \
        _compute_allocation(d, buf, lens, tabs, offsets, trim,
                            bits_left, live)

    # ---- fine energy (unquant_fine_energy, quant_bands.c:556) ----
    for i in range(nb):
        fq = ebits[:, i]
        has = live & (fq > 0)
        q2, d = V.rd_dec_bits(d, buf, lens, jnp.where(has, fq, 0), has)
        offs = (q2.astype(jnp.float64) + 0.5) \
            * jnp.exp2(-fq.astype(jnp.float64)) - 0.5
        old_e = old_e.at[:, i].set(
            jnp.where(has, old_e[:, i] + offs, old_e[:, i]))

    return dict(silence=silence, pf_pitch=pf_pitch, pf_gain=pf_gain,
                pf_tapset=pf_tapset, is_transient=is_transient,
                intra=intra, energies=old_e, tf_res=tf_res,
                spread=spread, offsets=offsets, trim=trim,
                coded_bands=coded_bands, balance=balance, pulses=pulses,
                ebits=ebits, fine_priority=fine_priority,
                anti_collapse_rsv=ac_rsv, error=d.error), d

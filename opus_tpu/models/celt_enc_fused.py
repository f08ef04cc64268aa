"""Fully fused CELT encode symbol pass: PCM in, CELT packets out, in
one jit — the encode twin of celt_dec_fused.py.

The DSP front end (preemphasis, dual forward MDCT as MXU basis matmuls,
band energies) feeds a fully vectorized symbol-encode pass over the
[B]-lane range encoder (opus_tpu/ops/range_vec.py): transient analysis,
two-pass coarse energy with the static-chain Laplace encoder, tf
analysis (Viterbi over bands), spreading decision, dynalloc boosts,
allocation trim, the deterministic allocation integer program with
encode-side skip decisions, fine energy, and the PVQ band-split
recursion (greedy pulse search + CWRS index encode) over the same
static binary tree as the fused decoder.  Carries resolve in one
associative scan at finalization (re_finalize).

Scope: mono, CBR, 48 kHz family, prefilter off (a zero bit is coded;
pitch search stays a round-4 item), no hybrid/LFE/QEXT.  Complexity
semantics are fixed at >= 5: transient + patch-transient + tf analysis
+ spreading all active.

Float DSP runs in float32 (the MXU's natural precision) so encoder
*decisions* can differ from the float64 scalar encoder on ties; every
stream is a valid CELT stream: tests decode them with the scalar
decoder (final_range equality) and with reference libopus.

Reference: celt_encode_with_ec celt/celt_encoder.c:1726,
transient_analysis :267, dynalloc_analysis :1049, tf_analysis :663,
quant_coarse_energy celt/quant_bands.c:260, spreading_decision
celt/bands.c:470, interp_bits2pulses celt/rate.c:249,
quant_all_bands celt/bands.c:1589, op_pvq_search celt/vq.c:205,
icwrs celt/cwrs.c:444, ec_laplace_encode celt/laplace.c:51."""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..celt import cwrs
from ..celt.modes import get_pulses
from ..celt.tables import E_PROB_MODEL, E_MEANS
from ..celt.encoder import _INV_TABLE
from ..ops import range_plan as V
from ..ops.range_vec import i32, u32, _sel, _ilog
from ..ops.mdct import _forward_basis
from .celt_dec_fused import (
    DecTabs, _lit_lookup, _tree_sum, _isqrt, _frac_mul16, _bitexact_cos,
    _bitexact_log2tan, _compute_qn_vec, _sudiv, _haar1,
    _deinterleave_hadamard, _fill_interleave, _band_variants,
    BIT_INTERLEAVE_TABLE, EXP2_TABLE8, TRIM_ICDF, SPREAD_ICDF,
    TF_SELECT_TABLE, SMALL_ENERGY_ICDF, QTHETA_OFFSET, ORDERY_TABLE,
    _haar1_arr, _deinterleave_hadamard_arr, _exp_rotation_arr)

BITRES = 3
MAX_FINE_BITS = 8
FINE_OFFSET = 21
ALLOC_STEPS = 6
SPREAD_NONE = 0
SPREAD_NORMAL = 2
SPREAD_AGGRESSIVE = 3
PREEMPH = 0.85
SIG_SCALE = 32768.0

PRED_COEF = (29440 / 32768., 26112 / 32768., 21248 / 32768.,
             16384 / 32768.)
BETA_COEF = (30147 / 32768., 22282 / 32768., 12124 / 32768., 6554 / 32768.)
BETA_INTRA = 4915 / 32768.

f32 = jnp.float32


# ===================================================================== #
# static tables                                                         #
# ===================================================================== #

@lru_cache(maxsize=None)
def _laplace_chain(fs0: int, decay: int):
    """Static (fl, fs) chains of ec_laplace_encode's magnitude walk
    (laplace.c:51): fl_list[i]/fs_list[i] = state after the while loop
    when it stops at i (i = 1..L, fs_list[L] == 0)."""
    fl = fs0
    fs = ((32768 - 2 * 16 - fs0) * (16384 - decay)) >> 15    # _get_freq1
    fls = [0, fl]          # fl when |val| == i (index by i)
    fss = [fs0, fs]
    i = 1
    while fs > 0:
        fs *= 2
        fl += fs + 2       # 2 * MINP
        fs = (fs * decay) >> 15
        i += 1
        fls.append(fl)
        fss.append(fs)
    return tuple(fls), tuple(fss), i    # L = i (first index with fs==0)


@lru_cache(maxsize=None)
def _transient_tabs(n: int):
    """Impulse-response Toeplitz operators for transient_analysis's
    three linear recurrences (celt_encoder.c:267), as np constants."""
    # 2-state masking filter: y[i] = mem0 + x[i];
    # mem0' = mem0 - x + .5 mem1; mem1' = x - mem0
    h = np.zeros(n, np.float64)
    m0 = m1 = 0.0
    for t in range(n):
        x = 1.0 if t == 0 else 0.0
        h[t] = m0 + x
        m00 = m0
        m0 = m0 - x + .5 * m1
        m1 = x - m00
    toep = np.zeros((n, n), np.float32)
    for t in range(n):
        toep[t, t:] = h[:n - t]
    return toep         # y = x @ toep  ([B, n] @ [n, n])


@lru_cache(maxsize=None)
def _iir1_toeplitz(n: int, a: float):
    """y[i] = x[i] + a*y[i-1] as a lower-triangular Toeplitz matmul."""
    h = a ** np.arange(n, dtype=np.float64)
    toep = np.zeros((n, n), np.float32)
    for t in range(n):
        toep[t, t:] = h[:n - t]
    return toep


class EncTabs(DecTabs):
    """Static tables for the fused encoder (extends the decoder's)."""

    def __init__(self, fs: int, frame_size: int):
        super().__init__(fs, frame_size)
        mode = self.mode
        n = frame_size
        ov = mode.overlap
        self.basis_l = _forward_basis(n, ov).astype(np.float32)
        self.basis_s = _forward_basis(mode.shortMdctSize, ov).astype(
            np.float32)
        m = self.M
        nb = self.nb
        bm = np.zeros(n, np.int32)
        msk = np.zeros((n, nb), np.float32)
        for i in range(nb):
            bm[m * self.eBands[i]:m * self.eBands[i + 1]] = i
            msk[m * self.eBands[i]:m * self.eBands[i + 1], i] = 1.0
        self.band_map = bm
        self.band_mask = msk
        self.noise_floor = [
            0.0625 * self.logN[i] + .5 + (9 - 24)      # lsb_depth = 24
            - E_MEANS[i] + .0062 * (i + 5) * (i + 5)
            for i in range(nb)]


# ===================================================================== #
# DSP front end                                                         #
# ===================================================================== #

def _encode_dsp(pcm, mem, hist, tabs: EncTabs, clip_mask):
    """preemphasis + dual MDCT + band energies (f32, MXU matmuls).

    pcm: [B, N] in [-1, 1].  Returns dict with full [B, N+ov], freq_l,
    freq_s [B, N], ble_l, ble_s (lists of nb [B] lanes), be_l, be_s,
    and (new_mem, new_hist)."""
    n = tabs.mode.shortMdctSize << tabs.lm
    nshort = 1 << tabs.lm
    n2s = tabs.mode.shortMdctSize
    b = pcm.shape[0]

    x = pcm * f32(SIG_SCALE)
    # hard clip (celt_preemphasis clip; need_clip when |x| > 65536)
    x = _sel(clip_mask[:, None], jnp.clip(x, -65536.0, 65536.0), x)
    inp = x - jnp.concatenate([mem[:, None],
                               f32(PREEMPH) * x[:, :-1]], axis=1)
    new_mem = f32(PREEMPH) * x[:, -1]
    full = jnp.concatenate([hist, inp], axis=1)     # [B, N+ov]
    new_hist = full[:, n:]

    basis_l = jnp.asarray(tabs.basis_l)
    freq_l = jnp.matmul(full[:, None, :], basis_l,
                        preferred_element_type=f32)[:, 0, :]
    if tabs.lm > 0:
        basis_s = jnp.asarray(tabs.basis_s)
        segs = jnp.stack([full[:, k * n2s:k * n2s + n2s + tabs.mode.overlap]
                          for k in range(nshort)], axis=1)
        spec = jnp.matmul(segs, basis_s, preferred_element_type=f32)
        freq_s = spec.transpose(0, 2, 1).reshape(b, n)
    else:
        freq_s = freq_l

    mask = jnp.asarray(tabs.band_mask)

    def band_e(freq):
        e2 = jnp.matmul(freq * freq, mask, preferred_element_type=f32)
        be = jnp.sqrt(f32(1e-27) + e2)        # [B, nb]
        ble = jnp.log2(be) - jnp.asarray(
            np.asarray(E_MEANS[:tabs.nb], np.float32))
        return be, ble

    be_l, ble_l = band_e(freq_l)
    be_s, ble_s = band_e(freq_s)
    return dict(full=full, freq_l=freq_l, freq_s=freq_s,
                be_l=be_l, ble_l=ble_l, be_s=be_s, ble_s=ble_s,
                mem=new_mem, hist=new_hist)


def _transient_analysis(inp, tabs: EncTabs):
    """transient_analysis (celt_encoder.c:267), mono, tone detect off.
    inp: [B, N+overlap] preemphasized signal INCLUDING overlap history
    (the scalar passes inp[:, overlap:]... no: it passes the full
    N-sample window starting at the overlap — we pass exactly the same
    [B, N] slice).  Returns (is_transient [B] bool, tf_estimate [B])."""
    n = inp.shape[1]
    len2 = n // 2
    tmp = jnp.matmul(inp[:, None, :], jnp.asarray(_transient_tabs(n)),
                     preferred_element_type=f32)[:, 0, :]
    iota = jnp.arange(n)
    tmp = jnp.where(iota[None, :] < 12, f32(0.0), tmp)
    x2 = (tmp[:, 0::2] * tmp[:, 0::2]
          + tmp[:, 1::2] * tmp[:, 1::2])           # [B, len2]
    mean = jnp.sum(x2, axis=1)
    fdecay = 0.0625                                 # no weak transients
    # forward: mem = x2 + (1-d) mem; t2 = d * mem
    fwd = jnp.matmul(x2[:, None, :],
                     jnp.asarray(_iir1_toeplitz(len2, 1.0 - fdecay)),
                     preferred_element_type=f32)[:, 0, :]
    t2f = f32(fdecay) * fwd
    # backward: mem = t2 + .875 mem; t2 = .125 mem  (reverse direction)
    bwd = jnp.matmul(t2f[:, ::-1][:, None, :],
                     jnp.asarray(_iir1_toeplitz(len2, 0.875)),
                     preferred_element_type=f32)[:, 0, ::-1]
    t2 = f32(0.125) * bwd
    max_e = jnp.max(t2, axis=1)
    mean = jnp.sqrt(jnp.maximum(mean * max_e * f32(0.5) * len2, 0.0))
    norm = len2 / (f32(1e-15) + f32(0.5) * mean) / 2.0
    idxs = np.arange(12, len2 - 5, 4)
    vals = t2[:, idxs]                              # [B, n_pts]
    tab = jnp.asarray(np.asarray(_INV_TABLE, np.int32))
    ti = jnp.clip(jnp.floor(64.0 * norm[:, None] * (vals + f32(1e-15))),
                  0, 127).astype(i32)
    unmask = jnp.sum(jnp.take(tab, ti), axis=1)
    unmask = 64 * unmask * 4 // (6 * (len2 - 17))
    mask_metric = unmask
    is_transient = mask_metric > 200
    tf_max = jnp.maximum(
        0.0, jnp.sqrt(jnp.maximum(27.0 * mask_metric.astype(f32), 0.0))
        - 42.0)
    tf_estimate = jnp.sqrt(jnp.maximum(
        0.0, f32(0.0069) * jnp.minimum(f32(163.), tf_max) - f32(0.139)))
    return is_transient, tf_estimate


def _patch_transient(ble_l, old_log_e, nb: int):
    """patch_transient_decision (celt_encoder.c:473), mono."""
    # spread_old[0..end): running max with -1.0 decay
    spread_old = [None] * nb
    spread_old[0] = old_log_e[0]
    for i in range(1, nb):
        spread_old[i] = jnp.maximum(spread_old[i - 1] - 1.0,
                                    old_log_e[i])
    # mean_diff over bands [start+1? reference: 2..end-1]
    diffs = []
    for i in range(2, nb - 1):
        diffs.append(jnp.maximum(
            0.0, ble_l[i] - spread_old[i]))
    mean_diff = _tree_sum(diffs) / len(diffs)
    return mean_diff > f32(1.0)


# ===================================================================== #
# Laplace encode (static chains)                                        #
# ===================================================================== #

def _laplace_encode(e, qi, fs0: int, decay: int, active):
    """ec_laplace_encode with python-int fs/decay.  Returns
    (e, value) — value possibly clamped like the reference."""
    fls, fss, big_l = _laplace_chain(fs0, decay)
    is_zero = qi == 0
    s = _sel(qi < 0, -1, 0)
    aval = jnp.abs(qi)
    i_stop = jnp.minimum(aval, big_l)
    fl_i = _lit_lookup(fls, jnp.clip(i_stop, 0, big_l))
    fs_i = _lit_lookup(fss, jnp.clip(i_stop, 0, big_l))
    # fs > 0 branch (aval < L)
    fs_a = fs_i + 1                                  # fs += MINP
    fl_a = fl_i + _sel(s == 0, fs_a, 0)              # fl += fs & ~s
    val_a = qi
    # fs == 0 branch (aval >= L)
    ndi_max = (32768 - fl_i + 1 - 1) >> 0            # LOG_MINP = 0
    ndi_max = (ndi_max - s) >> 1
    di = jnp.minimum(aval - big_l, ndi_max - 1)
    fl_b = fl_i + (2 * di + 1 + s) * 1
    fs_b = jnp.minimum(1, 32768 - fl_b)
    val_b = (big_l + di + s) ^ s
    nz = ~is_zero
    hit_end = aval >= big_l
    fl = _sel(is_zero, 0, _sel(hit_end, fl_b, fl_a))
    fs = _sel(is_zero, fs0, _sel(hit_end, fs_b, fs_a))
    value = _sel(is_zero, 0, _sel(hit_end, val_b, qi))
    e = V.re_encode_bin(e, fl, fl + fs, 15, active)
    return e, value


# ===================================================================== #
# coarse energy (two-pass intra/inter trial)                            #
# ===================================================================== #

def _coarse_impl(e, x_bands, old_e, budget, tell0, pm, coef: float,
                 beta: float, intra_bit, max_decay, nb: int, active):
    """_quant_coarse_impl (quant_bands.c:156), mono.  x_bands/old_e:
    lists of nb [B] f32.  Returns (e, new_old_e, error, badness)."""
    can_bit = active & (tell0 + 3 <= budget)
    e = V.re_enc_bit_logp(e, intra_bit, 3, can_bit)
    prev = jnp.zeros_like(x_bands[0])
    badness = jnp.zeros(prev.shape, i32)
    new_old = list(old_e)
    error = [None] * nb
    for i in range(nb):
        x = x_bands[i]
        old = jnp.maximum(-9.0, old_e[i])
        f = x - f32(coef) * old - prev
        qi = jnp.floor(f32(0.5) + f).astype(i32)
        decay_bound = jnp.maximum(-28.0, old_e[i]) - max_decay
        low = (qi < 0) & (x < decay_bound)
        qi = _sel(low, jnp.minimum(qi + (decay_bound - x).astype(i32), 0),
                  qi)
        qi0 = qi
        tell = V.re_tell(e)
        bits_left = budget - tell - 3 * (nb - i)
        tight = (i != 0) & (bits_left < 30)
        qi = _sel(tight & (bits_left < 24), jnp.minimum(1, qi), qi)
        qi = _sel(tight & (bits_left < 16), jnp.maximum(-1, qi), qi)
        big = active & (budget - tell >= 15)
        med = active & ~big & (budget - tell >= 2)
        sml = active & ~big & ~med & (budget - tell >= 1)
        non = active & ~big & ~med & ~sml
        pi = 2 * min(i, 20)
        e, v_big = _laplace_encode(e, qi, int(pm[pi]) << 7,
                                   int(pm[pi + 1]) << 6, big)
        qi_med = jnp.clip(qi, -1, 1)
        sym = 2 * qi_med ^ -(qi_med < 0).astype(i32)
        e = V.re_enc_icdf(e, sym, SMALL_ENERGY_ICDF, 2, med)
        qi_sml = jnp.minimum(0, qi)
        e = V.re_enc_bit_logp(e, -qi_sml, 1, sml)
        qi = _sel(big, v_big,
                  _sel(med, qi_med,
                       _sel(sml, qi_sml, jnp.full_like(qi, -1))))
        error[i] = f - qi.astype(f32)
        badness = badness + _sel(active, jnp.abs(qi0 - qi), 0)
        q = qi.astype(f32)
        tmp = f32(coef) * old + prev + q
        new_old[i] = _sel(active, tmp, old_e[i])
        prev = prev + q - f32(beta) * q
    return e, new_old, error, badness


def _quant_coarse_energy(e, x_bands, old_e, budget, lm: int,
                         nb_available_bytes, delayed_intra, loss_rate: int,
                         tabs, active):
    """quant_coarse_energy (quant_bands.c:260), mono, two_pass
    (complexity >= 4), force_intra off.  Returns
    (e, new_old_e, error, new_delayed_intra, intra[lanes])."""
    nb = tabs.nb
    intra_bias = (budget.astype(f32) * delayed_intra
                  * f32(loss_rate) / f32(512)).astype(i32)
    dist = _tree_sum([jnp.minimum((x - o) * (x - o), 200.0)
                      for x, o in zip(x_bands, old_e)])
    new_distortion = jnp.minimum(dist, 200.0)
    tell0 = V.re_tell(e)
    two_pass = active & (tell0 + 3 <= budget)
    max_decay = jnp.minimum(16.0, f32(0.125) * nb_available_bytes.astype(
        f32)) if nb > 10 else jnp.full_like(delayed_intra, 16.0)

    pm_intra = E_PROB_MODEL[tabs.lm][1]
    pm_inter = E_PROB_MODEL[tabs.lm][0]
    one = jnp.ones(tell0.shape, i32)
    e1, old1, err1, bad1 = _coarse_impl(
        e, x_bands, old_e, budget, tell0, pm_intra, 0.0, BETA_INTRA,
        one, max_decay, nb, two_pass)
    tell_intra = V.re_tell_frac(e1)
    zero = jnp.zeros_like(one)
    e2, old2, err2, bad2 = _coarse_impl(
        e, x_bands, old_e, budget, tell0, pm_inter,
        PRED_COEF[tabs.lm], BETA_COEF[tabs.lm], zero, max_decay, nb,
        active)
    tell_inter = V.re_tell_frac(e2)
    pick_intra = two_pass & (
        (bad1 < bad2)
        | ((bad1 == bad2) & (tell_inter + intra_bias > tell_intra)))
    e_out = V.re_select(pick_intra, e1, e2, e)
    old_out = [_sel(pick_intra, a, b) for a, b in zip(old1, old2)]
    err_out = [_sel(pick_intra, a, b) for a, b in zip(err1, err2)]
    pc = PRED_COEF[tabs.lm]
    new_di = _sel(pick_intra, new_distortion,
                  f32(pc * pc) * delayed_intra + new_distortion)
    return e_out, old_out, err_out, new_di, pick_intra

# ===================================================================== #
# dynalloc analysis                                                     #
# ===================================================================== #

def _median3(a, b, c):
    return jnp.maximum(jnp.minimum(jnp.maximum(a, b), c),
                       jnp.minimum(a, b))


def _median5(v0, v1, v2, v3, v4):
    t0, t1 = jnp.minimum(v0, v1), jnp.maximum(v0, v1)
    t3, t4 = jnp.minimum(v3, v4), jnp.maximum(v3, v4)
    lo = jnp.maximum(t0, t3)
    hi = jnp.minimum(t1, t4)
    return _median3(lo, v2, hi)


def _dynalloc_analysis(ble, ble2, tabs: EncTabs, is_transient,
                       eff_bytes: int):
    """dynalloc_analysis (celt_encoder.c:1049), mono, no tone/analysis/
    surround, vbr=0.  ble/ble2: lists of nb [B] lanes.  Returns
    (offsets [nb lanes i32], importance, spread_weight, max_depth,
    tot_boost)."""
    nb = tabs.nb
    lm = tabs.lm
    nf = tabs.noise_floor
    depth_terms = [ble[i] - nf[i] for i in range(nb)]
    max_depth = depth_terms[0]
    for i in range(1, nb):
        max_depth = jnp.maximum(max_depth, depth_terms[i])
    max_depth = jnp.maximum(max_depth, -31.9)

    # spread weights from the simple masking model
    mask = list(depth_terms)
    sig = list(depth_terms)
    for i in range(1, nb):
        mask[i] = jnp.maximum(mask[i], mask[i - 1] - 2.0)
    for i in range(nb - 2, -1, -1):
        mask[i] = jnp.maximum(mask[i], mask[i + 1] - 3.0)
    spread_weight = []
    for i in range(nb):
        smr = sig[i] - jnp.maximum(jnp.maximum(0.0, max_depth - 12.0),
                                   mask[i])
        shift = jnp.clip(-jnp.floor(f32(0.5) + smr).astype(i32), 0, 5)
        spread_weight.append((32 >> shift).astype(i32))

    offsets = [jnp.zeros_like(ble[0], i32) for _ in range(nb)]
    importance = [jnp.full_like(ble[0], 13).astype(i32)
                  for _ in range(nb)]
    tot_boost = jnp.zeros_like(ble[0], i32)
    if not (eff_bytes >= 30 + 5 * lm):
        return offsets, importance, spread_weight, max_depth, tot_boost

    ble3 = list(ble2)
    # follower forward chain + last
    f = [None] * nb
    f[0] = ble3[0]
    iota_last = jnp.zeros_like(ble[0], i32)
    for i in range(1, nb):
        iota_last = _sel(ble3[i] > ble3[i - 1] + 0.5, i, iota_last)
        f[i] = jnp.minimum(f[i - 1] + 1.5, ble3[i])
    for i in range(nb - 2, -1, -1):
        upd = i <= iota_last - 1
        f[i] = _sel(upd, jnp.minimum(
            f[i], jnp.minimum(f[i + 1] + 2.0, ble3[i])), f[i])
    offset = 1.0
    med = [None] * nb
    for i in range(2, nb - 2):
        med[i] = _median5(ble3[i - 2], ble3[i - 1], ble3[i],
                          ble3[i + 1], ble3[i + 2]) - offset
    lo_med = _median3(ble3[0], ble3[1], ble3[2]) - offset
    hi_med = _median3(ble3[nb - 3], ble3[nb - 2], ble3[nb - 1]) - offset
    for i in range(2, nb - 2):
        f[i] = jnp.maximum(f[i], med[i])
    f[0] = jnp.maximum(f[0], lo_med)
    f[1] = jnp.maximum(f[1], lo_med)
    f[nb - 2] = jnp.maximum(f[nb - 2], hi_med)
    f[nb - 1] = jnp.maximum(f[nb - 1], hi_med)
    for i in range(nb):
        f[i] = jnp.maximum(f[i], nf[i])
        f[i] = jnp.maximum(0.0, ble[i] - f[i])
        importance[i] = jnp.floor(
            f32(0.5) + 13.0 * jnp.exp2(jnp.minimum(f[i], 4.0))).astype(i32)
        # vbr == 0: halve unless transient
        f[i] = _sel(is_transient, f[i], f32(0.5) * f[i])
        if i < 8:
            f[i] = f[i] * 2.0
        if i >= 12:
            f[i] = f32(0.5) * f[i]
    if eff_bytes > 320:
        f[0] = f[0] + min(1.5, 1e-3 * (eff_bytes - 320))
    capped = jnp.zeros(ble[0].shape, bool)
    for i in range(nb):
        fi = jnp.minimum(f[i], 4.0)
        width = int(tabs.width[i])
        if width < 6:
            boost = fi.astype(i32)
            boost_bits = boost * width << BITRES
        elif width > 48:
            boost = (fi * 8.0).astype(i32)
            boost_bits = (boost * width << BITRES) // 8
        else:
            boost = (fi * width / 6.0).astype(i32)
            boost_bits = boost * 6 << BITRES
        # vbr == 0 path: cap total boost at 2/3 of the frame bytes
        over = ((tot_boost + boost_bits) >> BITRES >> 3) \
            > 2 * eff_bytes // 3
        capv = (2 * eff_bytes // 3) << BITRES << 3
        hit = ~capped & over
        # on the capping band the reference stores the remaining budget
        # directly into offsets (celt_encoder.c:1259) — the emission
        # loop then runs until the per-band cap, so the unit mismatch
        # is normative behavior
        offsets[i] = _sel(capped, 0,
                          _sel(hit, capv - tot_boost, boost))
        tot_boost = _sel(capped, tot_boost,
                         _sel(hit, capv, tot_boost + boost_bits))
        capped = capped | hit
    return offsets, importance, spread_weight, max_depth, tot_boost


def _quanta(width: int):
    return min(width << BITRES, max(6 << BITRES, width))


# ===================================================================== #
# tf analysis + encode                                                  #
# ===================================================================== #

def _l1_vec(x, bias_lm, bias):
    l1 = jnp.sum(jnp.abs(x), axis=1)
    return l1 + bias_lm * bias * l1


def _tf_analysis(X, tabs: EncTabs, is_transient, tf_estimate, lam: int,
                 importance):
    """tf_analysis (celt_encoder.c:663), mono.  X: [B, Ncoded].
    Returns (tf_res list of nb [B] i32 in {0,1}, tf_select [B] i32)."""
    nb = tabs.nb
    lm = tabs.lm
    m = tabs.M
    bias = f32(0.04) * jnp.maximum(-0.25, 0.5 - tf_estimate)
    metric = []
    for i in range(nb):
        base = int(tabs.eBands[i]) * m
        n = int(tabs.width[i])
        narrow = (int(tabs.eBands[i + 1] - tabs.eBands[i])) == 1
        xs = X[:, base:base + n]
        # transient variant (tv=1)
        best_l1_t = _l1_vec(xs, lm, bias)
        best_lv_t = jnp.zeros_like(best_l1_t, i32)
        if not narrow:
            tmp1 = _haar1_arr(xs, n >> lm, 1 << lm)
            l1 = _l1_vec(tmp1, lm + 1, bias)
            better = l1 < best_l1_t
            best_l1_t = jnp.minimum(l1, best_l1_t)
            best_lv_t = _sel(better, -1, best_lv_t)
        tmp = xs
        for k in range(lm):
            tmp = _haar1_arr(tmp, n >> k, 1 << k)
            bb = lm - k - 1
            l1 = _l1_vec(tmp, bb, bias)
            better = l1 < best_l1_t
            best_l1_t = jnp.minimum(l1, best_l1_t)
            best_lv_t = _sel(better, k + 1, best_lv_t)
        # non-transient variant (tv=0)
        best_l1_n = _l1_vec(xs, 0, bias)
        best_lv_n = jnp.zeros_like(best_l1_n, i32)
        tmp = xs
        for k in range(lm if narrow else lm + 1):
            tmp = _haar1_arr(tmp, n >> k, 1 << k)
            bb = k + 1
            l1 = _l1_vec(tmp, bb, bias)
            better = l1 < best_l1_n
            best_l1_n = jnp.minimum(l1, best_l1_n)
            best_lv_n = _sel(better, k + 1, best_lv_n)
        mt = _sel(is_transient, 2 * best_lv_t, -2 * best_lv_n)
        if narrow:
            mt = mt - ((mt == 0) | (mt == -2 * lm)).astype(i32)
        metric.append(mt)

    def _viterbi_cost(sel_lanes):
        t4 = 4 * is_transient.astype(i32)
        tab = TF_SELECT_TABLE[lm]
        c0v = _lit_lookup(tab, t4 + 2 * sel_lanes)
        c1v = _lit_lookup(tab, t4 + 2 * sel_lanes + 1)
        lam_t = _sel(is_transient, 0, lam)
        cost0 = importance[0] * jnp.abs(metric[0] - 2 * c0v)
        cost1 = importance[0] * jnp.abs(metric[0] - 2 * c1v) + lam_t
        paths0, paths1 = [], []
        for i in range(1, nb):
            from0, from1 = cost0, cost1 + lam
            p0 = (from0 >= from1).astype(i32)
            curr0 = jnp.minimum(from0, from1)
            from0b, from1b = cost0 + lam, cost1
            p1 = (from0b >= from1b).astype(i32)
            curr1 = jnp.minimum(from0b, from1b)
            cost0 = curr0 + importance[i] * jnp.abs(metric[i] - 2 * c0v)
            cost1 = curr1 + importance[i] * jnp.abs(metric[i] - 2 * c1v)
            paths0.append(p0)
            paths1.append(p1)
        return cost0, cost1, paths0, paths1

    z = jnp.zeros_like(metric[0])
    c0_s0, c1_s0, _, _ = _viterbi_cost(z)
    c0_s1, c1_s1, _, _ = _viterbi_cost(z + 1)
    sel0 = jnp.minimum(c0_s0, c1_s0)
    sel1 = jnp.minimum(c0_s1, c1_s1)
    tf_select = ((sel1 < sel0) & is_transient).astype(i32)
    cost0, cost1, paths0, paths1 = _viterbi_cost(tf_select)
    tf_res = [None] * nb
    tf_res[nb - 1] = (cost0 >= cost1).astype(i32)
    for i in range(nb - 2, -1, -1):
        tf_res[i] = _sel(tf_res[i + 1] == 1, paths1[i], paths0[i])
    return tf_res, tf_select


def _tf_encode(e, tf_res, tf_select, is_transient, tabs: EncTabs,
               total_bits, active):
    """tf_encode (celt_encoder.c:824).  Returns (e, tf_res_final
    [values from TF_SELECT_TABLE], tf_select)."""
    nb = tabs.nb
    lm = tabs.lm
    budget = total_bits
    tell = V.re_tell(e)
    logp0 = _sel(is_transient, 2, 4)
    tf_select_rsv = ((lm > 0) & (tell + logp0 + 1 <= budget)).astype(i32)
    budget = budget - tf_select_rsv
    curr = jnp.zeros_like(tell)
    tf_changed = jnp.zeros_like(tell)
    tf_out = list(tf_res)
    for i in range(nb):
        logp = logp0 if i == 0 else _sel(is_transient, 4, 5)
        can = active & (tell + logp <= budget)
        e = V.re_enc_bit_logp(e, tf_out[i] ^ curr, logp, can)
        tell = V.re_tell(e)
        curr = _sel(can, tf_out[i], curr)
        tf_out[i] = curr
        tf_changed = tf_changed | curr
    tab = TF_SELECT_TABLE[lm]
    t4 = 4 * is_transient.astype(i32)
    differs = (_lit_lookup(tab, t4 + tf_changed)
               != _lit_lookup(tab, t4 + 2 + tf_changed))
    code_sel = active & (tf_select_rsv != 0) & differs
    e = V.re_enc_bit_logp(e, tf_select, 1, code_sel)
    tf_select = _sel(code_sel, tf_select, 0)
    vals = [None] * nb
    for i in range(nb):
        vals[i] = _lit_lookup(tab, t4 + 2 * tf_select + tf_out[i])
    return e, vals, tf_select


# ===================================================================== #
# spreading decision                                                    #
# ===================================================================== #

def _spreading_decision(X, tabs: EncTabs, spread_weight, update_hf,
                        state):
    """spreading_decision (bands.c:470), mono.  state: dict with
    average, hf_average, tapset_decision, last_decision ([B] i32).
    Returns (decision [B] i32, new state)."""
    nb = tabs.nb
    m = tabs.M
    sum_ = jnp.zeros_like(state["average"])
    nb_bands = jnp.zeros_like(sum_)
    hf_sum = jnp.zeros_like(sum_)
    for i in range(nb):
        n = int(tabs.width[i])
        if n <= 8:
            continue
        base = int(tabs.eBands[i]) * m
        seg = X[:, base:base + n]
        x2n = seg * seg * n
        t0 = jnp.sum((x2n < 0.25).astype(i32), axis=1)
        t1 = jnp.sum((x2n < 0.0625).astype(i32), axis=1)
        t2 = jnp.sum((x2n < 0.015625).astype(i32), axis=1)
        if i > nb - 4:
            hf_sum = hf_sum + 32 * (t1 + t0) // n
        tmp = ((2 * t2 >= n).astype(i32) + (2 * t1 >= n).astype(i32)
               + (2 * t0 >= n).astype(i32))
        sum_ = sum_ + tmp * spread_weight[i]
        nb_bands = nb_bands + spread_weight[i]
    new_state = dict(state)
    # end == nb so the divisor c*(4 - nbEBands + end) is 4 (mono)
    hf = _sel(hf_sum != 0, hf_sum // 4, hf_sum)
    upd = update_hf
    hf_avg = _sel(upd, (state["hf_average"] + hf) >> 1,
                  state["hf_average"])
    hf2 = hf_avg + _sel(state["tapset_decision"] == 2, 4,
                        _sel(state["tapset_decision"] == 0, -4, 0))
    tapset = _sel(hf2 > 22, 2, _sel(hf2 > 18, 1, 0))
    new_state["hf_average"] = hf_avg
    new_state["tapset_decision"] = _sel(upd, tapset,
                                        state["tapset_decision"])
    nbb = jnp.maximum(nb_bands, 1)
    s = (sum_ << 8) // nbb
    s = (s + state["average"]) >> 1
    new_state["average"] = s
    s = (3 * s + (((3 - state["last_decision"]) << 7) + 64) + 2) >> 2
    decision = _sel(s < 80, SPREAD_AGGRESSIVE,
                    _sel(s < 256, SPREAD_NORMAL,
                         _sel(s < 384, 1, SPREAD_NONE)))
    return decision, new_state


# ===================================================================== #
# trim analysis                                                         #
# ===================================================================== #

def _alloc_trim_analysis(ble, tabs: EncTabs, tf_estimate,
                         equiv_rate: int):
    """alloc_trim_analysis (celt_encoder.c:865), mono, no analysis."""
    nb = tabs.nb
    if equiv_rate < 64000:
        trim = 4.0
    elif equiv_rate < 80000:
        trim = 4.0 + (1.0 / 16) * ((equiv_rate - 64000) >> 10)
    else:
        trim = 5.0
    diff = _tree_sum([ble[i] * (2 + 2 * i - nb) for i in range(nb - 1)])
    diff = diff / (nb - 1)
    t = trim - jnp.clip((diff + 1.0) / 6.0, -2.0, 2.0)
    t = t - 2.0 * tf_estimate
    idx = jnp.floor(f32(0.5) + t).astype(i32)
    return jnp.clip(idx, 0, 10)

# ===================================================================== #
# allocation (encode-side skip decisions)                               #
# ===================================================================== #

def _interp_bits2pulses_enc(e, tabs: EncTabs, bits1, bits2, thresh,
                            total, skip_rsv, skip_start, prev_cb,
                            active):
    """interp_bits2pulses, mono encode (rate.c:249).  prev_cb: [B]
    lastCodedBands lanes.  Returns (e, coded_bands, balance, bits,
    ebits, fine_priority)."""
    nb = tabs.nb
    alloc_floor = 1 << BITRES
    eB = [int(v) for v in tabs.eBands]
    caps = tabs.caps
    signal_bandwidth = nb - 1
    lo = jnp.zeros_like(total)
    hi = jnp.full_like(total, 1 << ALLOC_STEPS)
    for _ in range(ALLOC_STEPS):
        mid = (lo + hi) >> 1
        psum = jnp.zeros_like(total)
        done = jnp.zeros(total.shape, bool)
        for j in range(nb - 1, -1, -1):
            tmp = bits1[j] + ((mid * bits2[j]) >> ALLOC_STEPS)
            use = (tmp >= thresh[j]) | done
            psum = psum + _sel(use, jnp.minimum(tmp, caps[j]),
                               _sel(tmp >= alloc_floor, alloc_floor, 0))
            done = done | use
        over = psum > total
        hi = _sel(over, mid, hi)
        lo = _sel(over, lo, mid)
    psum = jnp.zeros_like(total)
    done = jnp.zeros(total.shape, bool)
    bits = [None] * nb
    for j in range(nb - 1, -1, -1):
        tmp = bits1[j] + ((lo * bits2[j]) >> ALLOC_STEPS)
        low = (tmp < thresh[j]) & ~done
        tmp2 = _sel(low, _sel(tmp >= alloc_floor, alloc_floor, 0), tmp)
        done = done | ~low
        tmp2 = jnp.minimum(tmp2, caps[j])
        bits[j] = tmp2
        psum = psum + tmp2

    coded_bands = jnp.full_like(total, nb)
    finished = ~active
    forced_stop = jnp.zeros(total.shape, bool)
    for j in range(nb - 1, 0, -1):
        is_cur = (~finished) & (coded_bands == j + 1) & (j > skip_start)
        at_skip = (~finished) & (coded_bands == j + 1) & (j <= skip_start)
        finished = finished | at_skip
        forced_stop = forced_stop | at_skip
        left = total - psum
        den = eB[j + 1] - eB[0]
        percoeff = left // den
        leftr = left - den * percoeff
        rem = jnp.maximum(leftr - (eB[j] - eB[0]), 0)
        band_width = eB[j + 1] - eB[j]
        band_bits = bits[j] + percoeff * band_width + rem
        th = max(thresh[j], alloc_floor + (1 << BITRES))
        cand = is_cur & (band_bits >= th)
        # encode-side stop decision (rate.c:282-299)
        depth_threshold = _sel(coded_bands > 17,
                               _sel(j < prev_cb, 7, 9), 0)
        stop_rule = (coded_bands <= 2) | (
            (band_bits > ((depth_threshold * band_width
                           << tabs.lm << BITRES) >> 4))
            & (j <= signal_bandwidth))
        stop = cand & stop_rule
        e = V.re_enc_bit_logp(e, stop.astype(i32), 1, cand)
        finished = finished | stop
        adj = cand & ~stop
        psum = _sel(adj, psum + (1 << BITRES), psum)
        band_bits = _sel(adj, band_bits - (1 << BITRES), band_bits)
        cont = is_cur & ~stop
        keep_floor = band_bits >= alloc_floor
        psum = _sel(cont, psum - bits[j]
                    + _sel(keep_floor, alloc_floor, 0), psum)
        bits[j] = _sel(cont, _sel(keep_floor, alloc_floor, 0), bits[j])
        coded_bands = _sel(cont, coded_bands - 1, coded_bands)
    total = total + _sel(forced_stop, skip_rsv, 0)

    left = total - psum
    den = _lit_lookup([eB[c] - eB[0] for c in range(nb + 1)],
                      jnp.clip(coded_bands, 0, nb))
    den = jnp.maximum(den, 1)
    percoeff = left // den
    left = left - den * percoeff
    in_coded = [None] * nb
    for j in range(nb):
        in_c = j < coded_bands
        bits[j] = bits[j] + _sel(in_c, percoeff * (eB[j + 1] - eB[j]), 0)
        in_coded[j] = in_c
    for j in range(nb):
        take = jnp.minimum(left, eB[j + 1] - eB[j])
        bits[j] = bits[j] + _sel(in_coded[j], take, 0)
        left = _sel(in_coded[j], left - take, left)

    ebits = [None] * nb
    fine_priority = [None] * nb
    balance = jnp.zeros_like(total)
    logM = tabs.lm << BITRES
    for j in range(nb):
        n0 = eB[j + 1] - eB[j]
        n = n0 << tabs.lm
        in_c = in_coded[j]
        bitj = bits[j] + balance
        if n > 1:
            excess = jnp.maximum(bitj - caps[j], 0)
            bj = bitj - excess
            den_ = n
            nclogn = den_ * (tabs.logN[j] + logM)
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
            excess = jnp.maximum(bitj - (1 << BITRES), 0)
            bj = bitj - excess
            eb_ = jnp.zeros_like(total)
            fp = jnp.ones_like(total)
        has_ex = excess > 0
        extra_fine = jnp.minimum(excess >> BITRES, MAX_FINE_BITS - eb_)
        eb2 = eb_ + _sel(has_ex, extra_fine, 0)
        extra_bits = extra_fine << BITRES
        fp = _sel(has_ex, (extra_bits >= excess - balance).astype(i32), fp)
        excess2 = _sel(has_ex, excess - extra_bits, excess)
        unc_eb = bits[j] >> BITRES
        ebits[j] = _sel(in_c, eb2, unc_eb)
        fine_priority[j] = _sel(in_c, fp, (unc_eb < 1).astype(i32))
        bits[j] = _sel(in_c, bj, 0)
        balance = _sel(in_c, excess2, balance)
    return e, coded_bands, balance, bits, ebits, fine_priority


def _compute_allocation_enc(e, tabs: EncTabs, offsets, trim, total,
                            prev_cb, active):
    """compute_allocation, mono encode (rate.c:535)."""
    nb = tabs.nb
    eB = tabs.eBands
    total = jnp.maximum(total, 0)
    skip_rsv = _sel(total >= (1 << BITRES), 1 << BITRES, 0)
    total = total - skip_rsv
    widths = [int(v) for v in (eB[1:] - eB[:-1])]
    thresh = [max((3 * widths[j] << tabs.lm << BITRES) >> 4, 1 << BITRES)
              for j in range(nb)]
    trim_off = []
    for j in range(nb):
        t = (widths[j] * (trim - 5 - tabs.lm) * (nb - 1 - j)
             * (1 << (tabs.lm + BITRES))) >> 6
        if (widths[j] << tabs.lm) == 1:
            t = t - (1 << BITRES)
        trim_off.append(t)
    caps = tabs.caps
    allocV = tabs.allocV
    nv = allocV.shape[0]

    lo = jnp.ones_like(total)
    hi = jnp.full_like(total, nv - 1)
    for _ in range(6):
        go = lo <= hi
        mid = (lo + hi) >> 1
        psum = jnp.zeros_like(total)
        done = jnp.zeros(total.shape, bool)
        for j in range(nb - 1, -1, -1):
            col = [int(widths[j] * allocV[v, j]) << tabs.lm >> 2
                   for v in range(nv)]
            bitsj = _lit_lookup(col, jnp.clip(mid, 0, nv - 1))
            bitsj = _sel(bitsj > 0,
                         jnp.maximum(bitsj + trim_off[j], 0), bitsj)
            bitsj = bitsj + offsets[j]
            use = (bitsj >= thresh[j]) | done
            psum = psum + _sel(use, jnp.minimum(bitsj, caps[j]),
                               _sel(bitsj >= (1 << BITRES),
                                    1 << BITRES, 0))
            done = done | use
        over = psum > total
        hi = _sel(go & over, mid - 1, hi)
        lo = _sel(go & ~over, mid + 1, lo)
    hi_f = lo
    lo_f = lo - 1
    bits1 = []
    bits2 = []
    skip_start = jnp.zeros_like(total)
    for j in range(nb):
        col = [int(widths[j] * allocV[v, j]) << tabs.lm >> 2
               for v in range(nv)]
        b1 = _lit_lookup(col, jnp.clip(lo_f, 0, nv - 1))
        b2_tab = _lit_lookup(col, jnp.clip(hi_f, 0, nv - 1))
        b2 = _sel(hi_f >= nv, i32(caps[j]), b2_tab)
        b1 = _sel(b1 > 0, jnp.maximum(b1 + trim_off[j], 0), b1)
        b2 = _sel(b2 > 0, jnp.maximum(b2 + trim_off[j], 0), b2)
        b1 = b1 + _sel(lo_f > 0, offsets[j], 0)
        b2 = b2 + offsets[j]
        skip_start = _sel(offsets[j] > 0,
                          jnp.full_like(skip_start, j), skip_start)
        b2 = jnp.maximum(b2 - b1, 0)
        bits1.append(b1)
        bits2.append(b2)
    return _interp_bits2pulses_enc(e, tabs, bits1, bits2, thresh, total,
                                   skip_rsv, skip_start, prev_cb, active)


# ===================================================================== #
# fine energy + finalise                                                #
# ===================================================================== #

def _quant_fine_energy(e, error, ebits, old_e, nbytes: int, nb: int,
                       active):
    """quant_fine_energy (quant_bands.c:360), mono.  Mutates error and
    old_e lists; returns (e, error, old_e)."""
    error = list(error)
    old_e = list(old_e)
    for i in range(nb):
        can = active & (ebits[i] > 0) \
            & (V.re_tell(e) + ebits[i] <= nbytes * 8)
        extra = (1 << jnp.clip(ebits[i], 0, MAX_FINE_BITS)).astype(f32)
        q2 = jnp.floor((error[i] + f32(0.5)) * extra).astype(i32)
        q2 = jnp.clip(q2, 0, (extra - 1).astype(i32))
        e = V.re_enc_bits(e, _sel(can, q2, 0),
                          _sel(can, ebits[i], 0), can)
        offs = (q2.astype(f32) + f32(0.5)) \
            * jnp.exp2(-ebits[i].astype(f32)) - f32(0.5)
        old_e[i] = _sel(can, old_e[i] + offs, old_e[i])
        error[i] = _sel(can, error[i] - offs, error[i])
    return e, error, old_e


def _quant_energy_finalise(e, error, ebits, fine_priority, bits_left,
                           nb: int, active):
    """quant_energy_finalise (quant_bands.c:401), mono."""
    error = list(error)
    bits_left = bits_left
    for prio in range(2):
        for i in range(nb):
            can = active & (bits_left >= 1) & (ebits[i] < MAX_FINE_BITS) \
                & (fine_priority[i] == prio)
            q2 = (error[i] >= 0).astype(i32)
            e = V.re_enc_bits(e, _sel(can, q2, 0),
                              _sel(can, 1, 0), can)
            offs = (q2.astype(f32) - f32(0.5)) \
                * jnp.exp2(-(ebits[i] + 1).astype(f32))
            error[i] = _sel(can, error[i] - offs, error[i])
            bits_left = bits_left - _sel(can, 1, 0)
    return e, error

# ===================================================================== #
# PVQ leaf encode: rotation + greedy search + CWRS index               #
# ===================================================================== #

EPSILON = 1e-15
_U32_SAT = (1 << 32) - 1


@lru_cache(maxsize=None)
def _u_table(n: int, kcap: int) -> np.ndarray:
    """ut[r, kk] = U(r, kk) for r in 2..n as a [n-1, kcap+3] uint32
    (saturated; valid streams never select saturated entries)."""
    ut = np.zeros((n - 1, kcap + 3), np.uint32)
    for r in range(2, n + 1):
        for kk in range(kcap + 3):
            ut[r - 2, kk] = min(cwrs.pvq_u(r, kk), _U32_SAT)
    return ut


@lru_cache(maxsize=None)
def _v_table(n: int, kcap: int) -> np.ndarray:
    return np.asarray([min(cwrs.pvq_v(n, kk), _U32_SAT)
                       for kk in range(kcap + 2)], np.uint64).astype(
                           np.uint32)


def _pvq_search(X, n: int, k, kcap: int, active):
    """op_pvq_search (vq.c:205): [B, n] greedy argmax pulse search.
    Returns iy [B, n] i32 (signed)."""
    xa = jnp.abs(X)
    signs = jnp.where(X < 0, -1, 1).astype(i32)
    iota = jnp.arange(n)
    sum_ = jnp.sum(xa, axis=-1)
    proj = active & (k > (n >> 1))
    bad = proj & ~((sum_ > EPSILON) & (sum_ < 64.0))
    oh0 = (iota == 0).astype(f32)[None, :]
    xa = jnp.where(bad[:, None], oh0, xa)
    sum_ = _sel(bad, f32(1.0), sum_)
    rcp = (k.astype(f32) + f32(0.8)) / sum_
    iy = jnp.where(proj[:, None],
                   jnp.floor(rcp[:, None] * xa).astype(i32), 0)
    yf = iy.astype(f32)
    yy = jnp.sum(yf * yf, axis=-1)
    xy = jnp.sum(xa * yf, axis=-1)
    pulses_left = _sel(proj, k - jnp.sum(iy, axis=-1), k)
    dump = active & (pulses_left > n + 3)
    tmpf = pulses_left.astype(f32)
    yy = _sel(dump, yy + tmpf * tmpf + tmpf * 2.0 * iy[:, 0].astype(f32),
              yy)
    iy = iy + jnp.where(dump[:, None] & (iota == 0)[None, :],
                        pulses_left[:, None], 0)
    pulses_left = _sel(dump, 0, pulses_left)

    cap = min(kcap, n + 3)

    def body(t, carry):
        iy, xy, yy = carry
        act = active & (t < pulses_left)
        yy1 = yy + 1.0
        rxy = (xy[:, None] + xa)
        rxy = rxy * rxy
        ryy = yy1[:, None] + 2.0 * iy.astype(f32)
        best = jnp.argmax(rxy / ryy, axis=-1)
        oh = (iota[None, :] == best[:, None])
        xy2 = xy + jnp.sum(jnp.where(oh, xa, f32(0.0)), axis=-1)
        yy2 = yy1 + jnp.sum(jnp.where(oh, 2.0 * iy.astype(f32),
                                      f32(0.0)), axis=-1)
        iy2 = iy + oh.astype(i32)
        return (jnp.where(act[:, None], iy2, iy), _sel(act, xy2, xy),
                _sel(act, yy2, yy))

    iy, xy, yy = jax.lax.fori_loop(0, cap, body, (iy, xy, yy))
    return iy * signs


def _encode_pulses(e, iy, n: int, k, kcap: int, active):
    """encode_pulses (cwrs.c:462): icwrs index + enc_uint(V(n, k)).

    The scalar accumulation  i += U(n-j, S_j) (+ U(n-j, T_j+1) on
    negative pulses)  uses only exclusive/inclusive suffix magnitude
    sums S_j/T_j, so the whole index is two flat gathers over the U
    table — no scan."""
    ut = _u_table(n, kcap)                   # [n-1, kcap+3] rows n-j-2
    vt = jnp.asarray(_v_table(n, kcap))
    ay = jnp.abs(iy)
    # S_j = sum_{t>j} |y_t| (exclusive suffix), T_j = S_j + |y_j|
    t_incl = jnp.cumsum(ay[:, ::-1], axis=1)[:, ::-1]    # [B, n]
    s_excl = t_incl - ay
    idx = (iy[:, n - 1] < 0).astype(u32)
    kcols = kcap + 3
    flat = jnp.asarray(ut.reshape(-1))
    # rows for j = 0..n-2: table row (n-j)-2 = n-2-j
    rowoff = (jnp.arange(n - 1)[::-1] * kcols)[None, :]  # [1, n-1]
    g1 = jnp.take(flat, rowoff + jnp.clip(s_excl[:, :n - 1], 0,
                                          kcols - 1))
    g2 = jnp.take(flat, rowoff + jnp.clip(t_incl[:, :n - 1] + 1, 0,
                                          kcols - 1))
    neg = (iy[:, :n - 1] < 0)
    idx = idx + jnp.sum(g1, axis=1) \
        + jnp.sum(jnp.where(neg, g2, u32(0)), axis=1)
    ft = jnp.take(vt, jnp.clip(k, 0, kcap + 1))
    e = V.re_enc_uint(e, idx.astype(i32), ft.astype(i32), active)
    return e


# ===================================================================== #
# theta + split recursion (encode)                                      #
# ===================================================================== #

def _compute_theta_mono_enc(e, ctx, tabs: EncTabs, band: int, n2: int, b,
                            bb2, b0, lm2: int, xs_m, xs_s, active):
    """compute_theta, mono encode (bands.c:700).  Returns
    (b, sctx, e, ctx)."""
    pulse_cap = tabs.logN[band] + lm2 * (1 << BITRES)
    offset = (pulse_cap >> 1) - QTHETA_OFFSET
    qn = _compute_qn_vec(n2, b, offset, pulse_cap)
    tell0 = V.re_tell_frac(e)
    emid = jnp.sum(xs_m * xs_m, axis=1) + f32(EPSILON)
    eside = jnp.sum(xs_s * xs_s, axis=1) + f32(EPSILON)
    itheta_raw = jnp.floor(
        f32(0.5) + f32(16384 * 0.63662)
        * jnp.arctan2(jnp.sqrt(eside), jnp.sqrt(emid))).astype(i32)
    has_theta = active & (qn != 1)
    itheta = (itheta_raw * qn + 8192) >> 14
    # avoid_split_noise (transient lanes): snap to 0/qn when the delta
    # would inject noise on one side (bands.c:752-764)
    asn = has_theta & ctx["avoid_split_noise"] & (itheta > 0) \
        & (itheta < qn)
    unq = (itheta * 16384) // jnp.maximum(qn, 1)
    imid_a = _bitexact_cos(unq)
    iside_a = _bitexact_cos(16384 - unq)
    delta_a = _frac_mul16(jnp.full_like(unq, (n2 - 1) << 7),
                          _bitexact_log2tan(iside_a, imid_a))
    itheta = _sel(asn & (delta_a > b), qn,
                  _sel(asn & (delta_a < -b), 0, itheta))
    # entropy-code the angle
    uin = has_theta & (b0 > 1)
    e = V.re_enc_uint(e, itheta, qn + 1, uin)
    tri = has_theta & (b0 <= 1)
    qh = qn >> 1
    ft = (qh + 1) * (qh + 1)
    low = itheta <= qh
    fs_t = _sel(low, itheta + 1, qn + 1 - itheta)
    fl_t = _sel(low, (itheta * (itheta + 1)) >> 1,
                ft - (((qn + 1 - itheta) * (qn + 2 - itheta)) >> 1))
    e = V.re_encode(e, fl_t, fl_t + fs_t, ft, tri)
    itheta_q14 = (itheta * 16384) // jnp.maximum(qn, 1)
    # qn == 1 (cannot happen on valid mono splits): the reference keeps
    # the RAW angle on the encoder side
    itheta_q14 = _sel(has_theta, itheta_q14, itheta_raw)
    qalloc = V.re_tell_frac(e) - tell0
    b = b - qalloc
    ctx = dict(ctx)
    ctx["rb"] = ctx["rb"] - _sel(active, qalloc, 0)

    th0 = itheta_q14 == 0
    th1 = itheta_q14 == 16384
    imid = _sel(th0, 32767, _sel(th1, 0, _bitexact_cos(itheta_q14)))
    iside = _sel(th0, 0, _sel(th1, 32767,
                              _bitexact_cos(16384 - itheta_q14)))
    delta_m = _frac_mul16(jnp.full_like(itheta_q14, (n2 - 1) << 7),
                          _bitexact_log2tan(iside, imid))
    delta = _sel(th0, -16384, _sel(th1, 16384, delta_m))
    sctx = dict(itheta=itheta_q14, imid=imid, iside=iside, delta=delta,
                qalloc=qalloc)
    return b, sctx, e, ctx


def _quant_partition_enc(e, ctx, tabs: EncTabs, band: int, n: int,
                         lm_node: int, b, bb, bb_vals, xs, active):
    """quant_partition encode (bands.c:973) over the static split
    tree.  xs: list of n [B] f32.  Returns (e, ctx)."""
    row = tabs.cache_rows[(lm_node, band)]
    can_split = lm_node != -1 and n > 2
    if can_split:
        thr = row[row[0]] + 12
        split = active & (b > thr)
        n2 = n >> 1
        lm2 = lm_node - 1
        b0 = bb
        bb2 = (bb + 1) >> 1
        bb2_vals = tuple(sorted({(v + 1) >> 1 for v in bb_vals}))
        xs_m = xs[:, :n2]
        xs_s = xs[:, n2:]
        b_s, sctx, e, ctx = _compute_theta_mono_enc(
            e, ctx, tabs, band, n2, b, bb2, b0, lm2, xs_m, xs_s, split)
        itheta = sctx["itheta"]
        delta = sctx["delta"]
        nonzero_th = (itheta & 0x3fff) != 0
        d_hi = delta - (delta >> (4 - lm2))
        d_lo = jnp.minimum(0, delta + (n2 << BITRES >> (5 - lm2)))
        delta = _sel((b0 > 1) & nonzero_th,
                     _sel(itheta > 8192, d_hi, d_lo), delta)
        mbits = jnp.maximum(0, jnp.minimum(b_s, (b_s - delta) // 2))
        sbits = b_s - mbits
        swap = split & (mbits < sbits)

        x_v0 = jnp.where(swap[:, None], xs_s, xs_m)
        b_v0 = _sel(swap, sbits, mbits)
        rb_before = ctx["rb"]
        e, ctx = _quant_partition_enc(e, ctx, tabs, band, n2, lm2, b_v0,
                                      bb2, bb2_vals, x_v0, split)
        spent = rb_before - ctx["rb"]
        rebalance = b_v0 - spent
        anchor = _sel(swap, 16384, 0)
        extra = _sel(split & (rebalance > (3 << BITRES))
                     & (itheta != anchor),
                     rebalance - (3 << BITRES), 0)
        b_v1 = _sel(swap, mbits, sbits) + extra
        x_v1 = jnp.where(swap[:, None], xs_m, xs_s)
        e, ctx = _quant_partition_enc(e, ctx, tabs, band, n2, lm2, b_v1,
                                      bb2, bb2_vals, x_v1, split)
        leaf_active = active & ~split
    else:
        split = jnp.zeros(active.shape, bool)
        leaf_active = active

    # ---- leaf: bits -> pulses -> PVQ search + CWRS encode ----
    L = row[0]
    rowj = jnp.asarray(np.asarray(row, np.int32))
    bm1 = b - 1
    c_lo = jnp.sum(bm1[..., None] > rowj[1:L + 1], axis=-1).astype(i32)
    lo = c_lo
    hi = jnp.minimum(lo + 1, L)
    lo_val = _sel(lo == 0, -1, jnp.take(rowj, jnp.clip(lo, 0, L)))
    hi_val = jnp.take(rowj, hi)
    q = _sel(bm1 - lo_val <= hi_val - bm1, lo, hi)
    rb0 = ctx["rb"]
    c_fit = jnp.sum(rb0[..., None] >= rowj[1:L + 1] + 1,
                    axis=-1).astype(i32)
    q = jnp.minimum(q, jnp.maximum(c_fit, 0))
    q = jnp.maximum(q, 0)
    bits_used = _sel(q > 0, jnp.take(rowj, jnp.clip(q, 0, L)) + 1, 0)
    ctx = dict(ctx)
    ctx["rb"] = ctx["rb"] - _sel(leaf_active, bits_used, 0)
    kq = _sel(q < 8, q, (8 + (q & 7)) << jnp.maximum((q >> 3) - 1, 0)
              .astype(u32))
    kcap = min(int(get_pulses(L)), 128)
    pvq = leaf_active & (kq != 0)
    if n >= 2:
        xs_rot = _exp_rotation_arr(xs, n, bb, bb_vals, kq,
                                   ctx["spread"], pvq, encode=True)
        iy = _pvq_search(xs_rot, n, kq, kcap, pvq)
        e = _encode_pulses(e, iy, n, kq, kcap, pvq)
    else:
        raise AssertionError("n==1 leaves are handled by quant_band_n1")
    # q == 0: the encoder codes nothing (decoder folds/noise-fills)
    return e, ctx


def _quant_band_n1_enc(e, ctx, x0, active):
    can = active & (ctx["rb"] >= (1 << BITRES))
    sign = (x0 < 0).astype(i32)
    e = V.re_enc_bits(e, _sel(can, sign, 0), _sel(can, 1, 0), can)
    ctx = dict(ctx)
    ctx["rb"] = ctx["rb"] - _sel(can, 1 << BITRES, 0)
    return e, ctx


def _quant_band_mono_enc(e, ctx, tabs: EncTabs, band: int, n: int, b,
                         transient, tf_change, xs, active):
    """quant_band, mono encode (bands.c:1245): input-side tf/hadamard
    transforms on x, then the split recursion."""
    if n == 1:
        return _quant_band_n1_enc(e, ctx, xs[:, 0], active)
    variants = _band_variants(tabs, n)
    masks = [active & (transient == v["tv"]) & (tf_change == v["tfv"])
             for v in variants]
    xs_f = xs
    bb_lanes = jnp.zeros_like(b)
    bb_vals = set()
    for v, m in zip(variants, masks):
        xv = xs
        for kk in range(v["recombine"]):
            xv = _haar1_arr(xv, n >> kk, 1 << kk)
        bb = v["B0"] >> v["recombine"]
        n_b = (n // v["B0"]) << v["recombine"]
        for _ in range(v["tdiv"]):
            xv = _haar1_arr(xv, n_b, bb)
            bb <<= 1
            n_b >>= 1
        if v["b0_final"] > 1:
            xv = _deinterleave_hadamard_arr(
                xv, v["n_b0"] >> v["recombine"],
                v["b0_final"] << v["recombine"], v["long"])
        xs_f = jnp.where(m[:, None], xv, xs_f)
        bb_lanes = _sel(m, v["b0_final"], bb_lanes)
        bb_vals.add(v["b0_final"])

    return _quant_partition_enc(e, ctx, tabs, band, n, tabs.lm, b,
                                bb_lanes, tuple(sorted(bb_vals)), xs_f,
                                active)


def quant_all_bands_mono_enc(e, tabs: EncTabs, X, is_transient, tf_res,
                             spread, coded_bands, pulses, total_bits8,
                             balance, active):
    """bands.c:1589, mono encode.  X: [B, M*eBands[nb]] normalized
    bands (selected transform).  Returns e."""
    nb = tabs.nb
    m = tabs.M
    eB = [int(v) for v in tabs.eBands]
    ctx = dict(rb=jnp.zeros_like(balance), spread=spread,
               avoid_split_noise=is_transient)
    for i in range(nb):
        n = m * (eB[i + 1] - eB[i])
        tell = V.re_tell_frac(e)
        if i != 0:
            balance = balance - tell
        remaining_bits = total_bits8 - tell - 1
        ctx["rb"] = remaining_bits
        in_coded = i <= coded_bands - 1
        den = jnp.minimum(3, jnp.maximum(coded_bands - i, 1))
        curr_balance = _sudiv(balance, den)
        b = _sel(in_coded,
                 jnp.clip(jnp.minimum(remaining_bits + 1,
                                      pulses[i] + curr_balance), 0, 16383),
                 0)
        base = m * eB[i]
        xs = X[:, base:base + n]
        e, ctx = _quant_band_mono_enc(e, ctx, tabs, i, n, b,
                                      is_transient.astype(i32),
                                      tf_res[i], xs, active)
        # avoid_split_noise only applies to the first coded band
        ctx["avoid_split_noise"] = jnp.zeros(balance.shape, bool)
        balance = balance + pulses[i] + tell
    return e

# ===================================================================== #
# frame driver                                                          #
# ===================================================================== #

def fused_celt_encode_frame(pcm, state, tabs: EncTabs, nbytes: int,
                            lsb_depth: int = 24):
    """One batched CELT encode frame, mono CBR (celt_encoder.c:1726).

    pcm: [B, N] float32 in [-1, 1]; state: see fused_celt_enc_init.
    Returns (payload [B, nbytes] u8, rng [B] u32, err [B], new_state,
    dbg dict)."""
    nb = tabs.nb
    lm = tabs.lm
    m = tabs.M
    n = tabs.mode.shortMdctSize << lm
    active = jnp.ones(pcm.shape[:1], bool)
    total_bits = nbytes * 8
    eff_bytes = nbytes
    equiv_rate = nbytes * 8 * 50 * (1 << (3 - lm)) \
        - (40 + 20) * ((400 >> lm) - 50)

    e = V.re_init(pcm.shape[0], nbytes)

    # ---- silence + clip detection (celt_encoder.c:1936-1966) ----
    ov_n = (n - tabs.mode.overlap)
    head_max = jnp.max(jnp.abs(pcm[:, :ov_n]), axis=1) if ov_n > 0 \
        else jnp.zeros(pcm.shape[:1], f32)
    tail_max = jnp.max(jnp.abs(pcm[:, ov_n:]), axis=1)
    sample_max = jnp.maximum(state["overlap_max"],
                             jnp.maximum(head_max, tail_max))
    new_overlap_max = tail_max
    silence = sample_max <= (1.0 / (1 << lsb_depth))
    e = V.re_enc_bit_logp(e, silence.astype(i32), 15, active)
    # CBR silence: skip to the end of the buffer
    tell_now = V.re_tell(e)
    e = e._replace(nbits_total=_sel(
        silence, e.nbits_total + (total_bits - tell_now), e.nbits_total))

    clip_mask = sample_max > 2.0
    dsp = _encode_dsp(pcm, state["mem"], state["hist"], tabs, clip_mask)

    # ---- transient analysis (complexity >= 1) ----
    is_transient, tf_estimate = _transient_analysis(
        dsp["full"][:, tabs.mode.overlap:], tabs)

    # ---- prefilter disabled: a zero bit when it fits ----
    can_pf = active & (V.re_tell(e) + 16 <= total_bits)
    e = V.re_enc_bit_logp(e, jnp.zeros_like(tell_now), 1, can_pf)

    can_tr = (lm > 0) & (V.re_tell(e) + 3 <= total_bits)
    transient_got_disabled = is_transient & ~can_tr
    is_transient = is_transient & can_tr

    ble_l = [dsp["ble_l"][:, i] for i in range(nb)]
    ble_s = [dsp["ble_s"][:, i] for i in range(nb)]
    ble = [_sel(is_transient, s, l) for l, s in zip(ble_l, ble_s)]

    # ---- temporal VBR state (spec_avg; celt_encoder.c:2219-2234) ----
    follow = jnp.full_like(ble[0], -10.0)
    frame_avg = jnp.zeros_like(follow)
    offset_sb = _sel(is_transient, f32(0.5) * lm, f32(0.0))
    for i in range(nb):
        follow = jnp.maximum(follow - 1.0, ble[i] - offset_sb)
        frame_avg = frame_avg + follow
    frame_avg = frame_avg / nb
    temporal_vbr = jnp.clip(frame_avg - state["spec_avg"], -1.5, 3.0)
    new_spec_avg = state["spec_avg"] + f32(0.02) * temporal_vbr

    ble2 = list(ble)            # second_mdct off at complexity 5

    # ---- patch transient (complexity >= 5) ----
    patch = can_tr & ~is_transient & _patch_transient(
        ble, state["old_band_e"], nb)
    is_transient = is_transient | patch
    ble = [_sel(patch, s, b_) for s, b_ in zip(ble_s, ble)]
    ble2 = [_sel(patch, l + f32(0.5) * lm, b_)
            for l, b_ in zip(ble_l, ble2)]
    tf_estimate = _sel(patch, f32(0.2), tf_estimate)

    e = V.re_enc_bit_logp(e, is_transient.astype(i32), 3, can_tr)

    # ---- normalize (selected transform) ----
    bm = jnp.asarray(tabs.band_map[:m * int(tabs.eBands[nb])])
    be = _sel(is_transient[:, None], dsp["be_s"], dsp["be_l"])
    freq = _sel(is_transient[:, None], dsp["freq_s"], dsp["freq_l"])
    ncoded = m * int(tabs.eBands[nb])
    X = freq[:, :ncoded] * (1.0 / (1e-27 + be))[:, bm]

    # ---- dynalloc analysis + tf analysis ----
    offsets_cnt, importance, spread_weight, max_depth, tot_boost_a = \
        _dynalloc_analysis(ble, ble2, tabs, is_transient, eff_bytes)
    lam = max(80, 20480 // eff_bytes + 2)
    tf_res, tf_select = _tf_analysis(X, tabs, is_transient, tf_estimate,
                                     lam, importance)

    # ---- coarse energy (with the stability bias) ----
    ble_b = [
        _sel(jnp.abs(b_ - o) < 2.0, b_ - f32(0.25) * ee, b_)
        for b_, o, ee in zip(ble, state["old_band_e"],
                             state["energy_error"])]
    budget = jnp.full_like(tell_now, total_bits)
    nb_avail = jnp.full_like(tell_now, nbytes)
    e, old_e, error, new_delayed_intra, intra = _quant_coarse_energy(
        e, ble_b, state["old_band_e"], budget, lm, nb_avail,
        state["delayed_intra"], 0, tabs, active)

    # ---- tf encode ----
    e, tf_vals, tf_select = _tf_encode(e, tf_res, tf_select,
                                       is_transient, tabs, budget, active)

    # ---- spreading decision (complexity >= 3; update_hf false: no
    # prefilter) ----
    can_sp = active & (V.re_tell(e) + 4 <= total_bits)
    sp_state = dict(average=state["tonal_average"],
                    hf_average=state["hf_average"],
                    tapset_decision=state["tapset_decision"],
                    last_decision=state["spread_decision"])
    sp_calc, sp_new = _spreading_decision(
        X, tabs, spread_weight, jnp.zeros(active.shape, bool), sp_state)
    use_calc = can_sp & ~is_transient & (eff_bytes >= 10)
    spread = _sel(use_calc, sp_calc,
                  _sel(can_sp, SPREAD_NORMAL,
                       jnp.full_like(sp_calc, SPREAD_NORMAL)))
    e = V.re_enc_icdf(e, spread, SPREAD_ICDF, 5, can_sp)
    new_sp = dict(
        tonal_average=_sel(use_calc, sp_new["average"],
                           state["tonal_average"]),
        hf_average=state["hf_average"],
        tapset_decision=state["tapset_decision"],
        spread_decision=_sel(can_sp, spread, SPREAD_NORMAL))

    # ---- dynalloc boost emission (celt_encoder.c:2365-2391) ----
    dyn_logp = jnp.full_like(tell_now, 6)
    total_bits8 = total_bits << BITRES
    total_boost = jnp.zeros_like(tell_now)
    tell_frac = V.re_tell_frac(e)
    offsets = [None] * nb
    for i in range(nb):
        width = int(tabs.width[i])
        quanta = _quanta(width)
        cap_i = int(tabs.caps[i])
        dlp = dyn_logp
        boost = jnp.zeros_like(tell_now)
        alive = active
        coded_any = jnp.zeros(active.shape, bool)
        for j in range(cap_i // quanta + 1):
            can = alive & (tell_frac + (dlp << BITRES)
                           < total_bits8 - total_boost) & (boost < cap_i)
            flag = can & (j < offsets_cnt[i])
            e = V.re_enc_bit_logp(e, flag.astype(i32), dlp, can)
            tell_frac = V.re_tell_frac(e)
            boost = boost + _sel(flag, quanta, 0)
            total_boost = total_boost + _sel(flag, quanta, 0)
            dlp = _sel(flag, jnp.ones_like(dlp), dlp)
            coded_any = coded_any | flag
            alive = flag
        dyn_logp = _sel(coded_any, jnp.maximum(2, dyn_logp - 1),
                        dyn_logp)
        offsets[i] = boost

    # ---- allocation trim ----
    can_trim = active & (tell_frac + (6 << BITRES)
                         <= total_bits8 - total_boost)
    trim_calc = _alloc_trim_analysis(ble, tabs, tf_estimate, equiv_rate)
    trim = _sel(can_trim, trim_calc, 5)
    e = V.re_enc_icdf(e, trim, TRIM_ICDF, 7, can_trim)
    tell_frac = V.re_tell_frac(e)

    # ---- allocation ----
    bits = total_bits8 - tell_frac - 1
    anti_rsv = _sel(is_transient & (lm >= 2)
                    & (bits >= ((lm + 2) << BITRES)), 1 << BITRES, 0)
    bits = bits - anti_rsv
    # trim must be per-python-int for trim_off... it is per-lane: the
    # decode twin takes trim lanes; mirror by passing lanes
    e, coded_bands, balance, pulses, ebits, fine_priority = \
        _compute_allocation_enc(e, tabs, offsets, trim, bits,
                                state["last_coded_bands"], active)
    lcb = state["last_coded_bands"]
    new_lcb = _sel(lcb != 0,
                   jnp.minimum(lcb + 1,
                               jnp.maximum(lcb - 1, coded_bands)),
                   coded_bands)

    # ---- fine energy ----
    e, error, old_e = _quant_fine_energy(e, error, ebits, old_e, nbytes,
                                         nb, active)

    # ---- PVQ band pass ----
    e = quant_all_bands_mono_enc(
        e, tabs, X, is_transient, tf_vals, spread, coded_bands, pulses,
        jnp.full_like(tell_now, nbytes * (8 << BITRES)) - anti_rsv,
        balance, active)

    # ---- anti-collapse flag ----
    has_rsv = active & (anti_rsv > 0)
    ac_on = (state["consec_transient"] < 2).astype(i32)
    e = V.re_enc_bits(e, _sel(has_rsv, ac_on, 0),
                      _sel(has_rsv, 1, 0), has_rsv)

    # ---- energy finalise ----
    bits_left = nbytes * 8 - V.re_tell(e)
    e, error = _quant_energy_finalise(e, error, ebits, fine_priority,
                                      bits_left, nb, active)
    new_energy_error = [jnp.clip(err, -0.5, 0.5) for err in error]

    old_e = [_sel(silence, f32(-28.0), oe) for oe in old_e]

    # ---- inter-frame energy state (celt_encoder.c:2766-2786) ----
    old_log_e = state["old_log_e"]
    old_log_e2 = state["old_log_e2"]
    new_ole2 = [_sel(is_transient, o2, o1)
                for o1, o2 in zip(old_log_e, old_log_e2)]
    new_ole = [_sel(is_transient, jnp.minimum(o1, oe), oe)
               for o1, oe in zip(old_log_e, old_e)]
    new_consec = _sel(is_transient | transient_got_disabled,
                      state["consec_transient"] + 1, 0)

    payload, err, rng = V.re_finalize(e, nbytes)

    new_state = dict(
        mem=dsp["mem"], hist=dsp["hist"], overlap_max=new_overlap_max,
        spec_avg=new_spec_avg, old_band_e=old_e, old_log_e=new_ole,
        old_log_e2=new_ole2, energy_error=new_energy_error,
        delayed_intra=new_delayed_intra, consec_transient=new_consec,
        last_coded_bands=new_lcb, tonal_average=new_sp["tonal_average"],
        hf_average=new_sp["hf_average"],
        tapset_decision=new_sp["tapset_decision"],
        spread_decision=new_sp["spread_decision"].astype(i32))
    dbg = dict(is_transient=is_transient, tf_res=tf_vals,
               tf_select=tf_select, spread=spread, trim=trim,
               coded_bands=coded_bands, pulses=pulses, ebits=ebits,
               offsets=offsets, intra=intra, silence=silence,
               tf_estimate=tf_estimate)
    return payload, rng, err, new_state, dbg


def fused_celt_enc_init(batch: int, tabs: EncTabs):
    z = jnp.zeros((batch,), f32)
    zi = jnp.zeros((batch,), i32)
    nb = tabs.nb
    return dict(
        mem=z, hist=jnp.zeros((batch, tabs.mode.overlap), f32),
        overlap_max=z, spec_avg=z,
        old_band_e=[z for _ in range(nb)],
        old_log_e=[jnp.full((batch,), -28.0, f32) for _ in range(nb)],
        old_log_e2=[jnp.full((batch,), -28.0, f32) for _ in range(nb)],
        energy_error=[z for _ in range(nb)],
        delayed_intra=jnp.ones((batch,), f32),
        consec_transient=zi, last_coded_bands=zi,
        tonal_average=jnp.full((batch,), 256, i32),
        hf_average=zi, tapset_decision=zi,
        spread_decision=jnp.full((batch,), SPREAD_NORMAL, i32))


class FusedCeltEncoder:
    """PCM-in -> CELT-packets-out mono CBR encoder, fully on device."""

    def __init__(self, batch: int, fs: int = 48000,
                 frame_size: int = 960, nbytes: int = 160,
                 lsb_depth: int = 24):
        self.batch = batch
        self.tabs = EncTabs(fs, frame_size)
        self.nbytes = nbytes
        self.state = fused_celt_enc_init(batch, self.tabs)
        self._step = jax.jit(
            lambda p, s: fused_celt_encode_frame(
                p, s, self.tabs, nbytes, lsb_depth)[:4])

    def encode(self, pcm: np.ndarray):
        """pcm [B, N] float in [-1, 1] -> (payloads [B, nbytes] u8,
        rng [B] u32, err [B])."""
        payload, rng, err, self.state = self._step(
            jnp.asarray(pcm, jnp.float32), self.state)
        return np.asarray(payload), np.asarray(rng), np.asarray(err)

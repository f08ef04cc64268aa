"""Fully fused on-device SILK decoder: packets in, int16 PCM out, in one
jit — no host work at all.

The symbol pass (frame header, side-info indices, shell-coded excitation,
NLSF->LPC conversion, gains, pitch/LTP) runs as masked [B]-lane vector
ops over the vectorized range decoder (opus_tpu/ops/range_vec.py), all
integer math int32-exact via opus_tpu/ops/silk_fixed.py (64-bit
intermediates emulated in uint32 limbs).  The synthesis is the existing
int32-exact batched decode_core (opus_tpu/models/batched_silk.py).
Together: SILK payloads resident in HBM decode to bit-exact PCM with
zero host round trips — the SURVEY.md §7 end state for the SILK path.

Scope: mono, one 20 ms frame per packet (nb_subfr=4), normal decode;
in-band FEC (LBRR) payloads are parsed through natively (the FEC frame
advances the range decoder and is discarded, dec_API.c:258-283).  Rare
bitstream features outside that envelope set the per-stream `error`
lane (pulse counts needing >3 escape symbols); callers re-decode
flagged streams on the scalar path.  The scalar decoder (opus_tpu/silk/decoder.py) is the
bit-exact oracle (tests/test_fused_silk_dec.py).

Reference: silk/dec_API.c:135, decode_indices.c, decode_pulses.c,
shell_coder.c, code_signs.c, decode_parameters.c, NLSF_decode.c,
NLSF_stabilize.c, NLSF2A.c, LPC_fit.c, LPC_inv_pred_gain.c,
gain_quant.c, decode_pitch.c, decode_core.c:80-96."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..silk import tables as T
from ..silk import tables_data as TD
from ..ops import range_vec as V
from ..ops.range_vec import i32, _sel
from ..ops import silk_fixed as F
from .batched_silk import SilkState, silk_decode_step, init_state

LTP_ORDER = 5
MAX_LPC_ORDER = 16
NLSF_QUANT_MAX_AMPLITUDE = 4
QA = 16


def _pad_icdf(rows, width):
    """Pad each iCDF row with trailing zeros to a common width (trailing
    zeros decode identically)."""
    out = np.zeros((len(rows), width), np.uint8)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out


class _SilkTabs:
    def __init__(self, fs_khz: int, nb_subfr: int = 4):
        self.fs_khz = fs_khz
        self.nb_subfr = nb_subfr
        self.order = 16 if fs_khz >= 16 else 10
        cb = T.NLSF_CB_WB if fs_khz >= 16 else T.NLSF_CB_NB_MB
        self.cb = cb
        self.cb1_icdf = _pad_icdf(
            [cb.CB1_iCDF[:cb.nVectors], cb.CB1_iCDF[cb.nVectors:]], 33)
        self.ec_icdf = np.asarray(cb.ec_iCDF, np.uint8)     # flat
        self.ec_sel = np.asarray(cb.ec_sel, np.uint8)
        self.pred_q8 = np.asarray(cb.pred_Q8, np.uint8)
        self.cb1_nlsf = np.asarray(cb.CB1_NLSF_Q8, np.int32).reshape(
            cb.nVectors, cb.order)
        self.cb1_wght = np.asarray(cb.CB1_Wght_Q9, np.int32).reshape(
            cb.nVectors, cb.order)
        self.dmin = np.asarray(cb.deltaMin_Q15, np.int32)
        self.qstep = cb.quantStepSize_Q16
        self.type_vad = np.asarray(TD.TYPE_OFFSET_VAD_ICDF, np.uint8)
        self.type_novad = np.asarray(TD.TYPE_OFFSET_NO_VAD_ICDF, np.uint8)
        self.gain_icdf = _pad_icdf([T.GAIN_ICDF[0], T.GAIN_ICDF[1],
                                    T.GAIN_ICDF[2]], 8)
        self.delta_gain = np.asarray(TD.DELTA_GAIN_ICDF, np.uint8)
        self.uniform4 = np.asarray(TD.UNIFORM4_ICDF, np.uint8)
        self.uniform8 = np.asarray(TD.UNIFORM8_ICDF, np.uint8)
        low = {16: TD.UNIFORM8_ICDF, 12: TD.UNIFORM6_ICDF,
               8: TD.UNIFORM4_ICDF}[fs_khz]
        self.lag_low = np.asarray(low, np.uint8)
        self.nlsf_ext = np.asarray(TD.NLSF_EXT_ICDF, np.uint8)
        self.nlsf_interp = np.asarray(TD.NLSF_INTERPOLATION_FACTOR_ICDF,
                                      np.uint8)
        self.pitch_lag = np.asarray(TD.PITCH_LAG_ICDF, np.uint8)
        self.contour = np.asarray(
            (TD.PITCH_CONTOUR_ICDF if nb_subfr == 4
             else TD.PITCH_CONTOUR_10_MS_ICDF) if fs_khz != 8 else
            (TD.PITCH_CONTOUR_NB_ICDF if nb_subfr == 4
             else TD.PITCH_CONTOUR_10_MS_NB_ICDF), np.uint8)
        self.per_index = np.asarray(TD.LTP_PER_INDEX_ICDF, np.uint8)
        self.ltp_gain = _pad_icdf([TD.LTP_GAIN_ICDF_0, TD.LTP_GAIN_ICDF_1,
                                   TD.LTP_GAIN_ICDF_2], 32)
        self.ltp_vq = np.zeros((3, 32, LTP_ORDER), np.int32)
        for c, tab in enumerate(T.LTP_VQ_PTRS_Q7):
            for r, row in enumerate(tab):
                self.ltp_vq[c, r] = np.asarray(row, np.int32) << 7
        self.ltp_scales = np.asarray(TD.LTPSCALES_TABLE_Q14, np.int32)
        self.ltp_scale_icdf = np.asarray(TD.LTPSCALE_ICDF, np.uint8)
        self.rate_levels = np.asarray(T.RATE_LEVELS_ICDF,
                                      np.uint8).reshape(2, 9)
        self.ppb_icdf = np.asarray(T.PULSES_PER_BLOCK_ICDF,
                                   np.uint8).reshape(10, 18)
        # per-count zero-padded iCDF rows: [17, 18] per level, so the
        # masked decode never reads past a row into the next one's data
        # (row for count p spans offsets[p]:offsets[p+1], terminated 0)
        offs = list(TD.SHELL_CODE_TABLE_OFFSETS)
        self.shell = []
        for t in (TD.SHELL_CODE_TABLE0, TD.SHELL_CODE_TABLE1,
                  TD.SHELL_CODE_TABLE2, TD.SHELL_CODE_TABLE3):
            flat = np.asarray(t, np.uint8)
            ends = offs[1:] + [len(flat)]
            rows = [flat[offs[p]:ends[p]] for p in range(17)]
            self.shell.append(_pad_icdf(rows, 18))
        self.sign_icdf = np.asarray(TD.SIGN_ICDF, np.uint8)
        self.quant_offsets = np.asarray(T.QUANTIZATION_OFFSETS_Q10,
                                        np.int32)
        self.lsf_cos = np.asarray(TD.LSFCOSTAB_FIX_Q12, np.int32)
        # pitch contour codebooks
        if fs_khz == 8:
            cbk = T.CB_LAGS_STAGE2 if nb_subfr == 4 else T.CB_LAGS_STAGE2_10MS
        else:
            cbk = T.CB_LAGS_STAGE3 if nb_subfr == 4 else T.CB_LAGS_STAGE3_10MS
        self.lag_cb = np.asarray(cbk, np.int32)     # [nb_subfr, ncontour]
        self.ordering = np.asarray(
            (0, 15, 8, 7, 4, 11, 12, 3, 2, 13, 10, 5, 6, 9, 14, 1)
            if self.order == 16 else (0, 9, 6, 3, 4, 5, 8, 1, 2, 7),
            np.int32)


# ===================================================================== #
# NLSF -> LPC, int32-exact (silk/NLSF2A.c + LPC_fit.c + inv-pred-gain)  #
# ===================================================================== #

def _bwexpander_32(ar, chirp_q16):
    """silk_bwexpander_32 over [B, d] with per-lane chirp [B]."""
    d = ar.shape[1]
    chirp_minus_one = chirp_q16 - 65536
    cols = []
    for i in range(d - 1):
        cols.append(F.smulww(chirp_q16, ar[:, i]))
        hi, lo = F.mul64(chirp_q16, chirp_minus_one)
        chirp_q16 = chirp_q16 + F.rshift_round64(hi, lo, 16)
    cols.append(F.smulww(chirp_q16, ar[:, d - 1]))
    return jnp.stack(cols, axis=1)


def _lpc_fit(a_qin, qout: int, qin: int):
    """silk/LPC_fit.c over [B, d]; returns (a_out int16vals [B, d],
    a_qin')."""
    d = a_qin.shape[1]
    fitted = jnp.zeros(a_qin.shape[0], bool)
    for _ in range(10):
        absa = jnp.abs(a_qin)
        maxabs0 = jnp.max(absa, axis=1)
        idx = jnp.argmax(absa, axis=1).astype(i32)
        maxabs = F.rshift_round(maxabs0, qin - qout)
        over = (~fitted) & (maxabs > 32767)
        mx = jnp.minimum(maxabs, 163838)
        chirp = 65470 - F.div32(
            (mx - 32767).astype(jnp.uint32).astype(i32) << 14,
            jnp.maximum((mx * (idx + 1)) >> 2, 1))
        expanded = _bwexpander_32(a_qin, chirp)
        a_qin = jnp.where(over[:, None], expanded, a_qin)
        fitted = fitted | ~over
    # force-fit lanes that never converged (reference: the i==10 path);
    # in-range lanes are untouched because the round trip is exact
    still = jnp.max(jnp.abs(F.rshift_round(a_qin, qin - qout)),
                    axis=1) > 32767
    forced = F.sat16(F.rshift_round(a_qin, qin - qout))
    a_qin = jnp.where(still[:, None],
                      (forced.astype(jnp.uint32)
                       << (qin - qout)).astype(i32), a_qin)
    a_out = F.sat16(F.rshift_round(a_qin, qin - qout))
    return a_out, a_qin


_A_LIMIT = 16773022   # SILK_FIX_CONST(0.99975, 24)


def _lpc_inverse_pred_gain(a_q12, order: int):
    """Returns stable [B] bool (inv gain > 0), int32-exact
    (silk/LPC_inv_pred_gain.c)."""
    b = a_q12.shape[0]
    a_qa = (a_q12.astype(jnp.uint32) << (24 - 12)).astype(i32)
    dc_resp = jnp.sum(a_q12, axis=1, dtype=i32)
    ok = dc_resp < 4096
    inv_gain_q30 = jnp.full((b,), 1 << 30, i32)
    for k in range(order - 1, 0, -1):
        ak = a_qa[:, k]
        ok = ok & (ak <= _A_LIMIT) & (ak >= -_A_LIMIT)
        rc_q31 = -((ak.astype(jnp.uint32) << 7).astype(i32))
        rc_mult1_q30 = (1 << 30) - F.smmul(rc_q31, rc_q31)
        inv_gain_q30 = (F.smmul(inv_gain_q30, rc_mult1_q30)
                        .astype(jnp.uint32) << 2).astype(i32)
        ok = ok & (inv_gain_q30 >= 107374)
        mult2q = 32 - F.clz32(jnp.abs(rc_mult1_q30))
        rc_mult2 = _inverse32_varq_dyn(rc_mult1_q30, mult2q + 30)
        # the (k+1)>>1 head/tail pair updates are independent within one k
        nhalf = (k + 1) >> 1
        tmp1 = a_qa[:, :nhalf]
        tmp2 = a_qa[:, k - 1::-1][:, :nhalf]    # a_qa[k-n-1]
        hi1, lo1 = F.mul64(tmp2, rc_q31[:, None])
        t1 = _sat32_64(*_sub64(_ext64(tmp1), (hi1, lo1), shift=31))
        hi3, lo3 = F.mul64(t1, rc_mult2[:, None])
        new1, fit1 = _rshift_round64_checked(hi3, lo3, mult2q[:, None])
        ok = ok & jnp.all(fit1, axis=1)
        hi2, lo2 = F.mul64(tmp1, rc_q31[:, None])
        t2 = _sat32_64(*_sub64(_ext64(tmp2), (hi2, lo2), shift=31))
        hi4, lo4 = F.mul64(t2, rc_mult2[:, None])
        new2, fit2 = _rshift_round64_checked(hi4, lo4, mult2q[:, None])
        ok = ok & jnp.all(fit2, axis=1)
        # scatter back: positions [0..nhalf) and [k-1 .. k-nhalf]
        upd = a_qa
        upd = upd.at[:, :nhalf].set(new1)
        idxs = np.arange(k - 1, k - 1 - nhalf, -1)
        upd = upd.at[:, idxs].set(new2)
        a_qa = jnp.where(ok[:, None], upd, a_qa)
    a0 = a_qa[:, 0]
    ok = ok & (a0 <= _A_LIMIT) & (a0 >= -_A_LIMIT)
    rc_q31 = -((a0.astype(jnp.uint32) << 7).astype(i32))
    rc_mult1_q30 = (1 << 30) - F.smmul(rc_q31, rc_q31)
    inv_gain_q30 = (F.smmul(inv_gain_q30, rc_mult1_q30)
                    .astype(jnp.uint32) << 2).astype(i32)
    ok = ok & (inv_gain_q30 >= 107374)
    return ok


def _inverse32_varq_dyn(b32, qres):
    """INVERSE32_varQ with dynamic qres (reference Inlines.h:139)."""
    absb = jnp.abs(b32)
    b_headrm = F.clz32(absb) - 1
    b32_nrm = (b32.astype(jnp.uint32)
               << b_headrm.astype(jnp.uint32)).astype(i32)
    denom = b32_nrm >> 16
    b32_inv = jax.lax.div(jnp.int32(0x7FFFFFFF >> 2), denom)
    result = (b32_inv.astype(jnp.uint32) << 16).astype(i32)
    err_q32 = ((jnp.int32(1 << 29)
                - F.smulwb(b32_nrm, b32_inv)).astype(jnp.uint32)
               << 3).astype(i32)
    result = result + F.smulww(err_q32, b32_inv)
    lshift = 61 - b_headrm - qres
    le0 = lshift <= 0
    sat = F.lshift_sat32_dyn(result, jnp.where(le0,
                                               jnp.minimum(-lshift, 31),
                                               0))
    shifted = result >> jnp.where((~le0) & (lshift < 32), lshift,
                                  31).astype(jnp.uint32)
    return jnp.where(le0, sat, jnp.where(lshift < 32, shifted, 0))


def _ext64(a):
    """Sign-extend int32 [..] to (hi, lo) limbs."""
    return (a >> 31, a.astype(jnp.uint32))


def _sub64(a, b, shift: int):
    """(a_hi, a_lo) - ((b_hi, b_lo) >> shift); shift static (31)."""
    bh, bl = b
    sh = jnp.uint32(shift)
    blo = (bl >> sh) | (bh.astype(jnp.uint32) << (jnp.uint32(32) - sh))
    bhi = bh >> shift
    ah, al = a
    lo = al - blo
    borrow = (al < blo).astype(i32)
    hi = ah - bhi - borrow
    return hi, lo


def _sat32_64(hi, lo):
    """Saturate a 64-bit (hi, lo) to int32 (silk_SAT32)."""
    as32 = lo.astype(i32)
    fits = hi == (as32 >> 31)
    return jnp.where(fits, as32,
                     jnp.where(hi < 0, jnp.int32(-2147483648),
                               jnp.int32(2147483647)))


def _shr64_full(hi, lo, s):
    """Arithmetic 64-bit right shift returning both limbs; s in [0,63]."""
    su = s.astype(jnp.uint32) if hasattr(s, "astype") else jnp.uint32(s)
    hiu = hi.astype(jnp.uint32)
    small = su < 32
    s1 = jnp.where(small, su, jnp.uint32(0))
    lo_small = jnp.where(s1 == 0, lo,
                         (lo >> s1) | (hiu << (jnp.uint32(32) - s1)))
    hi_small = hi >> s1.astype(i32)
    sb = jnp.where(small, jnp.uint32(0), su - 32)
    lo_big = (hi >> sb.astype(i32)).astype(jnp.uint32)
    hi_big = hi >> 31
    return (jnp.where(small, hi_small, hi_big),
            jnp.where(small, lo_small, lo_big))


def _rshift_round64_checked(hi, lo, s):
    """RSHIFT_ROUND64 returning (low-32 value, fits-in-int32 flag)."""
    s = s if hasattr(s, "astype") else jnp.asarray(s, i32)
    sm1 = (s - 1).astype(jnp.uint32)
    rc_lo = jnp.where(sm1 < 32, jnp.uint32(1) << jnp.minimum(sm1, 31),
                      jnp.uint32(0))
    rc_hi = jnp.where(sm1 >= 32,
                      jnp.uint32(1) << jnp.minimum(sm1 - 32, 31),
                      jnp.uint32(0))
    lo2 = lo + rc_lo
    carry = (lo2 < lo).astype(jnp.uint32)
    hi2 = (hi.astype(jnp.uint32) + rc_hi + carry).astype(i32)
    rh, rl = _shr64_full(hi2, lo2, s)
    val = rl.astype(i32)
    fits = rh == (val >> 31)
    return val, fits


def _nlsf2a(tabs: _SilkTabs, nlsf_q15):
    """silk_NLSF2A over [B, order]; returns a_q12 [B, 16] int32 (int16
    values; unused tail zero)."""
    d = tabs.order
    b = nlsf_q15.shape[0]
    cos_tab = jnp.asarray(tabs.lsf_cos)
    f_int = nlsf_q15 >> 8
    f_frac = nlsf_q15 - (f_int << 8)
    cos_val = cos_tab[f_int]
    delta = cos_tab[f_int + 1] - cos_val
    clsf_at = F.rshift_round((cos_val.astype(jnp.uint32) << 8)
                             .astype(i32) + delta * f_frac, 4)
    order_idx = jnp.asarray(tabs.ordering[:d])
    cos_lsf = jnp.zeros((b, d), i32).at[:, order_idx].set(clsf_at)

    dd = d >> 1

    def find_poly(off):
        out = [jnp.zeros((b,), i32) for _ in range(dd + 1)]
        out[0] = jnp.full((b,), 1 << QA, i32)
        out[1] = -cos_lsf[:, off]
        for k in range(1, dd):
            ftmp = cos_lsf[:, 2 * k + off]
            hi, lo = F.mul64(ftmp, out[k])
            out_k1 = ((out[k - 1].astype(jnp.uint32) << 1).astype(i32)
                      - F.rshift_round64(hi, lo, QA))
            new = list(out)
            new[k + 1] = out_k1
            for n in range(k, 1, -1):
                hi, lo = F.mul64(ftmp, out[n - 1])
                new[n] = out[n] + out[n - 2] - F.rshift_round64(hi, lo, QA)
            new[1] = out[1] - ftmp
            out = new
        return out

    p = find_poly(0)
    q = find_poly(1)
    a32 = [None] * d
    for k in range(dd):
        ptmp = p[k + 1] + p[k]
        qtmp = q[k + 1] - q[k]
        a32[k] = -qtmp - ptmp
        a32[d - k - 1] = qtmp - ptmp
    a32_qa1 = jnp.stack(a32, axis=1)

    a_q12, a32_qa1 = _lpc_fit(a32_qa1, 12, QA + 1)
    # stabilization: the reference allows up to 16 bandwidth-expansion
    # rounds; decoded (spacing-stabilized) NLSFs need at most a couple.
    # Run 2 and flag the (pathological) remainder for scalar fallback.
    for it in range(2):
        stable = _lpc_inverse_pred_gain(a_q12, d)
        need = ~stable
        a32_new = _bwexpander_32(a32_qa1, jnp.full((b,), 65536 - (2 << it),
                                                   i32))
        a32_qa1 = jnp.where(need[:, None], a32_new, a32_qa1)
        a_new = F.sat16(F.rshift_round(a32_qa1, QA + 1 - 12))
        a_q12 = jnp.where(need[:, None], a_new, a_q12)
    unstable = ~_lpc_inverse_pred_gain(a_q12, d)
    if d < MAX_LPC_ORDER:
        a_q12 = jnp.concatenate(
            [a_q12, jnp.zeros((b, MAX_LPC_ORDER - d), i32)], axis=1)
    return a_q12, unstable


def _nlsf_stabilize(nlsf, dmin_np):
    """silk_NLSF_stabilize over [B, L] (20 rounds + sorted fallback)."""
    L = nlsf.shape[1]
    dmin = jnp.asarray(dmin_np)
    for _ in range(20):
        d0 = nlsf[:, 0] - dmin[0]
        dmid = nlsf[:, 1:] - (nlsf[:, :-1] + dmin[1:L][None, :])
        dlast = (1 << 15) - (nlsf[:, L - 1] + dmin[L])
        diffs = jnp.concatenate([d0[:, None], dmid, dlast[:, None]],
                                axis=1)           # [B, L+1]
        imin = jnp.argmin(diffs, axis=1).astype(i32)
        mind = jnp.min(diffs, axis=1)
        go = mind < 0
        # three cases: I==0, I==L, else center
        # csumj[k] = sum(dmin[:k])
        csumj = jnp.asarray(
            np.concatenate([[0], np.cumsum(dmin_np)]).astype(np.int32))
        min_center = csumj[imin] + (dmin[imin] >> 1)
        tot = int(np.sum(dmin_np))
        max_center = (1 << 15) - (tot - csumj[imin] - dmin[imin]) \
            - (dmin[imin] >> 1)
        prev = jnp.take_along_axis(
            nlsf, jnp.clip(imin - 1, 0, L - 1)[:, None], axis=1)[:, 0]
        cur = jnp.take_along_axis(
            nlsf, jnp.clip(imin, 0, L - 1)[:, None], axis=1)[:, 0]
        center = F.rshift_round(prev + cur, 1)
        center = jnp.clip(center, min_center, max_center)
        newprev = center - (dmin[imin] >> 1)
        newcur = newprev + dmin[imin]
        mid = go & (imin > 0) & (imin < L)
        nlsf = _scatter_set(nlsf, jnp.clip(imin - 1, 0, L - 1),
                            newprev, mid)
        nlsf = _scatter_set(nlsf, jnp.clip(imin, 0, L - 1), newcur, mid)
        first = go & (imin == 0)
        nlsf = nlsf.at[:, 0].set(_sel(first, dmin[0], nlsf[:, 0]))
        last = go & (imin == L)
        nlsf = nlsf.at[:, L - 1].set(
            _sel(last, (1 << 15) - dmin[L], nlsf[:, L - 1]))
    # fallback for lanes still unsorted (reference: the post-loop path)
    d0 = nlsf[:, 0] - dmin[0]
    dmid = nlsf[:, 1:] - (nlsf[:, :-1] + dmin[1:L][None, :])
    dlast = (1 << 15) - (nlsf[:, L - 1] + dmin[L])
    bad = jnp.min(jnp.concatenate([d0[:, None], dmid, dlast[:, None]],
                                  axis=1), axis=1) < 0
    srt = jnp.sort(nlsf, axis=1)
    srt = srt.at[:, 0].set(jnp.maximum(srt[:, 0], dmin[0]))
    for i in range(1, L):
        lo = jnp.minimum(srt[:, i - 1] + dmin[i], 32767)  # ADD_SAT16
        srt = srt.at[:, i].set(jnp.maximum(srt[:, i], lo))
    srt = srt.at[:, L - 1].set(jnp.minimum(srt[:, L - 1],
                                           (1 << 15) - dmin[L]))
    for i in range(L - 2, -1, -1):
        srt = srt.at[:, i].set(jnp.minimum(srt[:, i],
                                           srt[:, i + 1] - dmin[i + 1]))
    return jnp.where(bad[:, None], srt, nlsf)


def _scatter_set(arr, col, val, mask):
    b = arr.shape[0]
    idx = jnp.where(mask, col, arr.shape[1])
    return arr.at[jnp.arange(b), idx].set(
        jnp.where(mask, val, 0), mode="drop")

# ===================================================================== #
# the symbol pass                                                       #
# ===================================================================== #

class FusedSilkState(NamedTuple):
    prev_nlsf: jax.Array      # [B, 16] i32
    last_gain_index: jax.Array  # [B] i32
    prev_gain_q16: jax.Array  # [B] i32
    first_frame: jax.Array    # [B] bool
    synth: SilkState


def fused_init_state(batch: int, fs_khz: int = 16) -> FusedSilkState:
    return FusedSilkState(
        prev_nlsf=jnp.zeros((batch, MAX_LPC_ORDER), i32),
        last_gain_index=jnp.full((batch,), 10, i32),
        prev_gain_q16=jnp.full((batch,), 1 << 16, i32),
        first_frame=jnp.ones((batch,), bool),
        synth=init_state(batch, fs_khz))


def _shell_split(d, buf, lens, tabs, level_table, p, active):
    """One shell SPLIT against the level's code table
    (shell_coder.c): returns (child1, child2, state).  level_table is
    the [17, 18] zero-padded per-count iCDF matrix."""
    act = active & (p > 0)
    table = jnp.asarray(level_table.astype(np.int32))[jnp.clip(p, 0, 16)]
    c1, d = V.rd_dec_icdf(d, buf, lens, table, 8, act)
    c1 = _sel(act, c1, 0)
    return c1, _sel(act, p - c1, 0), d


def _parse_frame_symbols(d, buf, lens, tabs, active, error,
                         nb_subfr: int, fs_khz: int):
    """Advance the range decoder over one frame's indices + pulses
    without keeping the values — the LBRR skip of dec_API.c:258-283
    (silk_decode_indices with decode_LBRR=1, i.e. the VAD type table,
    then silk_decode_pulses)."""
    b = d.rng.shape[0]
    sf = 5 * fs_khz
    L = nb_subfr * sf
    order = tabs.order

    t_ix, d = V.rd_dec_icdf(d, buf, lens, tabs.type_vad, 8, active)
    type_ix = t_ix + 2
    signal_type = type_ix >> 1

    gain_rows = jnp.asarray(tabs.gain_icdf)[signal_type]
    _g, d = V.rd_dec_icdf(d, buf, lens, gain_rows, 8, active)
    _g, d = V.rd_dec_icdf(d, buf, lens, tabs.uniform8, 8, active)
    for _ in range(nb_subfr - 1):
        _g, d = V.rd_dec_icdf(d, buf, lens, tabs.delta_gain, 8, active)

    cb1_rows = jnp.asarray(tabs.cb1_icdf)[signal_type >> 1]
    cb1, d = V.rd_dec_icdf(d, buf, lens, cb1_rows, 8, active)
    selj = jnp.asarray(tabs.ec_sel.astype(np.int32))
    half = order // 2
    sel = selj[cb1[:, None] * half + jnp.arange(half)[None, :]]
    ec_ix = jnp.zeros((b, order), i32)
    for i in range(0, order, 2):
        entry = sel[:, i // 2]
        ec_ix = ec_ix.at[:, i].set(((entry >> 1) & 7)
                                   * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1))
        ec_ix = ec_ix.at[:, i + 1].set(((entry >> 5) & 7)
                                       * (2 * NLSF_QUANT_MAX_AMPLITUDE
                                          + 1))
    ecj = jnp.asarray(tabs.ec_icdf.astype(np.int32))
    nlsf_ext_t = jnp.asarray(tabs.nlsf_ext.astype(np.int32))

    def _nlsf_coef(dd, ecix_col):
        table = ecj[ecix_col[:, None] + jnp.arange(9)[None, :]]
        ix, dd = V.rd_dec_icdf(dd, buf, lens, table, 8, active)
        lo_ext = active & (ix == 0)
        hi_ext = active & (ix == 2 * NLSF_QUANT_MAX_AMPLITUDE)
        _e, dd = V.rd_dec_icdf(dd, buf, lens, nlsf_ext_t, 8, lo_ext)
        _e, dd = V.rd_dec_icdf(dd, buf, lens, nlsf_ext_t, 8, hi_ext)
        return dd, jnp.zeros((), i32)

    d, _ = jax.lax.scan(_nlsf_coef, d, ec_ix.T)

    if nb_subfr == 4:
        _iq, d = V.rd_dec_icdf(d, buf, lens, tabs.nlsf_interp, 8, active)

    voiced = active & (signal_type == 2)
    _v, d = V.rd_dec_icdf(d, buf, lens, tabs.pitch_lag, 8, voiced)
    _v, d = V.rd_dec_icdf(d, buf, lens, tabs.lag_low, 8, voiced)
    _v, d = V.rd_dec_icdf(d, buf, lens, tabs.contour, 8, voiced)
    per_index, d = V.rd_dec_icdf(d, buf, lens, tabs.per_index, 8, voiced)
    ltp_rows = jnp.asarray(tabs.ltp_gain)[per_index]
    for _ in range(nb_subfr):
        _v, d = V.rd_dec_icdf(d, buf, lens, ltp_rows, 8, voiced)
    _v, d = V.rd_dec_icdf(d, buf, lens, tabs.ltp_scale_icdf, 8, voiced)
    _sd, d = V.rd_dec_icdf(d, buf, lens, tabs.uniform4, 8, active)

    # pulses (decode_pulses.c)
    rl_rows = jnp.asarray(tabs.rate_levels)[signal_type >> 1]
    rate_level, d = V.rd_dec_icdf(d, buf, lens, rl_rows, 8, active)
    ppb = jnp.asarray(tabs.ppb_icdf)
    nblocks = L // 16

    def _sum_block(carry, _):
        d, err = carry
        sp, d = V.rd_dec_icdf(d, buf, lens, ppb[rate_level], 8, active)
        esc = active & (sp == 17)
        sp2, d = V.rd_dec_icdf(d, buf, lens, ppb[9], 8, esc)
        esc2 = esc & (sp2 == 17)
        sp3, d = V.rd_dec_icdf(d, buf, lens, ppb[9], 8, esc2)
        err = err | (esc2 & (sp3 == 17))
        sp = _sel(esc2, sp3, _sel(esc, sp2, sp))
        return (d, err), (sp, esc.astype(i32) + esc2.astype(i32))

    (d, error), (sum_pulses, nshifts) = jax.lax.scan(
        _sum_block, (d, error), None, length=nblocks)

    def _shell_block(carry, xs):
        d = carry
        sp = xs
        p0 = [None] * 16

        def leafpair(d, p1, base):
            a, bb_, d = _shell_split(d, buf, lens, tabs, tabs.shell[0],
                                     p1, active)
            p0[base], p0[base + 1] = a, bb_
            return d

        def quad(d, p2, base):
            a, bb_, d = _shell_split(d, buf, lens, tabs, tabs.shell[1],
                                     p2, active)
            d = leafpair(d, a, base)
            d = leafpair(d, bb_, base + 2)
            return d

        def octet(d, p3, base):
            a, bb_, d = _shell_split(d, buf, lens, tabs, tabs.shell[2],
                                     p3, active)
            d = quad(d, a, base)
            d = quad(d, bb_, base + 4)
            return d

        p3a, p3b, d = _shell_split(d, buf, lens, tabs, tabs.shell[3],
                                   sp, active)
        d = octet(d, p3a, 0)
        d = octet(d, p3b, 8)
        return d, jnp.stack(p0, axis=1)

    d, blocks = jax.lax.scan(_shell_block, d, sum_pulses)

    lsb_tab = jnp.asarray(np.array([list(TD.LSB_ICDF)], np.int32))

    def _lsb_block(carry, xs):
        d = carry
        nsh, blkp = xs
        lsb_bt = jnp.broadcast_to(lsb_tab, (b, 2))

        def samp(dd, col):
            for r in range(2):
                m = active & (nsh > r)
                lsb, dd = V.rd_dec_icdf(dd, buf, lens, lsb_bt, 8, m)
                col = _sel(m, (col << 1) + lsb, col)
            return dd, col

        d, cols = jax.lax.scan(samp, d, blkp.T)
        return d, cols.T

    d, blocks = jax.lax.scan(_lsb_block, d, (nshifts, blocks))

    quant_offset_type = type_ix & 1
    i0 = 7 * (quant_offset_type + (signal_type << 1))
    signj = jnp.asarray(tabs.sign_icdf.astype(np.int32))

    def _sign_block(carry, xs):
        d = carry
        p, nsh, blkp = xs
        has = active & ((p > 0) | (nsh > 0))
        icdf0 = signj[i0 + jnp.minimum(p, 6)]
        table = jnp.stack([icdf0, jnp.zeros_like(icdf0)], axis=1)

        def samp(dd, col):
            m = has & (col > 0)
            _sg, dd = V.rd_dec_icdf(dd, buf, lens, table, 8, m)
            return dd, col

        d, _cols = jax.lax.scan(samp, d, blkp.T)
        return d, jnp.zeros((), i32)

    d, _ = jax.lax.scan(_sign_block, d, (sum_pulses, nshifts, blocks))
    return d, error


@partial(jax.jit, static_argnames=("fs_khz", "nb_subfr", "return_rc"))
def fused_silk_decode(buf, lens, state: FusedSilkState, *,
                      fs_khz: int = 16, nb_subfr: int = 4,
                      return_rc: bool = False):
    """One 20 ms SILK frame per stream, fully on device.

    buf: [B, S] int32 payload bytes; lens: [B] i32.
    Returns (xq int16-valued [B, L] i32, new state, error [B] bool);
    with return_rc=True appends the final range-decoder state so a
    hybrid caller can continue decoding the CELT half from the same
    coder (src/opus_decoder.c:432 shares one ec_dec across both)."""
    tabs = _SilkTabs(fs_khz, nb_subfr)
    b = buf.shape[0]
    sf = 5 * fs_khz
    L = nb_subfr * sf
    order = tabs.order
    d = V.rd_init(buf, lens)
    active = jnp.ones((b,), bool)
    error = jnp.zeros((b,), bool)

    # --- header flags (dec_API.c:252) ---
    vad, d = V.rd_dec_bit_logp(d, buf, lens, 1, active)
    lbrr, d = V.rd_dec_bit_logp(d, buf, lens, 1, active)
    # LBRR present: parse-through the in-band FEC frame (indices +
    # pulses with the VAD type table, dec_API.c:258-283) so the range
    # decoder lands on the regular frame; the decoded values are
    # discarded on the normal path
    d, error = _parse_frame_symbols(d, buf, lens, tabs,
                                    active & (lbrr != 0), error,
                                    nb_subfr, fs_khz)

    # --- decode_indices (decode_indices.c), CODE_INDEPENDENTLY ---
    t_vad, d = V.rd_dec_icdf(d, buf, lens, tabs.type_vad, 8, active & (vad != 0))
    t_nv, d = V.rd_dec_icdf(d, buf, lens, tabs.type_novad, 8, active & (vad == 0))
    type_ix = _sel(vad != 0, t_vad + 2, t_nv)
    signal_type = type_ix >> 1
    quant_offset_type = type_ix & 1

    gain_rows = jnp.asarray(tabs.gain_icdf)[signal_type]
    g_hi, d = V.rd_dec_icdf(d, buf, lens, gain_rows, 8, active)
    g_lo, d = V.rd_dec_icdf(d, buf, lens, tabs.uniform8, 8, active)
    gains_idx0 = (g_hi << 3) + g_lo
    gains_deltas = []
    for _ in range(nb_subfr - 1):
        gd, d = V.rd_dec_icdf(d, buf, lens, tabs.delta_gain, 8, active)
        gains_deltas.append(gd)

    cb1_rows = jnp.asarray(tabs.cb1_icdf)[signal_type >> 1]
    cb1, d = V.rd_dec_icdf(d, buf, lens, cb1_rows, 8, active)
    # NLSF_unpack (NLSF_unpack.c)
    selj = jnp.asarray(tabs.ec_sel.astype(np.int32))
    predj = jnp.asarray(tabs.pred_q8.astype(np.int32))
    half = order // 2
    sel = selj[cb1[:, None] * half + jnp.arange(half)[None, :]]  # [B, h]
    ec_ix = jnp.zeros((b, order), i32)
    pred_q8 = jnp.zeros((b, order), i32)
    for i in range(0, order, 2):
        entry = sel[:, i // 2]
        ec_ix = ec_ix.at[:, i].set(((entry >> 1) & 7)
                                   * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1))
        pred_q8 = pred_q8.at[:, i].set(
            predj[i + (entry & 1) * (order - 1)])
        ec_ix = ec_ix.at[:, i + 1].set(((entry >> 5) & 7)
                                       * (2 * NLSF_QUANT_MAX_AMPLITUDE
                                          + 1))
        pred_q8 = pred_q8.at[:, i + 1].set(
            predj[i + ((entry >> 4) & 1) * (order - 1) + 1])
    ecj = jnp.asarray(tabs.ec_icdf.astype(np.int32))
    nlsf_ext_t = jnp.asarray(tabs.nlsf_ext.astype(np.int32))

    def _nlsf_coef(dd, ecix_col):
        table = ecj[ecix_col[:, None] + jnp.arange(9)[None, :]]
        ix, dd = V.rd_dec_icdf(dd, buf, lens, table, 8, active)
        lo_ext = active & (ix == 0)
        hi_ext = active & (ix == 2 * NLSF_QUANT_MAX_AMPLITUDE)
        e_lo, dd = V.rd_dec_icdf(dd, buf, lens, nlsf_ext_t, 8, lo_ext)
        e_hi, dd = V.rd_dec_icdf(dd, buf, lens, nlsf_ext_t, 8, hi_ext)
        ix = _sel(lo_ext, ix - e_lo, _sel(hi_ext, ix + e_hi, ix))
        return dd, ix - NLSF_QUANT_MAX_AMPLITUDE

    d, nlsf_cols = jax.lax.scan(_nlsf_coef, d, ec_ix.T)
    nlsf_idx = nlsf_cols.T

    if nb_subfr == 4:
        interp_q2, d = V.rd_dec_icdf(d, buf, lens, tabs.nlsf_interp, 8, active)
    else:
        interp_q2 = jnp.full((b,), 4, i32)

    voiced = signal_type == 2
    lag_hi, d = V.rd_dec_icdf(d, buf, lens, tabs.pitch_lag, 8, active & voiced)
    lag_lo, d = V.rd_dec_icdf(d, buf, lens, tabs.lag_low, 8, active & voiced)
    lag_index = lag_hi * (fs_khz >> 1) + lag_lo
    contour, d = V.rd_dec_icdf(d, buf, lens, tabs.contour, 8, active & voiced)
    per_index, d = V.rd_dec_icdf(d, buf, lens, tabs.per_index, 8, active & voiced)
    ltp_rows = jnp.asarray(tabs.ltp_gain)[per_index]
    ltp_idx = []
    for _ in range(nb_subfr):
        li, d = V.rd_dec_icdf(d, buf, lens, ltp_rows, 8, active & voiced)
        ltp_idx.append(li)
    scale_ix, d = V.rd_dec_icdf(d, buf, lens, tabs.ltp_scale_icdf, 8,
                                active & voiced)
    seed, d = V.rd_dec_icdf(d, buf, lens, tabs.uniform4, 8, active)

    # --- decode_pulses (decode_pulses.c) ---
    # Bitstream order matches the reference exactly: all per-block
    # sum-pulse symbols (with escapes) first, then all shell trees, then
    # all LSB rounds, then all signs (decode_pulses.c:66-115).
    rl_rows = jnp.asarray(tabs.rate_levels)[signal_type >> 1]
    rate_level, d = V.rd_dec_icdf(d, buf, lens, rl_rows, 8, active)
    ppb = jnp.asarray(tabs.ppb_icdf)
    nblocks = L // 16

    def _sum_block(carry, _):
        d, err = carry
        sp, d = V.rd_dec_icdf(d, buf, lens, ppb[rate_level], 8, active)
        # up to two LSB escape rounds are decoded natively; a third
        # (>= 3 rounds, vanishingly rare) -> scalar-path fallback
        esc = active & (sp == 17)
        sp2, d = V.rd_dec_icdf(d, buf, lens, ppb[9], 8, esc)
        esc2 = esc & (sp2 == 17)
        sp3, d = V.rd_dec_icdf(d, buf, lens, ppb[9], 8, esc2)
        err = err | (esc2 & (sp3 == 17))
        sp = _sel(esc2, sp3, _sel(esc, sp2, sp))
        return (d, err), (sp, esc.astype(i32) + esc2.astype(i32))

    (d, error), (sum_pulses, nshifts) = jax.lax.scan(
        _sum_block, (d, error), None, length=nblocks)

    def _shell_block(carry, xs):
        d = carry
        sp = xs
        # shell decoder: fixed 15-split binary tree in the reference's
        # DEPTH-FIRST symbol order (shell_coder.c silk_shell_decoder)
        p0 = [None] * 16

        def leafpair(d, p1, base):
            a, bb_, d = _shell_split(d, buf, lens, tabs, tabs.shell[0],
                                     p1, active)
            p0[base], p0[base + 1] = a, bb_
            return d

        def quad(d, p2, base):
            a, bb_, d = _shell_split(d, buf, lens, tabs, tabs.shell[1],
                                     p2, active)
            d = leafpair(d, a, base)
            d = leafpair(d, bb_, base + 2)
            return d

        def octet(d, p3, base):
            a, bb_, d = _shell_split(d, buf, lens, tabs, tabs.shell[2],
                                     p3, active)
            d = quad(d, a, base)
            d = quad(d, bb_, base + 4)
            return d

        p3a, p3b, d = _shell_split(d, buf, lens, tabs, tabs.shell[3],
                                   sp, active)
        d = octet(d, p3a, 0)
        d = octet(d, p3b, 8)
        return d, jnp.stack(p0, axis=1)

    d, blocks = jax.lax.scan(_shell_block, d, sum_pulses)

    # LSB rounds (decode_pulses.c:94-110): up to two native rounds,
    # sample-major with the per-sample shift loop innermost like the
    # reference (k outer, j inner)
    lsb_tab = jnp.asarray(np.array([list(TD.LSB_ICDF)], np.int32))

    def _lsb_block(carry, xs):
        d = carry
        nsh, blkp = xs                    # [B], [B, 16]
        lsb_bt = jnp.broadcast_to(lsb_tab, (b, 2))

        def samp(dd, col):
            for r in range(2):
                m = active & (nsh > r)
                lsb, dd = V.rd_dec_icdf(dd, buf, lens, lsb_bt, 8, m)
                col = _sel(m, (col << 1) + lsb, col)
            return dd, col

        d, cols = jax.lax.scan(samp, d, blkp.T)
        return d, cols.T

    d, blocks = jax.lax.scan(_lsb_block, d, (nshifts, blocks))

    # signs (code_signs.c): icdf picked by the shell-level pulse count,
    # applied to post-LSB nonzero samples; blocks with only-LSB energy
    # still code signs (sum_pulses |= nLS<<5, decode_pulses.c:108)
    i0 = 7 * (quant_offset_type + (signal_type << 1))
    signj = jnp.asarray(tabs.sign_icdf.astype(np.int32))

    def _sign_block(carry, xs):
        d = carry
        p, nsh, blkp = xs                 # [B], [B], [B, 16]
        has = active & ((p > 0) | (nsh > 0))
        icdf0 = signj[i0 + jnp.minimum(p, 6)]
        table = jnp.stack([icdf0, jnp.zeros_like(icdf0)], axis=1)

        def samp(dd, col):
            m = has & (col > 0)
            sgn, dd = V.rd_dec_icdf(dd, buf, lens, table, 8, m)
            return dd, col * _sel(m, 2 * sgn - 1, 1)

        d, cols = jax.lax.scan(samp, d, blkp.T)
        return d, cols.T

    d, signed_blocks = jax.lax.scan(_sign_block, d,
                                    (sum_pulses, nshifts, blocks))
    pulses = signed_blocks.transpose(1, 0, 2).reshape(b, L)

    # --- decode_parameters ---
    # gains (gain_quant.c silk_gains_dequant, independent first gain)
    prev_ind = state.last_gain_index
    gains_q16 = []
    for k in range(nb_subfr):
        if k == 0:
            prev_ind = jnp.maximum(gains_idx0, prev_ind - 16)
        else:
            ind_tmp = gains_deltas[k - 1] - 4       # MIN_DELTA_GAIN_QUANT
            dst = 2 * 36 - 64 + prev_ind
            prev_ind = prev_ind + _sel(ind_tmp > dst,
                                       (ind_tmp << 1) - dst, ind_tmp)
        prev_ind = jnp.clip(prev_ind, 0, 63)
        lg = jnp.minimum(F.smulwb(jnp.full((b,), T.INV_SCALE_Q16, i32),
                                  prev_ind) + T.OFFSET, 3967)
        gains_q16.append(F.log2lin(lg))
    gains_q16 = jnp.stack(gains_q16, axis=1)       # [B, 4]
    new_last_gain = prev_ind

    # NLSF decode (NLSF_decode.c)
    out = jnp.zeros((b,), i32)
    res_q10 = jnp.zeros((b, order), i32)
    for i in range(order - 1, -1, -1):
        pred = (out * pred_q8[:, i]) >> 8
        o = nlsf_idx[:, i] << 10
        o = o - _sel(o > 0, 102, 0) + _sel(o < 0, 102, 0)
        out = pred + ((o * tabs.qstep) >> 16)   # SMLAWB, product fits
        res_q10 = res_q10.at[:, i].set(out)
    cb1_nlsf = jnp.asarray(tabs.cb1_nlsf)[cb1]     # [B, order]
    cb1_w = jnp.asarray(tabs.cb1_wght)[cb1]
    nlsf = jnp.clip(F.div32((res_q10.astype(jnp.uint32) << 14)
                            .astype(i32), cb1_w)
                    + (cb1_nlsf << 7), 0, 32767)
    nlsf = _nlsf_stabilize(nlsf, tabs.dmin)

    first = state.first_frame
    interp_q2 = _sel(first, 4, interp_q2)
    do_interp = interp_q2 < 4
    nlsf0 = state.prev_nlsf[:, :order] \
        + ((interp_q2[:, None] * (nlsf[:, :order]
                                  - state.prev_nlsf[:, :order])) >> 2)
    # one [2B]-batched NLSF2A call covers both coefficient sets (keeps
    # the compiled graph half the size of two calls)
    both, unst = _nlsf2a(tabs, jnp.concatenate(
        [nlsf[:, :order], nlsf0], axis=0))
    a1 = both[:b]
    a0_interp = both[b:]
    error = error | unst[:b] | (unst[b:] & do_interp)
    a0 = jnp.where(do_interp[:, None], a0_interp, a1)
    new_prev_nlsf = jnp.zeros((b, MAX_LPC_ORDER), i32) \
        .at[:, :order].set(nlsf[:, :order])

    # pitch lags (decode_pitch.c)
    min_lag = 2 * fs_khz
    max_lag = 18 * fs_khz
    lag = min_lag + lag_index
    lag_cb = jnp.asarray(tabs.lag_cb)
    pitch = jnp.stack(
        [jnp.clip(lag + lag_cb[k, jnp.clip(contour, 0,
                                           tabs.lag_cb.shape[1] - 1)],
                  min_lag, max_lag) for k in range(nb_subfr)], axis=1)
    pitch = jnp.where(voiced[:, None], pitch, 0)

    # LTP coefficients
    vq = jnp.asarray(tabs.ltp_vq)
    b_q14 = jnp.stack(
        [vq[jnp.clip(per_index, 0, 2), jnp.clip(ltp_idx[k], 0, 31)]
         for k in range(nb_subfr)], axis=1)        # [B, 4, 5]
    b_q14 = jnp.where(voiced[:, None, None], b_q14, 0)
    scales = jnp.asarray(tabs.ltp_scales)
    ltp_scale_q14 = jnp.where(voiced, scales[jnp.clip(scale_ix, 0, 2)], 0)

    # --- excitation (decode_core.c:80-96) via an affine LCG scan ---
    A = jnp.uint32(196314165)
    C = jnp.uint32(907633515)
    cvec = C + pulses.astype(jnp.uint32)           # c_i = C + p_i

    def comb(x, y):
        ax, bx = x
        ay, by = y
        return ax * ay, ay * bx + by

    a_arr = jnp.broadcast_to(A, (b, L))
    pa, pb = jax.lax.associative_scan(comb, (a_arr, cvec), axis=1)
    # t_i (state before step i): exclusive prefix applied to Seed
    seed_u = seed.astype(jnp.uint32)
    t_prev = jnp.concatenate(
        [seed_u[:, None],
         pa[:, :-1] * seed_u[:, None] + pb[:, :-1]], axis=1)
    r = (A * t_prev + C).astype(jnp.uint32)        # rand_seed at step i
    offset_q10 = jnp.asarray(tabs.quant_offsets)[
        signal_type >> 1, quant_offset_type]
    exc = (pulses.astype(jnp.uint32) << 14).astype(i32)
    exc = exc - _sel(exc > 0, 80 << 4, 0) + _sel(exc < 0, 80 << 4, 0)
    exc = exc + (offset_q10[:, None] << 4)
    exc = _sel(r.astype(i32) < 0, -exc, exc)

    # --- derived per-subframe gain terms ---
    gain_q10 = gains_q16 >> 6
    prev_g = state.prev_gain_q16
    gain_adj = []
    whiten = []
    for k in range(nb_subfr):
        g = gains_q16[:, k]
        adj = jnp.where(g == prev_g, 1 << 16,
                        F.div32_varq(prev_g, jnp.maximum(g, 1), 16))
        gain_adj.append(adj)
        inv = F.inverse32_varq(jnp.maximum(g, 1), 47)
        if k == 0:
            inv = (F.smulwb(inv, ltp_scale_q14)
                   .astype(jnp.uint32) << 2).astype(i32)
        whiten.append(inv)
        prev_g = g
    gain_adj = jnp.stack(gain_adj, axis=1)
    whiten = jnp.stack(whiten, axis=1)

    rewhiten2 = voiced & do_interp

    # --- synthesis (already on device, int32-exact) ---
    a_q12 = jnp.stack([a0, a1], axis=1)            # [B, 2, 16]
    xq, synth = silk_decode_step(
        exc, a_q12, b_q14, pitch, gain_q10, gain_adj, whiten,
        voiced, rewhiten2, state.synth, fs_khz=fs_khz,
        nb_subfr=nb_subfr)

    error = error | (d.error != 0)
    new_state = FusedSilkState(
        prev_nlsf=new_prev_nlsf, last_gain_index=new_last_gain,
        prev_gain_q16=prev_g, first_frame=jnp.zeros((b,), bool),
        synth=synth)
    if return_rc:
        return xq, new_state, error, d
    return xq, new_state, error


class FusedSilkDecoder:
    """Packets-in -> PCM-out SILK decoder running entirely on device."""

    def __init__(self, batch: int, fs_khz: int = 16, nb_subfr: int = 4,
                 max_payload: int = 512):
        self.batch = batch
        self.fs_khz = fs_khz
        self.nb_subfr = nb_subfr
        self.P = max_payload
        self.state = fused_init_state(batch, fs_khz)

    def decode(self, payloads):
        buf = np.zeros((self.batch, self.P), np.int32)
        lens = np.zeros(self.batch, np.int32)
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, np.uint8)
            buf[i, :len(arr)] = arr
            lens[i] = len(arr)
        xq, self.state, err = fused_silk_decode(
            jnp.asarray(buf), jnp.asarray(lens), self.state,
            fs_khz=self.fs_khz, nb_subfr=self.nb_subfr)
        return np.asarray(xq, np.int16), np.asarray(err)

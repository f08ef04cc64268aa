"""Delayed-decision NSQ with the survivor beam as a tensor dimension
(SURVEY.md §2.6): a jax twin of the scalar quantizer in
opus_tpu/silk/nsq_del_dec.py (itself bit-exact vs silk_NSQ_del_dec_c,
reference silk/NSQ_del_dec.c:114).

The per-sample survivor loop — prediction, warped noise-shape feedback,
two-candidate rate-distortion trial, winner penalty/merge — runs as
[S]-lane int32 vector ops inside one lax.scan over the subframe, with
the survivor filter states ([S, 32+sf] LPC window, [S, 24] warped AR,
[S, 40] decision ring buffers) carried through the scan.  The
sequential sample dependency is irreducible (each sample's quantization
feeds every survivor's filters), so the beam and — via an extra leading
axis, post-vmap — the stream batch are the parallel dimensions, exactly
the mapping the reference's SIMD rewrites use (NSQ_del_dec_avx2.c).

All arithmetic wraps in int32 like the C (jnp int32 semantics +
opus_tpu/ops/silk_fixed helpers); bit-exactness vs the scalar oracle is
tested on real encoder-captured calls (tests/test_nsq_del_dec_jax.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.silk_fixed import (smulwb as _smulwb_i16ok, smulww, sat16,
                              add_sat32, lshift_sat32, rshift_round,
                              inverse32_varq, div32_varq)
from . import tables as T

i32 = jnp.int32
DECISION_DELAY = 40
NSQ_LPC_BUF = 32
MAX_SHAPE_ORDER = 24
LTP_ORDER = 5
TYPE_VOICED = 2
QL_ADJ = 80                    # QUANT_LEVEL_ADJUST_Q10
I32MAX = 0x7FFFFFFF


def _i16(x):
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


def _smulwb(a, b):
    """(a32 * int16(b)) >> 16, b arbitrary int32."""
    return _smulwb_i16ok(a, _i16(b))


def _smlawb(acc, a, b):
    return acc + _smulwb(a, b)


def _smulbb(a, b):
    return _i16(a) * _i16(b)


def _rand(seed):
    return jnp.int32(907633515) + seed * jnp.int32(196314165)


def _sub_sat32(a, b):
    s = a - b                                # wraps
    overflow = ((a ^ b) < 0) & ((a ^ s) < 0)
    return jnp.where(overflow,
                     jnp.where(a >= 0, jnp.int32(I32MAX),
                               jnp.int32(-I32MAX - 1)), s)


def _masked_range_scale(buf, lo, hi, factor):
    """buf[i] = SMULWW(factor, buf[i]) for lo <= i < hi (dynamic)."""
    idx = jnp.arange(buf.shape[0])
    m = (idx >= lo) & (idx < hi)
    return jnp.where(m, smulww(factor, buf), buf)


def _analysis_fir_1d(inp, a_q12, n, order: int):
    """silk_LPC_analysis_filter over a 1-D window (values int16-ish),
    matching encoder.lpc_analysis_filter: out[ix] for ix >= order, else
    0.  inp: [n] i32; a_q12: [order] i32 (int16 values)."""
    pad = jnp.concatenate([jnp.zeros((order,), i32), inp])
    acc = jnp.zeros((n,), i32)
    base = jnp.arange(n)
    for j in range(order):
        acc = acc + _smulbb(pad[base + order - 1 - j], a_q12[j])
    # out32 = SUB32_ovflw(LSHIFT(inp,12), acc), then RSHIFT_ROUND 12,
    # SAT16 (reference silk/LPC_analysis_filter.c:99 — plain subtract,
    # no doubling; int32 wrap is native jnp int32 arithmetic)
    out32 = (inp << 12) - acc
    out = sat16(rshift_round(out32, 12))
    return jnp.where(base < order, 0, out)


@partial(jax.jit, static_argnames=(
    "frame_length", "subfr_length", "ltp_mem", "predict_order",
    "shaping_order", "n_states", "nb_subfr", "signal_type",
    "offset_q10", "lsf_interp_flag", "warping_q16"))
def _nsq_del_dec_core(x16, a_q12_2, b_q14, ar_q13, hsg_q14, tilt_q14,
                      lf_shp_q14, gains_q16, pitch_l, lambda_q10,
                      ltp_scale_q14, seed0, lag_prev, prev_gain_q16,
                      xq0, shp0, slpc0, sar20, lf_ar0, diff0,
                      *, frame_length: int, subfr_length: int,
                      ltp_mem: int, predict_order: int,
                      shaping_order: int, n_states: int, nb_subfr: int,
                      signal_type: int, offset_q10: int,
                      lsf_interp_flag: int, warping_q16: int):
    """Returns (pulses [frame], xq_new [ltp_mem+frame], shp_new, winner
    final states..., seed_init_winner)."""
    S = n_states
    total = ltp_mem + frame_length

    # ---- decision delay (reference :160-171) ----
    dd = jnp.int32(min(DECISION_DELAY, subfr_length))
    if signal_type == TYPE_VOICED:
        for k in range(nb_subfr):
            dd = jnp.minimum(dd, pitch_l[k] - LTP_ORDER // 2 - 1)
    else:
        dd = jnp.where(lag_prev > 0,
                       jnp.minimum(dd, lag_prev - LTP_ORDER // 2 - 1), dd)

    # ---- survivor state ----
    sk = jnp.arange(S, dtype=i32)
    seeds = (sk + seed0) & 3
    seed_init = seeds
    lf_ar = jnp.full((S,), lf_ar0, i32)
    diff = jnp.full((S,), diff0, i32)
    rd = jnp.zeros((S,), i32)
    slpc = jnp.broadcast_to(
        jnp.concatenate([slpc0, jnp.zeros((subfr_length,), i32)]),
        (S, NSQ_LPC_BUF + subfr_length)).astype(i32)
    sar2 = jnp.broadcast_to(sar20, (S, MAX_SHAPE_ORDER)).astype(i32)
    ring_shape = jnp.zeros((S, DECISION_DELAY), i32) \
        .at[:, 0].set(shp0[ltp_mem - 1])
    ring_rand = jnp.zeros((S, DECISION_DELAY), i32)
    ring_q = jnp.zeros((S, DECISION_DELAY), i32)
    ring_xq = jnp.zeros((S, DECISION_DELAY), i32)
    ring_pred = jnp.zeros((S, DECISION_DELAY), i32)

    xq = xq0
    shp = shp0
    sltp_q15 = jnp.zeros((total,), i32)
    sltp = jnp.zeros((total,), i32)
    pulses = jnp.zeros((frame_length,), i32)
    delayed_gain = jnp.zeros((DECISION_DELAY,), i32)
    smpl_idx = jnp.int32(0)
    shp_buf_idx = jnp.int32(ltp_mem)
    ltp_buf_idx = jnp.int32(ltp_mem)
    lag = lag_prev
    prev_gain = prev_gain_q16
    subfr = 0

    def flush(pulses, xq, shp, sltp_q15, ring_q, ring_xq, ring_shape,
              ring_pred, winner, smpl_idx, pul, pxq, shp_pos, ltp_pos,
              gain_flush, flush_shift: int, write_pred: bool):
        """_flush_winner twin: masked static loop over DECISION_DELAY."""
        for ii in range(DECISION_DELAY):
            m = ii < dd
            last = (smpl_idx + dd - 1 - ii) % DECISION_DELAY
            qv = rshift_round(ring_q[winner, last], 10)
            xv = sat16(rshift_round(
                smulww(ring_xq[winner, last], gain_flush), flush_shift))
            pi = jnp.where(m, pul + ii - dd, 0)
            pulses = pulses.at[pi].set(
                jnp.where(m, qv, pulses[pi]))
            xi = jnp.where(m, pxq + ii - dd, 0)
            xq = xq.at[xi].set(jnp.where(m, xv, xq[xi]))
            si = jnp.where(m, shp_pos - dd + ii, 0)
            shp = shp.at[si].set(
                jnp.where(m, ring_shape[winner, last], shp[si]))
            if write_pred:
                li = jnp.where(m, ltp_pos - dd + ii, 0)
                sltp_q15 = sltp_q15.at[li].set(
                    jnp.where(m, ring_pred[winner, last], sltp_q15[li]))
        return pulses, xq, shp, sltp_q15

    for k in range(nb_subfr):
        a_q12 = a_q12_2[(k >> 1) | (1 - lsf_interp_flag)]
        b5 = b_q14[k * LTP_ORDER:(k + 1) * LTP_ORDER]
        ar_shp = ar_q13[k * MAX_SHAPE_ORDER:(k + 1) * MAX_SHAPE_ORDER]
        hsg = hsg_q14[k]
        harm_lo = hsg >> 2
        harm_hi = hsg >> 1
        pul = k * subfr_length
        pxq = ltp_mem + k * subfr_length

        rewhite = False
        if signal_type == TYPE_VOICED:
            lag = pitch_l[k]
            if (k & (3 - (lsf_interp_flag << 1))) == 0:
                if k == 2:
                    # mid-frame winner flush (reference :219-248)
                    winner = jnp.argmin(rd).astype(i32)
                    rd = jnp.where(sk == winner, rd, rd + (I32MAX >> 4))
                    pulses, xq, shp, sltp_q15 = flush(
                        pulses, xq, shp, sltp_q15, ring_q, ring_xq,
                        ring_shape, ring_pred, winner, smpl_idx, pul,
                        pxq, shp_buf_idx, ltp_buf_idx, gains_q16[1], 14,
                        False)
                    subfr = 0
                rewhite = True

        if rewhite:
            start = ltp_mem - lag - predict_order - LTP_ORDER // 2
            # analysis filter over xq[start + k*sf : ltp_mem] region
            # (dynamic start): compute over the max window and place
            n = ltp_mem  # upper bound on window length
            idx = jnp.arange(total)
            # window is xq[start + k*sf : start + k*sf + (ltp_mem-start)]
            # the scalar filters xq[start+k*sf ...] writing sltp[start..]
            win_len = ltp_mem  # static upper bound
            src0 = start + k * subfr_length
            gath = jnp.take(xq, jnp.clip(src0 + jnp.arange(win_len), 0,
                                         total - 1))
            filt = _analysis_fir_1d(gath, a_q12, win_len, predict_order)
            # write filt[j] -> sltp[start + j] for j < ltp_mem - start
            wi = start + jnp.arange(win_len)
            wm = jnp.arange(win_len) < (ltp_mem - start)
            sltp = sltp.at[jnp.where(wm, wi, 0)].set(
                jnp.where(wm, filt, sltp[jnp.where(wm, wi, 0)]))
            ltp_buf_idx = jnp.int32(ltp_mem)

        # ---- scale states (silk_nsq_del_dec_scale_states) ----
        inv_gain_q31 = inverse32_varq(jnp.maximum(gains_q16[k], 1), 47)
        inv_gain_q26 = rshift_round(inv_gain_q31, 5)
        x_sc = smulww(x16[k * subfr_length:(k + 1) * subfr_length],
                      inv_gain_q26)
        if rewhite:
            ig = inv_gain_q31
            if k == 0:
                ig = _smulwb_i16ok(inv_gain_q31, ltp_scale_q14) << 2
            lo = ltp_buf_idx - lag - LTP_ORDER // 2
            idx = jnp.arange(total)
            m = (idx >= lo) & (idx < ltp_buf_idx)
            sltp_q15 = jnp.where(m, _smulwb(ig, sltp), sltp_q15)

        gain_adj = div32_varq(prev_gain, gains_q16[k], 16)
        neq = gains_q16[k] != prev_gain
        gain_adj = jnp.where(neq, gain_adj, 1 << 16)   # identity scale
        shp = _masked_range_scale(shp, shp_buf_idx - ltp_mem,
                                  shp_buf_idx, gain_adj)
        if signal_type == TYPE_VOICED and not rewhite:
            sltp_q15 = _masked_range_scale(
                sltp_q15, ltp_buf_idx - lag - LTP_ORDER // 2,
                ltp_buf_idx - dd, gain_adj)
        lf_ar = smulww(gain_adj, lf_ar)
        diff = smulww(gain_adj, diff)
        slpc = slpc.at[:, :NSQ_LPC_BUF].set(
            smulww(gain_adj, slpc[:, :NSQ_LPC_BUF]))
        sar2 = smulww(gain_adj, sar2)
        ring_pred = smulww(gain_adj, ring_pred)
        ring_shape = smulww(gain_adj, ring_shape)
        prev_gain = gains_q16[k]

        # ---- the sample scan ----
        gain_q10 = gains_q16[k] >> 6
        rdo_offset = lambda_q10 // 2 - 512
        use_rdo = lambda_q10 > 2048
        voiced = signal_type == TYPE_VOICED
        subfr_is0 = subfr == 0

        def body(carry, i):
            (slpc, sar2, lf_ar, diff, seeds, rd, ring_rand, ring_q,
             ring_xq, ring_pred_, ring_shape_, smpl_idx, shp, sltp_q15,
             xq, pulses, shp_buf_idx, ltp_buf_idx, delayed_gain) = carry

            pred_lag = ltp_buf_idx - lag + LTP_ORDER // 2
            shp_lag = shp_buf_idx - lag + 1

            if voiced:
                ltp_pred = jnp.int32(2)
                for j in range(LTP_ORDER):
                    ltp_pred = _smlawb(
                        ltp_pred, sltp_q15[jnp.clip(pred_lag - j, 0,
                                                    total - 1)], b5[j])
                ltp_pred = ltp_pred << 1
            else:
                ltp_pred = jnp.int32(0)

            haslag = lag > 0
            sl0 = shp[jnp.clip(shp_lag, 0, total - 1)]
            sl1 = shp[jnp.clip(shp_lag - 1, 0, total - 1)]
            sl2 = shp[jnp.clip(shp_lag - 2, 0, total - 1)]
            n_ltp = _smulwb(add_sat32(sl0, sl2), harm_lo)
            n_ltp = _smlawb(n_ltp, sl1, harm_hi)
            n_ltp = ltp_pred - (n_ltp << 2)
            n_ltp = jnp.where(haslag, n_ltp, 0)

            # --- per-survivor ---
            seeds2 = _rand(seeds)
            win = jax.lax.dynamic_slice(
                slpc, (0, i + NSQ_LPC_BUF - predict_order),
                (S, predict_order))
            lpc_pred = jnp.full((S,), predict_order >> 1, i32)
            for j in range(predict_order):
                lpc_pred = _smlawb(lpc_pred,
                                   win[:, predict_order - 1 - j],
                                   a_q12[j])
            lpc_pred = lpc_pred << 4

            # warped AR feedback chain (reference :423-447)
            wq = jnp.int32(warping_q16)
            tmp2 = _smlawb(diff, sar2[:, 0], wq)
            tmp1 = _smlawb(sar2[:, 0], sar2[:, 1] - tmp2, wq)
            sar2 = sar2.at[:, 0].set(tmp2)
            n_ar = jnp.full((S,), shaping_order >> 1, i32)
            n_ar = _smlawb(n_ar, tmp2, ar_shp[0])
            for j in range(2, shaping_order, 2):
                tmp2 = _smlawb(sar2[:, j - 1], sar2[:, j] - tmp1, wq)
                sar2 = sar2.at[:, j - 1].set(tmp1)
                n_ar = _smlawb(n_ar, tmp1, ar_shp[j - 1])
                tmp1 = _smlawb(sar2[:, j], sar2[:, j + 1] - tmp2, wq)
                sar2 = sar2.at[:, j].set(tmp2)
                n_ar = _smlawb(n_ar, tmp2, ar_shp[j])
            sar2 = sar2.at[:, shaping_order - 1].set(tmp1)
            n_ar = _smlawb(n_ar, tmp1, ar_shp[shaping_order - 1])
            n_ar = n_ar << 1
            n_ar = _smlawb(n_ar, lf_ar, tilt_q14[k])
            n_ar = n_ar << 2

            shp_cur = ring_shape_[:, smpl_idx]
            n_lf = _smulwb(shp_cur, lf_shp_q14[k])
            n_lf = _smlawb(n_lf, lf_ar, lf_shp_q14[k] >> 16)
            n_lf = n_lf << 2

            t1 = add_sat32(n_ar, n_lf)
            t2 = n_ltp + lpc_pred
            t1 = _sub_sat32(t2, t1)
            t1 = rshift_round(t1, 4)

            r_q10 = x_sc[i] - t1
            r_q10 = jnp.where(seeds2 < 0, -r_q10, r_q10)
            r_q10 = jnp.clip(r_q10, -(31 << 10), 30 << 10)

            q1_q10 = r_q10 - offset_q10
            q1_plain = q1_q10 >> 10
            q1_rdo = jnp.where(
                q1_q10 > rdo_offset, (q1_q10 - rdo_offset) >> 10,
                jnp.where(q1_q10 < -rdo_offset,
                          (q1_q10 + rdo_offset) >> 10,
                          jnp.where(q1_q10 < 0, -1, 0)))
            q1_q0 = jnp.where(use_rdo, q1_rdo, q1_plain)
            pos = q1_q0 > 0
            zer = q1_q0 == 0
            neg1 = q1_q0 == -1
            q1v = jnp.where(
                pos, (q1_q0 << 10) - QL_ADJ + offset_q10,
                jnp.where(zer, offset_q10,
                          jnp.where(neg1,
                                    offset_q10 - (1024 - QL_ADJ),
                                    (q1_q0 << 10) + QL_ADJ
                                    + offset_q10)))
            q2v = jnp.where(zer, q1v + (1024 - QL_ADJ),
                            jnp.where(neg1, offset_q10, q1v + 1024))
            mag1 = jnp.where(pos | zer, q1v, -q1v)
            mag2 = jnp.where(pos | zer | neg1, q2v, -q2v)
            rd1 = _smulbb(mag1, lambda_q10)
            rd2 = _smulbb(mag2, lambda_q10)
            rr1 = r_q10 - q1v
            rd1 = (rd1 + _smulbb(rr1, rr1)) >> 10   # SMLABB wraps int16
            rr2 = r_q10 - q2v
            rd2 = (rd2 + _smulbb(rr2, rr2)) >> 10
            first_is_1 = rd1 < rd2
            c0_rd = rd + jnp.where(first_is_1, rd1, rd2)
            c0_q = jnp.where(first_is_1, q1v, q2v)
            c1_rd = rd + jnp.where(first_is_1, rd2, rd1)
            c1_q = jnp.where(first_is_1, q2v, q1v)

            def derive(qq):
                exc = qq << 4
                exc = jnp.where(seeds2 < 0, -exc, exc)
                lpc_exc = exc + ltp_pred
                xq14 = lpc_exc + lpc_pred
                df = xq14 - (x_sc[i] << 4)
                slf = df - n_ar
                sh = _sub_sat32(slf, n_lf)
                return xq14, slf, df, sh, lpc_exc

            c0 = derive(c0_q)
            c1 = derive(c1_q)

            smpl_idx2 = (smpl_idx - 1) % DECISION_DELAY
            last = (smpl_idx2 + dd) % DECISION_DELAY

            winner = jnp.argmin(c0_rd).astype(i32)
            rand_last = ring_rand[:, last]
            pen = rand_last != rand_last[winner]
            c0_rd = c0_rd + jnp.where(pen, I32MAX >> 4, 0)
            c1_rd = c1_rd + jnp.where(pen, I32MAX >> 4, 0)

            rdmax_i = jnp.argmax(c0_rd).astype(i32)
            rdmin_i = jnp.argmin(c1_rd).astype(i32)
            do_merge = c1_rd[rdmin_i] < c0_rd[rdmax_i]

            def merge_rows(arr):
                # survivor rdmax_i <- full copy of survivor rdmin_i
                src = arr[rdmin_i]
                return jnp.where(
                    do_merge & (sk == rdmax_i)[(...,) + (None,) *
                                               (arr.ndim - 1)],
                    src, arr)

            slpc = merge_rows(slpc)
            sar2 = merge_rows(sar2)
            ring_rand = merge_rows(ring_rand)
            ring_q = merge_rows(ring_q)
            ring_xq = merge_rows(ring_xq)
            ring_pred_ = merge_rows(ring_pred_)
            ring_shape_ = merge_rows(ring_shape_)
            lf_ar = merge_rows(lf_ar)
            diff = merge_rows(diff)
            seeds2 = merge_rows(seeds2)
            # selected candidate per state: cand0, except the merged
            # target takes rdmin's cand1 (SeedInit merges are replayed
            # outside the scan from the emitted (take1, rdmin) pairs)
            take1 = do_merge & (sk == rdmax_i)

            def pick(c0v, c1v):
                return jnp.where(take1, c1v[rdmin_i], c0v)

            sel_rd = pick(c0_rd, c1_rd)
            sel_q = pick(c0_q, c1_q)
            sel_xq = pick(c0[0], c1[0])
            sel_slf = pick(c0[1], c1[1])
            sel_df = pick(c0[2], c1[2])
            sel_sh = pick(c0[3], c1[3])
            sel_exc = pick(c0[4], c1[4])

            # --- delayed winner output (reference :258-273) ---
            wm = (i >= dd) if subfr_is0 else jnp.bool_(True)
            qw = rshift_round(ring_q[winner, last], 10)
            dg = delayed_gain[last]
            xw = sat16(rshift_round(smulww(ring_xq[winner, last], dg),
                                    8))
            pi = jnp.where(wm, pul + i - dd, 0)
            pulses = pulses.at[pi].set(jnp.where(wm, qw, pulses[pi]))
            xi = jnp.where(wm, pxq + i - dd, 0)
            xq = xq.at[xi].set(jnp.where(wm, xw, xq[xi]))
            si = jnp.where(wm, shp_buf_idx - dd, 0)
            shp = shp.at[si].set(
                jnp.where(wm, ring_shape_[winner, last], shp[si]))
            li = jnp.where(wm, ltp_buf_idx - dd, 0)
            sltp_q15 = sltp_q15.at[li].set(
                jnp.where(wm, ring_pred_[winner, last], sltp_q15[li]))
            shp_buf_idx = shp_buf_idx + 1
            ltp_buf_idx = ltp_buf_idx + 1

            # --- commit the selected candidate (reference :275-287) ---
            lf_ar = sel_slf
            diff = sel_df
            slpc = jax.lax.dynamic_update_slice(
                slpc, sel_xq[:, None], (0, i + NSQ_LPC_BUF))

            def ring_set(arr, val):
                return jax.lax.dynamic_update_slice(
                    arr, val[:, None], (0, smpl_idx2))

            ring_xq = ring_set(ring_xq, sel_xq)
            ring_q = ring_set(ring_q, sel_q)
            ring_pred_ = ring_set(ring_pred_, sel_exc << 1)
            ring_shape_ = ring_set(ring_shape_, sel_sh)
            seeds3 = seeds2 + rshift_round(sel_q, 10)
            ring_rand = ring_set(ring_rand, seeds3)
            rd = sel_rd
            delayed_gain = delayed_gain.at[smpl_idx2].set(gain_q10)

            return (slpc, sar2, lf_ar, diff, seeds3, rd, ring_rand,
                    ring_q, ring_xq, ring_pred_, ring_shape_, smpl_idx2,
                    shp, sltp_q15, xq, pulses, shp_buf_idx, ltp_buf_idx,
                    delayed_gain), (take1, rdmin_i, do_merge, winner)

        carry = (slpc, sar2, lf_ar, diff, seeds, rd, ring_rand, ring_q,
                 ring_xq, ring_pred, ring_shape, smpl_idx, shp,
                 sltp_q15, xq, pulses, shp_buf_idx, ltp_buf_idx,
                 delayed_gain)
        carry, (take1s, rdmins, merges, winners) = jax.lax.scan(
            body, carry, jnp.arange(subfr_length))
        (slpc, sar2, lf_ar, diff, seeds, rd, ring_rand, ring_q, ring_xq,
         ring_pred, ring_shape, smpl_idx, shp, sltp_q15, xq, pulses,
         shp_buf_idx, ltp_buf_idx, delayed_gain) = carry

        # replay SeedInit merges (cheap sequential update outside scan)
        def seed_merge(si, xs):
            t1, rmin, dm, _w = xs
            return jnp.where(dm & t1, si[rmin], si), None
        seed_init, _ = jax.lax.scan(seed_merge, seed_init,
                                    (take1s, rdmins, merges, winners))

        # subframe LPC-window shift (reference :195)
        slpc = slpc.at[:, :NSQ_LPC_BUF].set(
            jax.lax.dynamic_slice(
                slpc, (0, subfr_length), (S, NSQ_LPC_BUF)))
        subfr += 1

    # ---- final winner flush (reference :279-311) ----
    winner = jnp.argmin(rd).astype(i32)
    gain_last = gains_q16[nb_subfr - 1] >> 6
    pulses, xq, shp, sltp_q15 = flush(
        pulses, xq, shp, sltp_q15, ring_q, ring_xq, ring_shape,
        ring_pred, winner, smpl_idx, frame_length, ltp_mem + frame_length,
        shp_buf_idx, ltp_buf_idx, gain_last, 8, False)
    slpc_out = jax.lax.dynamic_slice(
        slpc, (0, subfr_length), (S, NSQ_LPC_BUF))[winner]
    return (pulses, xq, shp, slpc_out, sar2[winner], lf_ar[winner],
            diff[winner], seed_init[winner], prev_gain)


def silk_nsq_del_dec_jax(ch, nsq, indices, x16, pulses, pred_coef_q12,
                         ltp_coef_q14, ar_q13, harm_shape_gain_q14,
                         tilt_q14, lf_shp_q14, gains_q16, pitch_l,
                         lambda_q10, ltp_scale_q14):
    """Drop-in twin of nsq_del_dec.silk_nsq_del_dec: same side effects
    on nsq / indices / pulses, computed by the jitted [S]-lane core."""
    frame_length = ch.frame_length
    ltp_mem = ch.ltp_mem_length
    total = ltp_mem + frame_length
    offset_q10 = T.QUANTIZATION_OFFSETS_Q10[indices.signalType >> 1][
        indices.quantOffsetType]

    out = _nsq_del_dec_core(
        jnp.asarray(x16, i32),
        jnp.asarray(pred_coef_q12, i32),
        jnp.asarray(ltp_coef_q14, i32),
        jnp.asarray(ar_q13, i32),
        jnp.asarray(harm_shape_gain_q14, i32),
        jnp.asarray(tilt_q14, i32),
        jnp.asarray(lf_shp_q14, i32),
        jnp.asarray(gains_q16, i32),
        jnp.asarray(list(pitch_l) + [0] * (4 - len(pitch_l)), i32),
        jnp.int32(lambda_q10), jnp.int32(ltp_scale_q14),
        jnp.int32(indices.Seed), jnp.int32(nsq.lagPrev),
        jnp.int32(nsq.prev_gain_Q16),
        jnp.asarray(nsq.xq[:total], i32),
        jnp.asarray(nsq.sLTP_shp_Q14[:total], i32),
        jnp.asarray(nsq.sLPC_Q14[:NSQ_LPC_BUF], i32),
        jnp.asarray(nsq.sAR2_Q14, i32),
        jnp.int32(nsq.sLF_AR_shp_Q14), jnp.int32(nsq.sDiff_shp_Q14),
        frame_length=frame_length, subfr_length=ch.subfr_length,
        ltp_mem=ltp_mem, predict_order=ch.predict_lpc_order,
        shaping_order=ch.shaping_lpc_order,
        n_states=ch.n_states_delayed_decision, nb_subfr=ch.nb_subfr,
        signal_type=indices.signalType, offset_q10=offset_q10,
        lsf_interp_flag=0 if indices.NLSFInterpCoef_Q2 == 4 else 1,
        warping_q16=ch.warping_q16)

    (pls, xq_new, shp_new, slpc_out, sar2_out, lf_ar_out, diff_out,
     seed_init_w, prev_gain) = [np.asarray(o) for o in out]

    pulses[:frame_length] = [int(v) for v in pls]
    nsq.xq[:total] = [int(v) for v in xq_new]
    nsq.sLTP_shp_Q14[:total] = [int(v) for v in shp_new]
    nsq.sLPC_Q14[:NSQ_LPC_BUF] = [int(v) for v in slpc_out]
    nsq.sAR2_Q14[:] = [int(v) for v in sar2_out]
    nsq.sLF_AR_shp_Q14 = int(lf_ar_out)
    nsq.sDiff_shp_Q14 = int(diff_out)
    nsq.lagPrev = pitch_l[ch.nb_subfr - 1]
    nsq.prev_gain_Q16 = int(prev_gain)
    indices.Seed = int(seed_init_w)
    # end-of-frame history shift (reference :305-310)
    nsq.xq[:ltp_mem] = nsq.xq[frame_length:frame_length + ltp_mem]
    nsq.sLTP_shp_Q14[:ltp_mem] = \
        nsq.sLTP_shp_Q14[frame_length:frame_length + ltp_mem]

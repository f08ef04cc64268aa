"""Delayed-decision noise-shaping quantizer (reference: silk/NSQ_del_dec.c).

The reference encoder's default quantizer at complexity >= 2: keeps 1-4
survivor states, each a full copy of the shaping/prediction filter state,
and defers the pulse decision by up to DECISION_DELAY samples so a locally
worse quantization can win globally.  Unlike silk_NSQ_c, the noise-shape
feedback here runs the *warped* AR filter (allpass chain with warping_Q16),
matching the warped coefficients produced by the noise-shaping analysis at
complexity >= 5.

All arithmetic is exact int32 fixed-point (silk.macros), differentially
tested against the reference silk_NSQ_del_dec_c (tests/test_nsq_del_dec.py).
"""

from __future__ import annotations

from .macros import (wrap32, SAT16, SMULWB, SMLAWB, SMULWW, SMULBB, SMLABB,
                     ADD32_ovflw, SUB32_ovflw, ADD_SAT32, SUB_SAT32,
                     RSHIFT_ROUND, DIV32_varQ, INVERSE32_varQ, silk_RAND)
from . import tables as T

DECISION_DELAY = 40
NSQ_LPC_BUF_LENGTH = 32
MAX_SHAPE_LPC_ORDER = 24
MAX_SUB_FRAME_LENGTH = 80
LTP_ORDER = 5
TYPE_VOICED = 2
QUANT_LEVEL_ADJUST_Q10 = 80
INT32_MAX = 0x7FFFFFFF


class _DelDecState:
    """One survivor state (reference: NSQ_del_dec_struct NSQ_del_dec.c:38)."""

    __slots__ = ("sLPC_Q14", "RandState", "Q_Q10", "Xq_Q14", "Pred_Q15",
                 "Shape_Q14", "sAR2_Q14", "LF_AR_Q14", "Diff_Q14", "Seed",
                 "SeedInit", "RD_Q10")

    def __init__(self):
        self.sLPC_Q14 = [0] * (MAX_SUB_FRAME_LENGTH + NSQ_LPC_BUF_LENGTH)
        self.RandState = [0] * DECISION_DELAY
        self.Q_Q10 = [0] * DECISION_DELAY
        self.Xq_Q14 = [0] * DECISION_DELAY
        self.Pred_Q15 = [0] * DECISION_DELAY
        self.Shape_Q14 = [0] * DECISION_DELAY
        self.sAR2_Q14 = [0] * MAX_SHAPE_LPC_ORDER
        self.LF_AR_Q14 = 0
        self.Diff_Q14 = 0
        self.Seed = 0
        self.SeedInit = 0
        self.RD_Q10 = 0

    def copy_from(self, other):
        self.sLPC_Q14 = list(other.sLPC_Q14)
        self.RandState = list(other.RandState)
        self.Q_Q10 = list(other.Q_Q10)
        self.Xq_Q14 = list(other.Xq_Q14)
        self.Pred_Q15 = list(other.Pred_Q15)
        self.Shape_Q14 = list(other.Shape_Q14)
        self.sAR2_Q14 = list(other.sAR2_Q14)
        self.LF_AR_Q14 = other.LF_AR_Q14
        self.Diff_Q14 = other.Diff_Q14
        self.Seed = other.Seed
        self.SeedInit = other.SeedInit
        self.RD_Q10 = other.RD_Q10


def _flush_winner(dd, pulses, pul_base, xq, xq_base, nsq, sltp_q15,
                  smpl_buf_idx, decision_delay, gain_flush, flush_shift,
                  write_pred):
    """Write the last decision_delay samples of the winner state out
    (the two flush sites in silk_NSQ_del_dec_c: mid-frame :237-246 and
    end-of-frame :290-300)."""
    last = smpl_buf_idx + decision_delay
    for i in range(decision_delay):
        last = (last - 1) % DECISION_DELAY
        pulses[pul_base + i - decision_delay] = \
            RSHIFT_ROUND(dd.Q_Q10[last], 10)
        xq[xq_base + i - decision_delay] = SAT16(RSHIFT_ROUND(
            SMULWW(dd.Xq_Q14[last], gain_flush), flush_shift))
        nsq.sLTP_shp_Q14[nsq.sLTP_shp_buf_idx - decision_delay + i] = \
            dd.Shape_Q14[last]
        if write_pred:
            sltp_q15[nsq.sLTP_buf_idx - decision_delay + i] = \
                dd.Pred_Q15[last]


def silk_nsq_del_dec(ch, nsq, indices, x16, pulses, pred_coef_q12,
                     ltp_coef_q14, ar_q13, harm_shape_gain_q14, tilt_q14,
                     lf_shp_q14, gains_q16, pitch_l, lambda_q10,
                     ltp_scale_q14):
    """silk_NSQ_del_dec_c (reference: silk/NSQ_del_dec.c:114).

    Same contract as encoder.silk_nsq; additionally reads
    ch.n_states_delayed_decision and ch.warping_q16, and may rewrite
    indices.Seed to the winner's initial seed (:292)."""
    from .encoder import lpc_analysis_filter, _OffsetList

    frame_length = ch.frame_length
    subfr_length = ch.subfr_length
    ltp_mem_length = ch.ltp_mem_length
    predict_order = ch.predict_lpc_order
    shaping_order = ch.shaping_lpc_order
    warping_q16 = ch.warping_q16
    n_states = ch.n_states_delayed_decision

    lag = nsq.lagPrev
    dd = [_DelDecState() for _ in range(n_states)]
    for k in range(n_states):
        d = dd[k]
        d.Seed = (k + indices.Seed) & 3
        d.SeedInit = d.Seed
        d.LF_AR_Q14 = nsq.sLF_AR_shp_Q14
        d.Diff_Q14 = nsq.sDiff_shp_Q14
        d.Shape_Q14[0] = nsq.sLTP_shp_Q14[ltp_mem_length - 1]
        d.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = nsq.sLPC_Q14[:NSQ_LPC_BUF_LENGTH]
        d.sAR2_Q14[:] = nsq.sAR2_Q14

    offset_q10 = T.QUANTIZATION_OFFSETS_Q10[indices.signalType >> 1][
        indices.quantOffsetType]
    smpl_buf_idx = 0

    decision_delay = min(DECISION_DELAY, subfr_length)
    if indices.signalType == TYPE_VOICED:
        for k in range(ch.nb_subfr):
            decision_delay = min(decision_delay,
                                 pitch_l[k] - LTP_ORDER // 2 - 1)
    elif lag > 0:
        decision_delay = min(decision_delay, lag - LTP_ORDER // 2 - 1)

    lsf_interp_flag = 0 if indices.NLSFInterpCoef_Q2 == 4 else 1

    sltp_q15 = [0] * (ltp_mem_length + frame_length)
    sltp = [0] * (ltp_mem_length + frame_length)
    delayed_gain_q10 = [0] * DECISION_DELAY
    pxq = ltp_mem_length
    nsq.sLTP_shp_buf_idx = ltp_mem_length
    nsq.sLTP_buf_idx = ltp_mem_length
    subfr = 0
    pul = 0
    for k in range(ch.nb_subfr):
        a_q12 = pred_coef_q12[((k >> 1) | (1 - lsf_interp_flag))]
        b_q14 = ltp_coef_q14[k * LTP_ORDER:(k + 1) * LTP_ORDER]
        ar_shp_q13 = ar_q13[k * MAX_SHAPE_LPC_ORDER:
                            (k + 1) * MAX_SHAPE_LPC_ORDER]
        hsg = harm_shape_gain_q14[k]
        harm_lo = hsg >> 2
        harm_hi = hsg >> 1

        nsq.rewhite_flag = 0
        if indices.signalType == TYPE_VOICED:
            lag = pitch_l[k]
            if (k & (3 - (lsf_interp_flag << 1))) == 0:
                if k == 2:
                    # mid-frame winner flush before re-whitening resets
                    # the LTP state (reference: :219-248)
                    winner = min(range(n_states),
                                 key=lambda i: dd[i].RD_Q10)
                    for i in range(n_states):
                        if i != winner:
                            dd[i].RD_Q10 += INT32_MAX >> 4
                    _flush_winner(dd[winner], pulses, pul, nsq.xq, pxq,
                                  nsq, sltp_q15, smpl_buf_idx,
                                  decision_delay, gains_q16[1], 14, False)
                    subfr = 0
                start_idx = ltp_mem_length - lag - predict_order \
                    - LTP_ORDER // 2
                assert start_idx > 0
                lpc_analysis_filter(
                    _OffsetList(sltp, start_idx),
                    _OffsetList(nsq.xq, start_idx + k * subfr_length),
                    a_q12, ltp_mem_length - start_idx, predict_order)
                nsq.sLTP_buf_idx = ltp_mem_length
                nsq.rewhite_flag = 1

        # ---- scale states (reference: silk_nsq_del_dec_scale_states) ----
        inv_gain_q31 = INVERSE32_varQ(max(gains_q16[k], 1), 47)
        inv_gain_q26 = RSHIFT_ROUND(inv_gain_q31, 5)
        x_sc_q10 = [SMULWW(x16[k * subfr_length + i], inv_gain_q26)
                    for i in range(subfr_length)]
        if nsq.rewhite_flag:
            ig = inv_gain_q31
            if k == 0:
                ig = wrap32(SMULWB(inv_gain_q31, ltp_scale_q14) << 2)
            for i in range(nsq.sLTP_buf_idx - lag - LTP_ORDER // 2,
                           nsq.sLTP_buf_idx):
                sltp_q15[i] = SMULWB(ig, sltp[i])
        if gains_q16[k] != nsq.prev_gain_Q16:
            gain_adj_q16 = DIV32_varQ(nsq.prev_gain_Q16, gains_q16[k], 16)
            for i in range(nsq.sLTP_shp_buf_idx - ltp_mem_length,
                           nsq.sLTP_shp_buf_idx):
                nsq.sLTP_shp_Q14[i] = SMULWW(gain_adj_q16,
                                             nsq.sLTP_shp_Q14[i])
            if indices.signalType == TYPE_VOICED and nsq.rewhite_flag == 0:
                for i in range(nsq.sLTP_buf_idx - lag - LTP_ORDER // 2,
                               nsq.sLTP_buf_idx - decision_delay):
                    sltp_q15[i] = SMULWW(gain_adj_q16, sltp_q15[i])
            for d in dd:
                d.LF_AR_Q14 = SMULWW(gain_adj_q16, d.LF_AR_Q14)
                d.Diff_Q14 = SMULWW(gain_adj_q16, d.Diff_Q14)
                for i in range(NSQ_LPC_BUF_LENGTH):
                    d.sLPC_Q14[i] = SMULWW(gain_adj_q16, d.sLPC_Q14[i])
                for i in range(MAX_SHAPE_LPC_ORDER):
                    d.sAR2_Q14[i] = SMULWW(gain_adj_q16, d.sAR2_Q14[i])
                for i in range(DECISION_DELAY):
                    d.Pred_Q15[i] = SMULWW(gain_adj_q16, d.Pred_Q15[i])
                    d.Shape_Q14[i] = SMULWW(gain_adj_q16, d.Shape_Q14[i])
            nsq.prev_gain_Q16 = gains_q16[k]

        # ---- quantizer (reference: silk_noise_shape_quantizer_del_dec) --
        gain_q10 = gains_q16[k] >> 6
        shp_lag = nsq.sLTP_shp_buf_idx - lag + 1
        pred_lag = nsq.sLTP_buf_idx - lag + LTP_ORDER // 2
        rdo_offset = lambda_q10 // 2 - 512
        # per-state sample candidates: (RD, Q, xq, LF_AR, Diff, shp, exc)
        ss = [[None, None] for _ in range(n_states)]
        for i in range(subfr_length):
            if indices.signalType == TYPE_VOICED:
                ltp_pred_q14 = 2
                for j in range(LTP_ORDER):
                    ltp_pred_q14 = SMLAWB(ltp_pred_q14,
                                          sltp_q15[pred_lag - j], b_q14[j])
                ltp_pred_q14 = wrap32(ltp_pred_q14 << 1)
                pred_lag += 1
            else:
                ltp_pred_q14 = 0
            if lag > 0:
                n_ltp_q14 = SMULWB(ADD_SAT32(nsq.sLTP_shp_Q14[shp_lag],
                                             nsq.sLTP_shp_Q14[shp_lag - 2]),
                                   harm_lo)
                n_ltp_q14 = SMLAWB(n_ltp_q14,
                                   nsq.sLTP_shp_Q14[shp_lag - 1], harm_hi)
                n_ltp_q14 = SUB32_ovflw(ltp_pred_q14,
                                        wrap32(n_ltp_q14 << 2))
                shp_lag += 1
            else:
                n_ltp_q14 = 0

            for st in range(n_states):
                d = dd[st]
                d.Seed = silk_RAND(d.Seed)
                psLPC = NSQ_LPC_BUF_LENGTH - 1 + i
                lpc_pred_q14 = predict_order >> 1
                for j in range(predict_order):
                    lpc_pred_q14 = SMLAWB(lpc_pred_q14,
                                          d.sLPC_Q14[psLPC - j], a_q12[j])
                lpc_pred_q14 = wrap32(lpc_pred_q14 << 4)

                # warped noise-shape feedback (allpass chain, :423-447)
                tmp2 = SMLAWB(d.Diff_Q14, d.sAR2_Q14[0], warping_q16)
                tmp1 = SMLAWB(d.sAR2_Q14[0],
                              SUB32_ovflw(d.sAR2_Q14[1], tmp2), warping_q16)
                d.sAR2_Q14[0] = tmp2
                n_ar_q14 = shaping_order >> 1
                n_ar_q14 = SMLAWB(n_ar_q14, tmp2, ar_shp_q13[0])
                for j in range(2, shaping_order, 2):
                    tmp2 = SMLAWB(d.sAR2_Q14[j - 1],
                                  SUB32_ovflw(d.sAR2_Q14[j], tmp1),
                                  warping_q16)
                    d.sAR2_Q14[j - 1] = tmp1
                    n_ar_q14 = SMLAWB(n_ar_q14, tmp1, ar_shp_q13[j - 1])
                    tmp1 = SMLAWB(d.sAR2_Q14[j],
                                  SUB32_ovflw(d.sAR2_Q14[j + 1], tmp2),
                                  warping_q16)
                    d.sAR2_Q14[j] = tmp2
                    n_ar_q14 = SMLAWB(n_ar_q14, tmp2, ar_shp_q13[j])
                d.sAR2_Q14[shaping_order - 1] = tmp1
                n_ar_q14 = SMLAWB(n_ar_q14, tmp1,
                                  ar_shp_q13[shaping_order - 1])
                n_ar_q14 = wrap32(n_ar_q14 << 1)
                n_ar_q14 = SMLAWB(n_ar_q14, d.LF_AR_Q14, tilt_q14[k])
                n_ar_q14 = wrap32(n_ar_q14 << 2)

                n_lf_q14 = SMULWB(d.Shape_Q14[smpl_buf_idx], lf_shp_q14[k])
                n_lf_q14 = SMLAWB(n_lf_q14, d.LF_AR_Q14,
                                  lf_shp_q14[k] >> 16)
                n_lf_q14 = wrap32(n_lf_q14 << 2)

                tmp1 = ADD_SAT32(n_ar_q14, n_lf_q14)
                tmp2 = ADD32_ovflw(n_ltp_q14, lpc_pred_q14)
                tmp1 = SUB_SAT32(tmp2, tmp1)
                tmp1 = RSHIFT_ROUND(tmp1, 4)

                r_q10 = x_sc_q10[i] - tmp1
                if d.Seed < 0:
                    r_q10 = -r_q10
                r_q10 = max(-(31 << 10), min(30 << 10, r_q10))

                q1_q10 = r_q10 - offset_q10
                q1_q0 = q1_q10 >> 10
                if lambda_q10 > 2048:
                    if q1_q10 > rdo_offset:
                        q1_q0 = (q1_q10 - rdo_offset) >> 10
                    elif q1_q10 < -rdo_offset:
                        q1_q0 = (q1_q10 + rdo_offset) >> 10
                    elif q1_q10 < 0:
                        q1_q0 = -1
                    else:
                        q1_q0 = 0
                if q1_q0 > 0:
                    q1_q10 = (q1_q0 << 10) - QUANT_LEVEL_ADJUST_Q10 \
                        + offset_q10
                    q2_q10 = q1_q10 + 1024
                    rd1 = SMULBB(q1_q10, lambda_q10)
                    rd2 = SMULBB(q2_q10, lambda_q10)
                elif q1_q0 == 0:
                    q1_q10 = offset_q10
                    q2_q10 = q1_q10 + (1024 - QUANT_LEVEL_ADJUST_Q10)
                    rd1 = SMULBB(q1_q10, lambda_q10)
                    rd2 = SMULBB(q2_q10, lambda_q10)
                elif q1_q0 == -1:
                    q2_q10 = offset_q10
                    q1_q10 = q2_q10 - (1024 - QUANT_LEVEL_ADJUST_Q10)
                    rd1 = SMULBB(-q1_q10, lambda_q10)
                    rd2 = SMULBB(q2_q10, lambda_q10)
                else:
                    q1_q10 = (q1_q0 << 10) + QUANT_LEVEL_ADJUST_Q10 \
                        + offset_q10
                    q2_q10 = q1_q10 + 1024
                    rd1 = SMULBB(-q1_q10, lambda_q10)
                    rd2 = SMULBB(-q2_q10, lambda_q10)
                rr = r_q10 - q1_q10
                rd1 = SMLABB(rd1, rr, rr) >> 10
                rr = r_q10 - q2_q10
                rd2 = SMLABB(rd2, rr, rr) >> 10
                if rd1 < rd2:
                    cands = ((wrap32(d.RD_Q10 + rd1), q1_q10),
                             (wrap32(d.RD_Q10 + rd2), q2_q10))
                else:
                    cands = ((wrap32(d.RD_Q10 + rd2), q2_q10),
                             (wrap32(d.RD_Q10 + rd1), q1_q10))
                for ci in range(2):
                    rd_q10, q_q10 = cands[ci]
                    exc_q14 = wrap32(q_q10 << 4)
                    if d.Seed < 0:
                        exc_q14 = -exc_q14
                    lpc_exc_q14 = wrap32(exc_q14 + ltp_pred_q14)
                    xq_q14 = ADD32_ovflw(lpc_exc_q14, lpc_pred_q14)
                    diff_q14 = SUB32_ovflw(xq_q14, wrap32(x_sc_q10[i] << 4))
                    slf_ar = SUB32_ovflw(diff_q14, n_ar_q14)
                    shp = SUB_SAT32(slf_ar, n_lf_q14)
                    ss[st][ci] = (rd_q10, q_q10, xq_q14, slf_ar, diff_q14,
                                  shp, lpc_exc_q14)

            smpl_buf_idx = (smpl_buf_idx - 1) % DECISION_DELAY
            last = (smpl_buf_idx + decision_delay) % DECISION_DELAY

            winner = min(range(n_states), key=lambda s: ss[s][0][0])
            winner_rand = dd[winner].RandState[last]
            for st in range(n_states):
                if dd[st].RandState[last] != winner_rand:
                    ss[st][0] = (wrap32(ss[st][0][0] + (INT32_MAX >> 4)),
                                 ) + ss[st][0][1:]
                    ss[st][1] = (wrap32(ss[st][1][0] + (INT32_MAX >> 4)),
                                 ) + ss[st][1][1:]
            rdmax_i = max(range(n_states), key=lambda s: ss[s][0][0])
            rdmin_i = min(range(n_states), key=lambda s: ss[s][1][0])
            if ss[rdmin_i][1][0] < ss[rdmax_i][0][0]:
                dd[rdmax_i].copy_from(dd[rdmin_i])
                ss[rdmax_i][0] = ss[rdmin_i][1]

            d = dd[winner]
            if subfr > 0 or i >= decision_delay:
                pulses[pul + i - decision_delay] = \
                    RSHIFT_ROUND(d.Q_Q10[last], 10)
                nsq.xq[pxq + i - decision_delay] = SAT16(RSHIFT_ROUND(
                    SMULWW(d.Xq_Q14[last], delayed_gain_q10[last]), 8))
                nsq.sLTP_shp_Q14[nsq.sLTP_shp_buf_idx - decision_delay] = \
                    d.Shape_Q14[last]
                sltp_q15[nsq.sLTP_buf_idx - decision_delay] = \
                    d.Pred_Q15[last]
            nsq.sLTP_shp_buf_idx += 1
            nsq.sLTP_buf_idx += 1

            for st in range(n_states):
                d = dd[st]
                rd_q10, q_q10, xq_q14, slf_ar, diff_q14, shp, lpc_exc = \
                    ss[st][0]
                d.LF_AR_Q14 = slf_ar
                d.Diff_Q14 = diff_q14
                d.sLPC_Q14[NSQ_LPC_BUF_LENGTH + i] = xq_q14
                d.Xq_Q14[smpl_buf_idx] = xq_q14
                d.Q_Q10[smpl_buf_idx] = q_q10
                d.Pred_Q15[smpl_buf_idx] = wrap32(lpc_exc << 1)
                d.Shape_Q14[smpl_buf_idx] = shp
                d.Seed = ADD32_ovflw(d.Seed, RSHIFT_ROUND(q_q10, 10))
                d.RandState[smpl_buf_idx] = d.Seed
                d.RD_Q10 = rd_q10
            delayed_gain_q10[smpl_buf_idx] = gain_q10

        for d in dd:
            d.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
                d.sLPC_Q14[subfr_length:subfr_length + NSQ_LPC_BUF_LENGTH]
        subfr += 1
        pul += subfr_length
        pxq += subfr_length

    # final winner flush (reference: :279-311)
    winner = min(range(n_states), key=lambda i: dd[i].RD_Q10)
    d = dd[winner]
    indices.Seed = d.SeedInit
    gain_q10 = gains_q16[ch.nb_subfr - 1] >> 6
    _flush_winner(d, pulses, pul, nsq.xq, pxq, nsq, sltp_q15,
                  smpl_buf_idx, decision_delay, gain_q10, 8, False)
    nsq.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
        d.sLPC_Q14[subfr_length:subfr_length + NSQ_LPC_BUF_LENGTH]
    nsq.sAR2_Q14[:] = d.sAR2_Q14
    nsq.sLF_AR_shp_Q14 = d.LF_AR_Q14
    nsq.sDiff_shp_Q14 = d.Diff_Q14
    nsq.lagPrev = pitch_l[ch.nb_subfr - 1]
    nsq.xq[:ltp_mem_length] = nsq.xq[frame_length:frame_length
                                     + ltp_mem_length]
    nsq.sLTP_shp_Q14[:ltp_mem_length] = \
        nsq.sLTP_shp_Q14[frame_length:frame_length + ltp_mem_length]

"""SILK stereo encoder side: LR->MS with adaptive prediction
(reference: silk/stereo_LR_to_MS.c, stereo_find_predictor.c,
stereo_quant_pred.c, stereo_encode_pred.c).

Fixed-point, mirroring the reference so the coded predictor indices and
the mid/side signals fed to the core encoders match its behavior."""

from __future__ import annotations

import numpy as np

from . import tables_data as TD
from .tables import STEREO_QUANT_SUB_STEPS, STEREO_INTERP_LEN_MS
from .macros import (SMULWB, SMLAWB, SMULBB, SMLABB, SAT16, RSHIFT_ROUND,
                     DIV32_16, DIV32_varQ, SQRT_APPROX, SILK_FIX_CONST,
                     sum_sqr_shift, wrap32)

STEREO_QUANT_TAB_SIZE = 16
STEREO_RATIO_SMOOTH_COEF = 0.01
LA_SHAPE_MS = 5
_INT32_MAX = 2 ** 31 - 1


def _inner_prod_scale(x, y, scale, n):
    s = 0
    for i in range(n):
        s = wrap32(s + (SMULBB(int(x[i]), int(y[i])) >> scale))
    return s


def stereo_find_predictor(x, y, mid_res_amp, amp_off, length,
                          smooth_coef_q16):
    """(reference: silk_stereo_find_predictor stereo_find_predictor.c:34).
    mid_res_amp: 4-element list state, slots [amp_off], [amp_off+1] used.
    Returns (pred_q13, ratio_q14)."""
    nrgx, scale1 = sum_sqr_shift(x)
    nrgy, scale2 = sum_sqr_shift(y)
    scale = max(scale1, scale2)
    scale = scale + (scale & 1)
    nrgy = nrgy >> (scale - scale2)
    nrgx = nrgx >> (scale - scale1)
    nrgx = max(nrgx, 1)
    corr = _inner_prod_scale(x, y, scale, length)
    pred_q13 = DIV32_varQ(corr, nrgx, 13)
    pred_q13 = max(-(1 << 14), min(1 << 14, pred_q13))
    pred2_q10 = SMULWB(pred_q13, pred_q13)

    smooth_coef_q16 = max(smooth_coef_q16, abs(pred2_q10))
    scale >>= 1
    mid_res_amp[amp_off] = SMLAWB(
        mid_res_amp[amp_off],
        (SQRT_APPROX(nrgx) << scale) - mid_res_amp[amp_off],
        smooth_coef_q16)
    nrgy = wrap32(nrgy - (SMULWB(corr, pred_q13) << 4))
    nrgy = wrap32(nrgy + (SMULWB(nrgx, pred2_q10) << 6))
    mid_res_amp[amp_off + 1] = SMLAWB(
        mid_res_amp[amp_off + 1],
        (SQRT_APPROX(nrgy) << scale) - mid_res_amp[amp_off + 1],
        smooth_coef_q16)

    ratio_q14 = DIV32_varQ(mid_res_amp[amp_off + 1],
                           max(mid_res_amp[amp_off], 1), 14)
    ratio_q14 = max(0, min(32767, ratio_q14))
    return pred_q13, ratio_q14


def stereo_quant_pred(pred_q13):
    """(reference: silk_stereo_quant_pred stereo_quant_pred.c:34).
    pred_q13: list[2] modified in place (quantized, pred0 -= pred1).
    Returns ix[2][3]."""
    ix = [[0, 0, 0], [0, 0, 0]]
    for n in range(2):
        err_min = _INT32_MAX
        quant_pred = 0
        done = False
        for i in range(STEREO_QUANT_TAB_SIZE - 1):
            low = TD.STEREO_PRED_QUANT_Q13[i]
            step = SMULWB(TD.STEREO_PRED_QUANT_Q13[i + 1] - low,
                          SILK_FIX_CONST(0.5 / STEREO_QUANT_SUB_STEPS, 16))
            for j in range(STEREO_QUANT_SUB_STEPS):
                lvl = SMLABB(low, step, 2 * j + 1)
                err = abs(pred_q13[n] - lvl)
                if err < err_min:
                    err_min = err
                    quant_pred = lvl
                    ix[n][0] = i
                    ix[n][1] = j
                else:
                    done = True
                    break
            if done:
                break
        ix[n][2] = ix[n][0] // 3
        ix[n][0] -= ix[n][2] * 3
        pred_q13[n] = quant_pred
    pred_q13[0] -= pred_q13[1]
    return ix


def stereo_encode_pred(enc, ix):
    """(reference: silk_stereo_encode_pred stereo_encode_pred.c:33)"""
    n = 5 * ix[0][2] + ix[1][2]
    enc.enc_icdf(n, TD.STEREO_PRED_JOINT_ICDF, 8)
    for k in range(2):
        enc.enc_icdf(ix[k][0], TD.UNIFORM3_ICDF, 8)
        enc.enc_icdf(ix[k][1], TD.UNIFORM5_ICDF, 8)


def stereo_encode_mid_only(enc, flag):
    enc.enc_icdf(flag, TD.STEREO_ONLY_CODE_MID_ICDF, 8)


class StereoEncState:
    """(reference: stereo_enc_state silk/structs.h)"""

    def __init__(self):
        self.pred_prev_Q13 = [0, 0]
        self.sMid = [0, 0]
        self.sSide = [0, 0]
        self.mid_side_amp_Q0 = [0, 1, 0, 1]
        self.smth_width_Q14 = SILK_FIX_CONST(1, 14)
        self.width_prev_Q14 = 0
        self.silent_side_len = 0
        self.predIx = [[[0, 0, 0], [0, 0, 0]] for _ in range(3)]
        self.mid_only_flags = [0, 0, 0]

    def lr_to_ms(self, x1, x2, frame_ix, mid_side_rates_bps,
                 total_rate_bps, prev_speech_act_q8, to_mono, fs_khz,
                 frame_length):
        """(reference: silk_stereo_LR_to_MS stereo_LR_to_MS.c:36).
        x1/x2: int lists of length frame_length (left/right); returns
        (mid[frame_length+2] incl 2-sample history, side[frame_length]
        prediction residual, mid_only_flag).  Fills mid_side_rates_bps[2]
        and self.predIx[frame_ix]."""
        # basic mid/side with 2-sample history
        mid = [0] * (frame_length + 2)
        side = [0] * (frame_length + 2)
        for n in range(frame_length):
            s = int(x1[n]) + int(x2[n])
            d = int(x1[n]) - int(x2[n])
            mid[n + 2] = RSHIFT_ROUND(s, 1)
            side[n + 2] = SAT16(RSHIFT_ROUND(d, 1))
        mid[0:2] = self.sMid
        side[0:2] = self.sSide
        self.sMid = list(mid[frame_length:frame_length + 2])
        self.sSide = list(side[frame_length:frame_length + 2])

        lp_mid = [0] * frame_length
        hp_mid = [0] * frame_length
        for n in range(frame_length):
            s = RSHIFT_ROUND(mid[n] + mid[n + 2] + (mid[n + 1] << 1), 2)
            lp_mid[n] = s
            hp_mid[n] = mid[n + 1] - s
        lp_side = [0] * frame_length
        hp_side = [0] * frame_length
        for n in range(frame_length):
            s = RSHIFT_ROUND(side[n] + side[n + 2] + (side[n + 1] << 1), 2)
            lp_side[n] = s
            hp_side[n] = side[n + 1] - s

        is10ms = frame_length == 10 * fs_khz
        smooth_coef_q16 = SILK_FIX_CONST(
            STEREO_RATIO_SMOOTH_COEF / 2 if is10ms
            else STEREO_RATIO_SMOOTH_COEF, 16)
        smooth_coef_q16 = SMULWB(
            SMULBB(prev_speech_act_q8, prev_speech_act_q8), smooth_coef_q16)

        pred_q13 = [0, 0]
        pred_q13[0], lp_ratio_q14 = stereo_find_predictor(
            lp_mid, lp_side, self.mid_side_amp_Q0, 0, frame_length,
            smooth_coef_q16)
        pred_q13[1], hp_ratio_q14 = stereo_find_predictor(
            hp_mid, hp_side, self.mid_side_amp_Q0, 2, frame_length,
            smooth_coef_q16)
        frac_q16 = SMLABB(hp_ratio_q14, lp_ratio_q14, 3)
        frac_q16 = min(frac_q16, SILK_FIX_CONST(1, 16))

        total_rate_bps -= 1200 if is10ms else 600
        total_rate_bps = max(total_rate_bps, 1)
        min_mid_rate_bps = SMLABB(2000, fs_khz, 600)
        frac_3_q16 = 3 * frac_q16
        mid_side_rates_bps[0] = DIV32_varQ(
            total_rate_bps, SILK_FIX_CONST(8 + 5, 16) + frac_3_q16, 16 + 3)
        if mid_side_rates_bps[0] < min_mid_rate_bps:
            mid_side_rates_bps[0] = min_mid_rate_bps
            mid_side_rates_bps[1] = total_rate_bps - mid_side_rates_bps[0]
            width_q14 = DIV32_varQ(
                (mid_side_rates_bps[1] << 1) - min_mid_rate_bps,
                SMULWB(SILK_FIX_CONST(1, 16) + frac_3_q16,
                       min_mid_rate_bps), 14 + 2)
            width_q14 = max(0, min(SILK_FIX_CONST(1, 14), width_q14))
        else:
            mid_side_rates_bps[1] = total_rate_bps - mid_side_rates_bps[0]
            width_q14 = SILK_FIX_CONST(1, 14)

        self.smth_width_Q14 = SMLAWB(
            self.smth_width_Q14, width_q14 - self.smth_width_Q14,
            smooth_coef_q16)

        mid_only_flag = 0
        if to_mono:
            width_q14 = 0
            pred_q13 = [0, 0]
            ix = stereo_quant_pred(pred_q13)
        elif self.width_prev_Q14 == 0 and (
                8 * total_rate_bps < 13 * min_mid_rate_bps
                or SMULWB(frac_q16, self.smth_width_Q14)
                < SILK_FIX_CONST(0.05, 14)):
            pred_q13[0] = SMULBB(self.smth_width_Q14, pred_q13[0]) >> 14
            pred_q13[1] = SMULBB(self.smth_width_Q14, pred_q13[1]) >> 14
            ix = stereo_quant_pred(pred_q13)
            width_q14 = 0
            pred_q13 = [0, 0]
            mid_side_rates_bps[0] = total_rate_bps
            mid_side_rates_bps[1] = 0
            mid_only_flag = 1
        elif self.width_prev_Q14 != 0 and (
                8 * total_rate_bps < 11 * min_mid_rate_bps
                or SMULWB(frac_q16, self.smth_width_Q14)
                < SILK_FIX_CONST(0.02, 14)):
            pred_q13[0] = SMULBB(self.smth_width_Q14, pred_q13[0]) >> 14
            pred_q13[1] = SMULBB(self.smth_width_Q14, pred_q13[1]) >> 14
            ix = stereo_quant_pred(pred_q13)
            width_q14 = 0
            pred_q13 = [0, 0]
        elif self.smth_width_Q14 > SILK_FIX_CONST(0.95, 14):
            ix = stereo_quant_pred(pred_q13)
            width_q14 = SILK_FIX_CONST(1, 14)
        else:
            pred_q13[0] = SMULBB(self.smth_width_Q14, pred_q13[0]) >> 14
            pred_q13[1] = SMULBB(self.smth_width_Q14, pred_q13[1]) >> 14
            ix = stereo_quant_pred(pred_q13)
            width_q14 = self.smth_width_Q14

        if mid_only_flag == 1:
            self.silent_side_len += frame_length \
                - STEREO_INTERP_LEN_MS * fs_khz
            if self.silent_side_len < LA_SHAPE_MS * fs_khz:
                mid_only_flag = 0
            else:
                self.silent_side_len = 10000
        else:
            self.silent_side_len = 0

        if mid_only_flag == 0 and mid_side_rates_bps[1] < 1:
            mid_side_rates_bps[1] = 1
            mid_side_rates_bps[0] = max(1, total_rate_bps
                                        - mid_side_rates_bps[1])

        # interpolate predictors and subtract prediction from side
        side_out = [0] * frame_length
        pred0 = -self.pred_prev_Q13[0]
        pred1 = -self.pred_prev_Q13[1]
        w_q24 = self.width_prev_Q14 << 10
        denom_q16 = DIV32_16(1 << 16, STEREO_INTERP_LEN_MS * fs_khz)
        delta0 = -RSHIFT_ROUND(
            SMULBB(pred_q13[0] - self.pred_prev_Q13[0], denom_q16), 16)
        delta1 = -RSHIFT_ROUND(
            SMULBB(pred_q13[1] - self.pred_prev_Q13[1], denom_q16), 16)
        deltaw_q24 = SMULWB(width_q14 - self.width_prev_Q14,
                            denom_q16) << 10
        interp = STEREO_INTERP_LEN_MS * fs_khz
        for n in range(interp):
            pred0 += delta0
            pred1 += delta1
            w_q24 += deltaw_q24
            s = (mid[n] + mid[n + 2] + (mid[n + 1] << 1)) << 9
            s = SMLAWB(SMULWB(w_q24, side[n + 1]), s, pred0)
            s = SMLAWB(s, mid[n + 1] << 11, pred1)
            side_out[n] = SAT16(RSHIFT_ROUND(s, 8))
        pred0 = -pred_q13[0]
        pred1 = -pred_q13[1]
        w_q24 = width_q14 << 10
        for n in range(interp, frame_length):
            s = (mid[n] + mid[n + 2] + (mid[n + 1] << 1)) << 9
            s = SMLAWB(SMULWB(w_q24, side[n + 1]), s, pred0)
            s = SMLAWB(s, mid[n + 1] << 11, pred1)
            side_out[n] = SAT16(RSHIFT_ROUND(s, 8))
        self.pred_prev_Q13 = [pred_q13[0], pred_q13[1]]
        self.width_prev_Q14 = width_q14
        self.predIx[frame_ix] = ix
        self.mid_only_flags[frame_ix] = mid_only_flag
        return mid, side_out, mid_only_flag

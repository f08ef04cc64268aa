"""SILK stereo prediction decode + MS->LR (reference:
silk/stereo_decode_pred.c, silk/stereo_MS_to_LR.c)."""

from __future__ import annotations

from . import tables_data as TD
from .tables import STEREO_QUANT_SUB_STEPS, STEREO_INTERP_LEN_MS
from .macros import SMULWB, SMLAWB, SMLABB, SAT16, RSHIFT_ROUND, DIV32_16, \
    SILK_FIX_CONST


def stereo_decode_pred(dec) -> list[int]:
    """Returns pred_Q13[2]."""
    n = dec.dec_icdf(TD.STEREO_PRED_JOINT_ICDF, 8)
    ix = [[0, 0, 0], [0, 0, 0]]
    ix[0][2] = n // 5
    ix[1][2] = n - 5 * ix[0][2]
    for ch in range(2):
        ix[ch][0] = dec.dec_icdf(TD.UNIFORM3_ICDF, 8)
        ix[ch][1] = dec.dec_icdf(TD.UNIFORM5_ICDF, 8)
    pred = [0, 0]
    for ch in range(2):
        ix[ch][0] += 3 * ix[ch][2]
        low = TD.STEREO_PRED_QUANT_Q13[ix[ch][0]]
        step = SMULWB(TD.STEREO_PRED_QUANT_Q13[ix[ch][0] + 1] - low,
                      SILK_FIX_CONST(0.5 / STEREO_QUANT_SUB_STEPS, 16))
        pred[ch] = SMLABB(low, step, 2 * ix[ch][1] + 1)
    pred[0] -= pred[1]
    return pred


def stereo_decode_mid_only(dec) -> int:
    return dec.dec_icdf(TD.STEREO_ONLY_CODE_MID_ICDF, 8)


class StereoDecState:
    def __init__(self):
        self.pred_prev_Q13 = [0, 0]
        self.sMid = [0, 0]
        self.sSide = [0, 0]

    def ms_to_lr(self, x1, x2, pred_q13, fs_khz, frame_length):
        """x1/x2: lists of length frame_length+2 (2-sample history prefix);
        modified in place to L/R."""
        x1[0:2] = self.sMid
        x2[0:2] = self.sSide
        self.sMid = list(x1[frame_length:frame_length + 2])
        self.sSide = list(x2[frame_length:frame_length + 2])

        pred0 = self.pred_prev_Q13[0]
        pred1 = self.pred_prev_Q13[1]
        denom = DIV32_16(1 << 16, STEREO_INTERP_LEN_MS * fs_khz)
        delta0 = RSHIFT_ROUND(
            SMLABB(0, pred_q13[0] - self.pred_prev_Q13[0], denom), 16)
        delta1 = RSHIFT_ROUND(
            SMLABB(0, pred_q13[1] - self.pred_prev_Q13[1], denom), 16)
        interp = STEREO_INTERP_LEN_MS * fs_khz
        for n in range(interp):
            pred0 += delta0
            pred1 += delta1
            s = ((x1[n] + x1[n + 2] + 2 * x1[n + 1]) << 9)
            s = SMLAWB(x2[n + 1] << 8, s, pred0)
            s = SMLAWB(s, x1[n + 1] << 11, pred1)
            x2[n + 1] = SAT16(RSHIFT_ROUND(s, 8))
        pred0 = pred_q13[0]
        pred1 = pred_q13[1]
        for n in range(interp, frame_length):
            s = ((x1[n] + x1[n + 2] + 2 * x1[n + 1]) << 9)
            s = SMLAWB(x2[n + 1] << 8, s, pred0)
            s = SMLAWB(s, x1[n + 1] << 11, pred1)
            x2[n + 1] = SAT16(RSHIFT_ROUND(s, 8))
        self.pred_prev_Q13 = list(pred_q13)

        for n in range(frame_length):
            summ = x1[n + 1] + x2[n + 1]
            diff = x1[n + 1] - x2[n + 1]
            x1[n + 1] = SAT16(summ)
            x2[n + 1] = SAT16(diff)

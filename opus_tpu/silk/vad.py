"""SILK voice activity detector (reference: silk/VAD.c, silk/sigm_Q15.c,
silk/ana_filt_bank_1.c).

Faithful fixed-point reimplementation of silk_VAD_GetSA_Q8_c: a 4-band
(0-1/1-2/2-4/4-8 kHz) energy/SNR tracker with adaptive noise-level
estimation.  Drives speech_activity_Q8, input_tilt_Q15 and per-band
input_quality_bands_Q15 exactly like the reference, which in turn drive
signal-type choice, SNR adaptation, and DTX.
"""

from __future__ import annotations

import numpy as np

from .macros import (SMULWB, SMLAWB, SMULWW, SMULBB, SMLABB, SAT16,
                     RSHIFT_ROUND, DIV32_16, lin2log, SQRT_APPROX,
                     ADD_SAT32)

VAD_N_BANDS = 4
VAD_INTERNAL_SUBFRAMES_LOG2 = 2
VAD_INTERNAL_SUBFRAMES = 1 << VAD_INTERNAL_SUBFRAMES_LOG2
VAD_NOISE_LEVEL_SMOOTH_COEF_Q16 = 1024
VAD_NOISE_LEVELS_BIAS = 50
VAD_NEGATIVE_OFFSET_Q5 = 128
VAD_SNR_FACTOR_Q16 = 45000
VAD_SNR_SMOOTH_COEF_Q18 = 4096

_INT32_MAX = 2 ** 31 - 1

# (reference: silk/sigm_Q15.c:37-47)
_SIGM_LUT_SLOPE_Q10 = (237, 153, 73, 30, 12, 7)
_SIGM_LUT_POS_Q15 = (16384, 23955, 28861, 31213, 32178, 32548)
_SIGM_LUT_NEG_Q15 = (16384, 8812, 3906, 1554, 589, 219)

_TILT_WEIGHTS = (30000, 6000, -12000, -12000)

# (reference: silk/ana_filt_bank_1.c:36-38)
_A_FB1_20 = 5394 << 1
_A_FB1_21 = -24290


def sigm_q15(in_q5: int) -> int:
    """(reference: silk_sigm_Q15 silk/sigm_Q15.c:49)"""
    if in_q5 < 0:
        in_q5 = -in_q5
        if in_q5 >= 6 * 32:
            return 0
        ind = in_q5 >> 5
        return _SIGM_LUT_NEG_Q15[ind] - SMULBB(_SIGM_LUT_SLOPE_Q10[ind],
                                               in_q5 & 0x1F)
    if in_q5 >= 6 * 32:
        return 32767
    ind = in_q5 >> 5
    return _SIGM_LUT_POS_Q15[ind] + SMULBB(_SIGM_LUT_SLOPE_Q10[ind],
                                           in_q5 & 0x1F)


def ana_filt_bank_1(inp, state, n):
    """Allpass 2-band split (reference: silk_ana_filt_bank_1).
    inp: int sequence length n; state: list[2] (modified).
    Returns (outL, outH) each length n//2."""
    n2 = n >> 1
    outL = [0] * n2
    outH = [0] * n2
    s0, s1 = state[0], state[1]
    for k in range(n2):
        in32 = int(inp[2 * k]) << 10
        Y = in32 - s0
        X = SMLAWB(Y, Y, _A_FB1_21)
        out_1 = s0 + X
        s0 = in32 + X
        in32 = int(inp[2 * k + 1]) << 10
        Y = in32 - s1
        X = SMULWB(Y, _A_FB1_20)
        out_2 = s1 + X
        s1 = in32 + X
        outL[k] = SAT16(RSHIFT_ROUND(out_2 + out_1, 11))
        outH[k] = SAT16(RSHIFT_ROUND(out_2 - out_1, 11))
    state[0], state[1] = s0, s1
    return outL, outH


class VadState:
    """(reference: silk_VAD_state silk/structs.h + silk_VAD_Init VAD.c:46)"""

    def __init__(self):
        self.AnaState = [0, 0]
        self.AnaState1 = [0, 0]
        self.AnaState2 = [0, 0]
        self.XnrgSubfr = [0] * VAD_N_BANDS
        self.HPstate = 0
        self.NoiseLevelBias = [max(VAD_NOISE_LEVELS_BIAS // (b + 1), 1)
                               for b in range(VAD_N_BANDS)]
        self.NL = [100 * b for b in self.NoiseLevelBias]
        self.inv_NL = [_INT32_MAX // nl for nl in self.NL]
        self.NrgRatioSmth_Q8 = [100 * 256] * VAD_N_BANDS
        self.counter = 15

    def copy(self):
        c = VadState.__new__(VadState)
        c.AnaState = list(self.AnaState)
        c.AnaState1 = list(self.AnaState1)
        c.AnaState2 = list(self.AnaState2)
        c.XnrgSubfr = list(self.XnrgSubfr)
        c.HPstate = self.HPstate
        c.NoiseLevelBias = list(self.NoiseLevelBias)
        c.NL = list(self.NL)
        c.inv_NL = list(self.inv_NL)
        c.NrgRatioSmth_Q8 = list(self.NrgRatioSmth_Q8)
        c.counter = self.counter
        return c

    # ------------------------------------------------------------------
    def _get_noise_levels(self, px):
        """(reference: silk_VAD_GetNoiseLevels VAD.c:306)"""
        if self.counter < 1000:
            min_coef = DIV32_16(2 ** 15 - 1, (self.counter >> 4) + 1)
            self.counter += 1
        else:
            min_coef = 0
        for k in range(VAD_N_BANDS):
            nl = self.NL[k]
            nrg = ADD_SAT32(px[k], self.NoiseLevelBias[k])
            inv_nrg = _INT32_MAX // nrg
            if nrg > (nl << 3):
                coef = VAD_NOISE_LEVEL_SMOOTH_COEF_Q16 >> 3
            elif nrg < nl:
                coef = VAD_NOISE_LEVEL_SMOOTH_COEF_Q16
            else:
                coef = SMULWB(SMULWW(inv_nrg, nl),
                              VAD_NOISE_LEVEL_SMOOTH_COEF_Q16 << 1)
            coef = max(coef, min_coef)
            self.inv_NL[k] = SMLAWB(self.inv_NL[k],
                                    inv_nrg - self.inv_NL[k], coef)
            nl = _INT32_MAX // self.inv_NL[k]
            nl = min(nl, 0x00FFFFFF)
            self.NL[k] = nl

    # ------------------------------------------------------------------
    def get_sa_q8(self, pin, frame_length, fs_khz):
        """(reference: silk_VAD_GetSA_Q8_c VAD.c:82).
        pin: int16 samples (length frame_length).
        Returns (speech_activity_q8, input_tilt_q15,
                 input_quality_bands_q15[4])."""
        dfl1 = frame_length >> 1
        dfl2 = frame_length >> 2
        dfl = frame_length >> 3
        X_offset = [0, dfl + dfl2, 0, 0]
        X_offset[2] = X_offset[1] + dfl
        X_offset[3] = X_offset[2] + dfl2
        X = [0] * (X_offset[3] + dfl1)

        lo, hi = ana_filt_bank_1(pin, self.AnaState, frame_length)
        X[:dfl1] = lo
        X[X_offset[3]:X_offset[3] + dfl1] = hi
        lo, hi = ana_filt_bank_1(X[:dfl1], self.AnaState1, dfl1)
        X[:dfl2] = lo
        X[X_offset[2]:X_offset[2] + dfl2] = hi
        lo, hi = ana_filt_bank_1(X[:dfl2], self.AnaState2, dfl2)
        X[:dfl] = lo
        X[X_offset[1]:X_offset[1] + dfl] = hi

        # HP differentiator on lowest band
        X[dfl - 1] = X[dfl - 1] >> 1
        hp_state_tmp = X[dfl - 1]
        for i in range(dfl - 1, 0, -1):
            X[i - 1] = X[i - 1] >> 1
            X[i] -= X[i - 1]
        X[0] -= self.HPstate
        self.HPstate = hp_state_tmp

        # band energies over 4 subframes (last weighted 1/2 as look-ahead)
        Xnrg = [0] * VAD_N_BANDS
        for b in range(VAD_N_BANDS):
            dec_fl = frame_length >> min(VAD_N_BANDS - b, VAD_N_BANDS - 1)
            dsl = dec_fl >> VAD_INTERNAL_SUBFRAMES_LOG2
            off = 0
            Xnrg[b] = self.XnrgSubfr[b]
            sum_sq = 0
            for s in range(VAD_INTERNAL_SUBFRAMES):
                seg = np.asarray(
                    X[X_offset[b] + off:X_offset[b] + off + dsl],
                    dtype=np.int64) >> 3
                sum_sq = int(np.dot(seg, seg))
                if s < VAD_INTERNAL_SUBFRAMES - 1:
                    Xnrg[b] = ADD_SAT32(Xnrg[b], sum_sq)
                else:
                    Xnrg[b] = ADD_SAT32(Xnrg[b], sum_sq >> 1)
                off += dsl
            self.XnrgSubfr[b] = sum_sq

        self._get_noise_levels(Xnrg)

        sum_squared = 0
        input_tilt = 0
        nrg_to_noise_q8 = [0] * VAD_N_BANDS
        for b in range(VAD_N_BANDS):
            speech_nrg = Xnrg[b] - self.NL[b]
            if speech_nrg > 0:
                if (Xnrg[b] & 0xFF800000) == 0:
                    nrg_to_noise_q8[b] = (Xnrg[b] << 8) // (self.NL[b] + 1)
                else:
                    nrg_to_noise_q8[b] = Xnrg[b] // ((self.NL[b] >> 8) + 1)
                snr_q7 = lin2log(nrg_to_noise_q8[b]) - 8 * 128
                sum_squared = SMLABB(sum_squared, snr_q7, snr_q7)
                if speech_nrg < (1 << 20):
                    snr_q7 = SMULWB(SQRT_APPROX(speech_nrg) << 6, snr_q7)
                input_tilt = SMLAWB(input_tilt, _TILT_WEIGHTS[b], snr_q7)
            else:
                nrg_to_noise_q8[b] = 256

        sum_squared = DIV32_16(sum_squared, VAD_N_BANDS)
        snr_db_q7 = 3 * SQRT_APPROX(sum_squared)

        sa_q15 = sigm_q15(SMULWB(VAD_SNR_FACTOR_Q16, snr_db_q7)
                          - VAD_NEGATIVE_OFFSET_Q5)
        input_tilt_q15 = (sigm_q15(input_tilt) - 16384) << 1

        speech_nrg = 0
        for b in range(VAD_N_BANDS):
            speech_nrg += (b + 1) * ((Xnrg[b] - self.NL[b]) >> 4)
        if frame_length == 20 * fs_khz:
            speech_nrg >>= 1
        if speech_nrg <= 0:
            sa_q15 >>= 1
        elif speech_nrg < 16384:
            speech_nrg = SQRT_APPROX(speech_nrg << 16)
            sa_q15 = SMULWB(32768 + speech_nrg, sa_q15)

        speech_activity_q8 = min(sa_q15 >> 7, 255)

        smooth_coef_q16 = SMULWB(VAD_SNR_SMOOTH_COEF_Q18,
                                 SMULWB(sa_q15, sa_q15))
        if frame_length == 10 * fs_khz:
            smooth_coef_q16 >>= 1

        quality_q15 = [0] * VAD_N_BANDS
        for b in range(VAD_N_BANDS):
            self.NrgRatioSmth_Q8[b] = SMLAWB(
                self.NrgRatioSmth_Q8[b],
                nrg_to_noise_q8[b] - self.NrgRatioSmth_Q8[b],
                smooth_coef_q16)
            snr_q7 = 3 * (lin2log(self.NrgRatioSmth_Q8[b]) - 8 * 128)
            quality_q15[b] = sigm_q15((snr_q7 - 16 * 128) >> 4)

        return speech_activity_q8, input_tilt_q15, quality_q15

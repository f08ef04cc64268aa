"""SILK decoder core (reference: silk/dec_API.c, decode_frame.c,
decode_indices.c, decode_pulses.c, decode_parameters.c, decode_core.c,
NLSF_decode.c, NLSF2A.c, gain_quant.c, decoder_set_fs.c, PLC.c, CNG.c).

Exact fixed-point integer implementation (the SILK decoder is fixed-point
only in the reference); per-stream scalar path.  PCM out is int16 at the
internal rate; the resampler (opus_tpu.silk.resampler) converts to API rate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..bitstream.range_coder import RangeDecoder
from . import tables_data as TD
from .tables import *  # noqa: F401,F403 - constants namespace
from . import tables as T
from .macros import (SMULWB, SMLAWB, SMULWW, SMLAWW, SMULBB, SMLABB,
                     SMLABB_ovflw, SMMUL, RSHIFT_ROUND, RSHIFT_ROUND64,
                     SAT16, SAT32, ADD_SAT32, LSHIFT_SAT32, wrap32, wrap16,
                     CLZ32, silk_RAND, DIV32_16, DIV32, INVERSE32_varQ,
                     DIV32_varQ, log2lin, lin2log, SQRT_APPROX, sum_sqr_shift,
                     SILK_FIX_CONST, INT32_MAX, ADD_SAT16)
from .resampler import Resampler


# ----------------------------------------------------------------------
# small helpers

def _limit(x, lo, hi):
    return lo if x < lo else (hi if x > hi else x)


def silk_bwexpander(ar, d, chirp_q16):
    chirp_minus_one = chirp_q16 - 65536
    for i in range(d - 1):
        ar[i] = wrap16(RSHIFT_ROUND(chirp_q16 * ar[i], 16))
        chirp_q16 += RSHIFT_ROUND(chirp_q16 * chirp_minus_one, 16)
    ar[d - 1] = wrap16(RSHIFT_ROUND(chirp_q16 * ar[d - 1], 16))


def silk_bwexpander_32(ar, d, chirp_q16):
    chirp_minus_one = chirp_q16 - 65536
    for i in range(d - 1):
        ar[i] = SMULWW(chirp_q16, ar[i])
        chirp_q16 += RSHIFT_ROUND(chirp_q16 * chirp_minus_one, 16)
    ar[d - 1] = SMULWW(chirp_q16, ar[d - 1])


_QA24 = 24
_A_LIMIT = SILK_FIX_CONST(0.99975, _QA24)


def _lpc_inverse_pred_gain_qa(a_qa, order):
    inv_gain_q30 = 1 << 30
    k = order - 1
    while k > 0:
        if a_qa[k] > _A_LIMIT or a_qa[k] < -_A_LIMIT:
            return 0
        rc_q31 = -(a_qa[k] << (31 - _QA24))
        rc_mult1_q30 = (1 << 30) - SMMUL(rc_q31, rc_q31)
        inv_gain_q30 = SMMUL(inv_gain_q30, rc_mult1_q30) << 2
        if inv_gain_q30 < SILK_FIX_CONST(1.0 / 1e4, 30):
            return 0
        mult2q = 32 - CLZ32(abs(rc_mult1_q30))
        rc_mult2 = INVERSE32_varQ(rc_mult1_q30, mult2q + 30)
        for n in range((k + 1) >> 1):
            tmp1 = a_qa[n]
            tmp2 = a_qa[k - n - 1]
            # MUL32_FRAC_Q uses a ROUNDED 64-bit shift (silk/macros.h):
            # truncating here diverges in the PLC unvoiced noise-gain path
            t64 = RSHIFT_ROUND64(
                SAT32(tmp1 - RSHIFT_ROUND64(tmp2 * rc_q31, 31))
                * rc_mult2, mult2q)
            if t64 > INT32_MAX or t64 < -INT32_MAX - 1:
                return 0
            a_qa[n] = t64
            t64 = RSHIFT_ROUND64(
                SAT32(tmp2 - RSHIFT_ROUND64(tmp1 * rc_q31, 31))
                * rc_mult2, mult2q)
            if t64 > INT32_MAX or t64 < -INT32_MAX - 1:
                return 0
            a_qa[k - n - 1] = t64
        k -= 1
    if a_qa[0] > _A_LIMIT or a_qa[0] < -_A_LIMIT:
        return 0
    rc_q31 = -(a_qa[0] << (31 - _QA24))
    rc_mult1_q30 = (1 << 30) - SMMUL(rc_q31, rc_q31)
    inv_gain_q30 = SMMUL(inv_gain_q30, rc_mult1_q30) << 2
    if inv_gain_q30 < SILK_FIX_CONST(1.0 / 1e4, 30):
        return 0
    return inv_gain_q30


def lpc_inverse_pred_gain(a_q12, order):
    dc_resp = 0
    a_qa = [0] * order
    for k in range(order):
        dc_resp += a_q12[k]
        a_qa[k] = a_q12[k] << (_QA24 - 12)
    if dc_resp >= 4096:
        return 0
    return _lpc_inverse_pred_gain_qa(a_qa, order)


def silk_lpc_fit(a_qin, qout, qin, d):
    """Returns int16 list (reference: silk/LPC_fit.c)."""
    for _ in range(10):
        maxabs = 0
        idx = 0
        for k in range(d):
            absval = abs(a_qin[k])
            if absval > maxabs:
                maxabs = absval
                idx = k
        maxabs = RSHIFT_ROUND(maxabs, qin - qout)
        if maxabs > 32767:
            maxabs = min(maxabs, 163838)
            chirp_q16 = SILK_FIX_CONST(0.999, 16) - DIV32(
                (maxabs - 32767) << 14, (maxabs * (idx + 1)) >> 2)
            silk_bwexpander_32(a_qin, d, chirp_q16)
        else:
            break
    else:
        # force fit after 10 iterations
        for k in range(d):
            a_qin[k] = SAT16(RSHIFT_ROUND(a_qin[k], qin - qout)) << (qin - qout)
    return [SAT16(RSHIFT_ROUND(a_qin[k], qin - qout)) for k in range(d)]


def nlsf2a(nlsf_q15, d):
    """NLSF -> LPC Q12 (reference: silk/NLSF2A.c)."""
    ordering = ((0, 15, 8, 7, 4, 11, 12, 3, 2, 13, 10, 5, 6, 9, 14, 1)
                if d == 16 else (0, 9, 6, 3, 4, 5, 8, 1, 2, 7))
    qa = 16
    cos_lsf_qa = [0] * d
    for k in range(d):
        f_int = nlsf_q15[k] >> (15 - 7)
        f_frac = nlsf_q15[k] - (f_int << (15 - 7))
        cos_val = TD.LSFCOSTAB_FIX_Q12[f_int]
        delta = TD.LSFCOSTAB_FIX_Q12[f_int + 1] - cos_val
        cos_lsf_qa[ordering[k]] = RSHIFT_ROUND(
            (cos_val << 8) + delta * f_frac, 20 - qa)
    dd = d >> 1

    def find_poly(clsf_off):
        out = [0] * (dd + 1)
        out[0] = 1 << qa
        out[1] = -cos_lsf_qa[clsf_off]
        for k in range(1, dd):
            ftmp = cos_lsf_qa[2 * k + clsf_off]
            out[k + 1] = (out[k - 1] << 1) - RSHIFT_ROUND64(ftmp * out[k], qa)
            for n in range(k, 1, -1):
                out[n] += out[n - 2] - RSHIFT_ROUND64(ftmp * out[n - 1], qa)
            out[1] -= ftmp
        return out

    p = find_poly(0)
    q = find_poly(1)
    a32_qa1 = [0] * d
    for k in range(dd):
        ptmp = p[k + 1] + p[k]
        qtmp = q[k + 1] - q[k]
        a32_qa1[k] = -qtmp - ptmp
        a32_qa1[d - k - 1] = qtmp - ptmp
    a_q12 = silk_lpc_fit(a32_qa1, 12, qa + 1, d)
    i = 0
    while lpc_inverse_pred_gain(a_q12, d) == 0 and i < MAX_LPC_STABILIZE_ITERATIONS:
        silk_bwexpander_32(a32_qa1, d, 65536 - (2 << i))
        a_q12 = [SAT16(RSHIFT_ROUND(a32_qa1[k], qa + 1 - 12)) for k in range(d)]
        i += 1
    return a_q12


def nlsf_stabilize(nlsf_q15, ndelta_min_q15, L):
    for _ in range(20):
        min_diff = nlsf_q15[0] - ndelta_min_q15[0]
        I = 0
        for i in range(1, L):
            diff = nlsf_q15[i] - (nlsf_q15[i - 1] + ndelta_min_q15[i])
            if diff < min_diff:
                min_diff = diff
                I = i
        diff = (1 << 15) - (nlsf_q15[L - 1] + ndelta_min_q15[L])
        if diff < min_diff:
            min_diff = diff
            I = L
        if min_diff >= 0:
            return
        if I == 0:
            nlsf_q15[0] = ndelta_min_q15[0]
        elif I == L:
            nlsf_q15[L - 1] = (1 << 15) - ndelta_min_q15[L]
        else:
            min_center = sum(ndelta_min_q15[:I]) + (ndelta_min_q15[I] >> 1)
            max_center = (1 << 15) - sum(ndelta_min_q15[I + 1:L + 1]) \
                - (ndelta_min_q15[I] >> 1)
            center = _limit(RSHIFT_ROUND(nlsf_q15[I - 1] + nlsf_q15[I], 1),
                            min_center, max_center)
            nlsf_q15[I - 1] = center - (ndelta_min_q15[I] >> 1)
            nlsf_q15[I] = nlsf_q15[I - 1] + ndelta_min_q15[I]
    # fallback
    nlsf_q15.sort()
    nlsf_q15[0] = max(nlsf_q15[0], ndelta_min_q15[0])
    for i in range(1, L):
        nlsf_q15[i] = max(nlsf_q15[i], ADD_SAT16(nlsf_q15[i - 1],
                                                 ndelta_min_q15[i]))
    nlsf_q15[L - 1] = min(nlsf_q15[L - 1], (1 << 15) - ndelta_min_q15[L])
    for i in range(L - 2, -1, -1):
        nlsf_q15[i] = min(nlsf_q15[i], nlsf_q15[i + 1] - ndelta_min_q15[i + 1])


def nlsf_unpack(cb: T.NLSFCodebook, cb1_index):
    ec_ix = [0] * cb.order
    pred_q8 = [0] * cb.order
    base = cb1_index * cb.order // 2
    for i in range(0, cb.order, 2):
        entry = cb.ec_sel[base + i // 2]
        ec_ix[i] = ((entry >> 1) & 7) * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1)
        pred_q8[i] = cb.pred_Q8[i + (entry & 1) * (cb.order - 1)]
        ec_ix[i + 1] = ((entry >> 5) & 7) * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1)
        pred_q8[i + 1] = cb.pred_Q8[i + ((entry >> 4) & 1) * (cb.order - 1) + 1]
    return ec_ix, pred_q8


def nlsf_decode(indices, cb: T.NLSFCodebook):
    ec_ix, pred_q8 = nlsf_unpack(cb, indices[0])
    # residual dequant
    res_q10 = [0] * cb.order
    out = 0
    adj = SILK_FIX_CONST(NLSF_QUANT_LEVEL_ADJ, 10)
    for i in range(cb.order - 1, -1, -1):
        pred = (out * pred_q8[i]) >> 8
        out = indices[i + 1] << 10
        if out > 0:
            out -= adj
        elif out < 0:
            out += adj
        out = SMLAWB(pred, out, cb.quantStepSize_Q16)
        res_q10[i] = out
    nlsf = [0] * cb.order
    base = indices[0] * cb.order
    for i in range(cb.order):
        tmp = DIV32_16(res_q10[i] << 14, cb.CB1_Wght_Q9[base + i]) \
            + (cb.CB1_NLSF_Q8[base + i] << 7)
        nlsf[i] = _limit(tmp, 0, 32767)
    nlsf_stabilize(nlsf, cb.deltaMin_Q15, cb.order)
    return nlsf


def gains_dequant(ind, prev_ind, conditional, nb_subfr):
    """Returns (gains_q16 list, new prev_ind)."""
    gains = [0] * nb_subfr
    for k in range(nb_subfr):
        if k == 0 and not conditional:
            prev_ind = max(ind[k], prev_ind - 16)
        else:
            ind_tmp = ind[k] + MIN_DELTA_GAIN_QUANT
            dst = 2 * MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN + prev_ind
            if ind_tmp > dst:
                prev_ind += (ind_tmp << 1) - dst
            else:
                prev_ind += ind_tmp
        prev_ind = _limit(prev_ind, 0, N_LEVELS_QGAIN - 1)
        gains[k] = log2lin(min(SMULWB(T.INV_SCALE_Q16, prev_ind) + T.OFFSET,
                               3967))
    return gains, prev_ind


def decode_pitch(lag_index, contour_index, fs_khz, nb_subfr):
    if fs_khz == 8:
        if nb_subfr == PE_MAX_NB_SUBFR:
            cb = T.CB_LAGS_STAGE2
        else:
            cb = T.CB_LAGS_STAGE2_10MS
    else:
        if nb_subfr == PE_MAX_NB_SUBFR:
            cb = T.CB_LAGS_STAGE3
        else:
            cb = T.CB_LAGS_STAGE3_10MS
    min_lag = PE_MIN_LAG_MS * fs_khz
    max_lag = PE_MAX_LAG_MS * fs_khz
    lag = min_lag + lag_index
    return [_limit(lag + cb[k][contour_index], min_lag, max_lag)
            for k in range(nb_subfr)]


def lpc_analysis_filter(out, inp, b, length, d):
    """(reference: silk/LPC_analysis_filter.c, float-less path)"""
    for ix in range(d, length):
        out32_q12 = SMULBB(inp[ix - 1], b[0])
        for j in range(1, d):
            out32_q12 = SMLABB_ovflw(out32_q12, inp[ix - 1 - j], b[j])
        out32_q12 = wrap32((inp[ix] << 12) - out32_q12)
        out[ix] = SAT16(RSHIFT_ROUND(out32_q12, 12))
    for ix in range(d):
        out[ix] = 0


# ----------------------------------------------------------------------

@dataclass
class SideInfoIndices:
    GainsIndices: list = field(default_factory=lambda: [0] * MAX_NB_SUBFR)
    LTPIndex: list = field(default_factory=lambda: [0] * MAX_NB_SUBFR)
    NLSFIndices: list = field(default_factory=lambda: [0] * (MAX_LPC_ORDER + 1))
    lagIndex: int = 0
    contourIndex: int = 0
    signalType: int = 0
    quantOffsetType: int = 0
    NLSFInterpCoef_Q2: int = 0
    PERIndex: int = 0
    LTP_scaleIndex: int = 0
    Seed: int = 0


@dataclass
class DecoderControl:
    pitchL: list = field(default_factory=lambda: [0] * MAX_NB_SUBFR)
    Gains_Q16: list = field(default_factory=lambda: [0] * MAX_NB_SUBFR)
    PredCoef_Q12: list = field(default_factory=lambda: [[0] * MAX_LPC_ORDER,
                                                        [0] * MAX_LPC_ORDER])
    LTPCoef_Q14: list = field(default_factory=lambda: [0] * (LTP_ORDER * MAX_NB_SUBFR))
    LTP_scale_Q14: int = 0


class ChannelState:
    """silk_decoder_state (reference: silk/structs.h)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.prev_gain_Q16 = 65536
        self.exc_Q14 = [0] * MAX_FRAME_LENGTH
        self.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
        self.outBuf = [0] * (MAX_FRAME_LENGTH + 2 * (SUB_FRAME_LENGTH_MS * 16))
        self.lagPrev = 100
        self.LastGainIndex = 10
        self.fs_kHz = 0
        self.fs_API_hz = 0
        self.nb_subfr = 0
        self.frame_length = 0
        self.subfr_length = 0
        self.ltp_mem_length = 0
        self.LPC_order = 0
        self.prevNLSF_Q15 = [0] * MAX_LPC_ORDER
        self.first_frame_after_reset = 1
        self.pitch_lag_low_bits_icdf = None
        self.pitch_contour_icdf = None
        self.nFramesDecoded = 0
        self.nFramesPerPacket = 0
        self.ec_prevSignalType = 0
        self.ec_prevLagIndex = 0
        self.VAD_flags = [0] * 3
        self.LBRR_flag = 0
        self.LBRR_flags = [0] * 3
        self.resampler: Resampler | None = None
        self.indices = SideInfoIndices()
        self.lossCnt = 0
        self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.psNLSF_CB = None
        # PLC
        self.plc_pitchL_Q8 = 0
        self.plc_LTPCoef_Q14 = [0] * LTP_ORDER
        self.plc_prevLPC_Q12 = [0] * MAX_LPC_ORDER
        self.plc_last_frame_lost = 0
        # zero like the reference's memset of silk_PLC_struct
        # (init_decoder.c; 3176576 is only the CNG seed)
        self.plc_rand_seed = 0
        self.plc_randScale_Q14 = 0
        self.plc_conc_energy = 0
        self.plc_conc_energy_shift = 0
        self.plc_prevLTP_scale_Q14 = 0
        self.plc_prevGain_Q16 = [65536, 65536]
        self.plc_fs_kHz = 0
        self.plc_nb_subfr = 2
        self.plc_subfr_length = 20
        # CNG
        self.cng_exc_buf_Q14 = [0] * MAX_FRAME_LENGTH
        self.cng_smth_NLSF_Q15 = [0] * MAX_LPC_ORDER
        self.cng_synth_state = [0] * MAX_LPC_ORDER
        self.cng_smth_Gain_Q16 = 0
        self.cng_rand_seed = 3176576
        self.cng_fs_kHz = 0

    def set_fs(self, fs_khz, fs_api_hz):
        """(reference: silk/decoder_set_fs.c)"""
        self.subfr_length = SUB_FRAME_LENGTH_MS * fs_khz
        frame_length = self.nb_subfr * self.subfr_length
        if self.fs_kHz != fs_khz or self.fs_API_hz != fs_api_hz:
            self.resampler = Resampler(fs_khz * 1000, fs_api_hz)
            self.fs_API_hz = fs_api_hz
        if self.fs_kHz != fs_khz or frame_length != self.frame_length:
            if fs_khz == 8:
                self.pitch_contour_icdf = (TD.PITCH_CONTOUR_NB_ICDF
                                           if self.nb_subfr == MAX_NB_SUBFR
                                           else TD.PITCH_CONTOUR_10_MS_NB_ICDF)
            else:
                self.pitch_contour_icdf = (TD.PITCH_CONTOUR_ICDF
                                           if self.nb_subfr == MAX_NB_SUBFR
                                           else TD.PITCH_CONTOUR_10_MS_ICDF)
            if self.fs_kHz != fs_khz:
                self.ltp_mem_length = LTP_MEM_LENGTH_MS * fs_khz
                if fs_khz in (8, 12):
                    self.LPC_order = MIN_LPC_ORDER
                    self.psNLSF_CB = T.NLSF_CB_NB_MB
                else:
                    self.LPC_order = MAX_LPC_ORDER
                    self.psNLSF_CB = T.NLSF_CB_WB
                if fs_khz == 16:
                    self.pitch_lag_low_bits_icdf = TD.UNIFORM8_ICDF
                elif fs_khz == 12:
                    self.pitch_lag_low_bits_icdf = TD.UNIFORM6_ICDF
                else:
                    self.pitch_lag_low_bits_icdf = TD.UNIFORM4_ICDF
                self.first_frame_after_reset = 1
                self.lagPrev = 100
                self.LastGainIndex = 10
                self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
                self.outBuf = [0] * (MAX_FRAME_LENGTH
                                     + 2 * SUB_FRAME_LENGTH_MS * 16)
                self.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
            self.fs_kHz = fs_khz
            self.frame_length = frame_length

    # ------------------------------------------------------------------
    def decode_indices(self, dec: RangeDecoder, frame_index, decode_lbrr,
                       cond_coding):
        ind = self.indices
        if decode_lbrr or self.VAD_flags[frame_index]:
            ix = dec.dec_icdf(TD.TYPE_OFFSET_VAD_ICDF, 8) + 2
        else:
            ix = dec.dec_icdf(TD.TYPE_OFFSET_NO_VAD_ICDF, 8)
        ind.signalType = ix >> 1
        ind.quantOffsetType = ix & 1

        if cond_coding == CODE_CONDITIONALLY:
            ind.GainsIndices[0] = dec.dec_icdf(TD.DELTA_GAIN_ICDF, 8)
        else:
            ind.GainsIndices[0] = dec.dec_icdf(
                T.GAIN_ICDF[ind.signalType], 8) << 3
            ind.GainsIndices[0] += dec.dec_icdf(TD.UNIFORM8_ICDF, 8)
        for i in range(1, self.nb_subfr):
            ind.GainsIndices[i] = dec.dec_icdf(TD.DELTA_GAIN_ICDF, 8)

        cb = self.psNLSF_CB
        base = (ind.signalType >> 1) * cb.nVectors
        ind.NLSFIndices[0] = dec.dec_icdf(cb.CB1_iCDF[base:], 8)
        ec_ix, _pred = nlsf_unpack(cb, ind.NLSFIndices[0])
        for i in range(cb.order):
            ix = dec.dec_icdf(cb.ec_iCDF[ec_ix[i]:], 8)
            if ix == 0:
                ix -= dec.dec_icdf(TD.NLSF_EXT_ICDF, 8)
            elif ix == 2 * NLSF_QUANT_MAX_AMPLITUDE:
                ix += dec.dec_icdf(TD.NLSF_EXT_ICDF, 8)
            ind.NLSFIndices[i + 1] = ix - NLSF_QUANT_MAX_AMPLITUDE

        if self.nb_subfr == MAX_NB_SUBFR:
            ind.NLSFInterpCoef_Q2 = dec.dec_icdf(
                TD.NLSF_INTERPOLATION_FACTOR_ICDF, 8)
        else:
            ind.NLSFInterpCoef_Q2 = 4

        if ind.signalType == TYPE_VOICED:
            decode_absolute = True
            if cond_coding == CODE_CONDITIONALLY and \
                    self.ec_prevSignalType == TYPE_VOICED:
                delta = dec.dec_icdf(TD.PITCH_DELTA_ICDF, 8)
                if delta > 0:
                    ind.lagIndex = self.ec_prevLagIndex + (delta - 9)
                    decode_absolute = False
            if decode_absolute:
                ind.lagIndex = dec.dec_icdf(TD.PITCH_LAG_ICDF, 8) \
                    * (self.fs_kHz >> 1)
                ind.lagIndex += dec.dec_icdf(self.pitch_lag_low_bits_icdf, 8)
            self.ec_prevLagIndex = ind.lagIndex
            ind.contourIndex = dec.dec_icdf(self.pitch_contour_icdf, 8)
            ind.PERIndex = dec.dec_icdf(TD.LTP_PER_INDEX_ICDF, 8)
            for k in range(self.nb_subfr):
                ind.LTPIndex[k] = dec.dec_icdf(
                    T.LTP_GAIN_ICDF_PTRS[ind.PERIndex], 8)
            if cond_coding == CODE_INDEPENDENTLY:
                ind.LTP_scaleIndex = dec.dec_icdf(TD.LTPSCALE_ICDF, 8)
            else:
                ind.LTP_scaleIndex = 0
        self.ec_prevSignalType = ind.signalType
        ind.Seed = dec.dec_icdf(TD.UNIFORM4_ICDF, 8)

    # ------------------------------------------------------------------
    def decode_pulses(self, dec: RangeDecoder, pulses, signal_type,
                      quant_offset_type, frame_length):
        rate_level_index = dec.dec_icdf(
            T.RATE_LEVELS_ICDF[signal_type >> 1], 8)
        niter = frame_length >> LOG2_SHELL_CODEC_FRAME_LENGTH
        if niter * SHELL_CODEC_FRAME_LENGTH < frame_length:
            niter += 1
        sum_pulses = [0] * niter
        n_lshifts = [0] * niter
        cdf = T.PULSES_PER_BLOCK_ICDF[rate_level_index]
        for i in range(niter):
            n_lshifts[i] = 0
            sum_pulses[i] = dec.dec_icdf(cdf, 8)
            while sum_pulses[i] == SILK_MAX_PULSES + 1:
                n_lshifts[i] += 1
                off = 1 if n_lshifts[i] == 10 else 0
                sum_pulses[i] = dec.dec_icdf(
                    T.PULSES_PER_BLOCK_ICDF[N_RATE_LEVELS - 1][off:], 8)
        for i in range(niter):
            base = i * SHELL_CODEC_FRAME_LENGTH
            if sum_pulses[i] > 0:
                _shell_decoder(pulses, base, dec, sum_pulses[i])
            else:
                for j in range(SHELL_CODEC_FRAME_LENGTH):
                    pulses[base + j] = 0
        for i in range(niter):
            if n_lshifts[i] > 0:
                nls = n_lshifts[i]
                base = i * SHELL_CODEC_FRAME_LENGTH
                for k in range(SHELL_CODEC_FRAME_LENGTH):
                    abs_q = pulses[base + k]
                    for _ in range(nls):
                        abs_q = (abs_q << 1) + dec.dec_icdf(TD.LSB_ICDF, 8)
                    pulses[base + k] = abs_q
                sum_pulses[i] |= nls << 5
        _decode_signs(dec, pulses, frame_length, signal_type,
                      quant_offset_type, sum_pulses)

    # ------------------------------------------------------------------
    def decode_parameters(self, ctrl: DecoderControl, cond_coding):
        ind = self.indices
        ctrl.Gains_Q16, self.LastGainIndex = gains_dequant(
            ind.GainsIndices, self.LastGainIndex,
            cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
        nlsf = nlsf_decode(ind.NLSFIndices, self.psNLSF_CB)
        ctrl.PredCoef_Q12[1] = nlsf2a(nlsf, self.LPC_order)

        if self.first_frame_after_reset:
            ind.NLSFInterpCoef_Q2 = 4
        if ind.NLSFInterpCoef_Q2 < 4:
            nlsf0 = [self.prevNLSF_Q15[i]
                     + ((ind.NLSFInterpCoef_Q2
                         * (nlsf[i] - self.prevNLSF_Q15[i])) >> 2)
                     for i in range(self.LPC_order)]
            ctrl.PredCoef_Q12[0] = nlsf2a(nlsf0, self.LPC_order)
        else:
            ctrl.PredCoef_Q12[0] = list(ctrl.PredCoef_Q12[1])
        self.prevNLSF_Q15[:self.LPC_order] = nlsf

        if self.lossCnt:
            silk_bwexpander(ctrl.PredCoef_Q12[0], self.LPC_order,
                            BWE_AFTER_LOSS_Q16)
            silk_bwexpander(ctrl.PredCoef_Q12[1], self.LPC_order,
                            BWE_AFTER_LOSS_Q16)

        if ind.signalType == TYPE_VOICED:
            ctrl.pitchL = decode_pitch(ind.lagIndex, ind.contourIndex,
                                       self.fs_kHz, self.nb_subfr)
            cbk = T.LTP_VQ_PTRS_Q7[ind.PERIndex]
            for k in range(self.nb_subfr):
                row = cbk[ind.LTPIndex[k]]
                for i in range(LTP_ORDER):
                    ctrl.LTPCoef_Q14[k * LTP_ORDER + i] = row[i] << 7
            ctrl.LTP_scale_Q14 = TD.LTPSCALES_TABLE_Q14[ind.LTP_scaleIndex]
        else:
            ctrl.pitchL = [0] * self.nb_subfr
            ctrl.LTPCoef_Q14 = [0] * (LTP_ORDER * self.nb_subfr)
            ind.PERIndex = 0
            ctrl.LTP_scale_Q14 = 0

    # ------------------------------------------------------------------
    def decode_core(self, ctrl: DecoderControl, xq, pulses):
        """(reference: silk/decode_core.c)"""
        sltp = [0] * self.ltp_mem_length
        sltp_q15 = [0] * (self.ltp_mem_length + self.frame_length)
        slpc_q14 = list(self.sLPC_Q14_buf) + [0] * self.subfr_length

        offset_q10 = T.QUANTIZATION_OFFSETS_Q10[
            self.indices.signalType >> 1][self.indices.quantOffsetType]
        nlsf_interp_flag = 1 if self.indices.NLSFInterpCoef_Q2 < 4 else 0

        rand_seed = self.indices.Seed
        for i in range(self.frame_length):
            rand_seed = silk_RAND(rand_seed)
            exc = pulses[i] << 14
            if exc > 0:
                exc -= QUANT_LEVEL_ADJUST_Q10 << 4
            elif exc < 0:
                exc += QUANT_LEVEL_ADJUST_Q10 << 4
            exc += offset_q10 << 4
            if rand_seed < 0:
                exc = -exc
            self.exc_Q14[i] = exc
            rand_seed = wrap32(rand_seed + pulses[i])

        pexc = 0
        pxq = 0
        sltp_buf_idx = self.ltp_mem_length
        lag = 0
        for k in range(self.nb_subfr):
            a_q12 = ctrl.PredCoef_Q12[k >> 1]
            b_base = k * LTP_ORDER
            b_q14 = ctrl.LTPCoef_Q14
            signal_type = self.indices.signalType

            gain_q10 = ctrl.Gains_Q16[k] >> 6
            inv_gain_q31 = INVERSE32_varQ(ctrl.Gains_Q16[k], 47)

            if ctrl.Gains_Q16[k] != self.prev_gain_Q16:
                gain_adj_q16 = DIV32_varQ(self.prev_gain_Q16,
                                          ctrl.Gains_Q16[k], 16)
                for i in range(MAX_LPC_ORDER):
                    slpc_q14[i] = SMULWW(gain_adj_q16, slpc_q14[i])
            else:
                gain_adj_q16 = 1 << 16

            self.prev_gain_Q16 = ctrl.Gains_Q16[k]

            if (self.lossCnt and self.prevSignalType == TYPE_VOICED
                    and self.indices.signalType != TYPE_VOICED
                    and k < MAX_NB_SUBFR // 2):
                b_q14 = list(b_q14)
                for i in range(LTP_ORDER):
                    b_q14[b_base + i] = 0
                b_q14[b_base + LTP_ORDER // 2] = SILK_FIX_CONST(0.25, 14)
                signal_type = TYPE_VOICED
                ctrl.pitchL[k] = self.lagPrev

            if signal_type == TYPE_VOICED:
                lag = ctrl.pitchL[k]
                if k == 0 or (k == 2 and nlsf_interp_flag):
                    start_idx = self.ltp_mem_length - lag \
                        - self.LPC_order - LTP_ORDER // 2
                    assert start_idx > 0
                    if k == 2:
                        self.outBuf[self.ltp_mem_length:
                                    self.ltp_mem_length
                                    + 2 * self.subfr_length] = \
                            xq[:2 * self.subfr_length]
                    lpc_analysis_filter(
                        _OffsetList(sltp, start_idx),
                        _OffsetList(self.outBuf,
                                    start_idx + k * self.subfr_length),
                        a_q12, self.ltp_mem_length - start_idx,
                        self.LPC_order)
                    if k == 0:
                        inv_gain_q31 = SMULWB(inv_gain_q31,
                                              ctrl.LTP_scale_Q14) << 2
                    for i in range(lag + LTP_ORDER // 2):
                        sltp_q15[sltp_buf_idx - i - 1] = SMULWB(
                            inv_gain_q31,
                            sltp[self.ltp_mem_length - i - 1])
                else:
                    if gain_adj_q16 != 1 << 16:
                        for i in range(lag + LTP_ORDER // 2):
                            sltp_q15[sltp_buf_idx - i - 1] = SMULWW(
                                gain_adj_q16, sltp_q15[sltp_buf_idx - i - 1])

            if signal_type == TYPE_VOICED:
                res_q14 = [0] * self.subfr_length
                pred_lag = sltp_buf_idx - lag + LTP_ORDER // 2
                for i in range(self.subfr_length):
                    ltp_pred_q13 = 2
                    ltp_pred_q13 = SMLAWB(ltp_pred_q13, sltp_q15[pred_lag],
                                          b_q14[b_base + 0])
                    ltp_pred_q13 = SMLAWB(ltp_pred_q13, sltp_q15[pred_lag - 1],
                                          b_q14[b_base + 1])
                    ltp_pred_q13 = SMLAWB(ltp_pred_q13, sltp_q15[pred_lag - 2],
                                          b_q14[b_base + 2])
                    ltp_pred_q13 = SMLAWB(ltp_pred_q13, sltp_q15[pred_lag - 3],
                                          b_q14[b_base + 3])
                    ltp_pred_q13 = SMLAWB(ltp_pred_q13, sltp_q15[pred_lag - 4],
                                          b_q14[b_base + 4])
                    pred_lag += 1
                    res_q14[i] = wrap32(self.exc_Q14[pexc + i]
                                        + wrap32(ltp_pred_q13 << 1))
                    sltp_q15[sltp_buf_idx] = wrap32(res_q14[i] << 1)
                    sltp_buf_idx += 1
            else:
                res_q14 = self.exc_Q14[pexc:pexc + self.subfr_length]

            order = self.LPC_order
            for i in range(self.subfr_length):
                lpc_pred_q10 = order >> 1
                base = MAX_LPC_ORDER + i
                for j in range(order):
                    lpc_pred_q10 = SMLAWB(lpc_pred_q10,
                                          slpc_q14[base - 1 - j], a_q12[j])
                slpc_q14[base] = ADD_SAT32(res_q14[i],
                                           LSHIFT_SAT32(lpc_pred_q10, 4))
                xq[pxq + i] = SAT16(RSHIFT_ROUND(
                    SMULWW(slpc_q14[base], gain_q10), 8))

            slpc_q14[:MAX_LPC_ORDER] = slpc_q14[self.subfr_length:
                                                self.subfr_length
                                                + MAX_LPC_ORDER]
            pexc += self.subfr_length
            pxq += self.subfr_length

        self.sLPC_Q14_buf = slpc_q14[:MAX_LPC_ORDER]

    # ------------------------------------------------------------------
    def decode_frame(self, dec: RangeDecoder, xq_out, lost_flag, cond_coding):
        """Returns frame_length (reference: silk/decode_frame.c)."""
        L = self.frame_length
        ctrl = DecoderControl()
        ctrl.LTP_scale_Q14 = 0
        if lost_flag == FLAG_DECODE_NORMAL or \
                (lost_flag == FLAG_DECODE_LBRR
                 and self.LBRR_flags[self.nFramesDecoded] == 1):
            npulses = (L + SHELL_CODEC_FRAME_LENGTH - 1) \
                & ~(SHELL_CODEC_FRAME_LENGTH - 1)
            pulses = [0] * npulses
            ec_start = dec.tell()
            self.decode_indices(dec, self.nFramesDecoded, lost_flag,
                                cond_coding)
            self.decode_pulses(dec, pulses, self.indices.signalType,
                               self.indices.quantOffsetType, L)
            self.decode_parameters(ctrl, cond_coding)
            self.decode_core(ctrl, xq_out, pulses)
            # update output buffer
            mv_len = self.ltp_mem_length - L
            self.outBuf[:mv_len] = self.outBuf[L:L + mv_len]
            self.outBuf[mv_len:mv_len + L] = xq_out[:L]
            # neural enhancement (reference: decode_frame.c:113 ->
            # osce_enhance_frame dnn/osce.c:1546); runs after the
            # outBuf update so PLC sees the unenhanced history
            if getattr(self, "osce", None) is not None:
                enhanced = self.osce.enhance_frame(
                    xq_out, dec.tell() - ec_start, ctrl.PredCoef_Q12,
                    ctrl.pitchL, ctrl.LTPCoef_Q14, ctrl.Gains_Q16,
                    self.indices.signalType, self.LPC_order,
                    self.fs_kHz, self.nb_subfr)
                xq_out[:len(enhanced)] = [int(v) for v in enhanced]
            self.plc_update(ctrl)
            self.lossCnt = 0
            self.prevSignalType = self.indices.signalType
            self.first_frame_after_reset = 0
        else:
            # packet loss concealment (reference: silk_PLC PLC.c:71,
            # decode_frame.c lost branch)
            if self.fs_kHz != self.plc_fs_kHz:
                self._plc_reset()
                self.plc_fs_kHz = self.fs_kHz
            self.plc_conceal(ctrl, xq_out)
            self.lossCnt += 1
            mv_len = self.ltp_mem_length - L
            self.outBuf[:mv_len] = self.outBuf[L:L + mv_len]
            self.outBuf[mv_len:mv_len + L] = xq_out[:L]
        self.cng(ctrl, xq_out, L)
        self.plc_glue_frames(xq_out, L)
        self.lagPrev = ctrl.pitchL[self.nb_subfr - 1]
        return L

    # ------------------------------------------------------------------
    def plc_update(self, ctrl: DecoderControl):
        if self.fs_kHz != self.plc_fs_kHz:
            self._plc_reset()
            self.plc_fs_kHz = self.fs_kHz
        self.prevSignalType = self.indices.signalType
        ltp_gain_q14 = 0
        if self.indices.signalType == TYPE_VOICED:
            j = 0
            while j * self.subfr_length < ctrl.pitchL[self.nb_subfr - 1]:
                if j == self.nb_subfr:
                    break
                temp = 0
                for i in range(LTP_ORDER):
                    temp += ctrl.LTPCoef_Q14[
                        (self.nb_subfr - 1 - j) * LTP_ORDER + i]
                if temp > ltp_gain_q14:
                    ltp_gain_q14 = temp
                    base = (self.nb_subfr - 1 - j) * LTP_ORDER
                    self.plc_LTPCoef_Q14 = list(
                        ctrl.LTPCoef_Q14[base:base + LTP_ORDER])
                    self.plc_pitchL_Q8 = ctrl.pitchL[self.nb_subfr - 1 - j] << 8
                j += 1
            self.plc_LTPCoef_Q14 = [0] * LTP_ORDER
            self.plc_LTPCoef_Q14[LTP_ORDER // 2] = ltp_gain_q14
            if ltp_gain_q14 < V_PITCH_GAIN_START_MIN_Q14:
                scale_q10 = DIV32(V_PITCH_GAIN_START_MIN_Q14 << 10,
                                  max(ltp_gain_q14, 1))
                for i in range(LTP_ORDER):
                    self.plc_LTPCoef_Q14[i] = \
                        SMULBB(self.plc_LTPCoef_Q14[i], scale_q10) >> 10
            elif ltp_gain_q14 > V_PITCH_GAIN_START_MAX_Q14:
                scale_q14 = DIV32(V_PITCH_GAIN_START_MAX_Q14 << 14,
                                  max(ltp_gain_q14, 1))
                for i in range(LTP_ORDER):
                    self.plc_LTPCoef_Q14[i] = \
                        SMULBB(self.plc_LTPCoef_Q14[i], scale_q14) >> 14
        else:
            self.plc_pitchL_Q8 = (self.fs_kHz * 18) << 8
            self.plc_LTPCoef_Q14 = [0] * LTP_ORDER
        self.plc_prevLPC_Q12 = list(ctrl.PredCoef_Q12[1][:self.LPC_order])
        self.plc_prevLTP_scale_Q14 = ctrl.LTP_scale_Q14
        self.plc_prevGain_Q16 = list(ctrl.Gains_Q16[self.nb_subfr - 2:
                                                    self.nb_subfr])
        self.plc_subfr_length = self.subfr_length
        self.plc_nb_subfr = self.nb_subfr

    def _plc_reset(self):
        self.plc_pitchL_Q8 = self.frame_length << 7
        self.plc_prevGain_Q16 = [1 << 16, 1 << 16]
        self.plc_subfr_length = 20
        self.plc_nb_subfr = 2

    def plc_conceal(self, ctrl: DecoderControl, xq_out):
        """Classic concealment: periodic LTP extrapolation of the
        rewhitened excitation plus attenuated noise, LPC-resynthesized
        (reference: silk/PLC.c silk_PLC_conceal :216-429)."""
        HARM_ATT_Q15 = (32440, 31130)
        RAND_ATT_V_Q15 = (31130, 26214)
        RAND_ATT_UV_Q15 = (32440, 29491)
        RAND_BUF_SIZE = 128
        L = self.frame_length
        if self.fs_kHz != self.plc_fs_kHz:
            self._plc_reset()
            self.plc_fs_kHz = self.fs_kHz
        prev_gain_q10 = [self.plc_prevGain_Q16[0] >> 6,
                         self.plc_prevGain_Q16[1] >> 6]
        if self.first_frame_after_reset:
            self.plc_prevLPC_Q12 = [0] * MAX_LPC_ORDER
        # pick the lower-energy of the last two scaled excitation
        # subframes as the random-noise source (silk_PLC_energy)
        sl = self.subfr_length
        exc_buf = [0] * (2 * sl)
        for k in range(2):
            base = (k + self.nb_subfr - 2) * sl
            for i in range(sl):
                exc_buf[k * sl + i] = SAT16(SMULWW(
                    self.exc_Q14[base + i], prev_gain_q10[k]) >> 8)
        energy1, shift1 = sum_sqr_shift(exc_buf[:sl])
        energy2, shift2 = sum_sqr_shift(exc_buf[sl:])
        if (energy1 >> shift2) < (energy2 >> shift1):
            rand_base = max(0, (self.plc_nb_subfr - 1)
                            * self.plc_subfr_length - RAND_BUF_SIZE)
        else:
            rand_base = max(0, self.plc_nb_subfr * self.plc_subfr_length
                            - RAND_BUF_SIZE)
        rand_buf = self.exc_Q14
        b_q14 = self.plc_LTPCoef_Q14     # mutated in place (persists)
        rand_scale_q14 = self.plc_randScale_Q14
        att_idx = min(1, self.lossCnt)
        harm_gain_q15 = HARM_ATT_Q15[att_idx]
        if self.prevSignalType == TYPE_VOICED:
            rand_gain_q15 = RAND_ATT_V_Q15[att_idx]
        else:
            rand_gain_q15 = RAND_ATT_UV_Q15[att_idx]
        # bandwidth-expand the previous LPC (silk_bwexpander, chirp .99)
        silk_bwexpander(self.plc_prevLPC_Q12, self.LPC_order,
                        SILK_FIX_CONST(0.99, 16))
        a_q12 = list(self.plc_prevLPC_Q12[:self.LPC_order])
        if self.lossCnt == 0:
            rand_scale_q14 = 1 << 14
            if self.prevSignalType == TYPE_VOICED:
                for i in range(LTP_ORDER):
                    rand_scale_q14 -= b_q14[i]
                rand_scale_q14 = max(3277, rand_scale_q14)
                rand_scale_q14 = SMULBB(
                    rand_scale_q14, self.plc_prevLTP_scale_Q14) >> 14
            else:
                inv_gain_q30 = lpc_inverse_pred_gain(
                    self.plc_prevLPC_Q12, self.LPC_order)
                down_scale = min((1 << 30) >> 3, inv_gain_q30)
                down_scale = max((1 << 30) >> 8, down_scale)
                down_scale <<= 3
                rand_gain_q15 = SMULWB(down_scale, rand_gain_q15) >> 14
        rand_seed = self.plc_rand_seed
        lag = RSHIFT_ROUND(self.plc_pitchL_Q8, 8)
        sltp_buf_idx = self.ltp_mem_length
        # rewhiten the LTP state through the expanded LPC
        idx = self.ltp_mem_length - lag - self.LPC_order - LTP_ORDER // 2
        assert idx > 0
        sltp = [0] * self.ltp_mem_length
        tmp_out = [0] * (self.ltp_mem_length - idx)
        lpc_analysis_filter(tmp_out, self.outBuf[idx:self.ltp_mem_length],
                            a_q12, self.ltp_mem_length - idx,
                            self.LPC_order)
        sltp[idx:] = tmp_out
        inv_gain_q30 = INVERSE32_varQ(self.plc_prevGain_Q16[1], 46)
        inv_gain_q30 = min(inv_gain_q30, 0x7FFFFFFF >> 1)
        sltp_q14 = [0] * (self.ltp_mem_length + L)
        for i in range(idx + self.LPC_order, self.ltp_mem_length):
            sltp_q14[i] = SMULWB(inv_gain_q30, sltp[i])
        # LTP synthesis with decaying gains and drifting pitch
        for k in range(self.nb_subfr):
            p = sltp_buf_idx - lag + LTP_ORDER // 2
            for i in range(self.subfr_length):
                ltp_pred_q12 = 2
                for j in range(LTP_ORDER):
                    ltp_pred_q12 = SMLAWB(ltp_pred_q12,
                                          sltp_q14[p + i - j], b_q14[j])
                rand_seed = silk_RAND(rand_seed)
                ridx = (rand_seed >> 25) & (RAND_BUF_SIZE - 1)
                sltp_q14[sltp_buf_idx] = wrap32(SMLAWB(
                    ltp_pred_q12, rand_buf[rand_base + ridx],
                    rand_scale_q14) << 2)
                sltp_buf_idx += 1
            for j in range(LTP_ORDER):
                b_q14[j] = SMULBB(harm_gain_q15, b_q14[j]) >> 15
            rand_scale_q14 = SMULBB(rand_scale_q14, rand_gain_q15) >> 15
            self.plc_pitchL_Q8 = SMLAWB(self.plc_pitchL_Q8,
                                        self.plc_pitchL_Q8, 655)
            self.plc_pitchL_Q8 = min(self.plc_pitchL_Q8,
                                     (18 * self.fs_kHz) << 8)
            lag = RSHIFT_ROUND(self.plc_pitchL_Q8, 8)
        # LPC synthesis
        base = self.ltp_mem_length - MAX_LPC_ORDER
        sltp_q14[base:base + MAX_LPC_ORDER] = self.sLPC_Q14_buf
        for i in range(L):
            lpc_pred_q10 = self.LPC_order >> 1
            for j in range(self.LPC_order):
                lpc_pred_q10 = SMLAWB(
                    lpc_pred_q10,
                    sltp_q14[base + MAX_LPC_ORDER + i - j - 1], a_q12[j])
            sltp_q14[base + MAX_LPC_ORDER + i] = ADD_SAT32(
                sltp_q14[base + MAX_LPC_ORDER + i],
                LSHIFT_SAT32(lpc_pred_q10, 4))
            xq_out[i] = SAT16(RSHIFT_ROUND(SMULWW(
                sltp_q14[base + MAX_LPC_ORDER + i], prev_gain_q10[1]), 8))
        self.sLPC_Q14_buf = list(
            sltp_q14[base + L:base + L + MAX_LPC_ORDER])
        self.plc_rand_seed = rand_seed
        self.plc_randScale_Q14 = rand_scale_q14
        ctrl.pitchL = [lag] * MAX_NB_SUBFR

    def plc_glue_frames(self, frame, length):
        if self.lossCnt:
            self.plc_conc_energy, self.plc_conc_energy_shift = \
                sum_sqr_shift(frame[:length])
            self.plc_last_frame_lost = 1
        else:
            if self.plc_last_frame_lost:
                energy, energy_shift = sum_sqr_shift(frame[:length])
                if energy_shift > self.plc_conc_energy_shift:
                    self.plc_conc_energy >>= (energy_shift
                                              - self.plc_conc_energy_shift)
                elif energy_shift < self.plc_conc_energy_shift:
                    energy >>= self.plc_conc_energy_shift - energy_shift
                if energy > self.plc_conc_energy:
                    lz = CLZ32(self.plc_conc_energy) - 1
                    conc = self.plc_conc_energy << lz
                    energy >>= max(24 - lz, 0)
                    frac_q24 = DIV32(conc, max(energy, 1))
                    gain_q16 = SQRT_APPROX(frac_q24) << 4
                    slope_q16 = DIV32_16((1 << 16) - gain_q16, length)
                    slope_q16 <<= 2
                    # reference uses SMULWB here (PLC.c:482) — the fade
                    # multiplies by the int16 sample, not a full 32-bit
                    # SMULWW; the truncation difference is audible as a
                    # persistent state divergence after FEC recovery
                    for i in range(length):
                        frame[i] = SMULWB(gain_q16, frame[i])
                        gain_q16 += slope_q16
                        if gain_q16 > 1 << 16:
                            break
            self.plc_last_frame_lost = 0

    # ------------------------------------------------------------------
    def cng(self, ctrl: DecoderControl, frame, length):
        """Comfort noise update/application (reference: silk/CNG.c)."""
        if self.fs_kHz != self.cng_fs_kHz:
            # CNG reset
            nlsf_step = DIV32_16(32767, self.LPC_order + 1)
            acc = 0
            for i in range(self.LPC_order):
                acc += nlsf_step
                self.cng_smth_NLSF_Q15[i] = acc
            self.cng_smth_Gain_Q16 = 0
            self.cng_rand_seed = 3176576
            self.cng_fs_kHz = self.fs_kHz
        if self.lossCnt == 0 and self.prevSignalType == TYPE_NO_VOICE_ACTIVITY:
            for i in range(self.LPC_order):
                self.cng_smth_NLSF_Q15[i] += SMULWB(
                    self.prevNLSF_Q15[i] - self.cng_smth_NLSF_Q15[i],
                    CNG_NLSF_SMTH_Q16)
            max_gain = 0
            subfr = 0
            for i in range(self.nb_subfr):
                if ctrl.Gains_Q16[i] > max_gain:
                    max_gain = ctrl.Gains_Q16[i]
                    subfr = i
            sl = self.subfr_length
            self.cng_exc_buf_Q14[sl:self.nb_subfr * sl] = \
                self.cng_exc_buf_Q14[:(self.nb_subfr - 1) * sl]
            self.cng_exc_buf_Q14[:sl] = \
                self.exc_Q14[subfr * sl:(subfr + 1) * sl]
            for i in range(self.nb_subfr):
                self.cng_smth_Gain_Q16 += SMULWB(
                    ctrl.Gains_Q16[i] - self.cng_smth_Gain_Q16,
                    CNG_GAIN_SMTH_Q16)
                if SMULWW(self.cng_smth_Gain_Q16,
                          CNG_GAIN_SMTH_THRESHOLD_Q16) > ctrl.Gains_Q16[i]:
                    self.cng_smth_Gain_Q16 = ctrl.Gains_Q16[i]
        # add comfort noise during loss (reference: silk/CNG.c:131-178)
        if self.lossCnt:
            gain_q16 = SMULWW(self.plc_randScale_Q14,
                              self.plc_prevGain_Q16[1])
            if gain_q16 >= (1 << 21) or self.cng_smth_Gain_Q16 > (1 << 23):
                gain_q16 = (gain_q16 >> 16) * (gain_q16 >> 16)
                gain_q16 = wrap32(
                    (self.cng_smth_Gain_Q16 >> 16)
                    * (self.cng_smth_Gain_Q16 >> 16) - (gain_q16 << 5))
                gain_q16 = wrap32(SQRT_APPROX(gain_q16) << 16)
            else:
                gain_q16 = SMULWW(gain_q16, gain_q16)
                gain_q16 = wrap32(
                    SMULWW(self.cng_smth_Gain_Q16, self.cng_smth_Gain_Q16)
                    - (gain_q16 << 5))
                gain_q16 = wrap32(SQRT_APPROX(gain_q16) << 8)
            gain_q10 = gain_q16 >> 6
            # CNG excitation from random past samples (silk_CNG_exc)
            exc_mask = 255
            while exc_mask > length:
                exc_mask >>= 1
            seed = self.cng_rand_seed
            cng_sig = [0] * (length + MAX_LPC_ORDER)
            cng_sig[:MAX_LPC_ORDER] = self.cng_synth_state
            exc = [0] * length
            for i in range(length):
                seed = silk_RAND(seed)
                exc[i] = self.cng_exc_buf_Q14[(seed >> 24) & exc_mask]
            self.cng_rand_seed = seed
            a_q12 = nlsf2a(self.cng_smth_NLSF_Q15, self.LPC_order)
            for i in range(length):
                pred_q10 = self.LPC_order >> 1
                for j in range(self.LPC_order):
                    pred_q10 = SMLAWB(pred_q10,
                                      cng_sig[MAX_LPC_ORDER + i - j - 1],
                                      a_q12[j])
                cng_sig[MAX_LPC_ORDER + i] = ADD_SAT32(
                    exc[i], LSHIFT_SAT32(pred_q10, 4))
                frame[i] = SAT16(frame[i] + SAT16(RSHIFT_ROUND(
                    SMULWW(cng_sig[MAX_LPC_ORDER + i], gain_q10), 8)))
            self.cng_synth_state = list(cng_sig[length:
                                                length + MAX_LPC_ORDER])
        else:
            self.cng_synth_state = [0] * MAX_LPC_ORDER


class _OffsetList:
    """View over a list with a base offset (C pointer emulation)."""
    __slots__ = ("data", "base")

    def __init__(self, data, base):
        self.data = data
        self.base = base

    def __getitem__(self, i):
        return self.data[self.base + i]

    def __setitem__(self, i, v):
        self.data[self.base + i] = v


def _shell_decoder(pulses, base, dec: RangeDecoder, pulses4):
    def split(p, table):
        if p > 0:
            child1 = dec.dec_icdf(
                table[TD.SHELL_CODE_TABLE_OFFSETS[p]:], 8)
            return child1, p - child1
        return 0, 0

    t0, t1, t2, t3 = (TD.SHELL_CODE_TABLE0, TD.SHELL_CODE_TABLE1,
                      TD.SHELL_CODE_TABLE2, TD.SHELL_CODE_TABLE3)
    p3 = [0, 0]
    p2 = [0] * 4
    p1 = [0] * 8
    p3[0], p3[1] = split(pulses4, t3)
    p2[0], p2[1] = split(p3[0], t2)
    p1[0], p1[1] = split(p2[0], t1)
    pulses[base + 0], pulses[base + 1] = split(p1[0], t0)
    pulses[base + 2], pulses[base + 3] = split(p1[1], t0)
    p1[2], p1[3] = split(p2[1], t1)
    pulses[base + 4], pulses[base + 5] = split(p1[2], t0)
    pulses[base + 6], pulses[base + 7] = split(p1[3], t0)
    p2[2], p2[3] = split(p3[1], t2)
    p1[4], p1[5] = split(p2[2], t1)
    pulses[base + 8], pulses[base + 9] = split(p1[4], t0)
    pulses[base + 10], pulses[base + 11] = split(p1[5], t0)
    p1[6], p1[7] = split(p2[3], t1)
    pulses[base + 12], pulses[base + 13] = split(p1[6], t0)
    pulses[base + 14], pulses[base + 15] = split(p1[7], t0)


def _decode_signs(dec: RangeDecoder, pulses, length, signal_type,
                  quant_offset_type, sum_pulses):
    i0 = 7 * (quant_offset_type + (signal_type << 1))
    icdf = [0, 0]
    nblocks = (length + SHELL_CODEC_FRAME_LENGTH // 2) \
        >> LOG2_SHELL_CODEC_FRAME_LENGTH
    q = 0
    for i in range(nblocks):
        p = sum_pulses[i]
        if p > 0:
            icdf[0] = TD.SIGN_ICDF[i0 + min(p & 0x1F, 6)]
            for j in range(SHELL_CODEC_FRAME_LENGTH):
                if pulses[q + j] > 0:
                    # dec_map(a) = 2*a - 1
                    pulses[q + j] *= 2 * dec.dec_icdf(icdf, 8) - 1
        q += SHELL_CODEC_FRAME_LENGTH

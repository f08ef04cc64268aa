"""SILK encoder (reference: silk/enc_API.c, float/encode_frame_FLP.c,
NSQ.c, encode_indices.c, encode_pulses.c, gain_quant.c, control_codec.c).

Mono-first implementation: float analysis (opus_tpu.silk.enc_analysis) +
exact fixed-point quantizers.  The NSQ mirrors the decoder's fixed-point
filters exactly (silk_NSQ_c, single-state variant)."""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..bitstream.range_coder import RangeEncoder, ec_tell
from . import tables as T
from . import tables_data as TD
from . import enc_analysis as FA
from .tables import (MAX_NB_SUBFR, SUB_FRAME_LENGTH_MS, LTP_MEM_LENGTH_MS,
                     LTP_ORDER, MIN_LPC_ORDER, MAX_LPC_ORDER,
                     SHELL_CODEC_FRAME_LENGTH, LOG2_SHELL_CODEC_FRAME_LENGTH,
                     SILK_MAX_PULSES, N_RATE_LEVELS, MIN_DELTA_GAIN_QUANT,
                     MAX_DELTA_GAIN_QUANT, N_LEVELS_QGAIN,
                     QUANT_LEVEL_ADJUST_Q10, NLSF_QUANT_MAX_AMPLITUDE,
                     TYPE_NO_VOICE_ACTIVITY, TYPE_UNVOICED, TYPE_VOICED,
                     CODE_INDEPENDENTLY, CODE_CONDITIONALLY)
from .macros import (SMULWB, SMLAWB, SMULWW, SMULBB, SMLABB, SAT16, SAT32,
                     wrap16, wrap32, RSHIFT_ROUND, LSHIFT_SAT32, silk_RAND,
                     INVERSE32_varQ, DIV32_varQ, log2lin, lin2log, DIV32_16,
                     ADD_SAT32, SILK_FIX_CONST)
from .decoder import (ChannelState, SideInfoIndices, gains_dequant,
                      lpc_analysis_filter, _OffsetList)
from .nlsf_enc import process_nlsfs, a2nlsf, nlsf_encode
from .resampler import Resampler
from .vad import VadState
from .stereo_enc import (StereoEncState, stereo_encode_pred,
                         stereo_encode_mid_only)
from .tables import CODE_INDEPENDENTLY_NO_LTP_SCALING

LA_SHAPE_MS = 5
LA_PITCH_MS = 2
FIND_PITCH_LPC_WIN_MS = 20 + (LA_PITCH_MS << 1)
FIND_PITCH_LPC_WIN_MS_2_SF = 10 + (LA_PITCH_MS << 1)
MAX_FIND_PITCH_LPC_ORDER = 16
NSQ_LPC_BUF_LENGTH = 32
MAX_SHAPE_LPC_ORDER = 24


def gains_quant(gains_q16, prev_ind, conditional, nb_subfr):
    """(reference: silk_gains_quant gain_quant.c:39).
    Returns (ind, quantized gains, new prev_ind)."""
    ind = [0] * nb_subfr
    for k in range(nb_subfr):
        ind[k] = SMULWB(T.SCALE_Q16, lin2log(gains_q16[k]) - T.OFFSET)
        if ind[k] < prev_ind:
            ind[k] += 1
        ind[k] = max(0, min(N_LEVELS_QGAIN - 1, ind[k]))
        if k == 0 and not conditional:
            ind[k] = max(prev_ind + MIN_DELTA_GAIN_QUANT,
                         min(N_LEVELS_QGAIN - 1, ind[k]))
            prev_ind = ind[k]
        else:
            ind[k] = ind[k] - prev_ind
            dst = 2 * MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN + prev_ind
            if ind[k] > dst:
                ind[k] = dst + ((ind[k] - dst + 1) >> 1)
            ind[k] = max(MIN_DELTA_GAIN_QUANT,
                         min(MAX_DELTA_GAIN_QUANT, ind[k]))
            if ind[k] > dst:
                prev_ind += (ind[k] << 1) - dst
                prev_ind = min(prev_ind, N_LEVELS_QGAIN - 1)
            else:
                prev_ind += ind[k]
            ind[k] -= MIN_DELTA_GAIN_QUANT
        gains_q16[k] = log2lin(min(SMULWB(T.INV_SCALE_Q16, prev_ind)
                                   + T.OFFSET, 3967))
    return ind, gains_q16, prev_ind


class NSQState:
    """silk_nsq_state (reference: silk/structs.h)."""

    def __init__(self):
        self.xq = [0] * (2 * 320)               # 2*MAX_FRAME_LENGTH worst
        self.sLTP_shp_Q14 = [0] * (2 * 320)
        self.sLPC_Q14 = [0] * (80 + NSQ_LPC_BUF_LENGTH)
        self.sAR2_Q14 = [0] * MAX_SHAPE_LPC_ORDER
        self.sLF_AR_shp_Q14 = 0
        self.sDiff_shp_Q14 = 0
        self.lagPrev = 0
        self.sLTP_buf_idx = 0
        self.sLTP_shp_buf_idx = 0
        self.rand_seed = 0
        self.prev_gain_Q16 = 65536
        self.rewhite_flag = 0

    def copy(self):
        import copy
        return copy.deepcopy(self)


def silk_nsq(ch, nsq: NSQState, indices, x16, pulses, pred_coef_q12,
             ltp_coef_q14, ar_q13, harm_shape_gain_q14, tilt_q14, lf_shp_q14,
             gains_q16, pitch_l, lambda_q10, ltp_scale_q14):
    """silk_NSQ_c (reference: silk/NSQ.c:76)."""
    frame_length = ch.frame_length
    subfr_length = ch.subfr_length
    ltp_mem_length = ch.ltp_mem_length
    predict_order = ch.predict_lpc_order
    shaping_order = ch.shaping_lpc_order

    nsq.rand_seed = indices.Seed
    lag = nsq.lagPrev
    offset_q10 = T.QUANTIZATION_OFFSETS_Q10[indices.signalType >> 1][
        indices.quantOffsetType]
    lsf_interp_flag = 0 if indices.NLSFInterpCoef_Q2 == 4 else 1

    sltp_q15 = [0] * (ltp_mem_length + frame_length)
    sltp = [0] * (ltp_mem_length + frame_length)
    nsq.sLTP_shp_buf_idx = ltp_mem_length
    nsq.sLTP_buf_idx = ltp_mem_length
    pxq = ltp_mem_length
    for k in range(ch.nb_subfr):
        a_q12 = pred_coef_q12[((k >> 1) | (1 - lsf_interp_flag))]
        b_base = k * LTP_ORDER
        ar_base = k * MAX_SHAPE_LPC_ORDER
        hsg = harm_shape_gain_q14[k]
        harm_packed = (hsg >> 2) | (((hsg >> 1) & 0xFFFF) << 16)
        # careful: C packs signed int16s; hsg>=0 so plain shifts work
        harm_lo = hsg >> 2
        harm_hi = hsg >> 1

        nsq.rewhite_flag = 0
        if indices.signalType == TYPE_VOICED:
            lag = pitch_l[k]
            if (k & (3 - (lsf_interp_flag << 1))) == 0:
                start_idx = ltp_mem_length - lag - predict_order \
                    - LTP_ORDER // 2
                assert start_idx > 0
                lpc_analysis_filter(
                    _OffsetList(sltp, start_idx),
                    _OffsetList(nsq.xq, start_idx + k * subfr_length),
                    a_q12, ltp_mem_length - start_idx, predict_order)
                nsq.rewhite_flag = 1
                nsq.sLTP_buf_idx = ltp_mem_length

        # scale states
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
                               nsq.sLTP_buf_idx):
                    sltp_q15[i] = SMULWW(gain_adj_q16, sltp_q15[i])
            nsq.sLF_AR_shp_Q14 = SMULWW(gain_adj_q16, nsq.sLF_AR_shp_Q14)
            nsq.sDiff_shp_Q14 = SMULWW(gain_adj_q16, nsq.sDiff_shp_Q14)
            for i in range(NSQ_LPC_BUF_LENGTH):
                nsq.sLPC_Q14[i] = SMULWW(gain_adj_q16, nsq.sLPC_Q14[i])
            for i in range(MAX_SHAPE_LPC_ORDER):
                nsq.sAR2_Q14[i] = SMULWW(gain_adj_q16, nsq.sAR2_Q14[i])
        nsq.prev_gain_Q16 = gains_q16[k]

        # ---- quantizer inner loop ----
        gain_q10 = gains_q16[k] >> 6
        shp_lag = nsq.sLTP_shp_buf_idx - lag + 1  # HARM_SHAPE_FIR_TAPS/2 = 1
        pred_lag = nsq.sLTP_buf_idx - lag + LTP_ORDER // 2
        psLPC = NSQ_LPC_BUF_LENGTH - 1
        rdo_offset = lambda_q10 // 2 - 512
        for i in range(subfr_length):
            nsq.rand_seed = silk_RAND(nsq.rand_seed)
            # short-term prediction
            lpc_pred_q10 = predict_order >> 1
            for j in range(predict_order):
                lpc_pred_q10 = SMLAWB(lpc_pred_q10,
                                      nsq.sLPC_Q14[psLPC - j], a_q12[j])
            # long-term prediction
            if indices.signalType == TYPE_VOICED:
                ltp_pred_q13 = 2
                for j in range(LTP_ORDER):
                    ltp_pred_q13 = SMLAWB(ltp_pred_q13,
                                          sltp_q15[pred_lag - j],
                                          ltp_coef_q14[b_base + j])
                pred_lag += 1
            else:
                ltp_pred_q13 = 0
            # noise shape feedback (order even)
            tmp2 = nsq.sDiff_shp_Q14
            tmp1 = nsq.sAR2_Q14[0]
            nsq.sAR2_Q14[0] = tmp2
            n_ar_q12 = shaping_order >> 1
            n_ar_q12 = SMLAWB(n_ar_q12, tmp2, ar_q13[ar_base + 0])
            for j in range(2, shaping_order, 2):
                tmp2 = nsq.sAR2_Q14[j - 1]
                nsq.sAR2_Q14[j - 1] = tmp1
                n_ar_q12 = SMLAWB(n_ar_q12, tmp1, ar_q13[ar_base + j - 1])
                tmp1 = nsq.sAR2_Q14[j]
                nsq.sAR2_Q14[j] = tmp2
                n_ar_q12 = SMLAWB(n_ar_q12, tmp2, ar_q13[ar_base + j])
            nsq.sAR2_Q14[shaping_order - 1] = tmp1
            n_ar_q12 = SMLAWB(n_ar_q12, tmp1,
                              ar_q13[ar_base + shaping_order - 1])
            n_ar_q12 = wrap32(n_ar_q12 << 1)

            n_ar_q12 = SMLAWB(n_ar_q12, nsq.sLF_AR_shp_Q14, tilt_q14[k])
            n_lf_q12 = SMULWB(nsq.sLTP_shp_Q14[nsq.sLTP_shp_buf_idx - 1],
                              lf_shp_q14[k])
            n_lf_q12 = SMLAWB(n_lf_q12, nsq.sLF_AR_shp_Q14,
                              lf_shp_q14[k] >> 16)

            tmp1 = wrap32((lpc_pred_q10 << 2) - n_ar_q12)
            tmp1 = wrap32(tmp1 - n_lf_q12)
            if lag > 0:
                n_ltp_q13 = SMULWB(ADD_SAT32(
                    nsq.sLTP_shp_Q14[shp_lag],
                    nsq.sLTP_shp_Q14[shp_lag - 2]), harm_lo)
                n_ltp_q13 = SMLAWB(n_ltp_q13,
                                   nsq.sLTP_shp_Q14[shp_lag - 1], harm_hi)
                n_ltp_q13 = wrap32(n_ltp_q13 << 1)
                shp_lag += 1
                tmp2 = ltp_pred_q13 - n_ltp_q13
                tmp1 = wrap32(tmp2 + wrap32(tmp1 << 1))
                tmp1 = RSHIFT_ROUND(tmp1, 3)
            else:
                tmp1 = RSHIFT_ROUND(tmp1, 2)

            r_q10 = x_sc_q10[i] - tmp1
            if nsq.rand_seed < 0:
                r_q10 = -r_q10
            r_q10 = max(-(31 << 10), min(30 << 10, r_q10))

            # two candidate levels
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
                q1_q10 = (q1_q0 << 10) - QUANT_LEVEL_ADJUST_Q10 + offset_q10
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
                q1_q10 = (q1_q0 << 10) + QUANT_LEVEL_ADJUST_Q10 + offset_q10
                q2_q10 = q1_q10 + 1024
                rd1 = SMULBB(-q1_q10, lambda_q10)
                rd2 = SMULBB(-q2_q10, lambda_q10)
            rr = r_q10 - q1_q10
            rd1 = SMLABB(rd1, rr, rr)
            rr = r_q10 - q2_q10
            rd2 = SMLABB(rd2, rr, rr)
            if rd2 < rd1:
                q1_q10 = q2_q10
            pulses[k * subfr_length + i] = RSHIFT_ROUND(q1_q10, 10)

            exc_q14 = wrap32(q1_q10 << 4)
            if nsq.rand_seed < 0:
                exc_q14 = -exc_q14
            lpc_exc_q14 = wrap32(exc_q14 + wrap32(ltp_pred_q13 << 1))
            xq_q14 = wrap32(lpc_exc_q14 + wrap32(lpc_pred_q10 << 4))
            nsq.xq[pxq + i] = SAT16(RSHIFT_ROUND(
                SMULWW(xq_q14, gain_q10), 8))

            psLPC += 1
            nsq.sLPC_Q14[psLPC] = xq_q14
            nsq.sDiff_shp_Q14 = wrap32(xq_q14 - wrap32(x_sc_q10[i] << 4))
            slf_ar = wrap32(nsq.sDiff_shp_Q14 - wrap32(n_ar_q12 << 2))
            nsq.sLF_AR_shp_Q14 = slf_ar
            nsq.sLTP_shp_Q14[nsq.sLTP_shp_buf_idx] = \
                wrap32(slf_ar - wrap32(n_lf_q12 << 2))
            sltp_q15[nsq.sLTP_buf_idx] = wrap32(lpc_exc_q14 << 1)
            nsq.sLTP_shp_buf_idx += 1
            nsq.sLTP_buf_idx += 1
            nsq.rand_seed = wrap32(nsq.rand_seed
                                   + pulses[k * subfr_length + i])
        nsq.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
            nsq.sLPC_Q14[subfr_length:subfr_length + NSQ_LPC_BUF_LENGTH]
        pxq += subfr_length

    nsq.lagPrev = pitch_l[ch.nb_subfr - 1]
    nsq.xq[:ltp_mem_length] = nsq.xq[frame_length:frame_length
                                     + ltp_mem_length]
    nsq.sLTP_shp_Q14[:ltp_mem_length] = \
        nsq.sLTP_shp_Q14[frame_length:frame_length + ltp_mem_length]


def encode_signs(enc, pulses, length, signal_type, quant_offset_type,
                 sum_pulses):
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
                if pulses[q + j] != 0:
                    sign = 0 if pulses[q + j] < 0 else 1
                    enc.enc_icdf(sign, icdf, 8)
        q += SHELL_CODEC_FRAME_LENGTH


def shell_encoder(enc, pulses0):
    def combine(src):
        return [src[2 * k] + src[2 * k + 1] for k in range(len(src) // 2)]

    def split(child1, p, table):
        if p > 0:
            enc.enc_icdf(child1, table[TD.SHELL_CODE_TABLE_OFFSETS[p]:], 8)

    t0, t1, t2, t3 = (TD.SHELL_CODE_TABLE0, TD.SHELL_CODE_TABLE1,
                      TD.SHELL_CODE_TABLE2, TD.SHELL_CODE_TABLE3)
    p1 = combine(pulses0)
    p2 = combine(p1)
    p3 = combine(p2)
    p4 = combine(p3)
    split(p3[0], p4[0], t3)
    split(p2[0], p3[0], t2)
    split(p1[0], p2[0], t1)
    split(pulses0[0], p1[0], t0)
    split(pulses0[2], p1[1], t0)
    split(p1[2], p2[1], t1)
    split(pulses0[4], p1[2], t0)
    split(pulses0[6], p1[3], t0)
    split(p2[2], p3[1], t2)
    split(p1[4], p2[2], t1)
    split(pulses0[8], p1[4], t0)
    split(pulses0[10], p1[5], t0)
    split(p1[6], p2[3], t1)
    split(pulses0[12], p1[6], t0)
    split(pulses0[14], p1[7], t0)


def encode_pulses(enc, signal_type, quant_offset_type, pulses, frame_length):
    """(reference: silk/encode_pulses.c)"""
    niter = frame_length >> LOG2_SHELL_CODEC_FRAME_LENGTH
    if niter * SHELL_CODEC_FRAME_LENGTH < frame_length:
        niter += 1
        pulses.extend([0] * (niter * SHELL_CODEC_FRAME_LENGTH - len(pulses)))
    abs_pulses = [abs(p) for p in
                  pulses[:niter * SHELL_CODEC_FRAME_LENGTH]]
    sum_pulses = [0] * niter
    n_rshifts = [0] * niter
    for i in range(niter):
        base = i * SHELL_CODEC_FRAME_LENGTH
        while True:
            blk = abs_pulses[base:base + SHELL_CODEC_FRAME_LENGTH]
            scale_down = False
            lvl = blk
            for mx in TD.MAX_PULSES_TABLE:
                nxt = [lvl[2 * k] + lvl[2 * k + 1] for k in range(len(lvl) // 2)]
                if any(v > mx for v in nxt):
                    scale_down = True
                lvl = nxt
            if scale_down:
                n_rshifts[i] += 1
                for k in range(SHELL_CODEC_FRAME_LENGTH):
                    abs_pulses[base + k] >>= 1
            else:
                sum_pulses[i] = lvl[0]
                break
    # rate level
    min_bits = None
    rate_level = 0
    bits_tables = [TD.PULSES_PER_BLOCK_BITS_Q5[k * 18:(k + 1) * 18]
                   for k in range(9)]
    rl_bits = (TD.RATE_LEVELS_BITS_Q5[:9], TD.RATE_LEVELS_BITS_Q5[9:])
    for k in range(N_RATE_LEVELS - 1):
        sum_bits = rl_bits[signal_type >> 1][k]
        for i in range(niter):
            if n_rshifts[i] > 0:
                sum_bits += bits_tables[k][SILK_MAX_PULSES + 1]
            else:
                sum_bits += bits_tables[k][sum_pulses[i]]
        if min_bits is None or sum_bits < min_bits:
            min_bits = sum_bits
            rate_level = k
    enc.enc_icdf(rate_level, T.RATE_LEVELS_ICDF[signal_type >> 1], 8)
    cdf = T.PULSES_PER_BLOCK_ICDF[rate_level]
    last = T.PULSES_PER_BLOCK_ICDF[N_RATE_LEVELS - 1]
    for i in range(niter):
        if n_rshifts[i] == 0:
            enc.enc_icdf(sum_pulses[i], cdf, 8)
        else:
            enc.enc_icdf(SILK_MAX_PULSES + 1, cdf, 8)
            for _ in range(n_rshifts[i] - 1):
                enc.enc_icdf(SILK_MAX_PULSES + 1, last, 8)
            enc.enc_icdf(sum_pulses[i], last, 8)
    for i in range(niter):
        if sum_pulses[i] > 0:
            shell_encoder(enc, abs_pulses[i * SHELL_CODEC_FRAME_LENGTH:
                                          (i + 1) * SHELL_CODEC_FRAME_LENGTH])
    for i in range(niter):
        if n_rshifts[i] > 0:
            nls = n_rshifts[i] - 1
            base = i * SHELL_CODEC_FRAME_LENGTH
            for k in range(SHELL_CODEC_FRAME_LENGTH):
                abs_q = abs(pulses[base + k])
                for j in range(nls, 0, -1):
                    enc.enc_icdf((abs_q >> j) & 1, TD.LSB_ICDF, 8)
                enc.enc_icdf(abs_q & 1, TD.LSB_ICDF, 8)
            sum_pulses[i] |= n_rshifts[i] << 5
    encode_signs(enc, pulses, frame_length, signal_type, quant_offset_type,
                 sum_pulses)


class SilkEncoderChannel(ChannelState):
    """Encoder channel state; reuses the decoder-side helpers/state."""

    def __init__(self):
        super().reset()
        self.nsq = NSQState()
        self.x_buf = np.zeros(2 * 320 + 5 * 16 + 16)
        self.frameCounter = 0
        self.speech_activity_q8 = 0
        self.input_tilt_q15 = 0
        self.input_quality_bands_q15 = [0] * 4
        self.snr_db_q7 = 0
        self.use_cbr = 0
        self.packet_loss_perc = 0
        self.prev_lag = 100
        self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.ltp_corr = 0.0
        self.sum_log_gain_q7 = 0
        self.prev_nlsf_q15 = [0] * MAX_LPC_ORDER
        self.last_gain_index = 10
        self.harm_shape_gain_smth = 0.0
        self.tilt_smth = 0.0
        self.sVAD = VadState()
        self.no_speech_counter = 0
        self.in_dtx = 0
        self.target_rate_bps = 20000
        # in-band FEC (LBRR) state (reference: silk_encoder_state
        # LBRR_enabled/LBRR_GainIncreases/LBRR_flags/indices_LBRR/
        # pulses_LBRR, silk/structs.h:170-178)
        self.lbrr_enabled = 0
        self.lbrr_gain_increases = 7
        self.LBRR_flags = [0, 0, 0]
        self.LBRR_flag = 0
        self.indices_LBRR = [None, None, None]
        self.pulses_LBRR = [None, None, None]
        self.LBRRprevLastGainIndex = 0
        self.resampler_enc = None
        # adaptive HP cutoff smoother state (reference:
        # silk/HP_variable_cutoff.c; read by the opus layer's hp_cutoff)
        self.variable_HP_smth1_Q15 = lin2log(60) << 8  # VARIABLE_HP_MIN_CUTOFF_HZ

    def partial_reset(self):
        """Reset for the first side frame after decode-only-middle
        (reference: enc_API.c:452-464)."""
        self.nsq = NSQState()
        self.prev_nlsf_q15 = [0] * MAX_LPC_ORDER
        self.prev_lag = 100
        self.last_gain_index = 10
        self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.harm_shape_gain_smth = 0.0
        self.tilt_smth = 0.0
        self.first_frame_after_reset = 1

    def do_vad(self, frame16, opus_activity=None):
        """(reference: silk_encode_do_VAD_FLP encode_frame_FLP.c:45).
        Returns (speech_activity_q8, tilt_q15, quality_q15[4], vad_flag)
        and updates DTX counters."""
        sa, tilt, qual = self.sVAD.get_sa_q8(
            [int(v) for v in frame16], self.frame_length, self.fs_kHz)
        thres = SILK_FIX_CONST(0.05, 8)  # SPEECH_ACTIVITY_DTX_THRES
        if opus_activity == 0 and sa >= thres:
            sa = thres - 1
        if sa < thres:
            self.no_speech_counter += 1
            if self.no_speech_counter <= 10:       # NB_SPEECH_FRAMES_BEFORE_DTX
                self.in_dtx = 0
            elif self.no_speech_counter > 20 + 10:  # MAX_CONSECUTIVE_DTX + NB
                self.no_speech_counter = 10
                self.in_dtx = 0
            else:
                self.in_dtx = 1
            vad_flag = 0
        else:
            self.no_speech_counter = 0
            self.in_dtx = 0
            vad_flag = 1
        self.speech_activity_q8 = sa
        self.input_tilt_q15 = tilt
        self.input_quality_bands_q15 = qual
        return sa, tilt, qual, vad_flag

    def hp_variable_cutoff(self):
        """(reference: silk_HP_variable_cutoff silk/HP_variable_cutoff.c:36)
        Update the smoothed HP cutoff from pitch-lag statistics."""
        if self.prevSignalType != TYPE_VOICED or self.prev_lag <= 0:
            return
        pitch_freq_hz_q16 = ((self.fs_kHz * 1000) << 16) // self.prev_lag
        pitch_freq_log_q7 = lin2log(pitch_freq_hz_q16) - (16 << 7)
        quality_q15 = self.input_quality_bands_q15[0]
        pitch_freq_log_q7 = SMLAWB(
            pitch_freq_log_q7,
            SMULWB((-quality_q15) << 2, quality_q15),
            pitch_freq_log_q7 - (lin2log(SILK_FIX_CONST(60, 16))
                                 - (16 << 7)))
        delta_freq_q7 = pitch_freq_log_q7 - (self.variable_HP_smth1_Q15 >> 8)
        if delta_freq_q7 < 0:
            delta_freq_q7 *= 3
        lim = SILK_FIX_CONST(0.4, 7)  # VARIABLE_HP_MAX_DELTA_FREQ
        delta_freq_q7 = max(-lim, min(lim, delta_freq_q7))
        self.variable_HP_smth1_Q15 = SMLAWB(
            self.variable_HP_smth1_Q15,
            SMULBB(self.speech_activity_q8, delta_freq_q7),
            SILK_FIX_CONST(0.1, 16))  # VARIABLE_HP_SMTH_COEF1
        lo = lin2log(60) << 8
        hi = lin2log(100) << 8
        self.variable_HP_smth1_Q15 = max(lo, min(hi,
                                                 self.variable_HP_smth1_Q15))

    # -- configuration --------------------------------------------------
    def setup(self, fs_khz, api_fs_hz, payload_ms, complexity):
        self.fs_kHz = fs_khz
        self.fs_API_hz = api_fs_hz
        self.nb_subfr = 2 if payload_ms == 10 else 4
        self.subfr_length = SUB_FRAME_LENGTH_MS * fs_khz
        self.frame_length = self.nb_subfr * self.subfr_length
        self.ltp_mem_length = LTP_MEM_LENGTH_MS * fs_khz
        self.la_pitch = LA_PITCH_MS * fs_khz
        self.la_shape = LA_SHAPE_MS * fs_khz
        self.shape_win_length = SUB_FRAME_LENGTH_MS * fs_khz \
            + 2 * self.la_shape
        if fs_khz in (8, 12):
            self.predict_lpc_order = MIN_LPC_ORDER
            self.psNLSF_CB = T.NLSF_CB_NB_MB
        else:
            self.predict_lpc_order = MAX_LPC_ORDER
            self.psNLSF_CB = T.NLSF_CB_WB
        if fs_khz == 8:
            self.pitch_contour_icdf = (TD.PITCH_CONTOUR_NB_ICDF
                                       if self.nb_subfr == MAX_NB_SUBFR
                                       else TD.PITCH_CONTOUR_10_MS_NB_ICDF)
        else:
            self.pitch_contour_icdf = (TD.PITCH_CONTOUR_ICDF
                                       if self.nb_subfr == MAX_NB_SUBFR
                                       else TD.PITCH_CONTOUR_10_MS_ICDF)
        if fs_khz == 16:
            self.pitch_lag_low_bits_icdf = TD.UNIFORM8_ICDF
        elif fs_khz == 12:
            self.pitch_lag_low_bits_icdf = TD.UNIFORM6_ICDF
        else:
            self.pitch_lag_low_bits_icdf = TD.UNIFORM4_ICDF
        self.pitch_lpc_win_length = (FIND_PITCH_LPC_WIN_MS if self.nb_subfr == 4
                                     else FIND_PITCH_LPC_WIN_MS_2_SF) * fs_khz
        # complexity mapping (reference: silk_setup_complexity
        # silk/control_codec.c:307): (shaping order, nStates, survivors,
        # warping on); pitch settings follow the >=6 rows used elsewhere.
        if complexity < 1:
            pe_order, pe_thr, pe_cplx = 6, 0.8, 0
        elif complexity < 2:
            pe_order, pe_thr, pe_cplx = 8, 0.76, 1
        elif complexity < 3:
            pe_order, pe_thr, pe_cplx = 6, 0.8, 0
        elif complexity < 4:
            pe_order, pe_thr, pe_cplx = 8, 0.76, 1
        elif complexity < 6:
            pe_order, pe_thr, pe_cplx = 10, 0.74, 1
        elif complexity < 8:
            pe_order, pe_thr, pe_cplx = 12, 0.72, 1
        else:
            pe_order, pe_thr, pe_cplx = 16, 0.7, 2
        self.pitch_estimation_lpc_order = min(pe_order,
                                              self.predict_lpc_order)
        self.pitch_estimation_threshold = pe_thr
        self.pitch_estimation_complexity = pe_cplx
        if complexity < 2:
            self.shaping_lpc_order = 12 if complexity < 1 else 14
            self.n_states_delayed_decision = 1
            self.nlsf_msvq_survivors = 2 if complexity < 1 else 3
            self.warping_q16 = 0
        elif complexity < 4:
            self.shaping_lpc_order = 12 if complexity < 3 else 14
            self.n_states_delayed_decision = 2
            self.nlsf_msvq_survivors = 2 if complexity < 3 else 4
            self.warping_q16 = 0
        elif complexity < 6:
            self.shaping_lpc_order = 16
            self.n_states_delayed_decision = 2
            self.nlsf_msvq_survivors = 6
            self.warping_q16 = fs_khz * SILK_FIX_CONST(0.015, 16)
        elif complexity < 8:
            self.shaping_lpc_order = 20
            self.n_states_delayed_decision = 3
            self.nlsf_msvq_survivors = 8
            self.warping_q16 = fs_khz * SILK_FIX_CONST(0.015, 16)
        else:
            self.shaping_lpc_order = 24
            self.n_states_delayed_decision = 4
            self.nlsf_msvq_survivors = 16
            self.warping_q16 = fs_khz * SILK_FIX_CONST(0.015, 16)
        self.use_interpolated_nlsfs = 1
        self.complexity = complexity
        # (re)create the input resampler whenever either rate changes
        # (reference: silk_control_encoder control_codec.c:118-135
        # re-inits the resampler on fs transitions)
        if (self.resampler_enc is None
                or getattr(self, "_resampler_rates", None)
                != (api_fs_hz, fs_khz * 1000)):
            self.resampler_enc = Resampler(api_fs_hz, fs_khz * 1000,
                                           for_enc=True)
            self._resampler_rates = (api_fs_hz, fs_khz * 1000)

    def control_snr(self, target_rate_bps):
        """(reference: silk/control_SNR.c:86)"""
        self.target_rate_bps = target_rate_bps
        if self.nb_subfr == 2:
            target_rate_bps -= 2000 + self.fs_kHz // 16
        if self.fs_kHz == 8:
            table = TD.TARGETRATE_NB_21
        elif self.fs_kHz == 12:
            table = TD.TARGETRATE_MB_21
        else:
            table = TD.TARGETRATE_WB_21
        idx = (target_rate_bps + 200) // 400
        idx = min(idx - 10, len(table) - 1)
        self.snr_db_q7 = 0 if idx <= 0 else table[idx] * 21

    def setup_lbrr(self, lbrr_coded: bool):
        """(reference: silk_setup_LBRR silk/control_codec.c:403)"""
        prev_enabled = self.lbrr_enabled
        self.lbrr_enabled = 1 if lbrr_coded else 0
        if self.lbrr_enabled:
            if prev_enabled == 0:
                self.lbrr_gain_increases = 7
            else:
                self.lbrr_gain_increases = max(
                    7 - ((self.packet_loss_perc
                          * SILK_FIX_CONST(0.2, 16)) >> 16), 3)

    def _lbrr_encode(self, ctrl, inp16, cond_coding, pitch_l):
        """Low-bitrate redundant encoding of the current frame: reuse all
        analysis results but re-quantize the excitation at boosted gains;
        the stored indices/pulses are emitted at the start of the NEXT
        packet (reference: silk_LBRR_encode_FLP
        silk/float/encode_frame_FLP.c:361; emission enc_API.c:363-405)."""
        i = self.nFramesDecoded
        # LBRR_SPEECH_ACTIVITY_THRES = 0.3 (silk/tuning_parameters.h:78)
        if not (self.lbrr_enabled
                and self.speech_activity_q8 > SILK_FIX_CONST(0.3, 8)):
            return
        self.LBRR_flags[i] = 1
        nsq_lbrr = self.nsq.copy()
        ind = dataclasses.replace(
            self.indices, GainsIndices=list(self.indices.GainsIndices),
            LTPIndex=list(self.indices.LTPIndex),
            NLSFIndices=list(self.indices.NLSFIndices))
        gains_save_q16 = list(ctrl["Gains_Q16"])
        if i == 0 or self.LBRR_flags[i - 1] == 0:
            # first (or first-after-gap) LBRR frame: boost the gain to hit
            # the reduced LBRR rate
            self.LBRRprevLastGainIndex = self.last_gain_index
            ind.GainsIndices[0] = min(
                ind.GainsIndices[0] + self.lbrr_gain_increases,
                N_LEVELS_QGAIN - 1)
        gains_q16, self.LBRRprevLastGainIndex = gains_dequant(
            ind.GainsIndices, self.LBRRprevLastGainIndex,
            cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
        ctrl["Gains_Q16"] = gains_q16
        pulses = [0] * ((self.frame_length + 15) & ~15)
        self._nsq_wrapper(ctrl, pulses, inp16, pitch_l,
                          nsq=nsq_lbrr, indices=ind)
        ctrl["Gains_Q16"] = gains_save_q16
        self.indices_LBRR[i] = ind
        self.pulses_LBRR[i] = pulses

    # -- frame encode ----------------------------------------------------
    def encode_frame(self, enc: RangeEncoder, inp16, cond_coding, max_bits,
                     use_cbr):
        """inp16: int16 frame at internal rate.  (reference:
        encode_frame_FLP.c)"""
        self.indices = SideInfoIndices()
        self.indices.Seed = self.frameCounter & 3
        self.frameCounter += 1

        # VAD + signal type: reuse the pre-pass result from encode() (the
        # header VAD bit was already written from it; recomputing here could
        # disagree and desync the decoder's icdf table choice).
        if getattr(self, "_vad_result", None) is not None:
            sa, tilt, qual, vad_flag = self._vad_result
            self._vad_result = None
        else:
            sa, tilt, qual, vad_flag = self.do_vad(
                np.asarray(inp16, np.int64))
        self.speech_activity_q8 = sa
        self.input_tilt_q15 = tilt
        self.input_quality_bands_q15 = qual
        if not vad_flag:
            self.indices.signalType = TYPE_NO_VOICE_ACTIVITY
            self.VAD_flags[self.nFramesDecoded] = 0
        else:
            self.indices.signalType = TYPE_UNVOICED
            self.VAD_flags[self.nFramesDecoded] = 1

        # shift input buffer and append new frame
        la_shape = self.la_shape
        buf_head = self.ltp_mem_length
        x_frame_off = buf_head
        self.x_buf[:-self.frame_length] = self.x_buf[self.frame_length:]
        self.x_buf[x_frame_off + la_shape:
                   x_frame_off + la_shape + self.frame_length] = inp16
        for i in range(8):
            self.x_buf[x_frame_off + la_shape
                       + i * (self.frame_length >> 3)] += (1 - (i & 2)) * 1e-6

        x_frame = self.x_buf  # full buffer; frame starts at x_frame_off

        # ---- pitch analysis ----
        buf_len = self.la_pitch + self.frame_length + self.ltp_mem_length
        res_pitch = np.zeros(2 * 320 + self.la_pitch + 16)
        pred_gain = FA.find_pitch_lags(self, self.x_buf[:buf_len], res_pitch)
        pitch_l = [0] * self.nb_subfr
        if self.indices.signalType != TYPE_NO_VOICE_ACTIVITY \
                and not self.first_frame_after_reset:
            # final-stage threshold (reference: find_pitch_lags_FLP.c:103)
            thr = 0.6
            thr -= 0.004 * self.pitch_estimation_lpc_order
            thr -= 0.1 * self.speech_activity_q8 / 256.0
            thr -= 0.15 * (self.prevSignalType >> 1)
            thr -= 0.1 * self.input_tilt_q15 / 32768.0
            voiced, lag_index, contour_index, pitch_l, ltp_corr = \
                FA.pitch_analysis(res_pitch, self.fs_kHz, self.nb_subfr,
                                  self.pitch_estimation_threshold, thr,
                                  self.pitch_estimation_complexity,
                                  self.prev_lag, self.ltp_corr)
            self.ltp_corr = ltp_corr
            if voiced:
                self.indices.signalType = TYPE_VOICED
                self.indices.lagIndex = lag_index
                self.indices.contourIndex = contour_index
        else:
            self.ltp_corr = 0.0

        # ---- noise shape analysis ----
        ctrl = self._noise_shape_analysis(res_pitch, x_frame_off, pred_gain,
                                          pitch_l)

        # ---- prediction coefficients ----
        self._find_pred_coefs(ctrl, res_pitch, x_frame_off, cond_coding,
                              pitch_l)

        # ---- gains processing ----
        self._process_gains(ctrl, cond_coding)

        # ---- low-bitrate redundancy (in-band FEC) ----
        self._lbrr_encode(ctrl, inp16, cond_coding, pitch_l)

        # ---- rate loop ----
        gains_unq_q16 = list(ctrl["Gains_Q16"])
        last_gain_index_prev = ctrl["lastGainIndexPrev"]
        max_iter = 6
        gain_mult_q8 = 256
        found_lower = found_upper = False
        gains_id = tuple(self.indices.GainsIndices[:self.nb_subfr])
        gains_id_lower = gains_id_upper = None
        n_bits_lower = n_bits_upper = 0
        gain_mult_lower = gain_mult_upper = 0
        enc_copy = enc.save_state()
        nsq_copy = self.nsq.copy()
        seed_copy = self.indices.Seed
        prev_lag_copy = self.ec_prevLagIndex
        prev_sigtype_copy = self.ec_prevSignalType
        best_state = None
        pulses = [0] * ((self.frame_length + 15) & ~15)
        bits_margin = 5 if use_cbr else max_bits // 4
        it = 0
        while True:
            if gains_id == gains_id_lower:
                n_bits = n_bits_lower
            elif gains_id == gains_id_upper:
                n_bits = n_bits_upper
            else:
                if it > 0:
                    enc.restore_state(enc_copy)
                    self.nsq = nsq_copy.copy()
                    self.indices.Seed = seed_copy
                    self.ec_prevLagIndex = prev_lag_copy
                    self.ec_prevSignalType = prev_sigtype_copy
                self._nsq_wrapper(ctrl, pulses, inp16, pitch_l)
                self.encode_indices(enc, self.nFramesDecoded, 0, cond_coding)
                encode_pulses(enc, self.indices.signalType,
                              self.indices.quantOffsetType, list(pulses),
                              self.frame_length)
                n_bits = ec_tell(enc)
                if not use_cbr and it == 0 and n_bits <= max_bits:
                    break
            if it >= max_iter:
                if best_state is not None and \
                        (gains_id == gains_id_lower or n_bits > max_bits):
                    enc.restore_state(best_state[0])
                    self.nsq = best_state[1].copy()
                    self.last_gain_index = best_state[2]
                break
            if n_bits > max_bits:
                if not found_lower and it >= 2:
                    ctrl["Lambda"] = max(ctrl["Lambda"] * 1.5, 1.5)
                    self.indices.quantOffsetType = 0
                    found_upper = False
                    gains_id_upper = None
                else:
                    found_upper = True
                    n_bits_upper = n_bits
                    gain_mult_upper = gain_mult_q8
                    gains_id_upper = gains_id
            elif n_bits < max_bits - bits_margin:
                found_lower = True
                n_bits_lower = n_bits
                gain_mult_lower = gain_mult_q8
                if gains_id != gains_id_lower:
                    gains_id_lower = gains_id
                    best_state = (enc.save_state(), self.nsq.copy(),
                                  self.last_gain_index)
            else:
                break
            if not (found_lower and found_upper):
                if n_bits > max_bits:
                    gain_mult_q8 = min(1024, gain_mult_q8 * 3 // 2)
                else:
                    gain_mult_q8 = max(64, gain_mult_q8 * 4 // 5)
            else:
                gain_mult_q8 = gain_mult_lower + \
                    (gain_mult_upper - gain_mult_lower) \
                    * (max_bits - n_bits_lower) // (n_bits_upper - n_bits_lower)
                hi = gain_mult_lower + ((gain_mult_upper - gain_mult_lower) >> 2)
                lo = gain_mult_upper - ((gain_mult_upper - gain_mult_lower) >> 2)
                gain_mult_q8 = max(min(gain_mult_q8, hi), lo) \
                    if gain_mult_upper < gain_mult_lower else gain_mult_q8
            p_gains_q16 = [LSHIFT_SAT32(SMULWB(gains_unq_q16[i], gain_mult_q8),
                                        8) for i in range(self.nb_subfr)]
            self.last_gain_index = last_gain_index_prev
            ginds, p_gains_q16, self.last_gain_index = gains_quant(
                p_gains_q16, self.last_gain_index,
                cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
            self.indices.GainsIndices = ginds + [0] * (4 - len(ginds))
            gains_id = tuple(ginds)
            ctrl["Gains_Q16"] = p_gains_q16
            it += 1

        self.prev_lag = pitch_l[self.nb_subfr - 1] if \
            self.indices.signalType == TYPE_VOICED else self.prev_lag
        self.prevSignalType = self.indices.signalType
        self.first_frame_after_reset = 0
        self.nFramesDecoded += 1  # reused as nFramesEncoded
        return (ec_tell(enc) + 7) >> 3

    # ------------------------------------------------------------------
    def encode_indices(self, enc, frame_index, encode_lbrr, cond_coding):
        """Mirror of decode_indices (reference: silk/encode_indices.c)."""
        ind = self.indices_LBRR[frame_index] if encode_lbrr \
            else self.indices
        typ = ind.signalType
        if encode_lbrr or self.VAD_flags[frame_index]:
            assert typ >= 1
            enc.enc_icdf(2 * typ + ind.quantOffsetType - 2,
                         TD.TYPE_OFFSET_VAD_ICDF, 8)
        else:
            assert typ < 2
            enc.enc_icdf(2 * typ + ind.quantOffsetType,
                         TD.TYPE_OFFSET_NO_VAD_ICDF, 8)
        if cond_coding == CODE_CONDITIONALLY:
            enc.enc_icdf(ind.GainsIndices[0], TD.DELTA_GAIN_ICDF, 8)
        else:
            enc.enc_icdf(ind.GainsIndices[0] >> 3, T.GAIN_ICDF[typ], 8)
            enc.enc_icdf(ind.GainsIndices[0] & 7, TD.UNIFORM8_ICDF, 8)
        for i in range(1, self.nb_subfr):
            enc.enc_icdf(ind.GainsIndices[i], TD.DELTA_GAIN_ICDF, 8)

        cb = self.psNLSF_CB
        enc.enc_icdf(ind.NLSFIndices[0],
                     cb.CB1_iCDF[(typ >> 1) * cb.nVectors:], 8)
        from .decoder import nlsf_unpack
        ec_ix, _ = nlsf_unpack(cb, ind.NLSFIndices[0])
        for i in range(cb.order):
            idx = ind.NLSFIndices[i + 1]
            if idx >= NLSF_QUANT_MAX_AMPLITUDE:
                enc.enc_icdf(2 * NLSF_QUANT_MAX_AMPLITUDE,
                             cb.ec_iCDF[ec_ix[i]:], 8)
                enc.enc_icdf(idx - NLSF_QUANT_MAX_AMPLITUDE,
                             TD.NLSF_EXT_ICDF, 8)
            elif idx <= -NLSF_QUANT_MAX_AMPLITUDE:
                enc.enc_icdf(0, cb.ec_iCDF[ec_ix[i]:], 8)
                enc.enc_icdf(-idx - NLSF_QUANT_MAX_AMPLITUDE,
                             TD.NLSF_EXT_ICDF, 8)
            else:
                enc.enc_icdf(idx + NLSF_QUANT_MAX_AMPLITUDE,
                             cb.ec_iCDF[ec_ix[i]:], 8)
        if self.nb_subfr == MAX_NB_SUBFR:
            assert 0 <= ind.NLSFInterpCoef_Q2 <= 4
            enc.enc_icdf(ind.NLSFInterpCoef_Q2,
                         TD.NLSF_INTERPOLATION_FACTOR_ICDF, 8)
        else:
            assert ind.NLSFInterpCoef_Q2 == 4

        if ind.signalType == TYPE_VOICED:
            encode_absolute = True
            if cond_coding == CODE_CONDITIONALLY and \
                    self.ec_prevSignalType == TYPE_VOICED:
                delta = ind.lagIndex - self.ec_prevLagIndex
                if -8 <= delta <= 11:
                    enc.enc_icdf(delta + 9, TD.PITCH_DELTA_ICDF, 8)
                    encode_absolute = False
                else:
                    enc.enc_icdf(0, TD.PITCH_DELTA_ICDF, 8)
            if encode_absolute:
                enc.enc_icdf(ind.lagIndex // (self.fs_kHz >> 1),
                             TD.PITCH_LAG_ICDF, 8)
                enc.enc_icdf(ind.lagIndex % (self.fs_kHz >> 1),
                             self.pitch_lag_low_bits_icdf, 8)
            self.ec_prevLagIndex = ind.lagIndex
            enc.enc_icdf(ind.contourIndex, self.pitch_contour_icdf, 8)
            enc.enc_icdf(ind.PERIndex, TD.LTP_PER_INDEX_ICDF, 8)
            for k in range(self.nb_subfr):
                enc.enc_icdf(ind.LTPIndex[k],
                             T.LTP_GAIN_ICDF_PTRS[ind.PERIndex], 8)
            if cond_coding == CODE_INDEPENDENTLY:
                enc.enc_icdf(ind.LTP_scaleIndex, TD.LTPSCALE_ICDF, 8)
            else:
                assert ind.LTP_scaleIndex == 0
        self.ec_prevSignalType = ind.signalType
        enc.enc_icdf(ind.Seed, TD.UNIFORM4_ICDF, 8)

    # ------------------------------------------------------------------
    def _noise_shape_analysis(self, res_pitch, x_frame_off, pred_gain,
                              pitch_l):
        """(reference: noise_shape_analysis_FLP.c).  Returns ctrl dict."""
        ctrl = {}
        snr_adj_db = self.snr_db_q7 / 128.0
        input_quality = 0.5 * (self.input_quality_bands_q15[0]
                               + self.input_quality_bands_q15[1]) / 32768.0
        coding_quality = FA.sigmoid(0.25 * (snr_adj_db - 20.0))
        ctrl["input_quality"] = input_quality
        ctrl["coding_quality"] = coding_quality
        if not self.use_cbr:
            b = 1.0 - self.speech_activity_q8 / 256.0
            snr_adj_db -= FA.BG_SNR_DECR_dB * coding_quality \
                * (0.5 + 0.5 * input_quality) * b * b
        if self.indices.signalType == TYPE_VOICED:
            snr_adj_db += FA.HARM_SNR_INCR_dB * self.ltp_corr
        else:
            snr_adj_db += (-0.4 * self.snr_db_q7 / 128.0 + 6.0) \
                * (1.0 - input_quality)

        if self.indices.signalType == TYPE_VOICED:
            self.indices.quantOffsetType = 0
        else:
            n_samples = 2 * self.fs_kHz
            n_segs = SUB_FRAME_LENGTH_MS * self.nb_subfr // 2
            energy_variation = 0.0
            log_energy_prev = 0.0
            base = x_frame_off
            for k in range(n_segs):
                seg = res_pitch[base + k * n_samples:
                                base + (k + 1) * n_samples]
                nrg = n_samples + float(np.dot(seg, seg))
                log_energy = math.log2(nrg)
                if k > 0:
                    energy_variation += abs(log_energy - log_energy_prev)
                log_energy_prev = log_energy
            if energy_variation > \
                    FA.ENERGY_VARIATION_THRESHOLD_QNT_OFFSET * (n_segs - 1):
                self.indices.quantOffsetType = 0
            else:
                self.indices.quantOffsetType = 1

        strength = FA.FIND_PITCH_WHITE_NOISE_FRACTION * pred_gain
        bw_exp = FA.BANDWIDTH_EXPANSION / (1.0 + strength * strength)
        warping = self.warping_q16 / 65536.0 + 0.01 * coding_quality

        order = self.shaping_lpc_order
        AR = np.zeros(self.nb_subfr * MAX_SHAPE_LPC_ORDER)
        gains = np.zeros(self.nb_subfr)
        x_ptr = x_frame_off - self.la_shape
        for k in range(self.nb_subfr):
            flat_part = self.fs_kHz * 3
            slope_part = (self.shape_win_length - flat_part) // 2
            seg = self.x_buf[x_ptr:x_ptr + self.shape_win_length]
            xw = np.concatenate([
                FA.apply_sine_window(seg[:slope_part], 1),
                seg[slope_part:slope_part + flat_part],
                FA.apply_sine_window(seg[slope_part + flat_part:], 2)])
            x_ptr += self.subfr_length
            if self.warping_q16 > 0:
                ac = FA.warped_autocorrelation(xw, warping, order)
            else:
                ac = FA.autocorrelation(xw, order)
            ac[0] += ac[0] * FA.SHAPE_WHITE_NOISE_FRACTION + 1.0
            rc, nrg = FA.schur(ac, order)
            a = FA.k2a(rc, order)
            gains[k] = math.sqrt(max(nrg, 0.0))
            if self.warping_q16 > 0:
                lam = -warping
                g = a[order - 1]
                for i in range(order - 2, -1, -1):
                    g = lam * g + a[i]
                gains[k] *= 1.0 / (1.0 - lam * g)
            FA.bwexpander_flp(a, bw_exp)
            if self.warping_q16 > 0:
                _warped_true2monic(a, warping, 3.999, order)
            else:
                _limit_coefs(a, 3.999, order)
            AR[k * MAX_SHAPE_LPC_ORDER:k * MAX_SHAPE_LPC_ORDER + order] = a

        gain_mult = 2.0 ** (-0.16 * snr_adj_db)
        gain_add = 2.0 ** (0.16 * T.MIN_QGAIN_DB)
        gains = gains * gain_mult + gain_add

        strength = FA.LOW_FREQ_SHAPING * (
            1.0 + FA.LOW_QUALITY_LOW_FREQ_SHAPING_DECR
            * (self.input_quality_bands_q15[0] / 32768.0 - 1.0))
        strength *= self.speech_activity_q8 / 256.0
        lf_ma = np.zeros(self.nb_subfr)
        lf_ar = np.zeros(self.nb_subfr)
        if self.indices.signalType == TYPE_VOICED:
            for k in range(self.nb_subfr):
                b = 0.2 / self.fs_kHz + 3.0 / max(pitch_l[k], 1)
                lf_ma[k] = -1.0 + b
                lf_ar[k] = 1.0 - b - b * strength
            tilt = -FA.HP_NOISE_COEF - (1 - FA.HP_NOISE_COEF) \
                * FA.HARM_HP_NOISE_COEF * self.speech_activity_q8 / 256.0
        else:
            b = 1.3 / self.fs_kHz
            lf_ma[:] = -1.0 + b
            lf_ar[:] = 1.0 - b - b * strength * 0.6
            tilt = -FA.HP_NOISE_COEF

        if self.indices.signalType == TYPE_VOICED:
            harm_shape_gain = FA.HARMONIC_SHAPING
            harm_shape_gain += FA.HIGH_RATE_OR_LOW_QUALITY_HARMONIC_SHAPING \
                * (1.0 - (1.0 - coding_quality) * input_quality)
            harm_shape_gain *= math.sqrt(max(self.ltp_corr, 0.0))
        else:
            harm_shape_gain = 0.0

        hsg = np.zeros(self.nb_subfr)
        tlt = np.zeros(self.nb_subfr)
        for k in range(self.nb_subfr):
            self.harm_shape_gain_smth += FA.SUBFR_SMTH_COEF \
                * (harm_shape_gain - self.harm_shape_gain_smth)
            hsg[k] = self.harm_shape_gain_smth
            self.tilt_smth += FA.SUBFR_SMTH_COEF * (tilt - self.tilt_smth)
            tlt[k] = self.tilt_smth

        ctrl.update(AR=AR, Gains=gains, LF_MA_shp=lf_ma, LF_AR_shp=lf_ar,
                    Tilt=tlt, HarmShapeGain=hsg)
        return ctrl

    # ------------------------------------------------------------------
    def _find_pred_coefs(self, ctrl, res_pitch, x_frame_off, cond_coding,
                         pitch_l):
        """(reference: find_pred_coefs_FLP.c)"""
        inv_gains = 1.0 / np.maximum(ctrl["Gains"], 1e-9)
        order = self.predict_lpc_order
        if self.indices.signalType == TYPE_VOICED:
            XX, xX = FA.find_ltp(res_pitch, pitch_l, self.subfr_length,
                                 self.nb_subfr, x_frame_off)
            b_q14, ltp_idx, per_idx, pred_gain_db, self.sum_log_gain_q7 = \
                FA.quant_ltp_gains(XX, xX, self.subfr_length, self.nb_subfr,
                                   self.sum_log_gain_q7)
            self.indices.LTPIndex = ltp_idx + [0] * (4 - len(ltp_idx))
            self.indices.PERIndex = per_idx
            ctrl["LTPredCodGain"] = pred_gain_db
            # LTP scaling
            if cond_coding == CODE_INDEPENDENTLY:
                round_loss = self.packet_loss_perc * self.nFramesPerPacket
                idx = int(SMULBB(int(pred_gain_db), round_loss)
                          > log2lin(2900 - self.snr_db_q7))
                idx += int(SMULBB(int(pred_gain_db), round_loss)
                           > log2lin(3900 - self.snr_db_q7))
                self.indices.LTP_scaleIndex = idx
            else:
                self.indices.LTP_scaleIndex = 0
            ltp_scale_q14 = TD.LTPSCALES_TABLE_Q14[self.indices.LTP_scaleIndex]
            ctrl["LTP_scale_Q14"] = ltp_scale_q14
            ctrl["LTPCoef_Q14"] = b_q14
            lpc_in = FA.ltp_analysis_filter(
                self.x_buf, x_frame_off, b_q14, pitch_l, inv_gains,
                self.subfr_length, self.nb_subfr, order)
        else:
            lpc_in = np.zeros(self.nb_subfr * (self.subfr_length + order))
            stride = self.subfr_length + order
            for k in range(self.nb_subfr):
                seg = self.x_buf[x_frame_off + k * self.subfr_length - order:
                                 x_frame_off + (k + 1) * self.subfr_length]
                lpc_in[k * stride:(k + 1) * stride] = seg * inv_gains[k]
            ctrl["LTPCoef_Q14"] = [0] * (LTP_ORDER * self.nb_subfr)
            ctrl["LTPredCodGain"] = 0.0
            ctrl["LTP_scale_Q14"] = 0
            self.indices.LTP_scaleIndex = 0
            self.sum_log_gain_q7 = 0

        if self.first_frame_after_reset:
            min_inv_gain = 1.0 / 1e2
        else:
            min_inv_gain = 2 ** (ctrl["LTPredCodGain"] / 3) / 1e4
            min_inv_gain /= 0.25 + 0.75 * ctrl["coding_quality"]

        # find_LPC: burg + interpolation search
        subfr_len_ext = self.subfr_length + order
        self.indices.NLSFInterpCoef_Q2 = 4
        a, res_nrg = FA.burg_modified(lpc_in, min_inv_gain, subfr_len_ext,
                                      self.nb_subfr, order)
        nlsf_q15 = None
        if self.use_interpolated_nlsfs and not self.first_frame_after_reset \
                and self.nb_subfr == MAX_NB_SUBFR:
            a_tmp, res_nrg_half = FA.burg_modified(
                lpc_in[2 * subfr_len_ext:], min_inv_gain, subfr_len_ext, 2,
                order)
            res_nrg -= res_nrg_half
            nlsf_q15 = a2nlsf([int(round(v * 65536)) for v in a_tmp], order)
            res_nrg_2nd = float('inf')
            from .nlsf_enc import interpolate
            from .decoder import nlsf2a
            for k in range(3, -1, -1):
                nlsf0 = interpolate(self.prev_nlsf_q15[:order], nlsf_q15, k,
                                    order)
                a_interp = np.array(nlsf2a(nlsf0, order)) / 4096.0
                lpc_res = FA.lpc_analysis_filter_flp(
                    lpc_in[:2 * subfr_len_ext], a_interp, order)
                r1 = lpc_res[order:subfr_len_ext]
                r2 = lpc_res[subfr_len_ext + order:2 * subfr_len_ext]
                res_nrg_interp = float(np.dot(r1, r1) + np.dot(r2, r2))
                if res_nrg_interp < res_nrg:
                    res_nrg = res_nrg_interp
                    self.indices.NLSFInterpCoef_Q2 = k
                elif res_nrg_interp > res_nrg_2nd:
                    break
                res_nrg_2nd = res_nrg_interp
        if self.indices.NLSFInterpCoef_Q2 == 4:
            nlsf_q15 = a2nlsf([int(round(v * 65536)) for v in a], order)

        pred_coef_q12 = process_nlsfs(self, nlsf_q15)
        ctrl["PredCoef_Q12"] = pred_coef_q12
        self.prev_nlsf_q15[:order] = nlsf_q15

        # residual energies with quantized coefs
        pc = [np.array(pred_coef_q12[0]) / 4096.0,
              np.array(pred_coef_q12[1]) / 4096.0]
        ctrl["ResNrg"] = FA.residual_energy(lpc_in, pc, ctrl["Gains"],
                                            self.subfr_length, self.nb_subfr,
                                            order)

    # ------------------------------------------------------------------
    def _process_gains(self, ctrl, cond_coding):
        """(reference: process_gains_FLP.c)"""
        gains = ctrl["Gains"]
        if self.indices.signalType == TYPE_VOICED:
            s = 1.0 - 0.5 * FA.sigmoid(0.25 * (ctrl["LTPredCodGain"] - 12.0))
            gains *= s
        inv_max_sqr = (2.0 ** (0.33 * (21.0 - self.snr_db_q7 / 128.0))) \
            / self.subfr_length
        for k in range(self.nb_subfr):
            gains[k] = min(math.sqrt(gains[k] ** 2
                                     + ctrl["ResNrg"][k] * inv_max_sqr),
                           32767.0)
        p_gains_q16 = [int(g * 65536) for g in gains]
        ctrl["GainsUnq_Q16"] = list(p_gains_q16)
        ctrl["lastGainIndexPrev"] = self.last_gain_index
        ginds, p_gains_q16, self.last_gain_index = gains_quant(
            p_gains_q16, self.last_gain_index,
            cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
        self.indices.GainsIndices = ginds + [0] * (4 - len(ginds))
        ctrl["Gains_Q16"] = p_gains_q16
        ctrl["Gains"] = np.array(p_gains_q16) / 65536.0
        if self.indices.signalType == TYPE_VOICED:
            if ctrl["LTPredCodGain"] + self.input_tilt_q15 / 32768.0 > 1.0:
                self.indices.quantOffsetType = 0
            else:
                self.indices.quantOffsetType = 1
        quant_offset = T.QUANTIZATION_OFFSETS_Q10[
            self.indices.signalType >> 1][self.indices.quantOffsetType] / 1024.0
        ctrl["Lambda"] = (FA.LAMBDA_OFFSET
                          + FA.LAMBDA_DELAYED_DECISIONS
                          * self.n_states_delayed_decision
                          + FA.LAMBDA_SPEECH_ACT * self.speech_activity_q8 / 256.0
                          + FA.LAMBDA_INPUT_QUALITY * ctrl["input_quality"]
                          + FA.LAMBDA_CODING_QUALITY * ctrl["coding_quality"]
                          + FA.LAMBDA_QUANT_OFFSET * quant_offset)

    # ------------------------------------------------------------------
    def _nsq_wrapper(self, ctrl, pulses, inp16, pitch_l, nsq=None,
                     indices=None):
        """(reference: silk_NSQ_wrapper_FLP wrappers_FLP.c:96).  nsq and
        indices default to the channel's own; the LBRR pass supplies
        copies so the redundant quantization leaves the real state
        untouched."""
        nsq = self.nsq if nsq is None else nsq
        indices = self.indices if indices is None else indices
        nb = self.nb_subfr
        ar_q13 = [0] * (nb * MAX_SHAPE_LPC_ORDER)
        for k in range(nb):
            for j in range(self.shaping_lpc_order):
                ar_q13[k * MAX_SHAPE_LPC_ORDER + j] = int(round(
                    ctrl["AR"][k * MAX_SHAPE_LPC_ORDER + j] * 8192.0))
        lf_shp_q14 = [0] * nb
        tilt_q14 = [0] * nb
        hsg_q14 = [0] * nb
        for k in range(nb):
            ar_shp = int(round(ctrl["LF_AR_shp"][k] * 16384.0))
            ma_shp = int(round(ctrl["LF_MA_shp"][k] * 16384.0)) & 0xFFFF
            lf_shp_q14[k] = wrap32((ar_shp << 16) | ma_shp)
            tilt_q14[k] = int(round(ctrl["Tilt"][k] * 16384.0))
            hsg_q14[k] = int(round(ctrl["HarmShapeGain"][k] * 16384.0))
        lambda_q10 = int(round(ctrl["Lambda"] * 1024.0))
        ltp_coef_q14 = ctrl["LTPCoef_Q14"]
        pred_coef_q12 = ctrl["PredCoef_Q12"]
        gains_q16 = ctrl["Gains_Q16"]
        ltp_scale_q14 = ctrl.get("LTP_scale_Q14", 0) \
            if indices.signalType == TYPE_VOICED else 0
        x16 = [SAT16(int(round(v))) for v in inp16]
        if self.n_states_delayed_decision > 1 or self.warping_q16 > 0:
            # the reference default at complexity >= 2
            # (reference: silk_NSQ_wrapper_FLP wrappers_FLP.c:96)
            if getattr(self, "use_jax_nsq", False):
                # beam-vectorized [S]-lane twin, bit-exact with the
                # scalar quantizer (tests/test_nsq_del_dec_jax.py)
                from .nsq_del_dec_jax import silk_nsq_del_dec_jax
                silk_nsq_del_dec_jax(
                    self, nsq, indices, x16, pulses, pred_coef_q12,
                    ltp_coef_q14, ar_q13, hsg_q14, tilt_q14, lf_shp_q14,
                    gains_q16, pitch_l, lambda_q10, ltp_scale_q14)
            else:
                from .nsq_del_dec import silk_nsq_del_dec
                silk_nsq_del_dec(self, nsq, indices, x16, pulses,
                                 pred_coef_q12, ltp_coef_q14, ar_q13,
                                 hsg_q14, tilt_q14, lf_shp_q14, gains_q16,
                                 pitch_l, lambda_q10, ltp_scale_q14)
        else:
            silk_nsq(self, nsq, indices, x16, pulses,
                     pred_coef_q12, ltp_coef_q14, ar_q13, hsg_q14, tilt_q14,
                     lf_shp_q14, gains_q16, pitch_l, lambda_q10,
                     ltp_scale_q14)


def _warped_true2monic(coefs, lam, limit, order):
    for i in range(order - 1, 0, -1):
        coefs[i - 1] -= lam * coefs[i]
    gain = (1.0 - lam * lam) / (1.0 + lam * coefs[0])
    coefs[:order] *= gain
    for _ in range(10):
        maxabs = -1.0
        ind = 0
        for i in range(order):
            if abs(coefs[i]) > maxabs:
                maxabs = abs(coefs[i])
                ind = i
        if maxabs <= limit:
            return
        for i in range(1, order):
            coefs[i - 1] += lam * coefs[i]
        coefs[:order] *= 1.0 / gain
        chirp = 0.99 - (0.8 + 0.1 * 0) * (maxabs - limit) / (maxabs * (ind + 1))
        FA.bwexpander_flp(coefs[:order], chirp)
        for i in range(order - 1, 0, -1):
            coefs[i - 1] -= lam * coefs[i]
        gain = (1.0 - lam * lam) / (1.0 + lam * coefs[0])
        coefs[:order] *= gain


def _limit_coefs(coefs, limit, order):
    for it in range(10):
        maxabs = -1.0
        ind = 0
        for i in range(order):
            if abs(coefs[i]) > maxabs:
                maxabs = abs(coefs[i])
                ind = i
        if maxabs <= limit:
            return
        chirp = 0.99 - (0.8 + 0.1 * it) * (maxabs - limit) / (maxabs * (ind + 1))
        FA.bwexpander_flp(coefs[:order], chirp)


_SNR_TABLE_NB = TD.TARGETRATE_NB_21 if hasattr(TD, "TARGETRATE_NB_21") else None
_SNR_TABLE_MB = TD.TARGETRATE_MB_21 if hasattr(TD, "TARGETRATE_MB_21") else None
_SNR_TABLE_WB = TD.TARGETRATE_WB_21 if hasattr(TD, "TARGETRATE_WB_21") else None


class SilkEncoder:
    """silk_Encode equivalent (mono; reference: silk/enc_API.c:150)."""

    def __init__(self, use_jax_nsq: bool = True):
        self.channels = [SilkEncoderChannel(), SilkEncoderChannel()]
        self.channel = self.channels[0]   # mono alias
        self.stereo = StereoEncState()
        self.prev_decode_only_middle = 0
        self.n_frames_per_packet = 1
        # bit-reservoir state (reference: silk_encoder.nBitsExceeded)
        self.n_bits_exceeded = 0
        self.set_jax_nsq(use_jax_nsq)

    def set_jax_nsq(self, enabled: bool) -> None:
        """Route the delayed-decision NSQ through the beam-vectorized
        jax core (bit-exact twin of the scalar quantizer; the TPU
        production path)."""
        for ch in self.channels:
            ch.use_jax_nsq = bool(enabled)

    def encode(self, enc: RangeEncoder, pcm_api, *, api_fs_hz,
               internal_fs_hz, payload_ms, bitrate_bps, max_bits,
               use_cbr=False, complexity=9, packet_loss_perc=0,
               n_channels=1, lbrr_coded=False, prefill=False):
        """Encode one SILK packet worth of PCM into enc (reference:
        silk_Encode enc_API.c:150).  pcm_api: int16 at API rate,
        interleaved when n_channels == 2.  Returns bytes used."""
        fs_khz = internal_fs_hz // 1000
        frame_ms = min(payload_ms, 20)
        n_frames = max(1, payload_ms // 20)
        chs = self.channels[:n_channels]
        for ch in chs:
            ch.nFramesPerPacket = n_frames
            if ch.fs_kHz != fs_khz or ch.fs_API_hz != api_fs_hz \
                    or ch.nb_subfr != (2 if frame_ms == 10 else 4):
                ch.setup(fs_khz, api_fs_hz, frame_ms, complexity)
                # pending LBRR data was built against the old fs/codebook
                # tables; the reference drops it on any transition
                # (enc_API.c:268-272)
                ch.LBRR_flags = [0, 0, 0]
            ch.packet_loss_perc = packet_loss_perc
            ch.use_cbr = 1 if use_cbr else 0
            ch.nFramesDecoded = 0
            ch.setup_lbrr(lbrr_coded)

        # resample each API channel to the internal rate
        pcm = np.asarray(pcm_api, dtype=np.int64)
        x_int = []
        for n in range(n_channels):
            x = list(pcm[n::n_channels]) if n_channels == 2 else list(pcm)
            if api_fs_hz != internal_fs_hz:
                out = []
                chunk = 10 * (api_fs_hz // 1000)
                for off in range(0, len(x), chunk):
                    out += chs[n].resampler_enc.process(x[off:off + chunk])
                x_int.append(out)
            else:
                x_int.append(x)

        frame_len = chs[0].frame_length

        # Reserve header space for VAD+LBRR flags, patched at the end
        # (reference: enc_API.c:356-361)
        hdr_bits = (n_frames + 1) * n_channels
        icdf0 = 256 - (256 >> hdr_bits)
        if not prefill:
            enc.enc_icdf(0, (icdf0, 0), 8)

            # Encode any LBRR data stored during the PREVIOUS packet: the
            # redundant copy of packet k's frames rides at the front of
            # packet k+1's payload (reference: enc_API.c:363-405)
            for n in range(n_channels):
                ch = chs[n]
                lbrr_symbol = 0
                for i in range(n_frames):
                    lbrr_symbol |= ch.LBRR_flags[i] << i
                ch.LBRR_flag = 1 if lbrr_symbol > 0 else 0
                if lbrr_symbol and n_frames > 1:
                    enc.enc_icdf(lbrr_symbol - 1,
                                 T.LBRR_FLAGS_ICDF_PTR[n_frames - 2], 8)
            for i in range(n_frames):
                for n in range(n_channels):
                    ch = chs[n]
                    if not ch.LBRR_flags[i]:
                        continue
                    if n_channels == 2 and n == 0:
                        stereo_encode_pred(enc, self.stereo.predIx[i])
                        # mid-only flag only needed when the side channel
                        # has no LBRR of its own (enc_API.c:384-388)
                        if chs[1].LBRR_flags[i] == 0:
                            stereo_encode_mid_only(
                                enc, self.stereo.mid_only_flags[i])
                    cond = CODE_CONDITIONALLY \
                        if i > 0 and ch.LBRR_flags[i - 1] \
                        else CODE_INDEPENDENTLY
                    ch.encode_indices(enc, i, 1, cond)
                    encode_pulses(enc, ch.indices_LBRR[i].signalType,
                                  ch.indices_LBRR[i].quantOffsetType,
                                  list(ch.pulses_LBRR[i]), ch.frame_length)
            for ch in chs:
                ch.LBRR_flags = [0, 0, 0]

        # Bit reservoir: per-frame SNR target adapts to past overshoot
        # (reference: silk_Encode enc_API.c:412-443, :555-557).
        n_bits_packet = bitrate_bps * payload_ms // 1000
        n_bits = n_bits_packet // n_frames
        ms_rates = [0, 0]
        for i in range(n_frames):
            target = n_bits * (100 if frame_ms == 10 else 50)
            target -= self.n_bits_exceeded * 1000 // 500
            if i > 0:
                bits_balance = ec_tell(enc) - n_bits * i
                target -= bits_balance * 1000 // 500
            target = max(5000, min(bitrate_bps, target)) \
                if bitrate_bps >= 5000 else min(5000, max(bitrate_bps,
                                                          target))

            # per-frame maxBits split for multiframe packets
            # (reference: enc_API.c:486-497)
            frame_max_bits = max_bits
            if n_frames == 2 and i == 0:
                frame_max_bits = max_bits * 3 // 5
            elif n_frames == 3:
                if i == 0:
                    frame_max_bits = max_bits * 2 // 5
                elif i == 1:
                    frame_max_bits = max_bits * 3 // 4
            frame_cbr = use_cbr and i == n_frames - 1

            if n_channels == 2:
                ch0, ch1 = chs
                Lf = x_int[0][i * frame_len:(i + 1) * frame_len]
                Rf = x_int[1][i * frame_len:(i + 1) * frame_len]
                mid_full, side, mid_only = self.stereo.lr_to_ms(
                    Lf, Rf, i, ms_rates, target, ch0.speech_activity_q8,
                    0, fs_khz, frame_len)
                mid_frame = np.asarray(mid_full[1:frame_len + 1],
                                       dtype=np.float64)
                if mid_only == 0:
                    if self.prev_decode_only_middle == 1:
                        # first side frame after decode-only-middle: reset
                        # the side encoder like the reference
                        # (enc_API.c:452-464)
                        ch1.partial_reset()
                    ch1._vad_result = ch1.do_vad(
                        np.asarray(side, dtype=np.int64))
                    ch1.VAD_flags[i] = ch1._vad_result[3]
                else:
                    ch1.VAD_flags[i] = 0
                    ch1._vad_result = None
                stereo_encode_pred(enc, self.stereo.predIx[i])
                if ch1.VAD_flags[i] == 0:
                    stereo_encode_mid_only(enc, mid_only)
                ch0._vad_result = ch0.do_vad(
                    np.asarray(mid_frame, dtype=np.int64))
                ch0.VAD_flags[i] = ch0._vad_result[3]

                for n in range(2):
                    ch = chs[n]
                    ch_max = frame_max_bits
                    rate = ms_rates[n]
                    ch_cbr = frame_cbr
                    if n == 0 and ms_rates[1] > 0:
                        ch_cbr = False
                        ch_max -= max_bits // (n_frames * 2)
                    if rate > 0:
                        ch.control_snr(rate)
                        if i == 0:
                            cond = CODE_INDEPENDENTLY
                        elif n > 0 and self.prev_decode_only_middle:
                            cond = CODE_INDEPENDENTLY_NO_LTP_SCALING
                        else:
                            cond = CODE_CONDITIONALLY
                        frame = (mid_frame if n == 0
                                 else np.asarray(side, dtype=np.float64))
                        ch.encode_frame(enc, frame, cond, ch_max, ch_cbr)
                    else:
                        ch.nFramesDecoded += 1
                self.prev_decode_only_middle = mid_only
            else:
                ch = chs[0]
                frame = np.asarray(
                    x_int[0][i * frame_len:(i + 1) * frame_len],
                    dtype=np.float64)
                ch.control_snr(target)
                cond = CODE_CONDITIONALLY if i > 0 else CODE_INDEPENDENTLY
                ch._vad_result = ch.do_vad(np.asarray(frame, np.int64))
                ch.VAD_flags[i] = ch._vad_result[3]
                ch.encode_frame(enc, frame, cond,
                                max_bits * (i + 1) // n_frames, use_cbr)

        # Patch VAD + LBRR flags into the reserved header bits
        # (reference: enc_API.c:537-548)
        if not prefill:
            flags = 0
            for n in range(n_channels):
                for i in range(n_frames):
                    flags = (flags << 1) | chs[n].VAD_flags[i]
                flags = (flags << 1) | chs[n].LBRR_flag
            enc.patch_initial_bits(flags, hdr_bits)

        n_bytes_out = (ec_tell(enc) + 7) >> 3
        self.n_bits_exceeded += n_bytes_out * 8 - n_bits_packet
        self.n_bits_exceeded = max(0, min(10000, self.n_bits_exceeded))
        return n_bytes_out

"""CELT decoder (reference: celt/celt_decoder.c).

Per-stream scalar decode driver: exact integer symbol path + numpy float DSP.
The batched TPU synthesis path shares the same state layout (arrays only) and
lives in opus_tpu.models.  PCM is produced in normalized float ([-1, 1]);
internal signals use the reference's float build domain (+-32768).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..bitstream.range_coder import (RangeDecoder, ec_tell,
                                     ec_tell_frac, make_range_decoder)
from ..bitstream import laplace
from . import bands as B
from . import alloc as A
from .cwrs import BITRES
from .modes import CeltMode, mode_create, compute_qext_mode, NB_QEXT_BANDS
from .tables import (E_PROB_MODEL, SMALL_ENERGY_ICDF, PRED_COEF, BETA_COEF,
                     BETA_INTRA, TRIM_ICDF, SPREAD_ICDF, TAPSET_ICDF,
                     SPREAD_NORMAL, TF_SELECT_TABLE, COMB_GAINS,
                     COMBFILTER_MAXPERIOD, COMBFILTER_MINPERIOD)
from ..ops.mdct import _backward_basis, _window
from .pitch import (pitch_downsample, pitch_search, _celt_lpc)

DECODE_BUFFER_SIZE = 2048
MAX_PERIOD = 1024
CELT_LPC_ORDER = 24
PLC_PITCH_LAG_MAX = 720
PLC_PITCH_LAG_MIN = 100
# frame types (reference: celt_decoder.c FRAME_NORMAL etc.)
FRAME_NORMAL = 0
FRAME_PLC_PERIODIC = 1
FRAME_PLC_NOISE = 2
VERY_SMALL = 1e-30
CELT_SIG_SCALE = 32768.0


def tf_decode(start, end, is_transient, tf_res, lm, dec):
    budget = dec.storage * 8
    tell = ec_tell(dec)
    logp = 2 if is_transient else 4
    tf_select_rsv = 1 if (lm > 0 and tell + logp + 1 <= budget) else 0
    budget -= tf_select_rsv
    tf_changed = curr = 0
    for i in range(start, end):
        if tell + logp <= budget:
            curr ^= dec.dec_bit_logp(logp)
            tell = ec_tell(dec)
            tf_changed |= curr
        tf_res[i] = curr
        logp = 4 if is_transient else 5
    tf_select = 0
    if tf_select_rsv and \
            TF_SELECT_TABLE[lm][4 * is_transient + 0 + tf_changed] != \
            TF_SELECT_TABLE[lm][4 * is_transient + 2 + tf_changed]:
        tf_select = dec.dec_bit_logp(1)
    for i in range(start, end):
        tf_res[i] = TF_SELECT_TABLE[lm][4 * is_transient + 2 * tf_select
                                        + tf_res[i]]


def unquant_coarse_energy(m: CeltMode, start, end, old_e_bands, intra, dec,
                          c, lm):
    prob_model = E_PROB_MODEL[lm][intra]
    if intra:
        coef = 0.0
        beta = BETA_INTRA
    else:
        beta = BETA_COEF[lm]
        coef = PRED_COEF[lm]
    prev = [0.0, 0.0]
    budget = dec.storage * 8
    for i in range(start, end):
        for ch in range(c):
            tell = ec_tell(dec)
            if budget - tell >= 15:
                pi = 2 * min(i, 20)
                qi = laplace.laplace_decode(dec, prob_model[pi] << 7,
                                            prob_model[pi + 1] << 6)
            elif budget - tell >= 2:
                qi = dec.dec_icdf(SMALL_ENERGY_ICDF, 2)
                qi = (qi >> 1) ^ -(qi & 1)
            elif budget - tell >= 1:
                qi = -dec.dec_bit_logp(1)
            else:
                qi = -1
            q = float(qi)
            old = max(-9.0, old_e_bands[ch * m.nbEBands + i])
            old_e_bands[ch * m.nbEBands + i] = coef * old + prev[ch] + q
            prev[ch] = prev[ch] + q - beta * q


def unquant_fine_energy(m: CeltMode, start, end, old_e_bands, prev_quant,
                        extra_quant, dec, c):
    for i in range(start, end):
        extra = extra_quant[i]
        if extra <= 0:
            continue
        if ec_tell(dec) + c * extra > dec.storage * 8:
            continue
        prev = prev_quant[i] if prev_quant is not None else 0
        for ch in range(c):
            q2 = dec.dec_bits(extra)
            offset = (q2 + 0.5) * (1 << (14 - extra)) / 16384.0 - 0.5
            offset *= (1 << (14 - prev)) / 16384.0
            old_e_bands[ch * m.nbEBands + i] += offset


def unquant_energy_finalise(m: CeltMode, start, end, old_e_bands, fine_quant,
                            fine_priority, bits_left, dec, c):
    for prio in range(2):
        i = start
        while i < end and bits_left >= c:
            if fine_quant[i] >= 8 or fine_priority[i] != prio:
                i += 1
                continue
            for ch in range(c):
                q2 = dec.dec_bits(1)
                offset = (q2 - 0.5) * (1 << (14 - fine_quant[i] - 1)) / 16384.0
                if old_e_bands is not None:
                    old_e_bands[ch * m.nbEBands + i] += offset
                bits_left -= 1
            i += 1


def _windowed_autocorr(x, window, overlap, lag, n):
    """(reference: _celt_autocorr celt/celt_lpc.c:284, float)"""
    xx = np.array(x[:n], dtype=np.float64)
    if overlap:
        xx[:overlap] *= window[:overlap]
        xx[n - overlap:] *= window[:overlap][::-1]
    return np.array([float(np.dot(xx[:n - k], xx[k:n]))
                     for k in range(lag + 1)])


def _celt_fir(x, hist, num, n, ord_):
    """y[i] = x[i] + sum_j num[j]*x[i-1-j]; hist = x[-ord..-1] oldest
    first (reference: celt_fir celt/celt_lpc.c:92, float)."""
    full = np.concatenate([hist, x[:n]])
    y = np.array(x[:n], dtype=np.float64)
    for j in range(ord_):
        y += num[j] * full[ord_ - 1 - j:ord_ - 1 - j + n]
    return y


def _celt_iir(x, den, n, ord_, mem):
    """y[i] = x[i] - sum_j den[j]*y[i-1-j]; mem[j] = y[-1-j]
    (reference: celt_iir celt/celt_lpc.c:145, float)."""
    y = np.empty(n + ord_)
    y[:ord_] = np.asarray(mem)[::-1]   # y[ord_-1-j] = y_out[-1-j]
    for i in range(n):
        acc = x[i]
        for j in range(ord_):
            acc -= den[j] * y[ord_ + i - 1 - j]
        y[ord_ + i] = acc
    return y[ord_:]


def comb_filter(buf, base, t0, t1, n, g0, g1, tapset0, tapset1,
                window, overlap):
    """In-place comb postfilter over buf[base:base+n] with history below base.

    Applied in place like the reference (celt/celt.c:238 called with x==y in
    celt_decode_with_ec), which makes it recursive: taps at lag T read
    already-filtered output when T < n."""
    if g0 == 0 and g1 == 0:
        return
    if overlap == 240:
        # 96 kHz QEXT mode: the period is coded at the 48 kHz scale, and
        # the filter runs independently on the even/odd polyphase streams
        # (doubling the effective period and tap spacing, i.e. mirroring
        # the comb response around 24 kHz).  Requires 2*COMBFILTER_MAXPERIOD
        # samples of history below base.  (reference: comb_filter_qext
        # celt/celt.c:198-235)
        n2 = n // 2
        ov2 = overlap // 2
        for s in range(2):
            seg = buf[base - 2 * COMBFILTER_MAXPERIOD + s:base + n:2].copy()
            comb_filter(seg, COMBFILTER_MAXPERIOD, t0, t1, n2, g0, g1,
                        tapset0, tapset1, window[s::2][:ov2], ov2)
            buf[base + s:base + n:2] = seg[COMBFILTER_MAXPERIOD:]
        return
    t0 = max(t0, COMBFILTER_MINPERIOD)
    t1 = max(t1, COMBFILTER_MINPERIOD)
    g00 = g0 * COMB_GAINS[tapset0][0]
    g01 = g0 * COMB_GAINS[tapset0][1]
    g02 = g0 * COMB_GAINS[tapset0][2]
    g10 = g1 * COMB_GAINS[tapset1][0]
    g11 = g1 * COMB_GAINS[tapset1][1]
    g12 = g1 * COMB_GAINS[tapset1][2]
    ov = overlap
    if g0 == g1 and t0 == t1 and tapset0 == tapset1:
        ov = 0
    x1 = buf[base - t1 + 1]
    x2 = buf[base - t1]
    x3 = buf[base - t1 - 1]
    x4 = buf[base - t1 - 2]
    for i in range(ov):
        x0 = buf[base + i - t1 + 2]
        f = window[i] * window[i]
        buf[base + i] = (buf[base + i]
                         + (1 - f) * g00 * buf[base + i - t0]
                         + (1 - f) * g01 * (buf[base + i - t0 + 1]
                                            + buf[base + i - t0 - 1])
                         + (1 - f) * g02 * (buf[base + i - t0 + 2]
                                            + buf[base + i - t0 - 2])
                         + f * g10 * x2
                         + f * g11 * (x1 + x3)
                         + f * g12 * (x0 + x4))
        x4 = x3
        x3 = x2
        x2 = x1
        x1 = x0
    if g1 == 0:
        return
    # constant-filter tail; recursive at lag t1, so process in lag-sized
    # chunks that can each be vectorized safely
    i = ov
    while i < n:
        chunk = min(t1 - 2, n - i)
        idx = np.arange(base + i, base + i + chunk)
        buf[idx] = (buf[idx]
                    + g10 * buf[idx - t1]
                    + g11 * (buf[idx - t1 + 1] + buf[idx - t1 - 1])
                    + g12 * (buf[idx - t1 + 2] + buf[idx - t1 - 2]))
        i += chunk


@dataclass
class CeltDecoder:
    mode: CeltMode
    channels: int           # CC: output channels
    stream_channels: int    # C: coded channels
    downsample: int = 1
    start: int = 0
    end: int = 0
    signalling: int = 0
    disable_inv: int = 0    # set for mono streams at opus level
    rng: int = 0
    error: int = 0
    loss_duration: int = 0
    skip_plc: int = 0
    postfilter_period: int = 0
    postfilter_period_old: int = 0
    postfilter_gain: float = 0.0
    postfilter_gain_old: float = 0.0
    postfilter_tapset: int = 0
    postfilter_tapset_old: int = 0
    prefilter_and_fold: int = 0
    plc_duration: int = 0
    last_frame_type: int = FRAME_NORMAL
    last_pitch_index: int = 0
    plc_lpc: np.ndarray = None      # [CC, CELT_LPC_ORDER]
    qext_scale: int = 1     # 2 for the 96 kHz QEXT modes: the decode
                            # buffer and PLC periods double (reference:
                            # celt_decoder.c:267-269, QEXT_SCALE celt.h:267)
    qext_oldBandE: np.ndarray = None   # [2*NB_QEXT_BANDS]
    preemph_memD: np.ndarray = None
    decode_mem: np.ndarray = None   # [CC, DECODE_BUFFER_SIZE+overlap]
    oldEBands: np.ndarray = None    # [2*nbEBands]
    oldLogE: np.ndarray = None
    oldLogE2: np.ndarray = None
    backgroundLogE: np.ndarray = None

    @classmethod
    def create(cls, fs: int, channels: int, frame_mode_fs: int = 48000,
               frame_size: int = 960):
        mode = mode_create(frame_mode_fs, frame_size)
        st = cls(mode=mode, channels=channels, stream_channels=channels)
        st.downsample = resampling_factor(fs)
        st.end = mode.effEBands
        st.reset()
        return st

    def reset(self):
        nb = self.mode.nbEBands
        self.qext_scale = 2 if (self.mode.Fs == 96000 and
                                self.mode.shortMdctSize in (240, 180)) else 1
        self.preemph_memD = np.zeros(2)
        self.decode_mem = np.zeros(
            (self.channels,
             self.qext_scale * DECODE_BUFFER_SIZE + self.mode.overlap))
        self.oldEBands = np.zeros(2 * nb)
        self.qext_oldBandE = np.zeros(2 * NB_QEXT_BANDS)
        self.oldLogE = np.full(2 * nb, -28.0)
        self.oldLogE2 = np.full(2 * nb, -28.0)
        self.backgroundLogE = np.full(2 * nb, -28.0)
        self.rng = 0
        self.loss_duration = 0
        self.skip_plc = 1
        self.postfilter_period = self.postfilter_period_old = 0
        self.postfilter_gain = self.postfilter_gain_old = 0.0
        self.postfilter_tapset = self.postfilter_tapset_old = 0
        self.prefilter_and_fold = 0
        self.plc_duration = 0
        self.last_frame_type = FRAME_NORMAL
        self.last_pitch_index = 0
        self.plc_lpc = np.zeros((self.channels, CELT_LPC_ORDER))

    # ------------------------------------------------------------------
    def decode_with_ec(self, data: bytes | None, pcm_out: np.ndarray,
                       frame_size: int, dec: RangeDecoder | None,
                       accum: bool = False,
                       qext_payload: bytes | None = None) -> int:
        """Decode one CELT frame.  pcm_out: [frame_size/downsample * CC]
        interleaved float PCM in [-1, 1] (added when accum).
        qext_payload: extension-ID-124 payload carrying the quality
        extensions (reference: celt_decode_with_ec celt_decoder.c:1106
        ARG_QEXT(qext_payload))."""
        mode = self.mode
        nbEBands = mode.nbEBands
        overlap = mode.overlap
        eBands = mode.eBands
        start = self.start
        end = self.end
        CC = self.channels
        C = self.stream_channels
        frame_size *= self.downsample

        lm = 0
        while lm <= mode.maxLM:
            if mode.shortMdctSize << lm == frame_size:
                break
            lm += 1
        if lm > mode.maxLM:
            return -1
        M = 1 << lm
        N = M * mode.shortMdctSize

        dbuf = self.qext_scale * DECODE_BUFFER_SIZE
        if data is None or (dec is None and len(data) <= 1):
            self._decode_lost(N, lm)
            out_syn_off = dbuf - N
            self._deemphasis(pcm_out, out_syn_off, N, CC, accum)
            return frame_size // self.downsample

        length = dec.storage if dec is not None else len(data)
        if dec is None:
            dec = make_range_decoder(data)
        len_bytes = dec.storage

        if self.loss_duration == 0:
            self.skip_plc = 0

        oldBandE = self.oldEBands
        oldLogE = self.oldLogE
        oldLogE2 = self.oldLogE2
        backgroundLogE = self.backgroundLogE

        if C == 1:
            for i in range(nbEBands):
                oldBandE[i] = max(oldBandE[i], oldBandE[nbEBands + i])

        total_bits = len_bytes * 8
        tell = ec_tell(dec)

        if tell >= total_bits:
            silence = 1
        elif tell == 1:
            silence = dec.dec_bit_logp(15)
        else:
            silence = 0
        if silence:
            tell = len_bytes * 8
            dec.nbits_total += tell - ec_tell(dec)

        postfilter_gain = 0.0
        postfilter_pitch = 0
        postfilter_tapset = 0
        if start == 0 and tell + 16 <= total_bits:
            if dec.dec_bit_logp(1):
                octave = dec.dec_uint(6)
                postfilter_pitch = (16 << octave) + dec.dec_bits(4 + octave) - 1
                qg = dec.dec_bits(3)
                if ec_tell(dec) + 2 <= total_bits:
                    postfilter_tapset = dec.dec_icdf(TAPSET_ICDF, 2)
                postfilter_gain = 0.09375 * (qg + 1)
            tell = ec_tell(dec)

        if lm > 0 and tell + 3 <= total_bits:
            is_transient = dec.dec_bit_logp(3)
            tell = ec_tell(dec)
        else:
            is_transient = 0
        short_blocks = M if is_transient else 0

        intra_ener = dec.dec_bit_logp(3) if tell + 3 <= total_bits else 0

        if not intra_ener and self.loss_duration != 0:
            for ch in range(2):
                safety = 0.0
                missing = min(10, self.loss_duration >> lm)
                if lm == 0:
                    safety = 1.5
                elif lm == 1:
                    safety = 0.5
                for i in range(start, end):
                    k = ch * nbEBands + i
                    if oldBandE[k] < max(oldLogE[k], oldLogE2[k]):
                        e0 = oldBandE[k]
                        slope = max(oldLogE[k] - e0, 0.5 * (oldLogE2[k] - e0))
                        slope = min(slope, 2.0)
                        e0 -= max(0.0, (1 + missing) * slope)
                        oldBandE[k] = max(-20.0, e0)
                    else:
                        oldBandE[k] = min(oldBandE[k], oldLogE[k], oldLogE2[k])
                    oldBandE[k] -= safety

        unquant_coarse_energy(mode, start, end, oldBandE, intra_ener, dec,
                              C, lm)

        tf_res = [0] * nbEBands
        tf_decode(start, end, is_transient, tf_res, lm, dec)

        tell = ec_tell(dec)
        spread_decision = SPREAD_NORMAL
        if tell + 4 <= total_bits:
            spread_decision = dec.dec_icdf(SPREAD_ICDF, 5)

        cap = A.init_caps(mode, lm, C)
        offsets = [0] * nbEBands

        dynalloc_logp = 6
        total_bits <<= BITRES
        tell = ec_tell_frac(dec)
        for i in range(start, end):
            width = C * (eBands[i + 1] - eBands[i]) << lm
            quanta = min(width << BITRES, max(6 << BITRES, width))
            dynalloc_loop_logp = dynalloc_logp
            boost = 0
            while (tell + (dynalloc_loop_logp << BITRES) < total_bits
                   and boost < cap[i]):
                flag = dec.dec_bit_logp(dynalloc_loop_logp)
                tell = ec_tell_frac(dec)
                if not flag:
                    break
                boost += quanta
                total_bits -= quanta
                dynalloc_loop_logp = 1
            offsets[i] = boost
            if boost > 0:
                dynalloc_logp = max(2, dynalloc_logp - 1)

        alloc_trim = dec.dec_icdf(TRIM_ICDF, 7) \
            if tell + (6 << BITRES) <= total_bits else 5

        bits = (len_bytes * 8 << BITRES) - ec_tell_frac(dec) - 1
        anti_collapse_rsv = (1 << BITRES) if (
            is_transient and lm >= 2 and bits >= (lm + 2) << BITRES) else 0
        bits -= anti_collapse_rsv

        (coded_bands, balance, pulses, fine_quant, fine_priority,
         intensity, dual_stereo) = A.compute_allocation(
            mode, start, end, offsets, cap, alloc_trim, 0, 0, bits, C, lm,
            dec, encode=False)

        unquant_fine_energy(mode, start, end, oldBandE, None, fine_quant,
                            dec, C)

        # QEXT: parse the extension payload header, coarse extension-band
        # energies and the extra-depth allocation (reference:
        # celt_decoder.c:1462-1483)
        qext_bytes = len(qext_payload) if qext_payload else 0
        ext_dec = None
        qext_mode = None
        qext_end = 0
        qext_intensity = 0
        qext_dual_stereo = 0
        extra_pulses = [0] * (nbEBands + NB_QEXT_BANDS)
        extra_quant = [0] * (nbEBands + NB_QEXT_BANDS)
        if qext_bytes > 0:
            ext_dec = make_range_decoder(qext_payload)
            if end == nbEBands and (
                    (mode.Fs == 48000 and mode.shortMdctSize in (120, 90))
                    or (mode.Fs == 96000
                        and mode.shortMdctSize in (240, 180))):
                qext_mode = compute_qext_mode(mode)
                qext_end = NB_QEXT_BANDS if ext_dec.dec_bit_logp(1) else 2
                if C == 2:
                    # (reference: decode_qext_stereo_params
                    #  celt_decoder.c:1097)
                    qext_intensity = ext_dec.dec_uint(qext_end + 1)
                    qext_dual_stereo = (ext_dec.dec_bit_logp(1)
                                        if qext_intensity != 0 else 0)
                qext_intra = (ext_dec.dec_bit_logp(3)
                              if ec_tell(ext_dec) + 3 <= qext_bytes * 8
                              else 0)
                unquant_coarse_energy(qext_mode, 0, qext_end,
                                      self.qext_oldBandE, qext_intra,
                                      ext_dec, C, lm)
            qext_bits = (qext_bytes * 8 << BITRES) - ext_dec.tell_frac() - 1
            A.clt_compute_extra_allocation_decode(
                mode, qext_mode, start, end, qext_end, qext_bits,
                extra_pulses, extra_quant, C, lm, ext_dec)
            unquant_fine_energy(mode, start, end, oldBandE, fine_quant,
                                extra_quant, ext_dec, C)

        # slide decode memory left by N
        for ch in range(CC):
            self.decode_mem[ch, :dbuf - N + overlap] = \
                self.decode_mem[ch, N:dbuf + overlap]

        # decode band shapes
        X = np.zeros(C * N)
        collapse_masks = np.zeros(C * nbEBands, dtype=np.int64)
        x_ = X[:N]
        y_ = X[N:] if C == 2 else None
        self.rng = B.quant_all_bands(
            0, mode, start, end, x_, y_, collapse_masks, None, pulses,
            short_blocks, spread_decision, dual_stereo, intensity, tf_res,
            len_bytes * (8 << BITRES) - anti_collapse_rsv, balance, dec, lm,
            coded_bands, self.rng, 0, self.disable_inv,
            ext_ec=ext_dec, extra_pulses=extra_pulses,
            ext_total_bits=qext_bytes * (8 << BITRES),
            cap=cap if qext_bytes > 0 else None)

        if qext_mode is not None:
            # decode the 20-48 kHz extension bands from the extension
            # stream (reference: celt_decoder.c:1501-1518)
            ext_balance = qext_bytes * (8 << BITRES) - ext_dec.tell_frac()
            for i in range(qext_end):
                ext_balance -= extra_pulses[nbEBands + i] \
                    + C * (extra_quant[nbEBands + i] << BITRES)
            unquant_fine_energy(qext_mode, 0, qext_end, self.qext_oldBandE,
                                None, extra_quant[nbEBands:], ext_dec, C)
            qext_collapse = np.zeros(C * NB_QEXT_BANDS, dtype=np.int64)
            zeros_tf = [0] * NB_QEXT_BANDS
            dummy_ext = RangeDecoder(b"")
            self.rng = B.quant_all_bands(
                0, qext_mode, 0, qext_end, x_, y_, qext_collapse, None,
                extra_pulses[nbEBands:], short_blocks, spread_decision,
                qext_dual_stereo, qext_intensity, zeros_tf,
                qext_bytes * (8 << BITRES), ext_balance, ext_dec, lm,
                qext_end, self.rng, 0, self.disable_inv,
                ext_ec=dummy_ext, extra_pulses=[0] * NB_QEXT_BANDS,
                ext_total_bits=0, cap=None)

        anti_collapse_on = 0
        if anti_collapse_rsv > 0:
            anti_collapse_on = dec.dec_bits(1)

        unquant_energy_finalise(mode, start, end,
                                None if qext_bytes > 0 else oldBandE,
                                fine_quant, fine_priority,
                                len_bytes * 8 - ec_tell(dec), dec, C)

        if anti_collapse_on:
            self.rng = B.anti_collapse(mode, X, collapse_masks, lm, C, N,
                                       start, end, oldBandE, oldLogE,
                                       oldLogE2, pulses, self.rng)

        if silence:
            oldBandE[:2 * nbEBands] = -28.0

        if self.prefilter_and_fold:
            self._prefilter_and_fold(N)

        eff_end = min(end, mode.effEBands)
        self._synthesis(X, oldBandE, start, eff_end, C, CC, is_transient,
                        lm, silence, qext_mode=qext_mode, qext_end=qext_end)

        # postfilter
        out_syn_off = dbuf - N
        window = _window(overlap)
        pp = max(self.postfilter_period, COMBFILTER_MINPERIOD)
        ppo = max(self.postfilter_period_old, COMBFILTER_MINPERIOD)
        self.postfilter_period = pp
        self.postfilter_period_old = ppo
        for ch in range(CC):
            buf = self.decode_mem[ch]
            comb_filter(buf, out_syn_off, ppo, pp, mode.shortMdctSize,
                        self.postfilter_gain_old, self.postfilter_gain,
                        self.postfilter_tapset_old, self.postfilter_tapset,
                        window, overlap)
            if lm != 0:
                comb_filter(buf, out_syn_off + mode.shortMdctSize,
                            pp, postfilter_pitch, N - mode.shortMdctSize,
                            self.postfilter_gain, postfilter_gain,
                            self.postfilter_tapset, postfilter_tapset,
                            window, overlap)
        self.postfilter_period_old = self.postfilter_period
        self.postfilter_gain_old = self.postfilter_gain
        self.postfilter_tapset_old = self.postfilter_tapset
        self.postfilter_period = postfilter_pitch
        self.postfilter_gain = postfilter_gain
        self.postfilter_tapset = postfilter_tapset
        if lm != 0:
            self.postfilter_period_old = self.postfilter_period
            self.postfilter_gain_old = self.postfilter_gain
            self.postfilter_tapset_old = self.postfilter_tapset

        if C == 1:
            oldBandE[nbEBands:2 * nbEBands] = oldBandE[:nbEBands]

        if not is_transient:
            oldLogE2[:] = oldLogE
            oldLogE[:] = oldBandE
        else:
            np.minimum(oldLogE, oldBandE, out=oldLogE)
        max_background_increase = min(160, self.loss_duration + M) * 0.001
        np.minimum(backgroundLogE + max_background_increase, oldBandE,
                   out=backgroundLogE)
        for ch in range(2):
            for i in range(0, start):
                oldBandE[ch * nbEBands + i] = 0
                oldLogE[ch * nbEBands + i] = oldLogE2[ch * nbEBands + i] = -28.0
            for i in range(end, nbEBands):
                oldBandE[ch * nbEBands + i] = 0
                oldLogE[ch * nbEBands + i] = oldLogE2[ch * nbEBands + i] = -28.0
        self.rng = dec.rng
        if qext_bytes > 0:
            # final range folds in the extension stream's range
            # (reference: celt_decoder.c:1599)
            self.rng = self.rng ^ ext_dec.rng

        self._deemphasis(pcm_out, out_syn_off, N, CC, accum)
        self.loss_duration = 0
        self.plc_duration = 0
        self.last_frame_type = FRAME_NORMAL
        self.prefilter_and_fold = 0
        if ec_tell(dec) > 8 * len_bytes:
            return -3  # OPUS_INTERNAL_ERROR
        if dec.error:
            self.error = 1
        return frame_size // self.downsample

    # ------------------------------------------------------------------
    def _synthesis(self, X, oldBandE, start, eff_end, C, CC, is_transient,
                   lm, silence, qext_mode=None, qext_end=0):
        """denormalise + IMDCT + TDAC into decode_mem
        (reference: celt_synthesis celt_decoder.c:413)."""
        if qext_mode is not None and self.mode.Fs != 96000:
            qext_end = 2   # (reference: celt_decoder.c:434-435)
        mode = self.mode
        overlap = mode.overlap
        nbEBands = mode.nbEBands
        N = mode.shortMdctSize << lm
        M = 1 << lm
        if is_transient:
            nblocks = M
            nb = mode.shortMdctSize
        else:
            nblocks = 1
            nb = mode.shortMdctSize << lm
        n2 = nb  # spectrum size per block == block size

        out_off = self.qext_scale * DECODE_BUFFER_SIZE - N
        basis = _backward_basis(n2, overlap).astype(np.float64)
        window = _window(overlap)
        ov2 = overlap // 2

        freq = np.empty(N)
        for ch in range(CC):
            cx = min(ch, C - 1)
            B.denormalise_bands(mode, X[cx * N:(cx + 1) * N], freq,
                                oldBandE[cx * nbEBands:], start, eff_end,
                                M, self.downsample, silence)
            if qext_mode is not None:
                B.denormalise_bands(qext_mode, X[cx * N:(cx + 1) * N], freq,
                                    self.qext_oldBandE[cx * NB_QEXT_BANDS:],
                                    0, qext_end, M, self.downsample, silence)
            if CC == 1 and C == 2:
                freq2 = np.empty(N)
                B.denormalise_bands(mode, X[N:2 * N], freq2,
                                    oldBandE[nbEBands:], start, eff_end,
                                    M, self.downsample, silence)
                if qext_mode is not None:
                    B.denormalise_bands(qext_mode, X[N:2 * N], freq2,
                                        self.qext_oldBandE[NB_QEXT_BANDS:],
                                        0, qext_end, M, self.downsample,
                                        silence)
                freq = 0.5 * (freq + freq2)
            # spec[b, k] = freq[b + nblocks*k]
            spec = freq.reshape(n2, nblocks).T
            core = spec @ basis   # [nblocks, n2]
            buf = self.decode_mem[ch]
            for b in range(nblocks):
                pos = out_off + nb * b
                old = buf[pos:pos + ov2].copy()
                w_lo = window[:ov2]
                w_hi = window[overlap - 1:ov2 - 1:-1]
                cur = core[b, ov2 - 1::-1]
                head = w_hi * old - w_lo * cur
                mid = (w_lo * old + w_hi * cur)[::-1]
                buf[pos:pos + ov2] = head
                buf[pos + ov2:pos + overlap] = mid
                buf[pos + overlap:pos + n2 + ov2] = core[b, ov2:]

    def _deemphasis(self, pcm_out, out_off, N, CC, accum):
        mode = self.mode
        coef0 = mode.preemph[0]
        coef1 = mode.preemph[1]
        coef3 = mode.preemph[3]
        Nd = N // self.downsample
        for ch in range(CC):
            m = self.preemph_memD[ch]
            x = self.decode_mem[ch, out_off:out_off + N]
            tmp = np.empty(N)
            if coef1 != 0:
                # 2nd-order deemphasis of the 96 kHz QEXT mode
                # (reference: deemphasis celt/celt_decoder.c:346-358)
                acc = m
                for j in range(N):
                    t = x[j] + acc + VERY_SMALL
                    acc = coef0 * t - coef1 * x[j]
                    tmp[j] = coef3 * t
                self.preemph_memD[ch] = acc
            else:
                # first-order y[n] = x[n] + coef0*y[n-1], then decimate
                acc = m
                for j in range(N):
                    acc = x[j] + VERY_SMALL + acc
                    tmp[j] = acc
                    acc = coef0 * acc
                self.preemph_memD[ch] = acc
            dec = tmp[::self.downsample][:Nd]
            if accum:
                pcm_out[ch::CC][:Nd] += dec / CELT_SIG_SCALE
            else:
                pcm_out[ch::CC][:Nd] = dec / CELT_SIG_SCALE

    def _plc_pitch_search(self, C):
        """(reference: celt_plc_pitch_search celt_decoder.c:555)"""
        dbuf = self.qext_scale * DECODE_BUFFER_SIZE
        chans = [self.decode_mem[c][:dbuf] for c in range(C)]
        lp = pitch_downsample(chans, DECODE_BUFFER_SIZE >> 1,
                              factor=self.qext_scale * 2)
        pitch_index = pitch_search(lp[PLC_PITCH_LAG_MAX >> 1:], lp,
                                   DECODE_BUFFER_SIZE - PLC_PITCH_LAG_MAX,
                                   PLC_PITCH_LAG_MAX - PLC_PITCH_LAG_MIN)
        return self.qext_scale * (PLC_PITCH_LAG_MAX - pitch_index)

    def _prefilter_and_fold(self, N):
        """Apply the pre-filter (negated post-filter) to the concealed
        MDCT overlap and simulate TDAC so PLC output blends with the
        next frame (reference: prefilter_and_fold celt_decoder.c:580)."""
        mode = self.mode
        overlap = mode.overlap
        dbuf = self.qext_scale * DECODE_BUFFER_SIZE
        window = _window(overlap)
        g0 = -self.postfilter_gain_old
        g1 = -self.postfilter_gain
        t1 = max(self.postfilter_period, COMBFILTER_MINPERIOD)
        gains = COMB_GAINS[self.postfilter_tapset]
        for ch in range(self.channels):
            buf = self.decode_mem[ch]
            base = dbuf - N
            if g0 == 0 and g1 == 0:
                etmp = buf[base:base + overlap].copy()
            else:
                # constant comb (the reference passes overlap=0 here, so
                # the filter runs plain even at 96 kHz; celt.c:238)
                idx = np.arange(base, base + overlap)
                etmp = (buf[idx]
                        + g1 * gains[0] * buf[idx - t1]
                        + g1 * gains[1] * (buf[idx - t1 + 1]
                                           + buf[idx - t1 - 1])
                        + g1 * gains[2] * (buf[idx - t1 + 2]
                                           + buf[idx - t1 - 2]))
            half = overlap // 2
            buf[base:base + half] = (window[:half] * etmp[overlap - 1:
                                                          half - 1:-1]
                                     + window[overlap - 1:half - 1:-1]
                                     * etmp[:half])

    def _decode_lost(self, N, lm):
        """Packet-loss concealment (reference: celt_decode_lost
        celt_decoder.c:679): pitch-based waveform extrapolation in the
        LPC excitation domain for the first ~40 ms of loss, then
        noise-based comfort filling driven by the background energy."""
        mode = self.mode
        C = self.channels
        overlap = mode.overlap
        nbEBands = mode.nbEBands
        eBands = mode.eBands
        dbuf = self.qext_scale * DECODE_BUFFER_SIZE
        max_period = self.qext_scale * MAX_PERIOD
        loss_duration = self.loss_duration
        start = self.start

        curr = FRAME_PLC_PERIODIC
        if self.plc_duration >= 40 or start != 0 or self.skip_plc:
            curr = FRAME_PLC_NOISE

        if curr == FRAME_PLC_NOISE:
            end = self.end
            eff_end = max(start, min(end, mode.effEBands))
            for ch in range(C):
                buf = self.decode_mem[ch]
                buf[:dbuf - N + overlap] = buf[N:dbuf + overlap]
            if self.prefilter_and_fold:
                self._prefilter_and_fold(N)
            decay = 1.5 if loss_duration == 0 else 0.5
            for ch in range(C):
                for i in range(start, end):
                    self.oldEBands[ch * nbEBands + i] = max(
                        self.backgroundLogE[ch * nbEBands + i],
                        self.oldEBands[ch * nbEBands + i] - decay)
            seed = self.rng
            X = np.zeros(C * N)
            for ch in range(C):
                for i in range(start, eff_end):
                    boffs = N * ch + ((eBands[i] << lm))
                    blen = (eBands[i + 1] - eBands[i]) << lm
                    for j in range(blen):
                        seed = B.celt_lcg_rand(seed)
                        signed = seed - 0x100000000 if seed & 0x80000000 \
                            else seed
                        X[boffs + j] = float(signed >> 20)
                    B.renormalise_vector(X[boffs:], blen, 1.0)
            self.rng = seed
            self._synthesis(X, self.oldEBands, start, eff_end, C, C, 0,
                            lm, 0)
            # re-run the postfilter with the last parameters
            out_off = dbuf - N
            window = _window(overlap)
            pp = max(self.postfilter_period, COMBFILTER_MINPERIOD)
            ppo = max(self.postfilter_period_old, COMBFILTER_MINPERIOD)
            self.postfilter_period = pp
            self.postfilter_period_old = ppo
            for ch in range(C):
                buf = self.decode_mem[ch]
                comb_filter(buf, out_off, ppo, pp, mode.shortMdctSize,
                            self.postfilter_gain_old, self.postfilter_gain,
                            self.postfilter_tapset_old,
                            self.postfilter_tapset, window, overlap)
                if lm != 0:
                    comb_filter(buf, out_off + mode.shortMdctSize, pp, pp,
                                N - mode.shortMdctSize,
                                self.postfilter_gain, self.postfilter_gain,
                                self.postfilter_tapset,
                                self.postfilter_tapset, window, overlap)
            self.postfilter_period_old = self.postfilter_period
            self.postfilter_gain_old = self.postfilter_gain
            self.postfilter_tapset_old = self.postfilter_tapset
            self.prefilter_and_fold = 0
            self.skip_plc = 1
        else:
            # pitch-based PLC
            fade = 1.0
            if self.last_frame_type != FRAME_PLC_PERIODIC:
                self.last_pitch_index = pitch_index = \
                    self._plc_pitch_search(C)
            else:
                pitch_index = self.last_pitch_index
                fade = 0.8
            exc_length = min(2 * pitch_index, max_period)
            window = _window(overlap)
            for ch in range(C):
                buf = self.decode_mem[ch]
                exc = np.array(
                    buf[dbuf - max_period - CELT_LPC_ORDER:dbuf])
                # exc[CELT_LPC_ORDER:] are the max_period signal samples
                if self.last_frame_type != FRAME_PLC_PERIODIC:
                    ac = _windowed_autocorr(exc[CELT_LPC_ORDER:], window,
                                            overlap, CELT_LPC_ORDER,
                                            max_period)
                    ac[0] *= 1.0001
                    for i in range(1, CELT_LPC_ORDER + 1):
                        ac[i] -= ac[i] * (0.008 * 0.008) * i * i
                    self.plc_lpc[ch] = _celt_lpc(ac, CELT_LPC_ORDER)
                lpc = self.plc_lpc[ch]
                # excitation for the last exc_length samples
                off = max_period - exc_length
                fir = _celt_fir(exc[CELT_LPC_ORDER + off:],
                                exc[off:CELT_LPC_ORDER + off], lpc,
                                exc_length, CELT_LPC_ORDER)
                exc[CELT_LPC_ORDER + off:] = fir
                ex = exc[CELT_LPC_ORDER:]
                # decay estimate from two half-periods
                dlen = exc_length >> 1
                e1 = 1.0 + float(np.dot(ex[max_period - dlen:],
                                        ex[max_period - dlen:]))
                e2 = 1.0 + float(np.dot(
                    ex[max_period - 2 * dlen:max_period - dlen],
                    ex[max_period - 2 * dlen:max_period - dlen]))
                e1 = min(e1, e2)
                decay = math.sqrt(e1 / e2)
                buf[:dbuf - N] = buf[N:dbuf]
                # periodic extrapolation of the excitation
                extrap_off = max_period - pitch_index
                extrap_len = N + overlap
                attenuation = fade * decay
                s1 = 0.0
                j = 0
                for i in range(extrap_len):
                    if j >= pitch_index:
                        j -= pitch_index
                        attenuation *= decay
                    buf[dbuf - N + i] = attenuation * ex[extrap_off + j]
                    tmp = buf[dbuf - max_period - N + extrap_off + j]
                    s1 += tmp * tmp
                    j += 1
                lpc_mem = [buf[dbuf - N - 1 - i]
                           for i in range(CELT_LPC_ORDER)]
                buf[dbuf - N:dbuf - N + extrap_len] = _celt_iir(
                    buf[dbuf - N:dbuf - N + extrap_len], lpc, extrap_len,
                    CELT_LPC_ORDER, lpc_mem)
                s2 = float(np.dot(buf[dbuf - N:dbuf - N + extrap_len],
                                  buf[dbuf - N:dbuf - N + extrap_len]))
                if not (s1 > 0.2 * s2):
                    buf[dbuf - N:dbuf - N + extrap_len] = 0.0
                elif s1 < s2:
                    ratio = math.sqrt((s1 + 1) / (s2 + 1))
                    for i in range(overlap):
                        tmp_g = 1.0 - window[i] * (1.0 - ratio)
                        buf[dbuf - N + i] *= tmp_g
                    buf[dbuf - N + overlap:dbuf - N + extrap_len] *= ratio
            self.prefilter_and_fold = 1

        self.loss_duration = min(10000, loss_duration + (1 << lm))
        self.plc_duration = min(10000, self.plc_duration + (1 << lm))
        self.last_frame_type = curr


def resampling_factor(rate: int) -> int:
    return {96000: 1, 48000: 1, 24000: 2, 16000: 3, 12000: 4,
            8000: 6}[rate]

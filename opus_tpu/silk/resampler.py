"""SILK rational resampler bank (reference: silk/resampler.c,
resampler_private_{up2_HQ,IIR_FIR,down_FIR,AR2}.c).  Exact fixed-point."""

from __future__ import annotations

from . import tables_data as TD
from .tables import (RESAMPLER_DOWN_ORDER_FIR0, RESAMPLER_DOWN_ORDER_FIR1,
                     RESAMPLER_DOWN_ORDER_FIR2, RESAMPLER_ORDER_FIR_12,
                     RESAMPLER_MAX_BATCH_SIZE_MS, UP2_HQ_0, UP2_HQ_1,
                     RESAMPLER_FRAC_FIR_12)
from .macros import SMULWB, SMLAWB, SMULWW, SMULBB, SMLABB, SAT16, \
    RSHIFT_ROUND, DIV32

_DELAY_DEC = ((4, 0, 2, 0, 0, 0),
              (0, 9, 4, 7, 4, 4),
              (0, 3, 12, 7, 7, 7))
_DELAY_ENC = ((6, 0, 3), (0, 7, 3), (0, 1, 10), (0, 2, 6), (18, 10, 12))


def _rate_id(r):
    return min(5, ((((r >> 12) - (1 if r > 16000 else 0))
                    >> (1 if r > 24000 else 0)) - 1))


class Resampler:
    """One-channel resampler state (decoder direction by default)."""

    COPY, UP2_HQ, IIR_FIR, DOWN_FIR = 0, 1, 2, 3

    def __init__(self, fs_in_hz: int, fs_out_hz: int, for_enc: bool = False):
        if for_enc:
            self.input_delay = _DELAY_ENC[_rate_id(fs_in_hz)][_rate_id(fs_out_hz)]
        else:
            self.input_delay = _DELAY_DEC[_rate_id(fs_in_hz)][_rate_id(fs_out_hz)]
        self.fs_in_khz = fs_in_hz // 1000
        self.fs_out_khz = fs_out_hz // 1000
        self.batch_size = self.fs_in_khz * RESAMPLER_MAX_BATCH_SIZE_MS
        up2x = 0
        self.fir_fracs = 1
        self.fir_order = 0
        self.coefs = None
        if fs_out_hz > fs_in_hz:
            if fs_out_hz == 2 * fs_in_hz:
                self.fn = self.UP2_HQ
            else:
                self.fn = self.IIR_FIR
                up2x = 1
        elif fs_out_hz < fs_in_hz:
            self.fn = self.DOWN_FIR
            if fs_out_hz * 4 == fs_in_hz * 3:
                self.fir_fracs = 3
                self.fir_order = RESAMPLER_DOWN_ORDER_FIR0
                self.coefs = TD.RESAMPLER_3_4_COEFS
            elif fs_out_hz * 3 == fs_in_hz * 2:
                self.fir_fracs = 2
                self.fir_order = RESAMPLER_DOWN_ORDER_FIR0
                self.coefs = TD.RESAMPLER_2_3_COEFS
            elif fs_out_hz * 2 == fs_in_hz:
                self.fir_order = RESAMPLER_DOWN_ORDER_FIR1
                self.coefs = TD.RESAMPLER_1_2_COEFS
            elif fs_out_hz * 3 == fs_in_hz:
                self.fir_order = RESAMPLER_DOWN_ORDER_FIR2
                self.coefs = TD.RESAMPLER_1_3_COEFS
            elif fs_out_hz * 4 == fs_in_hz:
                self.fir_order = RESAMPLER_DOWN_ORDER_FIR2
                self.coefs = TD.RESAMPLER_1_4_COEFS
            elif fs_out_hz * 6 == fs_in_hz:
                self.fir_order = RESAMPLER_DOWN_ORDER_FIR2
                self.coefs = TD.RESAMPLER_1_6_COEFS
            else:
                raise ValueError("unsupported ratio")
        else:
            self.fn = self.COPY
        self.inv_ratio_q16 = ((fs_in_hz << (14 + up2x)) // fs_out_hz) << 2
        while SMULWW(self.inv_ratio_q16, fs_out_hz) < (fs_in_hz << up2x):
            self.inv_ratio_q16 += 1
        self.s_iir = [0] * 6
        self.s_fir = [0] * 36
        self.delay_buf = [0] * 48

    # ------------------------------------------------------------------
    def process(self, inp: list[int]) -> list[int]:
        """Resample int16 samples (>= 1 ms of input)."""
        in_len = len(inp)
        n = self.fs_in_khz - self.input_delay
        self.delay_buf[self.input_delay:self.input_delay + n] = inp[:n]
        rest = inp[n:n + in_len - self.fs_in_khz]
        out = []
        if self.fn == self.UP2_HQ:
            out += self._up2_hq(self.delay_buf[:self.fs_in_khz])
            out += self._up2_hq(rest)
        elif self.fn == self.IIR_FIR:
            out += self._iir_fir(self.delay_buf[:self.fs_in_khz])
            out += self._iir_fir(rest)
        elif self.fn == self.DOWN_FIR:
            out += self._down_fir(self.delay_buf[:self.fs_in_khz])
            out += self._down_fir(rest)
        else:
            out += self.delay_buf[:self.fs_in_khz]
            out += rest
        self.delay_buf[:self.input_delay] = inp[in_len - self.input_delay:]
        return out

    def _up2_hq(self, inp):
        s = self.s_iir
        out = [0] * (2 * len(inp))
        for k, x in enumerate(inp):
            in32 = x << 10
            y = in32 - s[0]
            xx = SMULWB(y, UP2_HQ_0[0])
            o1 = s[0] + xx
            s[0] = in32 + xx
            y = o1 - s[1]
            xx = SMULWB(y, UP2_HQ_0[1])
            o2 = s[1] + xx
            s[1] = o1 + xx
            y = o2 - s[2]
            xx = SMLAWB(y, y, UP2_HQ_0[2])
            o1 = s[2] + xx
            s[2] = o2 + xx
            out[2 * k] = SAT16(RSHIFT_ROUND(o1, 10))
            y = in32 - s[3]
            xx = SMULWB(y, UP2_HQ_1[0])
            o1 = s[3] + xx
            s[3] = in32 + xx
            y = o1 - s[4]
            xx = SMULWB(y, UP2_HQ_1[1])
            o2 = s[4] + xx
            s[4] = o1 + xx
            y = o2 - s[5]
            xx = SMLAWB(y, y, UP2_HQ_1[2])
            o1 = s[5] + xx
            s[5] = o2 + xx
            out[2 * k + 1] = SAT16(RSHIFT_ROUND(o1, 10))
        return out

    def _iir_fir(self, inp):
        out = []
        pos = 0
        in_len = len(inp)
        order = RESAMPLER_ORDER_FIR_12
        buf = list(self.s_fir[:order])
        while True:
            n_in = min(in_len - pos, self.batch_size)
            buf = buf[:order] + self._up2_hq(inp[pos:pos + n_in])
            max_index_q16 = n_in << 17  # +1 because 2x upsampled
            index_q16 = 0
            while index_q16 < max_index_q16:
                table_index = SMULWB(index_q16 & 0xFFFF, 12)
                b = index_q16 >> 16
                res = SMULBB(buf[b], RESAMPLER_FRAC_FIR_12[table_index][0])
                res = SMLABB(res, buf[b + 1], RESAMPLER_FRAC_FIR_12[table_index][1])
                res = SMLABB(res, buf[b + 2], RESAMPLER_FRAC_FIR_12[table_index][2])
                res = SMLABB(res, buf[b + 3], RESAMPLER_FRAC_FIR_12[table_index][3])
                res = SMLABB(res, buf[b + 4], RESAMPLER_FRAC_FIR_12[11 - table_index][3])
                res = SMLABB(res, buf[b + 5], RESAMPLER_FRAC_FIR_12[11 - table_index][2])
                res = SMLABB(res, buf[b + 6], RESAMPLER_FRAC_FIR_12[11 - table_index][1])
                res = SMLABB(res, buf[b + 7], RESAMPLER_FRAC_FIR_12[11 - table_index][0])
                out.append(SAT16(RSHIFT_ROUND(res, 15)))
                index_q16 += self.inv_ratio_q16
            pos += n_in
            if pos >= in_len:
                break
            buf = buf[2 * n_in:2 * n_in + order]
        self.s_fir[:order] = buf[2 * n_in:2 * n_in + order]
        return out

    def _ar2(self, inp):
        s = self.s_iir
        out = [0] * len(inp)
        a = self.coefs
        for k, x in enumerate(inp):
            o32 = s[0] + (x << 8)
            out[k] = o32
            o32 <<= 2
            s[0] = SMLAWB(s[1], o32, a[0])
            s[1] = SMULWB(o32, a[1])
        return out

    def _down_fir(self, inp):
        out = []
        pos = 0
        in_len = len(inp)
        buf = list(self.s_fir[:self.fir_order])
        fir = self.coefs[2:]
        order = self.fir_order
        while True:
            n_in = min(in_len - pos, self.batch_size)
            ar = self._ar2(inp[pos:pos + n_in])
            buf = buf[:order] + ar
            max_index_q16 = n_in << 16
            index_q16 = 0
            while index_q16 < max_index_q16:
                b = index_q16 >> 16
                if order == RESAMPLER_DOWN_ORDER_FIR0:
                    ind = SMULWB(index_q16 & 0xFFFF, self.fir_fracs)
                    p1 = 9 * ind
                    p2 = 9 * (self.fir_fracs - 1 - ind)
                    res = SMULWB(buf[b], fir[p1])
                    for j in range(1, 9):
                        res = SMLAWB(res, buf[b + j], fir[p1 + j])
                    for j in range(9):
                        res = SMLAWB(res, buf[b + 17 - j], fir[p2 + j])
                elif order == RESAMPLER_DOWN_ORDER_FIR1:
                    res = SMULWB(buf[b] + buf[b + 23], fir[0])
                    for j in range(1, 12):
                        res = SMLAWB(res, buf[b + j] + buf[b + 23 - j], fir[j])
                else:
                    res = SMULWB(buf[b] + buf[b + 35], fir[0])
                    for j in range(1, 18):
                        res = SMLAWB(res, buf[b + j] + buf[b + 35 - j], fir[j])
                out.append(SAT16(RSHIFT_ROUND(res, 6)))
                index_q16 += self.inv_ratio_q16
            pos += n_in
            if pos >= in_len:
                break
            buf = buf[n_in:n_in + order]
        self.s_fir[:order] = buf[n_in:n_in + order]
        return out

"""ctypes wrapper for the native SILK symbol pass (silk_dec.c).

SilkSymbolBatch decodes a batch of SILK-only mono packets (one per stream)
into fixed-layout symbol tensors — excitation exc_Q14, per-subframe gains
and derived gain terms, LPC/LTP coefficients, pitch lags, flags — which
the batched TPU synthesis (opus_tpu/models/batched_silk.py) turns into
int16 PCM.  The scalar Python decoder (opus_tpu/silk/decoder.py) is the
bit-exact oracle these outputs are tested against
(tests/test_native_silk.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .build import load_silk_sym

MAX_NB_SUBFR = 4
MAX_LPC_ORDER = 16
LTP_ORDER = 5


class SilkSymState(ctypes.Structure):
    _fields_ = [
        ("fs_khz", ctypes.c_int32),
        ("nb_subfr", ctypes.c_int32),
        ("first_frame_after_reset", ctypes.c_int32),
        ("LastGainIndex", ctypes.c_int32),
        ("ec_prevSignalType", ctypes.c_int32),
        ("ec_prevLagIndex", ctypes.c_int32),
        ("prev_gain_Q16", ctypes.c_int32),
        ("nFramesDecoded", ctypes.c_int32),
        ("prevNLSF_Q15", ctypes.c_int16 * MAX_LPC_ORDER),
    ]


class SilkSymOut(ctypes.Structure):
    _fields_ = [
        ("error", ctypes.c_int32),
        ("signal_type", ctypes.c_int32),
        ("quant_offset_type", ctypes.c_int32),
        ("nlsf_interp_flag", ctypes.c_int32),
        ("ltp_scale_q14", ctypes.c_int32),
        ("rewhiten0", ctypes.c_int32),
        ("rewhiten2", ctypes.c_int32),
        ("seed", ctypes.c_int32),
        ("pitchL", ctypes.c_int32 * MAX_NB_SUBFR),
        ("gains_q16", ctypes.c_int32 * MAX_NB_SUBFR),
        ("gain_q10", ctypes.c_int32 * MAX_NB_SUBFR),
        ("gain_adj_q16", ctypes.c_int32 * MAX_NB_SUBFR),
        ("whiten_gain_q31", ctypes.c_int32 * MAX_NB_SUBFR),
        ("a_q12", (ctypes.c_int16 * MAX_LPC_ORDER) * 2),
        ("b_q14", (ctypes.c_int16 * LTP_ORDER) * MAX_NB_SUBFR),
    ]


def available() -> bool:
    return load_silk_sym() is not None


class SilkSymbolBatch:
    """Batched SILK symbol decoder over independent mono streams.

    Per-stream entropy/NLSF/gain state lives in a C-visible array;
    decode() takes one SILK payload per stream and returns the symbol
    tensors for the TPU synthesis stage.
    """

    def __init__(self, batch: int, fs_khz: int = 16, nb_subfr: int = 4,
                 frames_per_packet: int = 1, nthreads: int | None = None):
        self.lib = load_silk_sym()
        if self.lib is None:
            raise RuntimeError("no C compiler for the native SILK pass")
        assert ctypes.sizeof(SilkSymState) == self.lib.silk_sym_state_size()
        assert ctypes.sizeof(SilkSymOut) == self.lib.silk_sym_out_size()
        self.batch = batch
        self.fs_khz = fs_khz
        self.nb_subfr = nb_subfr
        self.nframes = frames_per_packet
        self.frame_length = nb_subfr * 5 * fs_khz
        self.states = (SilkSymState * batch)()
        for s in self.states:
            self.lib.silk_sym_state_init(ctypes.byref(s), fs_khz, nb_subfr)
        self.outs = (SilkSymOut * (batch * self.nframes))()
        self.rets = np.zeros(batch, np.int32)
        self.exc = np.zeros((batch, self.nframes, self.frame_length),
                            np.int32)
        if nthreads is None:
            nthreads = min(os.cpu_count() or 1, batch)
        self.nthreads = max(1, nthreads)

    def decode(self, payloads: list[bytes]):
        """Decode one packet per stream.  Returns (exc [B, F, L] i32,
        outs ctypes array [B*F], rets [B] i32)."""
        assert len(payloads) == self.batch
        lens = np.asarray([len(p) for p in payloads], np.int32)
        offsets = np.zeros(self.batch, np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        buf = b"".join(payloads)
        self.lib.silk_decode_symbols_batch(
            self.batch, self.states, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.nframes,
            self.exc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.outs,
            self.rets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.nthreads)
        return self.exc, self.outs, self.rets

    def fields(self, name: str, dtype=np.int32) -> np.ndarray:
        """Gather one SilkSymOut field across the batch as an ndarray
        shaped [B, F, ...]."""
        vals = np.asarray([np.asarray(getattr(o, name)) for o in self.outs],
                          dtype)
        return vals.reshape((self.batch, self.nframes) + vals.shape[1:])

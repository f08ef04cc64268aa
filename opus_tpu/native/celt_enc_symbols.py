"""ctypes wrapper for the native CELT symbol-encode pass (celt_enc.c).

CeltEncSymbolBatch turns per-stream spectra (normalized band shapes +
band log-energies for both the long- and short-MDCT variants, computed
on the TPU) plus the raw PCM frame into CELT packet bytes, threaded over
the batch.  The scalar Python encoder (opus_tpu/celt/encoder.py) is the
byte-exact oracle (tests/test_native_celt_enc.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .build import load_celt_sym
from .celt_symbols import _marshal_mode
from ..celt.modes import mode_create
from ..celt.tables import E_MEANS

MAXB = 25


class CeltEncState(ctypes.Structure):
    _fields_ = [
        ("preemph_mem", ctypes.c_double),
        ("overlap_max", ctypes.c_double),
        ("delayed_intra", ctypes.c_double),
        ("spec_avg", ctypes.c_double),
        ("oldBandE", ctypes.c_double * MAXB),
        ("oldLogE", ctypes.c_double * MAXB),
        ("oldLogE2", ctypes.c_double * MAXB),
        ("energyError", ctypes.c_double * MAXB),
        ("tonal_average", ctypes.c_int32),
        ("hf_average", ctypes.c_int32),
        ("tapset_decision", ctypes.c_int32),
        ("spread_decision", ctypes.c_int32),
        ("consec_transient", ctypes.c_int32),
        ("lastCodedBands", ctypes.c_int32),
        ("rng", ctypes.c_uint32),
        ("complexity", ctypes.c_int32),
        ("lsb_depth", ctypes.c_int32),
    ]


def available() -> bool:
    return load_celt_sym() is not None


class CeltEncSymbolBatch:
    """Batched CELT symbol encoder over independent mono streams (CBR)."""

    def __init__(self, batch: int, fs: int = 48000, frame_size: int = 960,
                 nbytes: int = 160, complexity: int = 5,
                 nthreads: int | None = None):
        self.lib = load_celt_sym()
        if self.lib is None:
            raise RuntimeError("no C compiler for the native symbol pass")
        assert ctypes.sizeof(CeltEncState) == self.lib.celt_enc_state_size()
        self.mode = mode_create(fs, frame_size)
        self.mode_ptr = _marshal_mode(self.lib, self.mode)
        emeans = np.asarray(E_MEANS[:self.mode.nbEBands], np.float64)
        self.lib.celt_enc_set_emeans(
            emeans.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.mode.nbEBands)
        lm = 0
        while self.mode.shortMdctSize << lm != frame_size:
            lm += 1
        self.lm = lm
        self.batch = batch
        self.N = frame_size
        self.nb = self.mode.nbEBands
        self.nbytes = nbytes
        self.states = (CeltEncState * batch)()
        for s in self.states:
            self.lib.celt_enc_state_init(ctypes.byref(s))
            s.complexity = complexity
        self.payloads = np.zeros((batch, nbytes), np.uint8)
        self.rngs = np.zeros(batch, np.uint32)
        self.rets = np.zeros(batch, np.int32)
        if nthreads is None:
            nthreads = min(os.cpu_count() or 1, batch)
        self.nthreads = max(1, nthreads)

    def encode(self, pcm: np.ndarray, x_l: np.ndarray, x_s: np.ndarray,
               ble_l: np.ndarray, ble_s: np.ndarray):
        """pcm [B, N] float; x_l/x_s [B, N]; ble_l/ble_s [B, nb].
        Returns (payloads list[bytes], rngs [B] u32, rets [B])."""
        def as64(a, shape):
            a = np.ascontiguousarray(a, np.float64)
            assert a.shape == shape, (a.shape, shape)
            return a
        b, n, nb = self.batch, self.N, self.nb
        pcm = as64(pcm, (b, n))
        x_l = as64(x_l, (b, n))
        x_s = as64(x_s, (b, n))
        ble_l = as64(ble_l, (b, nb))
        ble_s = as64(ble_s, (b, nb))
        dp = ctypes.POINTER(ctypes.c_double)
        self.lib.celt_encode_symbols_batch(
            ctypes.c_void_p(self.mode_ptr), b, self.states,
            pcm.ctypes.data_as(dp), x_l.ctypes.data_as(dp),
            x_s.ctypes.data_as(dp), ble_l.ctypes.data_as(dp),
            ble_s.ctypes.data_as(dp), self.lm, self.nbytes,
            self.payloads.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            self.rngs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self.rets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.nthreads)
        return ([self.payloads[i].tobytes() for i in range(b)],
                self.rngs.copy(), self.rets.copy())

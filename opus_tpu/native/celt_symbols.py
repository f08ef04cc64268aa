"""ctypes wrapper for the native CELT symbol pass (celt_dec.c).

CeltSymbolBatch decodes a batch of CELT frames (one packet frame per
stream) into fixed-layout symbol tensors — normalized band spectra X,
band energies, postfilter parameters, flags — which the batched TPU
synthesis (opus_tpu/models/batched_celt.py) turns into PCM.  The scalar
Python decoder (opus_tpu/celt/decoder.py) is the bit-exact oracle these
outputs are tested against (tests/test_native_celt.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .build import load_celt_sym
from ..celt.modes import CeltMode, mode_create
from ..celt.tables import E_PROB_MODEL

MAXB = 25  # must match celt_dec.c


class SymState(ctypes.Structure):
    _fields_ = [
        ("oldEBands", ctypes.c_double * (2 * MAXB)),
        ("oldLogE", ctypes.c_double * (2 * MAXB)),
        ("oldLogE2", ctypes.c_double * (2 * MAXB)),
        ("backgroundLogE", ctypes.c_double * (2 * MAXB)),
        ("rng", ctypes.c_uint32),
        ("loss_duration", ctypes.c_int32),
        ("postfilter_period", ctypes.c_int32),
        ("postfilter_period_old", ctypes.c_int32),
        ("postfilter_gain", ctypes.c_double),
        ("postfilter_gain_old", ctypes.c_double),
        ("postfilter_tapset", ctypes.c_int32),
        ("postfilter_tapset_old", ctypes.c_int32),
    ]


class SymOut(ctypes.Structure):
    _fields_ = [
        ("silence", ctypes.c_int32),
        ("is_transient", ctypes.c_int32),
        ("intra", ctypes.c_int32),
        ("anti_collapse_on", ctypes.c_int32),
        ("error", ctypes.c_int32),
        ("pf_t0", ctypes.c_int32),
        ("pf_t1", ctypes.c_int32),
        ("pf_t1b", ctypes.c_int32),
        ("pf_g0", ctypes.c_double),
        ("pf_g1", ctypes.c_double),
        ("pf_g1b", ctypes.c_double),
        ("pf_ts0", ctypes.c_int32),
        ("pf_ts1", ctypes.c_int32),
        ("pf_ts1b", ctypes.c_int32),
        ("rng", ctypes.c_uint32),
    ]


_MODE_CACHE: dict = {}


def _marshal_mode(lib, mode: CeltMode) -> int:
    key = (mode.Fs, mode.shortMdctSize, mode.nbEBands)
    hit = _MODE_CACHE.get(key)
    if hit is not None:
        return hit
    nb = mode.nbEBands
    eb = np.asarray(mode.eBands, np.int16)
    logn = np.asarray(mode.logN, np.int16)
    av = np.ascontiguousarray(mode.allocVectors, np.uint8).reshape(-1)
    cidx = np.ascontiguousarray(mode.cache.index, np.int16)
    cbits = np.ascontiguousarray(mode.cache.bits, np.uint8)
    ccaps = np.ascontiguousarray(mode.cache.caps, np.uint8)
    eprob = np.zeros((4, 2, 42), np.uint8)
    for lm in range(4):
        for intra in range(2):
            eprob[lm, intra] = np.asarray(E_PROB_MODEL[lm][intra], np.uint8)
    ptr = lib.celt_mode_new(
        mode.Fs, mode.overlap, nb, mode.effEBands, mode.maxLM,
        mode.shortMdctSize, mode.nbAllocVectors,
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        logn.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        av.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        cbits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(cbits.size),
        ccaps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        eprob.reshape(-1).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    _MODE_CACHE[key] = ptr
    return ptr


def available() -> bool:
    return load_celt_sym() is not None


class CeltSymbolBatch:
    """Batched CELT symbol decoder over independent streams.

    Keeps per-stream decoder state (energies, rng, postfilter memory) in a
    C-visible array; decode() takes one frame per stream and returns the
    symbol tensors for the TPU synthesis stage.
    """

    def __init__(self, batch: int, channels: int = 1, fs: int = 48000,
                 frame_size: int = 960, nthreads: int | None = None):
        self.lib = load_celt_sym()
        if self.lib is None:
            raise RuntimeError("no C compiler for the native symbol pass")
        self.mode = mode_create(fs, frame_size)
        self.mode_ptr = _marshal_mode(self.lib, self.mode)
        self.batch = batch
        self.C = channels
        lm = 0
        while self.mode.shortMdctSize << lm != frame_size:
            lm += 1
        self.lm = lm
        self.N = frame_size
        self.nb = self.mode.nbEBands
        self.states = (SymState * batch)()
        for s in self.states:
            self.lib.celt_state_init(ctypes.byref(s))
        self.outs = (SymOut * batch)()
        self.rets = np.zeros(batch, np.int32)
        if nthreads is None:
            nthreads = min(os.cpu_count() or 1, batch)
        self.nthreads = max(1, nthreads)
        self.X = np.zeros((batch, self.C * self.N), np.float32)
        self.energies = np.zeros((batch, self.C * self.nb), np.float32)
        self.pf = np.zeros((batch, 6), np.float64)
        self.flags = np.zeros((batch, 8), np.int32)

    def decode(self, frames: list[bytes], start: int = 0,
               end: int | None = None, disable_inv: int | None = None):
        """Decode one frame per stream.  Returns (X [B, C*N] f32,
        energies [B, C*nb] f32, pf [B, 6] f64 (t0,t1,t1b,g0,g1,g1b),
        flags [B, 8] i32 (silence,transient,intra,anti_collapse,error,
        ts0,ts1,ts1b), rets [B])."""
        assert len(frames) == self.batch
        if end is None:
            end = self.mode.effEBands
        if disable_inv is None:
            disable_inv = 1 if self.C == 1 else 0
        lens = np.asarray([len(f) for f in frames], np.int32)
        offsets = np.zeros(self.batch, np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        buf = b"".join(frames)
        self.lib.celt_decode_symbols_batch(
            ctypes.c_void_p(self.mode_ptr), self.batch, self.states, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.lm, self.C, start, end, disable_inv,
            self.X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.energies.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.pf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.outs,
            self.rets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.nthreads)
        return self.X, self.energies, self.pf, self.flags, self.rets

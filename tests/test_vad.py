"""Differential test of the SILK VAD vs the reference silk_VAD_GetSA_Q8_c
(reference: silk/VAD.c:82) via the stateful oracle shim."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.silk.vad import VadState

_SO = os.path.join(os.path.dirname(__file__), os.pardir,
                   ".ref_build", "libsilk_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_SO),
                                reason="silk oracle not built")


@pytest.mark.parametrize("fs_khz", [8, 12, 16])
def test_vad_bit_exact(fs_khz):
    so = ctypes.CDLL(_SO)
    so.oracle_vad_create.restype = ctypes.c_void_p
    so.oracle_vad_run.restype = ctypes.c_int
    so.oracle_vad_run.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]

    rng = np.random.default_rng(fs_khz)
    h = so.oracle_vad_create()
    mine = VadState()
    fs = fs_khz * 1000
    N = 20 * fs_khz
    t = np.arange(2 * fs) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 2.5 * t))
    sig = (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
           + 0.02 * rng.standard_normal(len(t)))
    sig[fs // 2:fs] *= 0.05          # quiet stretch
    sig[3 * fs // 2:] = 0.0          # silence tail
    pcm = np.round(np.clip(sig, -1, 1) * 20000).astype(np.int16)

    for off in range(0, len(pcm) - N + 1, N):
        fr = np.ascontiguousarray(pcm[off:off + N])
        tilt = ctypes.c_int()
        qual = (ctypes.c_int * 4)()
        sa_ref = so.oracle_vad_run(
            h, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            N, fs_khz, ctypes.byref(tilt), qual)
        sa, tl, q = mine.get_sa_q8(fr.tolist(), N, fs_khz)
        assert sa == sa_ref, f"frame {off // N}: SA {sa} != {sa_ref}"
        assert tl == tilt.value
        assert list(q) == list(qual)
    so.oracle_vad_destroy(ctypes.c_void_p(h))

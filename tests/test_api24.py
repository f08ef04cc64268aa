"""24-bit sample API (opus_encode24/opus_decode24): differential parity
with the reference float build, plus round-trip sanity."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libopus_full.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="reference libopus not built")


def _sig(fs, seconds=0.5, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    x = 0.5 * np.sin(2 * np.pi * 300 * t) \
        + 0.05 * rng.standard_normal(len(t))
    return np.clip(x, -1, 1)


def test_decode24_matches_reference():
    lib = ctypes.CDLL(_LIB)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decode24.restype = ctypes.c_int
    lib.opus_decode24.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_int, ctypes.c_int]
    err = ctypes.c_int()
    fs = 48000
    rdec = lib.opus_decoder_create(fs, 1, ctypes.byref(err))
    enc = OpusEncoder(fs, 1, application="audio")
    enc.set_bitrate(64000)
    sig = _sig(fs)
    n = fs // 50
    dec = OpusDecoder(fs, 1)
    buf = (ctypes.c_int32 * n)()
    for i in range(len(sig) // n):
        p = enc.encode(sig[i * n:(i + 1) * n], n)
        ours = dec.decode24(p, n)
        r = lib.opus_decode24(rdec, p, len(p), buf, n, 0)
        assert r == n
        ref = np.ctypeslib.as_array(buf)[:n].astype(np.int64)
        # float32 (C) vs float64 (ours) decode residual: +/-1 step at
        # 24-bit depth
        assert np.abs(ours.astype(np.int64) - ref).max() <= 16, i


def test_encode24_round_trip():
    fs = 16000
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(24000)
    sig24 = np.clip(np.rint(_sig(fs) * 8388608.0), -8388608,
                    8388607).astype(np.int32)
    n = fs // 50
    dec = OpusDecoder(fs, 1)
    outs = []
    for i in range(len(sig24) // n):
        p = enc.encode24(sig24[i * n:(i + 1) * n], n)
        outs.append(dec.decode24(p, n))
    out = np.concatenate(outs).astype(np.float64) / 8388608.0
    ref = sig24.astype(np.float64)[:len(out)] / 8388608.0
    # delay-compensated correlation: the codec path shifts the signal
    # by its lookahead, so align before judging fidelity
    best = 0.0
    for d in range(0, fs // 100):
        a = ref[:len(ref) - d]
        bvec = out[d:]
        c = np.dot(a, bvec) / (np.linalg.norm(a)
                               * np.linalg.norm(bvec) + 1e-12)
        best = max(best, c)
    assert best > 0.8, best


def test_encode24_equivalent_to_float_encode():
    fs = 16000
    sig = _sig(fs)
    sig24 = np.clip(np.rint(sig * 8388608.0), -8388608,
                    8388607).astype(np.int32)
    e1 = OpusEncoder(fs, 1, application="voip")
    e2 = OpusEncoder(fs, 1, application="voip")
    e1.set_bitrate(24000)
    e2.set_bitrate(24000)
    n = fs // 50
    for i in range(5):
        p1 = e1.encode24(sig24[i * n:(i + 1) * n], n)
        p2 = e2.encode(sig24[i * n:(i + 1) * n] / 8388608.0, n)
        assert p1 == p2, i

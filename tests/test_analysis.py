"""Tonality analysis parity tests (reference: src/analysis.c, src/mlp.c,
weights src/mlp_data.c which are checked into the tree -- this module
runs with the REAL trained classifier)."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.models import analysis as A

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libopus_full.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="reference libopus not built")


class CAnalysisInfo(ctypes.Structure):
    # (reference: AnalysisInfo celt/celt.h:65)
    _fields_ = [("valid", ctypes.c_int), ("tonality", ctypes.c_float),
                ("tonality_slope", ctypes.c_float),
                ("noisiness", ctypes.c_float),
                ("activity", ctypes.c_float),
                ("music_prob", ctypes.c_float),
                ("music_prob_min", ctypes.c_float),
                ("music_prob_max", ctypes.c_float),
                ("bandwidth", ctypes.c_int),
                ("activity_probability", ctypes.c_float),
                ("max_pitch_ratio", ctypes.c_float),
                ("leak_boost", ctypes.c_ubyte * 19)]


def _ref_analyzer(fs):
    lib = ctypes.CDLL(_LIB)
    lib.opus_custom_mode_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    mode = lib.opus_custom_mode_create(48000, 960, ctypes.byref(err))
    assert err.value == 0
    state = (ctypes.c_byte * 200000)()
    lib.tonality_analysis_init(state, fs)
    downmix = ctypes.c_void_p.in_dll(lib, "downmix_float") if False \
        else lib.downmix_float
    return lib, state, mode, downmix


def _signal(fs, seconds, kind, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    if kind == "music":
        sig = sum(0.1 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
                  for f in (220, 440, 660, 880, 1320))
        sig = sig * (0.8 + 0.2 * np.sin(2 * np.pi * 0.5 * t))
    else:
        f0 = 120 * (1 + 0.15 * np.sin(2 * np.pi * 3 * t))
        phase = np.cumsum(f0) / fs
        env = np.clip(np.sin(2 * np.pi * 2.1 * t), 0, 1)
        sig = env * (np.sin(2 * np.pi * phase)
                     + 0.4 * np.sin(4 * np.pi * phase)) * 0.3 \
            + 0.02 * rng.standard_normal(n)
    return np.clip(sig, -1, 1).astype(np.float32)


@pytest.mark.parametrize("kind", ["music", "speech"])
def test_run_analysis_parity(kind):
    fs, frame = 48000, 960
    lib, state, mode, downmix = _ref_analyzer(fs)
    ours = A.TonalityAnalysisState(fs)
    pcm = _signal(fs, 1.0, kind)
    info_c = CAnalysisInfo()
    for i in range(0, len(pcm) - frame + 1, frame):
        buf = np.ascontiguousarray(pcm[i:i + frame])
        lib.run_analysis(state, ctypes.c_void_p(mode),
                         buf.ctypes.data_as(ctypes.c_void_p),
                         frame, frame, 0, -2, 1, fs, 16, downmix,
                         ctypes.byref(info_c))
        info_p = A.run_analysis(ours, buf.astype(np.float64), frame,
                                frame, 0, -2, 1, 16)
        fidx = i // frame
        assert info_p.valid == info_c.valid, f"frame {fidx} valid"
        if not info_c.valid:
            continue
        # tolerances allow float32-vs-float64 drift in the phase
        # unwrap chain (rint boundary flips perturb noisiness slightly)
        for name, tol in (("tonality", 2e-2), ("music_prob", 5e-2),
                          ("music_prob_min", 5e-2),
                          ("music_prob_max", 5e-2),
                          ("activity_probability", 5e-2),
                          ("activity", 5e-2), ("noisiness", 5e-2),
                          ("max_pitch_ratio", 1e-2)):
            c = getattr(info_c, name)
            p = getattr(info_p, name)
            assert abs(c - p) < tol, \
                f"frame {fidx} {name}: C={c} py={p}"
        assert abs(info_p.bandwidth - info_c.bandwidth) <= 1, \
            f"frame {fidx} bandwidth C={info_c.bandwidth} " \
            f"py={info_p.bandwidth}"
        np.testing.assert_allclose(
            info_p.leak_boost, np.asarray(info_c.leak_boost), atol=2,
            err_msg=f"frame {fidx} leak_boost")


def test_encoder_uses_analysis():
    """At complexity>=7 the encoder classifies music vs speech and
    steers the mode decision (reference: opus_encoder.c:1279-1304,
    :1412-1426)."""
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    fs, frame = 48000, 960
    enc = OpusEncoder(fs, 1, "audio")
    enc.set_bitrate(64000)
    enc.set_complexity(10)
    dec = OpusDecoder(fs, 1)
    pcm = _signal(fs, 1.0, "music")
    for i in range(0, len(pcm) - frame + 1, frame):
        p = enc.encode(pcm[i:i + frame], frame)
        if p:
            dec.decode(p)
    assert enc.voice_ratio >= 0          # classifier ran
    music_ratio = enc.voice_ratio
    enc2 = OpusEncoder(fs, 1, "audio")
    enc2.set_bitrate(64000)
    enc2.set_complexity(10)
    pcm = _signal(fs, 1.0, "speech")
    for i in range(0, len(pcm) - frame + 1, frame):
        enc2.encode(pcm[i:i + frame], frame)
    assert enc2.voice_ratio > music_ratio, \
        (enc2.voice_ratio, music_ratio)
    # complexity<7 must not run the analysis
    enc3 = OpusEncoder(fs, 1, "audio")
    enc3.set_complexity(5)
    enc3.encode(pcm[:frame], frame)
    assert enc3.analysis is None and enc3.voice_ratio == -1

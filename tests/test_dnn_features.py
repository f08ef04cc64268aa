"""LPCNet feature extraction + pitch DNN + FARGAN parity tests
(reference: dnn/lpcnet_enc.c, dnn/freq.c, dnn/burg.c, dnn/pitchdnn.c,
dnn/fargan.c).

Contract: with identical random weights shipped through a weight blob,
our feature extractor matches the reference's 36-dim output per frame,
and the FARGAN vocoder matches the reference's synthesized waveform
within autoregressive float drift."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.dnn import features as feat
from opus_tpu.dnn import pitchdnn as pdnn
from opus_tpu.dnn import fargan as fg
from opus_tpu.dnn.weights import write_blob

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libdnn_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="dnn oracle not built")

F32P = ctypes.POINTER(ctypes.c_float)


def _fp(a):
    return a.ctypes.data_as(F32P)


def _speech_like(n, seed=0):
    """Pitch-pulsed harmonic signal in int16-ish float scale (the
    feature path expects raw 16 kHz samples)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f0 = 120 * (1 + 0.05 * np.sin(2 * np.pi * 2 * t))
    phase = np.cumsum(f0) / 16000.0
    sig = np.sin(2 * np.pi * phase) + 0.4 * np.sin(4 * np.pi * phase) \
        + 0.2 * np.sin(6 * np.pi * phase)
    sig = sig * 8000 * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t) ** 2)
    return (sig + 50 * rng.standard_normal(n)).astype(np.float32)


def test_feature_parity_vs_reference():
    model = pdnn.random_model(seed=5)
    blob = write_blob(pdnn.model_to_arrays(model))
    lib = ctypes.CDLL(_LIB)
    lib.feat_oracle_create.restype = ctypes.c_void_p
    h = lib.feat_oracle_create(blob, len(blob))
    assert h, "oracle rejected pitchdnn blob"
    st = feat.init_state()
    pcm = _speech_like(feat.FRAME_SIZE * 8)
    for fidx in range(8):
        x = pcm[fidx * feat.FRAME_SIZE:(fidx + 1) * feat.FRAME_SIZE]
        ref = np.zeros(feat.NB_TOTAL_FEATURES, np.float32)
        lib.feat_oracle_frame(ctypes.c_void_p(h), _fp(x), _fp(ref))
        st, ours = feat.compute_frame_features(st, x, model)
        np.testing.assert_allclose(
            ours[:feat.NB_BANDS], ref[:feat.NB_BANDS], rtol=1e-3,
            atol=2e-3, err_msg=f"cepstrum frame {fidx}")
        assert abs(ours[feat.NB_BANDS] - ref[feat.NB_BANDS]) < 2e-3, \
            f"pitch frame {fidx}: {ours[feat.NB_BANDS]} vs " \
            f"{ref[feat.NB_BANDS]}"
        assert abs(ours[feat.NB_BANDS + 1]
                   - ref[feat.NB_BANDS + 1]) < 2e-3, \
            f"corr frame {fidx}"
        np.testing.assert_allclose(
            ours[feat.NB_BANDS + 2:], ref[feat.NB_BANDS + 2:],
            rtol=1e-3, atol=2e-3, err_msg=f"lpc frame {fidx}")


def test_burg_cepstrum_self_consistency():
    """burg_cepstral_analysis returns mean/diff of half-frame cepstra
    (reference: dnn/freq.c:183)."""
    pcm = _speech_like(feat.FRAME_SIZE, seed=3) / 32768.0
    ceps = feat.burg_cepstral_analysis(pcm)
    c0 = feat.compute_burg_cepstrum(pcm[:80], 80, feat.LPC_ORDER)
    c1 = feat.compute_burg_cepstrum(pcm[80:160], 80, feat.LPC_ORDER)
    np.testing.assert_allclose(ceps[:18], 0.5 * (c0 + c1), rtol=1e-6)
    np.testing.assert_allclose(ceps[18:], c0 - c1, rtol=1e-6)


def test_fargan_parity_vs_reference():
    model = fg.random_model(seed=6)
    blob = write_blob(fg.model_to_arrays(model))
    lib = ctypes.CDLL(_LIB)
    lib.fargan_oracle_create.restype = ctypes.c_void_p
    h = lib.fargan_oracle_create(blob, len(blob))
    assert h, "oracle rejected fargan blob"
    rng = np.random.default_rng(7)
    pcm0 = (0.1 * rng.standard_normal(fg.FARGAN_CONT_SAMPLES)) \
        .astype(np.float32)
    feats0 = (0.3 * rng.standard_normal((5, fg.NB_FEATURES))) \
        .astype(np.float32)
    feats0[:, fg.NB_BANDS] = 0.3   # reasonable pitch parameter
    lib.fargan_oracle_cont(ctypes.c_void_p(h), _fp(pcm0),
                           _fp(feats0.reshape(-1).copy()))
    state = fg.cont(model, fg.init_state(), pcm0, feats0)
    for fidx in range(4):
        f = (0.3 * rng.standard_normal(fg.NB_FEATURES)) \
            .astype(np.float32)
        f[fg.NB_BANDS] = 0.3
        ref = np.zeros(fg.FARGAN_FRAME_SIZE, np.float32)
        lib.fargan_oracle_synthesize(ctypes.c_void_p(h), _fp(ref),
                                     _fp(f))
        state, ours = fg.synthesize_frame(model, state, f)
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=5e-3, atol=5e-3,
            err_msg=f"fargan frame {fidx}")


def test_fargan_batched_matches_single():
    model = fg.random_model(seed=8)
    rng = np.random.default_rng(9)
    B = 3
    pcm0 = (0.1 * rng.standard_normal((B, fg.FARGAN_CONT_SAMPLES))) \
        .astype(np.float32)
    feats0 = (0.3 * rng.standard_normal((B, 5, fg.NB_FEATURES))) \
        .astype(np.float32)
    state_b = fg.cont(model, fg.init_state((B,)), pcm0, feats0)
    f = (0.3 * rng.standard_normal((B, fg.NB_FEATURES))) \
        .astype(np.float32)
    state_b, out_b = fg.synthesize_frame(model, state_b, f)
    for b in range(B):
        st = fg.cont(model, fg.init_state(), pcm0[b], feats0[b])
        _, out = fg.synthesize_frame(model, st, f[b])
        np.testing.assert_allclose(np.asarray(out_b)[b],
                                   np.asarray(out), rtol=1e-4,
                                   atol=1e-5, err_msg=f"stream {b}")

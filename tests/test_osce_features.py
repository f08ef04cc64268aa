"""OSCE feature calculation tests (reference: dnn/osce_features.c).

Contract: the clean-spectrum, noisy-cepstrum and pitch-acorr helpers
match the reference C; the assembled 93-dim feature frames follow the
reference layout and state carry."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.dnn import osce_features as F

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libosce_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="osce oracle not built")

F32P = ctypes.POINTER(ctypes.c_float)
I16P = ctypes.POINTER(ctypes.c_int16)


def _fp(a):
    return a.ctypes.data_as(F32P)


def test_log_spectrum_from_lpc_parity():
    lib = ctypes.CDLL(_LIB)
    rng = np.random.default_rng(1)
    a = (rng.standard_normal(16) * 800).astype(np.int16)
    ref = np.zeros(64, np.float32)
    lib.osce_oracle_logspec(_fp(ref), a.ctypes.data_as(I16P), 16)
    got = F.calculate_log_spectrum_from_lpc(a, 16)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cepstrum_parity():
    lib = ctypes.CDLL(_LIB)
    rng = np.random.default_rng(2)
    sig = (rng.standard_normal(320) * 0.3).astype(np.float32)
    ref = np.zeros(18, np.float32)
    lib.osce_oracle_cepstrum(_fp(ref), _fp(sig))
    got = F.calculate_cepstrum(sig)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lag", [7, 40, 150, 300])
def test_acorr_parity(lag):
    lib = ctypes.CDLL(_LIB)
    rng = np.random.default_rng(lag)
    hist = (rng.standard_normal(F.OSCE_FEATURES_MAX_HISTORY + 80)
            * 0.3).astype(np.float32)
    ref = np.zeros(5, np.float32)
    frame_ptr = hist[F.OSCE_FEATURES_MAX_HISTORY:]
    lib.osce_oracle_acorr(_fp(ref), _fp(frame_ptr), lag)
    got = F.calculate_acorr(hist, lag)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_assembled_features_layout():
    st = F.init_feature_state()
    rng = np.random.default_rng(5)
    xq = (rng.standard_normal(320) * 5000).astype(np.int16)
    pred = [rng.integers(-2000, 2000, 16).astype(np.int16)
            for _ in range(2)]
    lags = [120, 120, 118, 118]
    ltp = rng.integers(-8000, 8000, 20).astype(np.int16)
    gains = [65536 * 2] * 4
    st, feats, numbits, periods = F.calculate_features(
        st, xq, 300, pred, lags, ltp, gains, F.TYPE_VOICED, 16)
    assert feats.shape == (4, 93)
    assert numbits[0] == 300 and 0 < numbits[1] <= 300
    assert list(periods) == lags
    # even/odd frames share spec + cepstrum
    np.testing.assert_array_equal(feats[0, :82], feats[1, :82])
    np.testing.assert_array_equal(feats[2, :82], feats[3, :82])
    assert feats[0, 92] == pytest.approx(np.log(2 + 1e-9))
    # unvoiced -> pitch collapses to the no-pitch value
    st, feats, numbits, periods = F.calculate_features(
        st, xq, 300, pred, lags, ltp, gains, 0, 16)
    assert set(periods) == {F.OSCE_NO_PITCH_VALUE}


def test_osce_decoder_integration():
    """End-to-end: SILK-WB packets decode with NoLACE enhancement
    enabled; the first enhanced frame passes through (reset=2), output
    stays finite and the stream keeps decoding."""
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.dnn import osce as osce_mod
    fs, frame = 16000, 320
    enc = OpusEncoder(fs, 1, "voip")
    enc.set_bitrate(24000)
    dec_plain = OpusDecoder(fs, 1)
    dec_osce = OpusDecoder(fs, 1)
    dec_osce.set_osce(osce_mod.OSCE_METHOD_NOLACE,
                      osce_mod.random_nolace_model(70))
    rng = np.random.default_rng(71)
    t = np.arange(fs) / fs
    pcm = np.clip(0.3 * np.sin(2 * np.pi * np.cumsum(
        130 * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))) / fs)
        + 0.01 * rng.standard_normal(fs), -1, 1)
    outs_p, outs_e = [], []
    for i in range(0, fs - frame + 1, frame):
        p = enc.encode(pcm[i:i + frame], frame)
        if not p:
            continue
        outs_p.append(dec_plain.decode(p))
        outs_e.append(dec_osce.decode(p))
    a = np.concatenate(outs_p)
    b = np.concatenate(outs_e)
    assert np.isfinite(b).all()
    # first frame passes through identically (reset behavior)
    np.testing.assert_allclose(b[:frame], a[:frame], atol=1e-3)
    # with random weights the later frames must actually differ
    assert np.abs(a[2 * frame:] - b[2 * frame:]).max() > 1e-3

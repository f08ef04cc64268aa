"""BBWE bandwidth extension tests (reference: dnn/osce.c
ENABLE_OSCE_BWE sections; the adaptive-conv/shape primitives inside
are oracle-tested in test_dnn_nndsp.py)."""

import numpy as np

from opus_tpu.dnn import bbwe


def test_upsamp_2x_preserves_tone():
    st = bbwe.resamp_init()
    t = np.arange(640) / 16000.0
    x = np.sin(2 * np.pi * 1000 * t)
    st, y = bbwe.upsamp_2x(st, x)
    assert len(y) == 1280
    # skip warmup; a 1 kHz tone at 32 kHz must dominate the spectrum
    Y = np.abs(np.fft.rfft(y[256:]))
    peak = np.argmax(Y)
    freq = peak * 32000 / len(y[256:])
    assert abs(freq - 1000) < 80, freq


def test_interpol_3_2_ratio_and_tone():
    st = bbwe.resamp_init()
    t = np.arange(640) / 32000.0
    x = np.sin(2 * np.pi * 2000 * t)
    st, y = bbwe.interpol_3_2(st, x)
    assert len(y) == 960
    Y = np.abs(np.fft.rfft(y[128:]))
    freq = np.argmax(Y) * 48000 / len(y[128:])
    assert abs(freq - 2000) < 120, freq


def test_bwe_features_shape_and_state():
    st = bbwe.bwe_feature_init()
    rng = np.random.default_rng(1)
    xq = (rng.standard_normal(320) * 4000).astype(np.int16)
    st, f = bbwe.bwe_calculate_features(st, xq)
    assert f.shape == (2, 114)
    # instafreq terms are unit-normalized cosine/sine pairs
    inst = f[:, 32:]
    assert np.all(np.abs(inst) <= 1.0 + 1e-6)
    # energy terms are log-domain
    assert np.isfinite(f).all()


def test_bbwe_end_to_end():
    model = bbwe.random_model(2)
    ext = bbwe.BBWE(model)
    rng = np.random.default_rng(3)
    t = np.arange(320 * 4) / 16000.0
    sig = (4000 * np.sin(2 * np.pi * 440 * t)
           + 100 * rng.standard_normal(len(t))).astype(np.int16)
    outs = []
    for i in range(4):
        y = ext.process(sig[i * 320:(i + 1) * 320])
        assert y.shape == (960,) and y.dtype == np.int16
        outs.append(y)
    out = np.concatenate(outs)
    assert np.isfinite(out.astype(np.float64)).all()
    # 10 ms frames also accepted
    y = ext.process(sig[:160])
    assert y.shape == (480,)


def test_bbwe_decoder_integration():
    """SILK-WB stream encoded at 16 kHz, decoded at 48 kHz with BWE
    replacing the resampler: frame sizes stay correct and output is
    finite."""
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    enc = OpusEncoder(16000, 1, "voip")
    enc.set_bitrate(24000)
    dec = OpusDecoder(48000, 1)
    dec.set_osce_bwe(bbwe.random_model(5))
    t = np.arange(16000) / 16000.0
    pcm = 0.3 * np.sin(2 * np.pi * 160 * t)
    total = 0
    for i in range(0, 16000 - 320 + 1, 320):
        p = enc.encode(pcm[i:i + 320], 320)
        if not p:
            continue
        y = dec.decode(p)
        assert len(y) == 960, len(y)
        assert np.isfinite(y).all()
        total += 1
    assert total >= 40

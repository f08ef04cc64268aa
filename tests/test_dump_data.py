"""dump_data twin (opus_tpu/train/dump_data.py): the training-data
generator produces feature/PCM pairs with the reference's framing
contract — 36 features per 10 ms frame, PCM preemphasized and delayed
by half a frame so features are centered (dnn/dump_data.c:461-488) —
and the augmentation pipeline is seeded-deterministic."""

import numpy as np

from opus_tpu.train import dump_data as DD


def _speech(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 6000 * np.sin(2 * np.pi * 220 * t) \
        * (1 + 0.3 * np.sin(2 * np.pi * 3 * t)) \
        + 300 * rng.standard_normal(n)
    return sig.astype(np.int16)


def test_dump_features_contract():
    xn = _speech(40 * DD.FRAME_SIZE).astype(np.float64)
    feats, pcm = DD.dump_features(xn)
    assert feats.shape == (40, DD.NB_TOTAL_FEATURES)
    assert pcm.shape == (40 * DD.FRAME_SIZE,)
    assert np.all(np.isfinite(feats))
    # PCM is the preemphasized signal delayed by TRAINING_OFFSET
    pre = np.empty_like(xn)
    m = 0.0
    for i in range(len(xn)):
        pre[i] = xn[i] + m
        m = -DD.PREEMPHASIS * xn[i]
    expect = np.zeros_like(pre)
    expect[DD.TRAINING_OFFSET:] = pre[:-DD.TRAINING_OFFSET]
    q = np.clip(np.floor(0.5 + expect), -32767, 32767)
    assert np.array_equal(pcm[DD.FRAME_SIZE:],
                          q[DD.FRAME_SIZE:].astype(np.int16))


def test_dump_features_burg_prepends_cepstra():
    xn = _speech(8 * DD.FRAME_SIZE).astype(np.float64)
    feats, _ = DD.dump_features(xn, burg=True)
    assert feats.shape == (8, 36 + DD.NB_TOTAL_FEATURES)


def test_dump_data_deterministic_and_augmenting():
    sp = _speech(2 * 50 * DD.FRAME_SIZE, seed=1)
    nz = _speech(60 * DD.FRAME_SIZE, seed=2)
    a = list(DD.dump_data(sp, nz, seed=7, sequence_length=50))
    b = list(DD.dump_data(sp, nz, seed=7, sequence_length=50))
    assert len(a) == 2
    for (fa, pa), (fb, pb) in zip(a, b):
        assert np.array_equal(fa, fb)
        assert np.array_equal(pa, pb)
    c = list(DD.dump_data(sp, nz, seed=8, sequence_length=50))
    assert any(not np.array_equal(pa, pc)
               for (_, pa), (_, pc) in zip(a, c))


def test_dump_data_test_mode_matches_direct_features():
    sp = _speech(30 * DD.FRAME_SIZE, seed=3)
    (feats, pcm), = DD.dump_data(sp, train=False, sequence_length=30)
    from opus_tpu.dnn import features as FE
    from opus_tpu.dnn import pitchdnn as pdnn
    st = FE.init_state()
    model = pdnn.random_model(0)
    for t in range(30):
        st, f36 = FE.compute_frame_features(
            st, sp[t * 160:(t + 1) * 160].astype(np.float64), model)
        assert np.allclose(feats[t], f36, atol=1e-6), t

"""Batched TPU DNN execution tests: scan-over-frames and mesh-sharded
FARGAN/RDOVAE must match the single-stream reference paths."""

import jax
import jax.numpy as jnp
import numpy as np

from opus_tpu.dnn import fargan as fg
from opus_tpu.dnn import rdovae
from opus_tpu.models import batched_dnn as bd


def test_fargan_scan_matches_stepwise():
    model = fg.random_model(1)
    rng = np.random.default_rng(2)
    B, T = 3, 4
    state = fg.init_state((B,))
    feats = jnp.asarray(0.3 * rng.standard_normal((T, B, 20)),
                        jnp.float32)
    final, pcm = bd.fargan_synthesize_frames(model, state, feats)
    assert pcm.shape == (T, B, 160)
    # stepwise reference
    s = fg.init_state((B,))
    for t in range(T):
        s, y = fg.synthesize_frame(model, s, feats[t])
        np.testing.assert_allclose(np.asarray(pcm[t]), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_rdovae_scan_batched():
    model = rdovae.random_dec_model(3)
    rng = np.random.default_rng(4)
    B, T = 2, 3
    init = jnp.asarray(rng.standard_normal((B, 24)), jnp.float32)
    zs = jnp.asarray(rng.standard_normal((T, B, 81)), jnp.float32)
    _, q = bd.rdovae_decode_frames(model, init, zs)
    assert q.shape == (T, B, 80)
    # against the numpy decode_all per stream
    for b in range(B):
        feats = rdovae.decode_all(model, init[b], zs[:, b, :])
        np.testing.assert_allclose(
            np.asarray(q[:, b, :]).reshape(-1, 20), np.asarray(feats),
            rtol=1e-4, atol=1e-5)


def test_fargan_sharded_over_mesh():
    from opus_tpu.parallel.mesh import make_mesh
    devices = jax.devices()
    n = min(len(devices), 8)
    if n < 2:
        import pytest
        pytest.skip("needs multiple devices")
    mesh = make_mesh(devices[:n], dp=n, tp=1)
    model = fg.random_model(5)
    B = 2 * n
    state = bd.shard_fargan_state(mesh, fg.init_state((B,)))
    step = bd.fargan_batch_step(model)
    rng = np.random.default_rng(6)
    f = jnp.asarray(0.3 * rng.standard_normal((B, 20)), jnp.float32)
    state, pcm = step(state, f)
    assert pcm.shape == (B, 160)
    assert np.isfinite(np.asarray(pcm)).all()

"""RDOVAE + DRED coding tests (reference: dnn/dred_rdovae_enc.c,
dnn/dred_rdovae_dec.c, dnn/dred_encoder.c, dnn/dred_decoder.c).

Contract: with identical random weights shipped through the weight
blob, our JAX RDOVAE stacks match the reference inference C (compiled
with stand-in dimension headers derived from the in-tree training
code); the DRED payload coder round-trips its own streams exactly at
the quantized-symbol level."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.dnn import rdovae, dred
from opus_tpu.dnn.weights import write_blob

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "librdovae_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="rdovae oracle not built")

F32P = ctypes.POINTER(ctypes.c_float)


def _fp(a):
    return a.ctypes.data_as(F32P)


def test_encoder_parity_vs_reference():
    model = rdovae.random_enc_model(seed=42)
    blob = write_blob(rdovae.model_to_arrays(enc=model))
    lib = ctypes.CDLL(_LIB)
    lib.rdovae_oracle_enc_create.restype = ctypes.c_void_p
    h = lib.rdovae_oracle_enc_create(blob, len(blob))
    assert h, "oracle rejected our weight blob"
    rng = np.random.default_rng(1)
    state = rdovae.enc_init_state()
    for step in range(6):
        feat = (rng.standard_normal(2 * rdovae.DRED_NUM_FEATURES)
                .astype(np.float32) * 0.5)
        lat_c = np.zeros(rdovae.DRED_LATENT_DIM, np.float32)
        st_c = np.zeros(rdovae.DRED_STATE_DIM, np.float32)
        lib.rdovae_oracle_encode(ctypes.c_void_p(h), _fp(lat_c),
                                 _fp(st_c), _fp(feat))
        state, lat_j, st_j = rdovae.encode_dframe(model, state, feat)
        np.testing.assert_allclose(np.asarray(lat_j), lat_c, rtol=1e-4,
                                   atol=1e-4, err_msg=f"latents step {step}")
        np.testing.assert_allclose(np.asarray(st_j), st_c, rtol=1e-4,
                                   atol=1e-4, err_msg=f"state step {step}")


def test_decoder_parity_vs_reference():
    model = rdovae.random_dec_model(seed=43)
    blob = write_blob(rdovae.model_to_arrays(dec=model))
    lib = ctypes.CDLL(_LIB)
    lib.rdovae_oracle_dec_create.restype = ctypes.c_void_p
    h = lib.rdovae_oracle_dec_create(blob, len(blob))
    assert h, "oracle rejected our weight blob"
    rng = np.random.default_rng(2)
    init = rng.standard_normal(rdovae.DRED_STATE_DIM).astype(np.float32)
    lib.rdovae_oracle_dec_init(ctypes.c_void_p(h), _fp(init))
    state = rdovae.dec_init_state(model, init)
    for step in range(5):
        z = (rng.standard_normal(rdovae.DRED_LATENT_DIM + 1)
             .astype(np.float32))
        q_c = np.zeros(4 * rdovae.DRED_NUM_FEATURES, np.float32)
        lib.rdovae_oracle_decode_qframe(ctypes.c_void_p(h), _fp(q_c),
                                        _fp(z))
        state, q_j = rdovae.decode_qframe(model, state, z)
        np.testing.assert_allclose(np.asarray(q_j), q_c, rtol=1e-4,
                                   atol=1e-4, err_msg=f"qframe step {step}")


def test_decode_all_matches_stepwise():
    model = rdovae.random_dec_model(seed=44)
    rng = np.random.default_rng(3)
    init = rng.standard_normal(rdovae.DRED_STATE_DIM).astype(np.float32)
    zs = rng.standard_normal((4, rdovae.DRED_LATENT_DIM + 1)) \
        .astype(np.float32)
    feats = np.asarray(rdovae.decode_all(model, init, zs))
    assert feats.shape == (16, rdovae.DRED_NUM_FEATURES)
    state = rdovae.dec_init_state(model, init)
    for t in range(4):
        state, q = rdovae.decode_qframe(model, state, zs[t])
        np.testing.assert_allclose(
            feats[4 * t:4 * t + 4].reshape(-1), np.asarray(q),
            rtol=1e-6, atol=1e-6)


def test_dred_payload_roundtrip():
    """Encode->decode must recover exactly the dead-zone-quantized
    latents and the offsets (final_range-style symbol exactness)."""
    stats = dred.random_stats(seed=7)
    rng = np.random.default_rng(8)
    nb = 12
    latents = (rng.standard_normal((nb, rdovae.DRED_LATENT_DIM)) * 2) \
        .astype(np.float32)
    states = (rng.standard_normal((nb, rdovae.DRED_STATE_DIM)) * 2) \
        .astype(np.float32)
    activity = np.ones(4 * dred.DRED_MAX_FRAMES, np.uint8)
    q0, dq, qmax = 6, 3, 15
    payload = dred.dred_encode(stats, latents, states, nb,
                               dred_offset=8, activity=activity,
                               q0=q0, dq=dq, qmax=qmax)
    assert payload is not None and len(payload) <= dred.DRED_MAX_DATA_SIZE
    out = dred.dred_decode(stats, payload, max_dred_features=48)
    assert out.dred_offset == 8
    assert out.nb_latents >= 1
    # state symbols must round-trip exactly through the dead zone
    qs = dred.quantize_latents(states[0], stats.state_scale[q0],
                               stats.state_dead_zone[q0])
    mask = (stats.state_r[q0] != 0) & (stats.state_p0[q0] != 255)
    scale = stats.state_scale[q0].astype(np.float32)
    expect = np.where(mask, qs * 256.0 / np.maximum(scale, 1), 0.0)
    np.testing.assert_allclose(out.state, expect, rtol=1e-6)
    for k in range(out.nb_latents):
        q_level = dred.compute_quantizer(q0, dq, qmax, k)
        ql = dred.quantize_latents(latents[2 * k],
                                   stats.latent_scale[q_level],
                                   stats.latent_dead_zone[q_level])
        m = (stats.latent_r[q_level] != 0) \
            & (stats.latent_p0[q_level] != 255)
        sc = stats.latent_scale[q_level].astype(np.float32)
        expect = np.where(m, ql * 256.0 / np.maximum(sc, 1), 0.0)
        np.testing.assert_allclose(out.latents[k, :-1], expect,
                                   rtol=1e-6, err_msg=f"chunk {k}")
        assert out.latents[k, -1] == pytest.approx(q_level * 0.125 - 1)


def test_dred_silence_gating():
    """With no voice activity the encoder refuses to emit DRED
    (reference: dred_encode_silk_frame early returns)."""
    stats = dred.random_stats(seed=9)
    rng = np.random.default_rng(10)
    nb = 8
    latents = rng.standard_normal((nb, rdovae.DRED_LATENT_DIM)) \
        .astype(np.float32)
    states = rng.standard_normal((nb, rdovae.DRED_STATE_DIM)) \
        .astype(np.float32)
    silence = np.zeros(4 * dred.DRED_MAX_FRAMES, np.uint8)
    assert dred.dred_encode(stats, latents, states, nb, 8, silence) \
        is None


def test_dred_budget_limit():
    """A tiny byte budget yields either None or a payload within it."""
    stats = dred.random_stats(seed=11)
    rng = np.random.default_rng(12)
    nb = 20
    latents = (rng.standard_normal((nb, rdovae.DRED_LATENT_DIM)) * 4) \
        .astype(np.float32)
    states = (rng.standard_normal((nb, rdovae.DRED_STATE_DIM)) * 4) \
        .astype(np.float32)
    activity = np.ones(4 * dred.DRED_MAX_FRAMES, np.uint8)
    for budget in (8, 40, 200):
        p = dred.dred_encode(stats, latents, states, nb, 8, activity,
                             max_bytes=budget)
        assert p is None or len(p) <= budget

"""Compiled-path coverage for the fused CELT encoder: the SAME
fused_celt_encode_frame that bench.py headlines, traced through jit and
executed by XLA (CPU backend in CI; identical graph on TPU), validated

  1. byte-identical to the eager numpy twin (tests/np_shim) on every
     frame — the jitted graph and the eager math are the same program,
  2. decodable by the scalar CELT decoder with final_range equality
     (the final_range oracle, reference include/opus_defines.h:157).

All sizes are gated behind OPUS_TPU_RUN_FUSED_CELT_FULL on the CPU
backend (XLA CPU needs >35 min for even the 2.5 ms encode graph; the
TPU toolchain compiles it in ~2.5 min, measured) — on a TPU the 2.5 ms
case runs un-gated.
Reference: celt_encode_with_ec /root/reference/celt/celt_encoder.c:1726.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import opus_tpu.models.celt_enc_fused as E

FS = 48000
B = 4
NFRAMES = 6

_FULL = pytest.mark.skipif(
    not os.environ.get("OPUS_TPU_RUN_FUSED_CELT_FULL"),
    reason="larger fused-graph compiles are slow on XLA CPU; "
           "set OPUS_TPU_RUN_FUSED_CELT_FULL=1 (or run on TPU)")


def _signals(n, nframes=NFRAMES, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n * nframes) / FS
    sigs = []
    for b in range(B):
        f0 = 250 + 180 * b
        s = 0.3 * np.sin(2 * np.pi * f0 * t) \
            * (1 + 0.3 * np.sin(2 * np.pi * (2 + b) * t))
        s += 0.05 * np.sin(2 * np.pi * (1400 + 150 * b) * t + .3)
        for _ in range(2):
            p0 = int(rng.integers(0, len(t) - 500))
            s[p0:p0 + 400] += 0.4 * rng.standard_normal(400) \
                * np.hanning(400)
        sigs.append(np.clip(s, -1, 1).astype(np.float32))
    return np.stack(sigs)


def _np_twin_encode(sigs, n, nbytes, nframes):
    from tests.np_shim import install, uninstall
    mods = install(extra_modules=[E])
    try:
        tabs = E.EncTabs(FS, n)
        state = E.fused_celt_enc_init(B, tabs)
        frames = []
        for f in range(nframes):
            payload, rngv, err, state, _dbg = E.fused_celt_encode_frame(
                sigs[:, f * n:(f + 1) * n], state, tabs, nbytes)
            assert not np.any(np.asarray(err))
            frames.append((np.asarray(payload, np.uint8),
                           np.asarray(rngv, np.uint64)))
    finally:
        uninstall(mods)
    return frames


@pytest.mark.parametrize("frame_size,nbytes", [
    (120, 40),
    pytest.param(480, 80, marks=_FULL),
    pytest.param(960, 110, marks=_FULL),
])
def test_fused_encode_jitted_matches_np_twin(frame_size, nbytes):
    from opus_tpu.celt.decoder import CeltDecoder

    n = frame_size
    sigs = _signals(n)
    ref_frames = _np_twin_encode(sigs, n, nbytes, NFRAMES)

    tabs = E.EncTabs(FS, n)
    enc_jit = jax.jit(
        lambda pcm, st: E.fused_celt_encode_frame(pcm, st, tabs, nbytes))
    state = E.fused_celt_enc_init(B, tabs)
    got_frames = []
    for f in range(NFRAMES):
        pcm = jnp.asarray(sigs[:, f * n:(f + 1) * n])
        payload, rngv, err, state, _dbg = enc_jit(pcm, state)
        assert not np.any(np.asarray(err)), f"frame {f}: error lanes"
        got_frames.append((np.asarray(payload, np.uint8),
                           np.asarray(rngv, np.uint64)))

    # 1. byte-identical to the numpy twin
    for f, ((gp, gr), (rp, rr)) in enumerate(zip(got_frames, ref_frames)):
        assert gp.shape == rp.shape
        for b in range(B):
            assert gp[b].tobytes() == rp[b].tobytes(), \
                f"frame {f} lane {b}: payload bytes differ"
            assert (int(gr[b]) & 0xFFFFFFFF) == (int(rr[b]) & 0xFFFFFFFF)

    # 2. the scalar decoder consumes every stream, final_range equal
    for b in range(B):
        dec = CeltDecoder.create(FS, 1)
        for f in range(NFRAMES):
            pay, rngv = got_frames[f]
            pcm_out = np.zeros(n)
            ret = dec.decode_with_ec(bytes(pay[b].tobytes()), pcm_out,
                                     n, None)
            assert ret == n
            assert (int(dec.rng) & 0xFFFFFFFF) \
                == (int(rngv[b]) & 0xFFFFFFFF), (b, f)

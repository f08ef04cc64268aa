"""Pallas CELT decode symbol kernel (opus_tpu/models/celt_dec_kernel):
the full 10/20 ms per-frame symbol pass in ONE pallas_call, symbol-exact
vs the scalar CELT decoder on real packets, and the packets->PCM
production wrapper (kernel + XLA synthesis) against the scalar
decoder's PCM.

This kernel targets the real TPU toolchain: Mosaic compiles it in
minutes, while XLA-CPU interpret mode needs >1 h, so the whole module
is gated on a TPU backend:

    OPUS_TPU_TEST_PLATFORM=axon OPUS_TPU_RUN_DEC_KERNEL=1 \
        python -m pytest tests/test_celt_dec_kernel.py

Reference: celt/celt_decoder.c:1209-1614, bands.c:1589, cwrs.c:467.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_celt_dec_fused import _encode_frames, _scalar_decode

pytestmark = pytest.mark.skipif(
    not os.environ.get("OPUS_TPU_RUN_DEC_KERNEL"),
    reason="Pallas kernel needs the TPU toolchain; run with "
           "OPUS_TPU_TEST_PLATFORM=axon OPUS_TPU_RUN_DEC_KERNEL=1")


@pytest.mark.parametrize("frame_size", [480, 960])
def test_kernel_symbol_exact(frame_size):
    from opus_tpu.models.celt_dec_kernel import KTabs, build_frame_fn
    from opus_tpu.ops import rc_kernel as K

    nframes = 8
    frames = _encode_frames(frame_size, nframes=nframes, bitrate=64000)
    taps = _scalar_decode(frames, frame_size)
    tabs = KTabs(48000, frame_size)
    nb = tabs.nb
    R = 8
    B = R * 128
    W = 96

    bufb = np.zeros((B, W * 4), np.uint32)
    lens = np.zeros(B, np.int32)
    olde = np.zeros((nb, B), np.float32)
    prevmin = np.zeros((nb, B), np.float32)
    seed = np.zeros(B, np.uint32)
    for l in range(B):
        f = l % nframes
        a = np.frombuffer(frames[f], np.uint8)
        bufb[l, :len(a)] = a
        lens[l] = len(a)
        olde[:, l] = taps[f]["pre_e"]
        prevmin[:, l] = np.minimum(taps[f]["prev1"], taps[f]["prev2"])
        seed[l] = taps[f]["seed"]

    words = K.pack_words(bufb, W * 4)
    fn = build_frame_fn(tabs, W, R)
    out = fn(jnp.asarray(words.reshape(W, R, 128)),
             jnp.asarray(lens.reshape(R, 128)),
             jnp.asarray(olde.reshape(nb, R, 128)),
             jnp.asarray(prevmin.reshape(nb, R, 128)),
             jnp.asarray(seed.reshape(R, 128)))
    out = {k: np.asarray(v) for k, v in out.items()}

    X = out["X"].reshape(tabs.nx_rows, B)
    E = out["energies"].reshape(nb, B)
    rng = out["rng"].reshape(B)
    err = out["error"].reshape(B)
    for f in range(nframes):
        t = taps[f]
        assert err[f] == 0
        assert rng[f] == t["final_range"], f
        assert np.abs(E[:, f] - t["energies"]).max() < 1e-4, f
        xs = t["X"] if t["X"].ndim == 1 else t["X"][0]
        assert np.all(xs[tabs.nx_rows:] == 0.0)
        xs = xs[:tabs.nx_rows]
        rel = np.abs(X[:, f] - xs).max() / (np.abs(xs).max() + 1e-9)
        assert rel < 1e-4, (f, rel)


def test_kernel_decoder_pcm():
    """KernelCeltDecoder (kernel + XLA synthesis) vs the scalar
    decoder's float PCM on a chained 20 ms stream."""
    from opus_tpu.models.celt_dec_kernel import KernelCeltDecoder
    from opus_tpu.celt.decoder import CeltDecoder

    frame = 960
    nframes = 6
    frames = _encode_frames(frame, nframes=nframes, bitrate=64000)

    dec = CeltDecoder.create(48000, 1)
    ref = []
    for f in frames:
        pcm = np.zeros(frame)
        assert dec.decode_with_ec(bytes(f), pcm, frame, None) == frame
        ref.append(pcm.copy())
    ref = np.concatenate(ref)

    kd = KernelCeltDecoder(1024, frame_size=frame)
    got = []
    for f in frames:
        pcm, err = kd.decode([bytes(f)] * 1024)
        assert not err.any()
        got.append(pcm[0, 0])
    got = np.concatenate(got)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 1e-3

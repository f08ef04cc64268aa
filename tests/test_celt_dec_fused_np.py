"""Compile-free validation of the fused CELT decoder at every frame
size: the same celt_dec_fused code runs eagerly in numpy via
tests/np_shim (no XLA), so the 5/10/20 ms variants — whose one-jit
graphs compile too slowly on a 1-core XLA-CPU host for default CI —
still get full symbol-exactness coverage (final range, collapse masks,
band shapes, energies) against the scalar decoder on real packets.
The compiled path is covered at 2.5 ms in test_celt_dec_fused.py and
on TPU by bench.py's fused section."""

import numpy as np
import pytest

from tests import np_shim
from tests.test_celt_dec_fused import _encode_frames, _scalar_decode


@pytest.mark.parametrize("frame_size,nframes", [(240, 10), (960, 6)])
def test_fused_celt_decode_numpy_twin(frame_size, nframes):
    frames = _encode_frames(frame_size, nframes=nframes,
                            bitrate=64000 if frame_size >= 960
                            else 128000)
    taps = _scalar_decode(frames, frame_size)

    saved = np_shim.install()
    try:
        from opus_tpu.models.celt_dec_fused import (DecTabs,
                                                    fused_celt_decode_frame)
        from opus_tpu.ops import rc_kernel as K

        tabs = DecTabs(48000, frame_size)
        nb = tabs.nb
        bsz = len(frames)
        smax = max(len(f) for f in frames)
        bufb = np.zeros((bsz, smax), np.uint8)
        lens = np.zeros(bsz, np.int32)
        for i, f in enumerate(frames):
            a = np.frombuffer(f, np.uint8)
            bufb[i, :len(a)] = a
            lens[i] = len(a)
        buf = K.pack_words(bufb.astype(np.uint32), smax)
        old_e = [np.array([t["pre_e"][i] for t in taps], np.float32)
                 for i in range(nb)]
        prev1 = [np.array([t["prev1"][i] for t in taps], np.float32)
                 for i in range(nb)]
        prev2 = [np.array([t["prev2"][i] for t in taps], np.float32)
                 for i in range(nb)]
        seed = np.array([t["seed"] for t in taps], np.uint32)
        out, state = fused_celt_decode_frame(
            buf, np.asarray(lens), old_e, prev1, prev2, seed, None,
            tabs, np.ones(bsz, bool))
    finally:
        np_shim.uninstall(saved)

    X = np.asarray(out["X"])
    energies = np.stack([np.asarray(e) for e in out["energies"]], axis=1)
    collapse = np.stack([np.asarray(c) for c in out["collapse"]], axis=1)
    err = np.asarray(state["d"]["error"])
    frng = np.asarray(state["d"]["rng"])
    for i, t in enumerate(taps):
        assert err[i] == 0, f"frame {i}: error lane"
        assert frng[i] == t["final_range"], f"frame {i}: final range"
        assert list(collapse[i].astype(np.int64)) == \
            list(t["collapse"]), f"frame {i}: collapse"
        assert np.allclose(X[i], t["X"][:X.shape[1]], atol=2e-3), \
            f"frame {i}: band shapes " \
            f"({np.abs(X[i] - t['X'][:X.shape[1]]).max()})"
        assert np.allclose(energies[i], t["energies"], atol=1e-4), \
            f"frame {i}: energies"


def test_fused_celt_decoder_pcm_twin():
    """End-to-end packets->PCM: the FusedCeltDecoder pipeline (symbol
    decode under the numpy twin + the jitted synthesis DSP) against the
    scalar decoder's PCM over consecutive 20 ms frames, exercising the
    cross-frame state carry (energy memory, postfilter phases, oldLogE
    shift, deemphasis)."""
    from opus_tpu.models.opus_decoder import OpusDecoder

    frame_size, nframes = 960, 6
    frames = _encode_frames(frame_size, nframes=nframes, bitrate=64000)
    dec = OpusDecoder(48000, 1)
    ref_pcm = [np.array(dec.decode(bytes([0xF8]) + f))
               for f in frames]

    saved = np_shim.install()
    try:
        from opus_tpu.models.celt_dec_fused import (
            DecTabs, fused_celt_decode_to_pcm, fused_celt_init_state)
        from opus_tpu.ops import rc_kernel as K

        tabs = DecTabs(48000, frame_size)
        state = fused_celt_init_state(2, tabs)
        got = []
        cap = (max(len(f) for f in frames) + 3) // 4 * 4
        for f in frames:
            a = np.frombuffer(f, np.uint8)
            bufb = np.zeros((2, cap), np.uint32)
            bufb[:, :len(a)] = a
            lens = np.full(2, len(a), np.int32)
            buf = K.pack_words(bufb, cap)
            pcm, state, err = fused_celt_decode_to_pcm(
                buf, lens, state, tabs)
            assert not np.asarray(err).any()
            got.append(np.asarray(pcm)[0, 0])
    finally:
        np_shim.uninstall(saved)

    for i, (g, r) in enumerate(zip(got, ref_pcm)):
        err = np.abs(g - r)
        assert err.max() < 1e-5, f"frame {i}: PCM max err {err.max()}"

"""Fused on-device hybrid decoder (opus_tpu/models/hybrid_dec_fused):
SILK-WB + CELT start=17 over one shared range decoder, 16->48 kHz
upsample + accumulation, vs the scalar OpusDecoder oracle.

The SILK half and the resampler are integer-exact; the CELT half makes
float32 decisions whose symbols are integer-domain (same contract as
test_celt_dec_fused), so the composed PCM must match the scalar
decoder's float64 path to float tolerance while SILK-only content is
exact.

Reference: src/opus_decoder.c:432-646 (hybrid frame loop),
silk/resampler_private_IIR_FIR.c (upsampler)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from opus_tpu.bitstream import packet as pkt
from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder

FS = 48000
FRAME = 960
NFRAMES = 10


def _speechlike(nframes, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(FRAME * nframes) / FS
    f0 = 110 * (1 + 0.2 * np.sin(2 * np.pi * 1.1 * t))
    sig = 0.35 * np.sin(2 * np.pi * np.cumsum(f0) / FS)
    sig += 0.15 * np.sin(2 * np.pi * 3 * np.cumsum(f0) / FS + 0.4)
    # content above the 8 kHz hybrid crossover so the CELT band tree
    # codes real pulses, not just noise fill
    sig += 0.06 * np.sin(2 * np.pi * 9500 * t)
    sig += 0.03 * np.sin(2 * np.pi * 13700 * t)
    sig *= 1 + 0.3 * np.sin(2 * np.pi * 2.3 * t)
    sig += 0.01 * rng.standard_normal(len(t))
    return np.clip(sig, -1, 1)


def _hybrid_frames(nframes, bitrate=32000, seed=7):
    sig = _speechlike(nframes, seed)
    enc = OpusEncoder(FS, 1, application="voip")
    enc.set_bitrate(bitrate)
    enc.set_force_mode(pkt.Mode.HYBRID)
    enc.set_bandwidth(pkt.Bandwidth.FULLBAND)
    packets = []
    for i in range(nframes):
        p = enc.encode(sig[i * FRAME:(i + 1) * FRAME], FRAME)
        assert pkt.packet_get_mode(p) == pkt.Mode.HYBRID
        packets.append(p)
    return packets


def test_resampler_16_48_bitexact():
    from opus_tpu.silk.resampler import Resampler
    from opus_tpu.silk.resampler_jax import (upsampler_init,
                                             upsample_to_48k)
    rng = np.random.default_rng(0)
    b, nf = 4, 5
    x = np.clip((rng.standard_normal((b, nf, 320)) * 9000), -32768,
                32767).astype(np.int32)
    ref = np.zeros((b, nf, 960), np.int32)
    for i in range(b):
        rs = Resampler(16000, 48000)
        for f in range(nf):
            ref[i, f] = rs.process([int(v) for v in x[i, f]])
    st = upsampler_init(b, 16)
    for f in range(nf):
        out, st = upsample_to_48k(jnp.asarray(x[:, f]), st, 16, 20)
        np.testing.assert_array_equal(np.asarray(out), ref[:, f])


@pytest.mark.skipif(
    not os.environ.get("OPUS_TPU_RUN_HYBRID_FUSED"),
    reason="XLA-CPU compile of the batch hybrid graph exceeds 1 h "
           "(same backend pathology as the 20 ms fused CELT tree, "
           "COMPONENTS.md known-gap 3); the TPU compile is minutes "
           "and cached — set OPUS_TPU_RUN_HYBRID_FUSED=1 on hardware")
def test_hybrid_fused_vs_scalar():
    from opus_tpu.models.hybrid_dec_fused import FusedHybridDecoder

    packets = _hybrid_frames(NFRAMES)
    frames = [pkt.packet_parse(p).frames[0] for p in packets]

    # scalar oracle
    dec = OpusDecoder(FS, 1)
    ref = np.zeros((NFRAMES, FRAME))
    for i, p in enumerate(packets):
        ref[i] = dec.decode(p, FRAME)

    b = 8
    fd = FusedHybridDecoder(b)
    got = np.zeros((NFRAMES, FRAME), np.float32)
    for i, f in enumerate(frames):
        pcm, err = fd.decode([f] * b)
        assert not err.any(), f"frame {i}: error lanes {err.nonzero()}"
        # all lanes identical input -> identical output
        np.testing.assert_array_equal(pcm[0], pcm[-1])
        got[i] = pcm[0]

    err = np.abs(got - ref)
    # SILK low band is integer-exact; CELT float32 vs float64 leaves
    # sub-1e-4 differences in the high band
    assert err.max() < 1e-4, err.max()
    # and the signals must be energetically indistinguishable
    snr = 10 * np.log10(np.sum(ref ** 2)
                        / max(np.sum((got - ref) ** 2), 1e-30))
    assert snr > 80, snr

"""The beam-vectorized jax NSQ as the production quantizer: encoding
with OpusEncoder.set_jax_nsq(True) must produce byte-identical packets
to the scalar delayed-decision quantizer across voiced + unvoiced
SILK-WB content (reference: silk_NSQ_del_dec_c NSQ_del_dec.c:114 and
its AVX2 vectorization as the blueprint)."""

import numpy as np

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.bitstream import packet as pkt


def _speechish(fs, seconds, seed=5):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 110 * (1 + 0.1 * np.sin(2 * np.pi * 1.3 * t))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    sig *= 1 + 0.4 * np.sin(2 * np.pi * 3.1 * t)
    sig += 0.04 * rng.standard_normal(n)
    # an unvoiced stretch
    k = n // 3
    sig[k:k + n // 6] = 0.1 * rng.standard_normal(n // 6)
    return np.clip(sig, -1, 1)


def test_jax_nsq_packets_byte_identical():
    fs = 16000
    sig = _speechish(fs, 1.2)
    n = fs // 50
    packs = {}
    for use_jax in (False, True):
        enc = OpusEncoder(fs, 1, application="voip")
        enc.set_bitrate(24000)
        enc.set_jax_nsq(use_jax)
        out = []
        for i in range(len(sig) // n):
            p = enc.encode(sig[i * n:(i + 1) * n], n)
            assert pkt.packet_get_mode(p) == pkt.Mode.SILK_ONLY
            out.append(p)
        packs[use_jax] = out
    assert len(packs[False]) == len(packs[True])
    for i, (a, b) in enumerate(zip(packs[False], packs[True])):
        assert a == b, f"packet {i} diverged (scalar vs jax NSQ)"

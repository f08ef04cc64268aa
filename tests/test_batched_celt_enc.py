"""Batched CELT encode (TPU DSP + native C symbol pass), end to end.

Gates:
 (a) our scalar decoder decodes the batched streams with final_range
     agreement (entropy-stream round trip),
 (b) reference libopus decodes them with the same final_range,
 (c) quality is comparable to the scalar Python encoder at equal rate.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from opus_tpu.native import celt_enc_symbols
from opus_tpu.celt.decoder import CeltDecoder

pytestmark = pytest.mark.skipif(not celt_enc_symbols.available(),
                                reason="no C compiler")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMO = os.path.join(_REPO, ".ref_build", "opus_demo")
DELAY = 120


def _sig(n, seed=5):
    rs = np.random.RandomState(seed)
    t = np.arange(n)
    s = 0.25 * np.sin(2 * np.pi * 440 * t / 48000) + 0.02 * rs.randn(n)
    for p in range(5000, n, 9000):
        s[p:p + 300] += 0.4 * np.exp(-np.arange(300) / 30.) \
            * np.sign(rs.randn(300))
    return np.clip(s, -0.99, 0.99).astype(np.float32)


def _snr(ref, got):
    n = min(len(ref), len(got))
    err = np.mean((ref[:n] - got[:n]) ** 2)
    return 10 * np.log10(np.mean(ref[:n] ** 2) / (err + 1e-12))


def test_batched_encode_roundtrip_and_quality():
    from opus_tpu.models.batched_celt_enc import BatchedCeltEncoder

    sig = _sig(48000)
    B, N, nbytes = 3, 960, 160
    enc = BatchedCeltEncoder(B, 48000, N, nbytes=nbytes)
    dec = CeltDecoder.create(48000, 1)
    frames = []
    outs = []
    for f in range(len(sig) // N):
        pcm = np.tile(sig[f * N:(f + 1) * N], (B, 1))
        pays, rngs = enc.encode(pcm)
        assert all(p == pays[0] for p in pays), "streams must be identical"
        out = np.zeros(N)
        dec.decode_with_ec(pays[0], out, N, None)
        assert dec.rng == rngs[0], f"frame {f}: final range mismatch"
        frames.append((pays[0], rngs[0]))
        outs.append(out.copy())
    got = np.concatenate(outs)[DELAY:]
    snr = _snr(sig, got)
    assert snr > 12.0, f"SNR too low: {snr:.1f} dB"

    # scalar Python encoder at the same rate, as the quality baseline
    from opus_tpu.celt.encoder import CeltEncoder
    pe = CeltEncoder.create(48000, 1)
    pe.disable_pf = 1
    pe.complexity = 5
    pd = CeltDecoder.create(48000, 1)
    pouts = []
    for f in range(len(sig) // N):
        pe.encode_with_ec(sig[f * N:(f + 1) * N].astype(np.float64), N,
                          nbytes)
        out = np.zeros(N)
        pd.decode_with_ec(bytes(pe._own_enc.buf[:nbytes]), out, N, None)
        pouts.append(out.copy())
    snr_py = _snr(sig, np.concatenate(pouts)[DELAY:])
    assert snr > snr_py - 1.0, \
        f"batched {snr:.1f} dB vs scalar {snr_py:.1f} dB"


@pytest.mark.skipif(not os.path.exists(_DEMO), reason="no reference demo")
def test_batched_encode_reference_decodable(tmp_path):
    from opus_tpu.models.batched_celt_enc import BatchedCeltEncoder

    sig = _sig(48000)
    B, N, nbytes = 2, 960, 120
    enc = BatchedCeltEncoder(B, 48000, N, nbytes=nbytes)
    # CELT-only fullband 20 ms mono: config 31, code 0
    toc = bytes([31 << 3])
    bit = tmp_path / "enc.bit"
    with open(bit, "wb") as f:
        for fr in range(len(sig) // N):
            pays, rngs = enc.encode(
                np.tile(sig[fr * N:(fr + 1) * N], (B, 1)))
            pkt = toc + pays[0]
            # opus_demo format checks the final range per packet
            f.write(struct.pack(">II", len(pkt), int(rngs[0])))
            f.write(pkt)
    out = tmp_path / "dec.pcm"
    r = subprocess.run([_DEMO, "-d", "48000", "1", str(bit), str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    got = np.fromfile(out, "<i2").astype(np.float64) / 32768.0
    snr = _snr(sig[:len(got) - DELAY], got[DELAY:])
    assert snr > 12.0, f"reference-decoded SNR too low: {snr:.1f} dB"

"""CELT encoder tests.

A valid encoder need not match the reference encoder's bits; the contract is:
 (a) our decoder decodes our stream with final_range agreement (bit-exact
     round trip of the entropy stream),
 (b) the REFERENCE decoder accepts our stream with the same final_range
     (cross-implementation validity), and
 (c) quality via the conformance metric is close to the reference encoder's
     at the same rate.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.utils.compare import compare

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMO = os.path.join(_REPO, ".ref_build", "opus_demo")
DELAY = 120  # MDCT overlap delay of the CELT path


def gen(ch, n=24000, seed=7):
    rs = np.random.RandomState(seed)
    t = np.arange(n)
    sig = 0.25 * np.sin(2 * np.pi * 440 * t / 48000) \
        + 0.1 * np.sin(2 * np.pi * 1870 * t / 48000 + .3) \
        + 0.02 * rs.randn(n)
    for p in range(5000, n, 11000):
        sig[p:p + 300] += 0.3 * np.exp(-np.arange(300) / 40.) \
            * np.sign(rs.randn(300))
    if ch == 2:
        s2 = 0.2 * np.sin(2 * np.pi * 880 * t / 48000) + 0.015 * rs.randn(n)
        sig = np.stack([sig, s2], 1).reshape(-1)
    return np.clip(sig, -0.99, 0.99)


def encode_stream(sig, ch, rate, fsz, vbr=True):
    # restricted-lowdelay: no delay compensation / input HP filter, matching
    # the `opus_demo -e restricted-lowdelay` reference stream and DELAY=120
    enc = OpusEncoder(48000, ch, "restricted-lowdelay")
    enc.set_bitrate(rate)
    enc.set_vbr(vbr)
    n = len(sig) // ch
    pkts = []
    for f in range(n // fsz):
        p = enc.encode(sig[f * fsz * ch:(f + 1) * fsz * ch], fsz)
        pkts.append((p, enc.rangeFinal))
    return pkts


@pytest.mark.parametrize("ch,rate,fsz,vbr", [
    (1, 64000, 960, True),
    (1, 96000, 240, True),
    (2, 128000, 960, True),
    (1, 64000, 960, False),
    (2, 96000, 480, True),
    (1, 510000, 960, True),
    (1, 24000, 120, True),
])
def test_encoder_roundtrip_and_reference_decode(tmp_path, ch, rate, fsz, vbr):
    sig = gen(ch)
    pkts = encode_stream(sig, ch, rate, fsz, vbr)
    assert len(pkts) > 0

    # (a) self round trip
    dec = OpusDecoder(48000, ch)
    for i, (p, rng) in enumerate(pkts):
        dec.decode(p)
        assert dec.rangeFinal == rng, f"self range mismatch at pkt {i}"

    # (b) reference decoder agrees
    bit = tmp_path / "e.bit"
    with open(bit, "wb") as fh:
        for p, rng in pkts:
            fh.write(struct.pack(">iI", len(p), rng))
            fh.write(p)
    r = subprocess.run([_DEMO, "-d", "48000", str(ch), str(bit),
                        str(tmp_path / "e.pcm")], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    assert "mismatch" not in r.stderr


def test_encoder_quality_close_to_reference(tmp_path):
    ch, rate, fsz = 1, 96000, 960
    sig = gen(ch, n=48000)
    n = len(sig)
    orig = np.clip(sig * 32768, -32768, 32767).astype(np.int16)

    pkts = encode_stream(sig, ch, rate, fsz)
    bit = tmp_path / "q.bit"
    with open(bit, "wb") as fh:
        for p, rng in pkts:
            fh.write(struct.pack(">iI", len(p), rng))
            fh.write(p)
    subprocess.run([_DEMO, "-d", "48000", "1", str(bit),
                    str(tmp_path / "mine.pcm")], check=True,
                   capture_output=True)

    orig.tofile(tmp_path / "in.pcm")
    subprocess.run([_DEMO, "-e", "restricted-lowdelay", "48000", "1",
                    str(rate), "-framesize", "20", "-complexity", "9",
                    str(tmp_path / "in.pcm"), str(tmp_path / "r.bit")],
                   check=True, capture_output=True)
    subprocess.run([_DEMO, "-d", "48000", "1", str(tmp_path / "r.bit"),
                    str(tmp_path / "ref.pcm")], check=True,
                   capture_output=True)

    def quality(f):
        d = np.fromfile(f, dtype=np.int16)[DELAY:]
        L = min(len(d), n - DELAY)
        _, q = compare(np.repeat(orig[:L], 2), d[:L], 1, 48000)
        return q

    q_mine = quality(tmp_path / "mine.pcm")
    q_ref = quality(tmp_path / "ref.pcm")
    # within 15 quality points of the reference encoder (theta RDO and
    # analysis-driven boosts still to come)
    assert q_mine > q_ref - 15, (q_mine, q_ref)


def test_encoder_vbr_rate_control():
    sig = gen(1, n=48000)
    for rate in (48000, 96000, 192000):
        pkts = encode_stream(sig, 1, rate, 960)
        nbytes = sum(len(p) for p, _ in pkts)
        actual = nbytes * 8 / (len(sig) / 48000)
        assert 0.7 * rate < actual < 1.35 * rate, (rate, actual)

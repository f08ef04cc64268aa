"""Batched packets-in -> PCM-out CELT decode (C symbol pass + TPU DSP)
must match the scalar Python decoder on reference-encoded streams,
including postfilter, transients, silence and stereo."""

import struct
import subprocess
import os

import numpy as np
import pytest

from opus_tpu.utils.soft_clip import float2int16

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stream(tmp_path, ch, rate, bursts=True):
    demo = os.path.join(REPO, ".ref_build", "opus_demo")
    if not os.path.exists(demo):
        pytest.skip("reference build missing")
    fs = 48000
    rng = np.random.default_rng(13)
    t = np.arange(fs * 2) / fs
    sig = 0.3 * np.sin(2 * np.pi * 400 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    if bursts:
        for _ in range(20):
            p0 = int(rng.integers(0, len(t) - 500))
            sig[p0:p0 + 400] += 0.6 * rng.standard_normal(400) * np.hanning(400)
    sig = np.clip(sig, -1, 1)
    if ch == 2:
        st = np.empty(len(sig) * 2)
        st[0::2] = sig
        st[1::2] = np.roll(sig, 5) * 0.7
        sig = st
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e", "restricted-lowdelay", "48000", str(ch),
                    str(rate), str(inp), str(bit)],
                   check=True, capture_output=True)
    data = bit.read_bytes()
    pkts = []
    off = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkts.append(data[off:off + ln])
        off += ln
    from opus_tpu.bitstream import packet as pkt
    return [pkt.packet_parse(p).frames[0] for p in pkts]


@pytest.mark.parametrize("ch,rate", [(1, 64000), (2, 128000), (1, 24000)])
def test_batched_decode_matches_scalar(tmp_path, ch, rate):
    from opus_tpu.native.celt_symbols import available
    if not available():
        pytest.skip("no C compiler")
    from opus_tpu.models.batched_decode import BatchedCeltDecoder
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.bitstream.range_coder import make_range_decoder
    frames = _stream(tmp_path, ch, rate)
    B = 3
    bd = BatchedCeltDecoder(B, ch, 48000, 960)
    c = CeltDecoder.create(48000, ch)
    c.signalling = 0
    c.disable_inv = 1 if ch == 1 else 0
    ntr = 0
    for i, f in enumerate(frames[:50]):
        pcm_b = np.asarray(bd.decode([f] * B))
        ref = np.zeros(960 * ch)
        c.decode_with_ec(f, ref, 960, make_range_decoder(f))
        ntr += bd.sym.outs[0].is_transient
        for cc in range(ch):
            assert np.abs(pcm_b[0, cc] - ref[cc::ch]).max() < 1e-4, i
        # every batch lane decodes identically
        assert np.array_equal(pcm_b[0], pcm_b[B - 1])
    assert ntr > 0 or rate <= 24000  # bursty input must yield transients


def test_batched_decode_silence_frames(tmp_path):
    """Digital-silence CELT frames (all-zero energy path)."""
    from opus_tpu.native.celt_symbols import available
    if not available():
        pytest.skip("no C compiler")
    from opus_tpu.models.batched_decode import BatchedCeltDecoder
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.bitstream.range_coder import make_range_decoder
    demo = os.path.join(REPO, ".ref_build", "opus_demo")
    if not os.path.exists(demo):
        pytest.skip("reference build missing")
    fs = 48000
    sig = np.zeros(fs)
    sig[:fs // 2] = 0.3 * np.sin(2 * np.pi * 400 * np.arange(fs // 2) / fs)
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e", "restricted-lowdelay", "48000", "1",
                    "64000", "-cbr", str(inp), str(bit)],
                   check=True, capture_output=True)
    data = bit.read_bytes()
    pkts = []
    off = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkts.append(data[off:off + ln])
        off += ln
    from opus_tpu.bitstream import packet as pkt
    frames = [pkt.packet_parse(p).frames[0] for p in pkts]
    bd = BatchedCeltDecoder(1, 1, 48000, 960)
    c = CeltDecoder.create(48000, 1)
    c.signalling = 0
    c.disable_inv = 1
    for i, f in enumerate(frames[:48]):
        pcm_b = np.asarray(bd.decode([f]))
        ref = np.zeros(960)
        c.decode_with_ec(f, ref, 960, make_range_decoder(f))
        assert np.abs(pcm_b[0, 0] - ref).max() < 1e-4, i

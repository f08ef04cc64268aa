"""Streams-as-lanes multistream decode
(opus_tpu/models/batched_multistream.py): parity with the scalar
OpusMSDecoder on CELT-only mono-stream layouts, and the packet batch
axis."""

import numpy as np
import pytest

from opus_tpu.models.multistream import OpusMSEncoder, OpusMSDecoder
from opus_tpu.models.batched_multistream import (BatchedMSDecoder,
                                                 split_ms_packet)
from opus_tpu.native import celt_symbols


pytestmark = pytest.mark.skipif(not celt_symbols.available(),
                                reason="native celt symbol pass missing")


def _encode_ms(fs=48000, streams=3, seconds=0.5, seed=4):
    channels = streams
    mapping = list(range(streams))
    enc = OpusMSEncoder(fs, channels, streams, 0, mapping,
                        application="restricted-lowdelay")
    enc.bitrate = 64000 * streams
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    sig = np.stack([0.3 * np.sin(2 * np.pi * (200 + 130 * c) * t)
                    + 0.02 * rng.standard_normal(len(t))
                    for c in range(channels)], axis=1).reshape(-1)
    n = fs // 50
    pkts = [enc.encode(sig[i * n * channels:(i + 1) * n * channels], n)
            for i in range(int(seconds * 50))]
    return pkts, mapping


def test_split_ms_packet():
    pkts, mapping = _encode_ms(streams=2, seconds=0.1)
    frames = split_ms_packet(pkts[0], 2)
    assert len(frames) == 2 and all(len(f) > 0 for f in frames)


def test_batched_matches_scalar_ms():
    streams = 3
    pkts, mapping = _encode_ms(streams=streams)
    ref = OpusMSDecoder(48000, streams, streams, 0, mapping)
    bat = BatchedMSDecoder(48000, streams, streams, mapping=mapping)
    for i, p in enumerate(pkts):
        a = ref.decode(p)
        bvec = bat.decode(p)
        assert a.shape == bvec.shape
        err = np.abs(np.asarray(bvec, np.float64) - a)
        # batched synthesis is float32; scalar is float64
        assert err.max() < 1e-4, f"packet {i}: {err.max()}"


def test_packet_batch_axis():
    streams = 2
    pkts, mapping = _encode_ms(streams=streams, seconds=0.2)
    npk = 4
    bat = BatchedMSDecoder(48000, streams, streams, mapping=mapping,
                           npackets=npk)
    seq = OpusMSDecoder(48000, streams, streams, 0, mapping)
    # decoding P packets as extra lanes must equal sequential decode
    # ONLY when each lane has its own state; here we check the first
    # batch (fresh state on both sides)
    outs = bat.decode(pkts[:npk])
    assert outs.shape[0] == npk
    first = seq.decode(pkts[0])
    assert np.abs(outs[0] - first).max() < 1e-4

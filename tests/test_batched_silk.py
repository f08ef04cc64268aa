"""Batched SILK decode: native C symbol pass + int32-exact TPU synthesis.

Bit-exactness gates against the scalar Python decoder
(opus_tpu/silk/decoder.py), which is itself bit-exact vs reference
libopus (test_silk_decoder.py).  Covers NB/MB/WB internal rates, voiced
and unvoiced material, NLSF-interpolated frames, and multi-frame (40 ms)
packets with conditional coding.
"""

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.bitstream import packet as pkt
from opus_tpu.bitstream.range_coder import RangeDecoder
from opus_tpu.silk.api import SilkDecoder
from opus_tpu.silk import decoder as sdec
from opus_tpu.native import silk_symbols
from opus_tpu.models.batched_silk import BatchedSilkDecoder

pytestmark = pytest.mark.skipif(not silk_symbols.available(),
                                reason="no C compiler")


def _speechish(fs, seconds=1.5, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    sig += 0.2 * np.sin(2 * np.pi * 2 * np.cumsum(f0) / fs)
    sig *= (0.3 + 0.7 * (np.sin(2 * np.pi * 1.5 * t) > 0))
    sig += 0.02 * rng.standard_normal(len(t))
    return np.clip(sig, -1, 1)


def _encode(fs, frame_ms=20, bitrate=24000, seconds=1.5):
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(bitrate)
    sig = _speechish(fs, seconds)
    n = fs * frame_ms // 1000
    payloads = []
    for i in range(len(sig) // n):
        p = enc.encode(sig[i * n:(i + 1) * n], n)
        assert pkt.packet_get_mode(p) == pkt.Mode.SILK_ONLY
        payloads.append(pkt.packet_parse(p).frames[0])
    return payloads


def _scalar_frames(payloads, fs_hz, payload_ms):
    """Scalar-decoder per-frame synthesis output (pre-resampler),
    driving silk_Decode the way the Opus layer does
    (opus_tpu/models/opus_decoder.py:341)."""
    xq = []
    orig = sdec.ChannelState.decode_frame

    def cap(self, dec, xq_out, lost, cond):
        r = orig(self, dec, xq_out, lost, cond)
        xq.append(np.asarray(xq_out, np.int16))
        return r

    sdec.ChannelState.decode_frame = cap
    try:
        sd = SilkDecoder()
        for p in payloads:
            dec = RangeDecoder(p)
            for f in range(payload_ms // 20):
                sd.decode(dec, n_channels_api=1, n_channels_internal=1,
                          api_sample_rate=fs_hz, internal_sample_rate=fs_hz,
                          payload_size_ms=payload_ms,
                          lost_flag=0, new_packet_flag=(f == 0))
    finally:
        sdec.ChannelState.decode_frame = orig
    return xq


@pytest.mark.parametrize("fs_khz", [8, 12, 16])
def test_batched_silk_bit_exact(fs_khz):
    fs = fs_khz * 1000
    payloads = _encode(fs)
    ref = _scalar_frames(payloads, fs, 20)
    bd = BatchedSilkDecoder(3, fs_khz=fs_khz)
    for i, p in enumerate(payloads):
        out = bd.decode([p] * 3)
        for s in range(3):
            assert np.array_equal(out[s], ref[i]), \
                f"fs={fs_khz}k frame {i} stream {s}"


def test_batched_silk_40ms_packets():
    """40 ms packets: two frames per packet, the second coded
    conditionally (delta gains, pitch-lag deltas)."""
    fs = 16000
    payloads = _encode(fs, frame_ms=40, seconds=2.0)
    ref = _scalar_frames(payloads, fs, 40)
    bd = BatchedSilkDecoder(2, fs_khz=16, frames_per_packet=2)
    for i, p in enumerate(payloads):
        out = bd.decode([p] * 2)
        want = np.concatenate([ref[2 * i], ref[2 * i + 1]])
        for s in range(2):
            assert np.array_equal(out[s], want), f"packet {i} stream {s}"


def test_batched_silk_independent_streams():
    """Streams with different content stay independent."""
    fs = 16000
    pay_a = _encode(fs, seconds=1.0, bitrate=24000)
    pay_b = _encode(fs, seconds=1.0, bitrate=12000)
    n = min(len(pay_a), len(pay_b))
    ref_a = _scalar_frames(pay_a[:n], fs, 20)
    ref_b = _scalar_frames(pay_b[:n], fs, 20)
    bd = BatchedSilkDecoder(2, fs_khz=16)
    for i in range(n):
        out = bd.decode([pay_a[i], pay_b[i]])
        assert np.array_equal(out[0], ref_a[i]), f"frame {i} stream a"
        assert np.array_equal(out[1], ref_b[i]), f"frame {i} stream b"

"""Fused on-device SILK decoder (opus_tpu/models/fused_silk_dec.py):
bit-exactness vs the scalar Python decoder, with no error-lane fallbacks
on ordinary speech streams."""

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.bitstream import packet as pkt
from opus_tpu.bitstream.range_coder import RangeDecoder
from opus_tpu.silk.api import SilkDecoder
from opus_tpu.silk import decoder as sdec


def _speechish(fs, seconds=1.5, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    sig += 0.2 * np.sin(2 * np.pi * 2 * np.cumsum(f0) / fs)
    sig *= (0.3 + 0.7 * (np.sin(2 * np.pi * 1.5 * t) > 0))
    sig += 0.02 * rng.standard_normal(len(t))
    return np.clip(sig, -1, 1)


def _encode(fs, bitrate=24000, seconds=1.5, fec=False):
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(bitrate)
    if fec:
        enc.set_inband_fec(True)
        enc.set_packet_loss_perc(20)
    sig = _speechish(fs, seconds)
    n = fs // 50
    payloads = []
    for i in range(len(sig) // n):
        p = enc.encode(sig[i * n:(i + 1) * n], n)
        assert pkt.packet_get_mode(p) == pkt.Mode.SILK_ONLY
        payloads.append(pkt.packet_parse(p).frames[0])
    return payloads


def _scalar_frames(payloads, fs_hz):
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
            sd.decode(RangeDecoder(p), n_channels_api=1,
                      n_channels_internal=1, api_sample_rate=fs_hz,
                      internal_sample_rate=fs_hz, payload_size_ms=20,
                      lost_flag=0, new_packet_flag=True)
    finally:
        sdec.ChannelState.decode_frame = orig
    return xq


@pytest.mark.parametrize("fs_khz", [16, 8, 12])
def test_fused_silk_bit_exact(fs_khz):
    from opus_tpu.models.fused_silk_dec import FusedSilkDecoder

    fs = fs_khz * 1000
    payloads = _encode(fs, bitrate={16: 24000, 12: 16000,
                                    8: 12000}[fs_khz])
    ref = _scalar_frames(payloads, fs)
    fd = FusedSilkDecoder(2, fs_khz=fs_khz)
    for i, p in enumerate(payloads):
        pcm, err = fd.decode([p] * 2)
        assert not err.any(), f"frame {i}: unexpected error-lane fallback"
        for s in range(2):
            assert np.array_equal(pcm[s], ref[i]), \
                f"fs={fs_khz}k frame {i} stream {s}"


def test_fused_silk_lbrr_parse_through():
    """Streams with in-band FEC (LBRR): the fused decoder parses the
    LBRR frame to advance the range decoder (dec_API.c:258-283) and the
    regular frame still decodes bit-exactly."""
    from opus_tpu.models.fused_silk_dec import FusedSilkDecoder

    payloads = _encode(16000, fec=True, seconds=1.0)
    ref = _scalar_frames(payloads, 16000)
    fd = FusedSilkDecoder(1, fs_khz=16)
    any_lbrr = any(len(p) > 0 and (p[0] & 0x40) for p in payloads)
    for k, p in enumerate(payloads):
        xq, err = fd.decode([p])
        assert not err[0], f"packet {k}: unexpected error lane"
        assert np.array_equal(xq[0], ref[k]), f"packet {k}: PCM mismatch"
    assert any_lbrr, "expected at least one LBRR packet in the stream"


def test_fused_silk_10ms_frames():
    """nb_subfr=2 (10 ms) packets decode bit-exact too."""
    from opus_tpu.models.fused_silk_dec import FusedSilkDecoder

    fs = 16000
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(24000)
    sig = _speechish(fs, 1.0)
    n = fs // 100
    payloads = []
    for i in range(len(sig) // n):
        p = enc.encode(sig[i * n:(i + 1) * n], n)
        assert pkt.packet_get_mode(p) == pkt.Mode.SILK_ONLY
        payloads.append(pkt.packet_parse(p).frames[0])

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
            sd.decode(RangeDecoder(p), n_channels_api=1,
                      n_channels_internal=1, api_sample_rate=fs,
                      internal_sample_rate=fs, payload_size_ms=10,
                      lost_flag=0, new_packet_flag=True)
    finally:
        sdec.ChannelState.decode_frame = orig

    fd = FusedSilkDecoder(1, fs_khz=16, nb_subfr=2)
    for i, p in enumerate(payloads):
        pcm, err = fd.decode([p])
        assert not err[0], f"frame {i}"
        assert np.array_equal(pcm[0], xq[i]), f"frame {i}"

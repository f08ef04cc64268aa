"""Systematic ctl surface (opus_tpu/models/ctl.py): the reference
request-code contract over our encoder/decoder, including the decoder
gain path and reset semantics."""

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.models import ctl as C


def test_encoder_set_get_roundtrip():
    enc = OpusEncoder(48000, 2, application="audio")
    pairs = [
        (C.OPUS_SET_BITRATE, C.OPUS_GET_BITRATE, 64000),
        (C.OPUS_SET_COMPLEXITY, C.OPUS_GET_COMPLEXITY, 5),
        (C.OPUS_SET_VBR, C.OPUS_GET_VBR, 0),
        (C.OPUS_SET_VBR_CONSTRAINT, C.OPUS_GET_VBR_CONSTRAINT, 0),
        (C.OPUS_SET_INBAND_FEC, C.OPUS_GET_INBAND_FEC, 1),
        (C.OPUS_SET_PACKET_LOSS_PERC, C.OPUS_GET_PACKET_LOSS_PERC, 30),
        (C.OPUS_SET_DTX, C.OPUS_GET_DTX, 1),
        (C.OPUS_SET_FORCE_CHANNELS, C.OPUS_GET_FORCE_CHANNELS, 1),
        (C.OPUS_SET_SIGNAL, C.OPUS_GET_SIGNAL, C.OPUS_SIGNAL_VOICE),
        (C.OPUS_SET_LSB_DEPTH, C.OPUS_GET_LSB_DEPTH, 20),
        (C.OPUS_SET_MAX_BANDWIDTH, C.OPUS_GET_MAX_BANDWIDTH,
         C.OPUS_BANDWIDTH_WIDEBAND),
        (C.OPUS_SET_APPLICATION, C.OPUS_GET_APPLICATION,
         C.OPUS_APPLICATION_VOIP),
    ]
    for set_req, get_req, val in pairs:
        C.encoder_ctl(enc, set_req, val)
        assert C.encoder_ctl(enc, get_req) == val, set_req


def test_encoder_bad_args_rejected():
    enc = OpusEncoder(48000, 1)
    for req, bad in [
        (C.OPUS_SET_COMPLEXITY, 11),
        (C.OPUS_SET_COMPLEXITY, -1),
        (C.OPUS_SET_PACKET_LOSS_PERC, 101),
        (C.OPUS_SET_VBR, 2),
        (C.OPUS_SET_SIGNAL, 1234),
        (C.OPUS_SET_LSB_DEPTH, 7),
        (C.OPUS_SET_LSB_DEPTH, 25),
        (C.OPUS_SET_MAX_BANDWIDTH, 42),
        (C.OPUS_SET_FORCE_CHANNELS, 2),  # mono encoder
        (C.OPUS_SET_APPLICATION, 9999),
    ]:
        with pytest.raises(ValueError):
            C.encoder_ctl(enc, req, bad)
    with pytest.raises(NotImplementedError):
        C.encoder_ctl(enc, 5999)


def test_encoder_getters_and_reset():
    enc = OpusEncoder(48000, 1, application="voip")
    C.encoder_ctl(enc, C.OPUS_SET_BITRATE, 24000)
    assert C.encoder_ctl(enc, C.OPUS_GET_SAMPLE_RATE) == 48000
    look = C.encoder_ctl(enc, C.OPUS_GET_LOOKAHEAD)
    assert look == 48000 // 400 + enc.delay_compensation
    enc.encode(np.zeros(960), 960)
    assert isinstance(C.encoder_ctl(enc, C.OPUS_GET_FINAL_RANGE), int)
    C.encoder_ctl(enc, C.OPUS_RESET_STATE)
    # user settings survive reset (reference resets only runtime state)
    assert C.encoder_ctl(enc, C.OPUS_GET_BITRATE) == 24000
    assert enc.prev_mode == 0


def test_decoder_gain_applied():
    fs = 48000
    enc = OpusEncoder(fs, 1, application="audio")
    enc.set_bitrate(64000)
    t = np.arange(960 * 4) / fs
    sig = 0.25 * np.sin(2 * np.pi * 440 * t)
    pkts = [enc.encode(sig[i * 960:(i + 1) * 960], 960)
            for i in range(4)]
    d0 = OpusDecoder(fs, 1)
    d6 = OpusDecoder(fs, 1)
    C.decoder_ctl(d6, C.OPUS_SET_GAIN, 256 * 6)     # +6 dB in Q8 dB
    for p in pkts:
        a = d0.decode(p)
        bvec = d6.decode(p)
    ratio = np.linalg.norm(bvec) / (np.linalg.norm(a) + 1e-12)
    assert abs(ratio - 10 ** (6 / 20)) < 0.02
    assert C.decoder_ctl(d6, C.OPUS_GET_GAIN) == 256 * 6
    # gain survives reset like the reference (fields before
    # OPUS_DECODER_RESET_START)
    C.decoder_ctl(d6, C.OPUS_RESET_STATE)
    assert C.decoder_ctl(d6, C.OPUS_GET_GAIN) == 256 * 6
    with pytest.raises(ValueError):
        C.decoder_ctl(d6, C.OPUS_SET_GAIN, 40000)


def test_decoder_getters():
    fs = 48000
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(24000)
    t = np.arange(960 * 6) / fs
    f0 = 150 * (1 + 0.05 * np.sin(2 * np.pi * 2 * t))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    dec = OpusDecoder(fs, 1)
    for i in range(6):
        dec.decode(enc.encode(sig[i * 960:(i + 1) * 960], 960))
    assert C.decoder_ctl(dec, C.OPUS_GET_SAMPLE_RATE) == fs
    assert C.decoder_ctl(dec, C.OPUS_GET_LAST_PACKET_DURATION) == 960
    assert C.decoder_ctl(dec, C.OPUS_GET_BANDWIDTH) in (
        C.OPUS_BANDWIDTH_NARROWBAND, C.OPUS_BANDWIDTH_MEDIUMBAND,
        C.OPUS_BANDWIDTH_WIDEBAND, C.OPUS_BANDWIDTH_SUPERWIDEBAND,
        C.OPUS_BANDWIDTH_FULLBAND)
    pitch = C.decoder_ctl(dec, C.OPUS_GET_PITCH)
    assert pitch > 0, "voiced stream should report a pitch lag"
    rng = C.decoder_ctl(dec, C.OPUS_GET_FINAL_RANGE)
    assert rng == dec.rangeFinal != 0


def test_multistream_ctl_forwarding():
    from opus_tpu.models.multistream import OpusMSEncoder, OpusMSDecoder
    ms = OpusMSEncoder(48000, 2, 2, 0, [0, 1], application="audio")
    C.multistream_encoder_ctl(ms, C.OPUS_SET_COMPLEXITY, 4)
    assert all(e.complexity == 4 for e in ms.encoders)
    sub = C.multistream_encoder_ctl(
        ms, C.OPUS_MULTISTREAM_GET_ENCODER_STATE, 1)
    assert sub is ms.encoders[1]
    msd = OpusMSDecoder(48000, 2, 2, 0, [0, 1])
    C.multistream_decoder_ctl(msd, C.OPUS_SET_GAIN, 128)
    assert all(d.decode_gain == 128 for d in msd.decoders)
    assert C.multistream_decoder_ctl(
        msd, C.OPUS_MULTISTREAM_GET_DECODER_STATE, 0) is msd.decoders[0]

"""Robustness tier: API argument contract, garbage/bit-flip decode fuzz
with final-range consistency, and an exhaustive settings-transition
driver (our analogue of the reference's test_opus_api.c,
test_opus_decode.c:638 fuzz, and the de Bruijn driver in
test_opus_common.h)."""

import itertools

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.bitstream import packet as pkt


# --------------------------------------------------------------------- #
# API argument contract (reference: tests/test_opus_api.c)              #
# --------------------------------------------------------------------- #

def test_decoder_create_rejects_bad_args():
    for fs in (0, -1, 12345, 96001, 192000):
        with pytest.raises((ValueError, KeyError, AssertionError)):
            OpusDecoder(fs, 1)
    for ch in (0, -1, 3):
        with pytest.raises((ValueError, AssertionError)):
            OpusDecoder(48000, ch)


def test_encoder_create_rejects_bad_args():
    for fs in (0, -1, 12345):
        with pytest.raises((ValueError, KeyError, AssertionError)):
            OpusEncoder(fs, 1)
    for ch in (0, -1, 3):
        with pytest.raises((ValueError, AssertionError)):
            OpusEncoder(48000, ch)
    with pytest.raises((ValueError, KeyError, AssertionError)):
        OpusEncoder(48000, 1, application="bogus")


def test_encode_rejects_bad_frame_sizes():
    enc = OpusEncoder(48000, 1)
    for n in (0, 1, 100, 961, 7000):
        with pytest.raises((ValueError, AssertionError)):
            enc.encode(np.zeros(max(n, 1)), n)


def test_decode_empty_and_none():
    dec = OpusDecoder(48000, 1)
    # PLC with no prior packet: zeros of the default duration
    out = dec.decode(None, 960)
    assert len(out) == 960 and not np.any(out)
    # len==0 is loss concealment, same as data=None (src/opus_decoder.c
    # treats len<=0/data==NULL as PLC)
    out = dec.decode(b"", 960)
    assert len(out) == 960 and not np.any(out)


def test_packet_parse_contract():
    # invalid code-3 packets return OPUS_INVALID_PACKET-style error codes
    # (reference: opus_packet_parse contract, src/opus.c:205-299)
    for bad in (bytes([0x03]),        # code 3 with no count
                bytes([0x03, 0x00]),  # M = 0
                bytes([0x03, 120]),   # > 120 ms total
                bytes([0x02, 255])):  # truncated VBR length
        r = pkt.packet_parse(bad)
        assert isinstance(r, int) and r < 0, bad.hex()
    # valid minimal packets
    assert pkt.packet_parse(bytes([0x00])).count == 1
    p = pkt.packet_parse(bytes([0x01, 0xAA, 0xBB]))
    assert p.count == 2 and p.frames[0] == b"\xaa"


# --------------------------------------------------------------------- #
# garbage + bit-flip decode fuzz (reference: test_opus_decode.c:638)    #
# --------------------------------------------------------------------- #

def test_garbage_packet_fuzz():
    """Random TOC + random payload: never crash, output sane."""
    rng = np.random.default_rng(1234)
    dec = OpusDecoder(48000, 1)
    for trial in range(120):
        toc = int(rng.integers(0, 256))
        n = int(rng.integers(0, 60))
        data = bytes([toc]) + rng.bytes(n)
        try:
            out = dec.decode(data)
        except ValueError:
            continue          # a rejected packet is a valid outcome
        assert np.all(np.isfinite(out))
        # the int16 API must saturate cleanly (the reference fuzz decodes
        # through the saturating int16 path and only requires no crash)
        assert np.max(np.abs(out)) < 1e6
        # duration must match the TOC
        want = pkt.packet_get_nb_samples(data, 48000)
        assert len(out) == want


def test_bitflip_fuzz_with_final_range():
    """Flip one bit per packet of a valid stream: decode must never
    crash; unflipped packets keep encoder/decoder final-range agreement
    (the OPUS_GET_FINAL_RANGE oracle)."""
    rng = np.random.default_rng(77)
    enc = OpusEncoder(48000, 1, application="restricted-lowdelay")
    enc.set_bitrate(48000)
    t = np.arange(48000) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 440 * t)
                  + 0.05 * rng.standard_normal(len(t)), -1, 1)
    dec = OpusDecoder(48000, 1)
    for f in range(50):
        p = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        data = bytearray(p)
        if f % 2 == 1 and len(data) > 1:
            # flip a payload bit (never the TOC: mode changes are legal
            # but equivalence below assumes the config is unchanged)
            bit = int(rng.integers(8, len(data) * 8))
            data[bit // 8] ^= 1 << (bit & 7)
            try:
                out = dec.decode(bytes(data))
                assert np.all(np.isfinite(out))
            except ValueError:
                pass
        else:
            out = dec.decode(bytes(data))
            assert dec.rangeFinal == enc.rangeFinal, f"frame {f}"


def test_mode_transition_sweep():
    """Drive the encoder through every consecutive pair of configs (a
    de Bruijn-style transition cover) and require encoder/decoder
    final-range agreement on every packet."""
    configs = [
        dict(bitrate=8000, fs=8000),
        dict(bitrate=16000, fs=16000),
        dict(bitrate=24000, fs=16000),
        dict(bitrate=32000, fs=48000),
        dict(bitrate=64000, fs=48000),
        dict(bitrate=128000, fs=48000),
    ]
    # sequence covering all ordered pairs (n^2 transitions)
    order = [a for a, b in itertools.product(range(len(configs)),
                                             repeat=2)] + [0]
    rng = np.random.default_rng(3)
    enc = OpusEncoder(48000, 1, application="audio")
    dec = OpusDecoder(48000, 1)
    t = np.arange(960) / 48000.0
    nbad = 0
    for step, ci in enumerate(order):
        cfg = configs[ci]
        enc.set_bitrate(cfg["bitrate"])
        sig = np.clip(0.3 * np.sin(2 * np.pi * (200 + 37 * step) * t)
                      + 0.02 * rng.standard_normal(960), -1, 1)
        p = enc.encode(sig, 960)
        out = dec.decode(p)
        assert np.all(np.isfinite(out))
        assert len(out) == pkt.packet_get_nb_samples(p, 48000)
        if dec.rangeFinal != enc.rangeFinal:
            nbad += 1
    assert nbad == 0, f"{nbad}/{len(order)} transition packets diverged"


def test_plc_then_recovery_after_transitions():
    """Losses interleaved with mode changes must stay finite and keep
    decoding after recovery."""
    rng = np.random.default_rng(9)
    enc = OpusEncoder(48000, 1, application="voip")
    dec = OpusDecoder(48000, 1)
    t = np.arange(960) / 48000.0
    for step in range(40):
        enc.set_bitrate(int(rng.choice([12000, 24000, 64000])))
        sig = np.clip(0.3 * np.sin(2 * np.pi * 300 * t)
                      + 0.02 * rng.standard_normal(960), -1, 1)
        p = enc.encode(sig, 960)
        if step % 5 == 3:
            out = dec.decode(None, 960)       # loss
        else:
            out = dec.decode(p)
        assert np.all(np.isfinite(out))


def test_forced_mode_and_framesize_transitions():
    """Forced SILK->CELT->hybrid mode flips interleaved with frame-size
    changes: every packet must decode finite with encoder/decoder
    final-range agreement (the transition-redundancy + prefill paths)."""
    from opus_tpu.models.opus_encoder import (MODE_SILK_ONLY,
                                              MODE_CELT_ONLY, MODE_HYBRID)
    fs = 48000
    rng = np.random.default_rng(21)
    enc = OpusEncoder(fs, 1, application="audio")
    enc.set_bitrate(64000)
    dec = OpusDecoder(fs, 1)
    plan = [
        (MODE_SILK_ONLY, 960), (MODE_SILK_ONLY, 480),
        (MODE_CELT_ONLY, 480), (MODE_CELT_ONLY, 120),
        (MODE_CELT_ONLY, 960), (MODE_HYBRID, 960),
        (MODE_SILK_ONLY, 960), (MODE_HYBRID, 480),
        (MODE_CELT_ONLY, 240), (MODE_SILK_ONLY, 960),
        (None, 960), (None, 480),   # back to auto
    ]
    nbad = 0
    for step, (mode, frame) in enumerate(plan * 3):
        enc.set_force_mode(mode)
        t = np.arange(frame) / fs
        sig = np.clip(0.3 * np.sin(2 * np.pi * (250 + 31 * step) * t)
                      + 0.02 * rng.standard_normal(frame), -1, 1)
        p = enc.encode(sig, frame)
        out = dec.decode(p)
        assert np.all(np.isfinite(out)), step
        assert len(out) == pkt.packet_get_nb_samples(p, fs), step
        nbad += dec.rangeFinal != enc.rangeFinal
    assert nbad == 0, f"{nbad} final-range mismatches"

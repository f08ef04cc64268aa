"""Opus Custom tests (reference: tests/test_opus_custom.c: round trips
at odd Fs/frame sizes)."""

import numpy as np
import pytest

from opus_tpu.models.opus_custom import (OpusCustomMode,
                                         OpusCustomEncoder,
                                         OpusCustomDecoder)


def _tone(fs, frames, frame_size, ch, seed=0):
    rng = np.random.default_rng(seed)
    n = frames * frame_size
    t = np.arange(n) / fs
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) \
        + 0.01 * rng.standard_normal(n)
    if ch == 2:
        sig = np.stack([sig, np.roll(sig, 7)], 1).reshape(-1)
    return np.clip(sig, -1, 1)


@pytest.mark.parametrize("fs,frame,ch", [
    (48000, 960, 1),       # the standard mode, Opus-compatible header
    (44100, 240, 1),       # odd rate
    (32000, 640, 2),       # stereo custom
    (16000, 320, 1),
])
def test_custom_roundtrip(fs, frame, ch):
    mode = OpusCustomMode(fs, frame)
    enc = OpusCustomEncoder(mode, ch)
    enc.set_bitrate(96000 * ch)
    dec = OpusCustomDecoder(mode, ch)
    pcm = _tone(fs, 8, frame, ch)
    outs = []
    for i in range(8):
        p = enc.encode(pcm[i * frame * ch:(i + 1) * frame * ch], frame)
        assert 2 <= len(p) <= 1275
        outs.append(dec.decode(p, frame))
    out = np.concatenate(outs)
    # steady-state energy must be preserved within codec loss
    a = pcm[frame * ch * 2:]
    b = out[frame * ch * 2:]
    ea, eb = float(np.sum(a * a)), float(np.sum(b * b))
    assert 0.3 * ea < eb < 3 * ea, (ea, eb)


def test_custom_plc_and_errors():
    mode = OpusCustomMode(44100, 240)
    enc = OpusCustomEncoder(mode, 1)
    dec = OpusCustomDecoder(mode, 1)
    pcm = _tone(44100, 2, 240, 1)
    p = enc.encode(pcm[:240], 240)
    dec.decode(p, 240)
    out = dec.decode(None, 240)    # PLC
    assert out.shape == (240,) and np.isfinite(out).all()
    with pytest.raises(ValueError):
        OpusCustomMode(44100, 41)  # odd frame size
    with pytest.raises(ValueError):
        OpusCustomMode(200000, 960)


def test_custom_bad_mode_rejected():
    # shorts longer than 3.3 ms are unsupported (modes.c:298)
    with pytest.raises(ValueError):
        OpusCustomMode(44100, 882)


def test_custom_ref_parity():
    """Our custom packets must decode identically in the reference
    opus_custom decoder."""
    import ctypes, os
    lib_path = os.path.join(os.path.dirname(__file__), os.pardir,
                            ".ref_build", "libopus_full.so")
    if not os.path.exists(lib_path):
        pytest.skip("reference libopus not built")
    lib = ctypes.CDLL(lib_path)
    lib.opus_custom_mode_create.restype = ctypes.c_void_p
    lib.opus_custom_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    fs, frame = 44100, 240
    rmode = lib.opus_custom_mode_create(fs, frame, ctypes.byref(err))
    assert err.value == 0
    rdec = lib.opus_custom_decoder_create(ctypes.c_void_p(rmode), 1,
                                          ctypes.byref(err))
    assert err.value == 0
    mode = OpusCustomMode(fs, frame)
    enc = OpusCustomEncoder(mode, 1)
    enc.set_bitrate(96000)
    dec = OpusCustomDecoder(mode, 1)
    pcm = _tone(fs, 6, frame, 1)
    from opus_tpu.utils.soft_clip import float2int16
    for i in range(6):
        p = enc.encode(pcm[i * frame:(i + 1) * frame], frame)
        ours = float2int16(dec.decode(p, frame))
        buf = (ctypes.c_int16 * frame)()
        n = lib.opus_custom_decode(ctypes.c_void_p(rdec), p, len(p),
                                   buf, frame)
        assert n == frame, f"frame {i}: reference returned {n}"
        ref = np.asarray(buf[:], dtype=np.int64)
        assert np.abs(ours.astype(np.int64) - ref).max() <= 1, \
            f"frame {i}: custom parity failure"

"""Encode-kernel symbol pass (opus_tpu/models/celt_enc_kernel.py),
unrolled CPU twin: the SAME _symbol_pass the Pallas kernel traces,
driven eagerly on [B] lanes via tests/np_shim, validated the same three
ways as the fused encoder:

  1. our scalar CELT decoder consumes every stream and lands on the
     encoder's exact final range,
  2. reference libopus (when built) decodes the TOC-wrapped packets
     with the same final range,
  3. decoded quality within 1 dB of the fused XLA encoder's on the
     same signal (the kernel twin differs only in the atan2 polynomial
     and f32 tie handling).

The compiled Pallas path is exercised on TPU by
test_celt_enc_kernel_tpu.py (OPUS_TPU_RUN_ENC_KERNEL gate).
Reference: celt_encode_with_ec celt/celt_encoder.c:1726."""

import ctypes
import os

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB = os.path.join(_REPO, ".ref_build", "libopus_full.so")

B = 4
N = 960
FS = 48000
NFRAMES = 5
NBYTES = 110


def _signals(seed=13, nframes=NFRAMES):
    rng = np.random.default_rng(seed)
    t = np.arange(N * nframes) / FS
    sigs = []
    for b in range(B):
        f0 = 220 + 140 * b
        s = 0.3 * np.sin(2 * np.pi * f0 * t) \
            * (1 + 0.3 * np.sin(2 * np.pi * (2 + b) * t))
        s += 0.05 * np.sin(2 * np.pi * (1600 + 180 * b) * t + .3)
        for _ in range(2):
            p0 = int(rng.integers(0, len(t) - 500))
            s[p0:p0 + 400] += 0.4 * rng.standard_normal(400) \
                * np.hanning(400)
        sigs.append(np.clip(s, -1, 1).astype(np.float32))
    return np.stack(sigs)


def _kernel_twin_encode(sigs, nframes=NFRAMES):
    from tests.np_shim import install, uninstall
    import opus_tpu.models.celt_enc_kernel as EK
    import opus_tpu.models.celt_enc_fused as EF
    import opus_tpu.ops.rc_enc_kernel as RCE

    mods = install(extra_modules=[EK, EF, RCE])
    try:
        tabs = EK.ETabs(FS, N)
        state = EF.fused_celt_enc_init(B, tabs.enc)
        frames = []
        for f in range(nframes):
            payload, rngv, err, state = EK.unrolled_encode_frame(
                sigs[:, f * N:(f + 1) * N], state, tabs, NBYTES)
            assert not np.any(np.asarray(err)), f
            frames.append((np.asarray(payload, np.uint8),
                           np.asarray(rngv, np.uint64)))
    finally:
        uninstall(mods)
    return frames


def test_enc_kernel_streams_decode_bit_exact():
    from opus_tpu.celt.decoder import CeltDecoder

    sigs = _signals()
    frames = _kernel_twin_encode(sigs)
    for b in range(B):
        dec = CeltDecoder.create(FS, 1)
        for f in range(NFRAMES):
            pay, rngv = frames[f]
            pcm_out = np.zeros(N)
            ret = dec.decode_with_ec(bytes(pay[b].tobytes()), pcm_out,
                                     N, None)
            assert ret == N, (b, f)
            assert (int(dec.rng) & 0xFFFFFFFF) \
                == (int(rngv[b]) & 0xFFFFFFFF), (b, f)


def test_enc_kernel_quality_matches_fused():
    from opus_tpu.celt.decoder import CeltDecoder
    from tests.test_celt_enc_fused_np import _fused_encode, _best_snr

    sigs = _signals(seed=11, nframes=8)
    kframes = _kernel_twin_encode(sigs, nframes=8)
    fframes = _fused_encode(sigs[:, :8 * N], NBYTES, nframes=8)

    def _snr(frames):
        dec = CeltDecoder.create(FS, 1)
        out = []
        for f in range(8):
            pcm = np.zeros(N)
            dec.decode_with_ec(bytes(frames[f][0][0].tobytes()), pcm,
                               N, None)
            out.append(pcm.copy())
        return _best_snr(sigs[0].astype(np.float64),
                         np.concatenate(out))

    ksnr = _snr(kframes)
    fsnr = _snr(fframes)
    assert ksnr > fsnr - 1.0, (ksnr, fsnr)


@pytest.mark.skipif(not os.path.exists(_LIB),
                    reason="reference libopus not built")
def test_enc_kernel_reference_libopus_parity():
    lib = ctypes.CDLL(_LIB)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decode.restype = ctypes.c_int
    lib.opus_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int, ctypes.c_void_p,
                                ctypes.c_int, ctypes.c_int]
    lib.opus_decoder_ctl.restype = ctypes.c_int
    lib.opus_decoder_ctl.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_decoder_destroy.restype = None

    sigs = _signals()
    frames = _kernel_twin_encode(sigs)
    toc = bytes([(31 << 3)])          # CELT-only FB 20 ms mono code 0
    for b in range(B):
        err = ctypes.c_int(0)
        dec = lib.opus_decoder_create(FS, 1, ctypes.byref(err))
        assert err.value == 0
        for f in range(NFRAMES):
            pay, rngv = frames[f]
            p = toc + bytes(pay[b].tobytes())
            out = np.zeros(N, np.int16)
            r = lib.opus_decode(dec, p, len(p),
                                out.ctypes.data_as(ctypes.c_void_p),
                                N, 0)
            assert r == N, (b, f, r)
            fr = ctypes.c_uint(0)
            lib.opus_decoder_ctl(dec, 4031, ctypes.byref(fr))
            assert fr.value == (int(rngv[b]) & 0xFFFFFFFF), (b, f)
        lib.opus_decoder_destroy(dec)

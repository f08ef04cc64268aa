"""Fused CELT encoder (opus_tpu/models/celt_enc_fused.py), numpy twin:
the full symbol-encode pass runs eagerly via tests/np_shim and the
produced packets are validated three ways:

  1. our scalar CELT decoder consumes every stream and lands on the
     encoder's exact final range (the final_range oracle,
     reference include/opus_defines.h:157),
  2. reference libopus (when built) decodes the TOC-wrapped packets
     and reports the same final range,
  3. decoded quality matches the float64 scalar encoder's on the same
     signal (within 1 dB SNR).

Compiled-path coverage at 2.5 ms lives in test_celt_enc_fused.py.
"""

import ctypes
import os

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB = os.path.join(_REPO, ".ref_build", "libopus_full.so")

B = 6
N = 960
FS = 48000
NFRAMES = 8


def _signals(seed=11, nframes=NFRAMES):
    rng = np.random.default_rng(seed)
    t = np.arange(N * nframes) / FS
    sigs = []
    for b in range(B):
        f0 = 200 + 150 * b
        s = 0.3 * np.sin(2 * np.pi * f0 * t) \
            * (1 + 0.3 * np.sin(2 * np.pi * (2 + b) * t))
        s += 0.05 * np.sin(2 * np.pi * (1500 + 200 * b) * t + .3)
        for _ in range(3):
            p0 = int(rng.integers(0, len(t) - 500))
            s[p0:p0 + 400] += 0.4 * rng.standard_normal(400) \
                * np.hanning(400)
        sigs.append(np.clip(s, -1, 1).astype(np.float32))
    return np.stack(sigs)


def _fused_encode(sigs, nbytes, nframes=NFRAMES):
    from tests.np_shim import install, uninstall
    import opus_tpu.models.celt_enc_fused as E

    mods = install(extra_modules=[E])
    try:
        tabs = E.EncTabs(FS, N)
        state = E.fused_celt_enc_init(sigs.shape[0], tabs)
        frames = []
        for f in range(nframes):
            payload, rngv, err, state, dbg = E.fused_celt_encode_frame(
                sigs[:, f * N:(f + 1) * N], state, tabs, nbytes)
            assert not np.any(np.asarray(err))
            frames.append((np.asarray(payload, np.uint8),
                           np.asarray(rngv, np.uint64)))
    finally:
        uninstall(mods)
    return frames


def _best_snr(ref, out):
    best = -99.0
    for sh in range(0, 400):
        m = min(len(ref) - sh, len(out) - sh)
        a, o = ref[:len(out) - sh], out[sh:]
        m = min(len(a), len(o))
        if m < 2 * N:
            continue
        err2 = np.mean((a[N:m] - o[N:m]) ** 2)
        sref = np.mean(a[N:m] ** 2)
        best = max(best, 10 * np.log10(sref / (err2 + 1e-12)))
    return best


@pytest.mark.parametrize("nbytes", [60, 110, 160])
def test_fused_encode_streams_decode_bit_exact(nbytes):
    from opus_tpu.celt.decoder import CeltDecoder

    sigs = _signals()
    frames = _fused_encode(sigs, nbytes)
    for b in range(B):
        dec = CeltDecoder.create(FS, 1)
        for f in range(NFRAMES):
            pay, rngv = frames[f]
            pcm_out = np.zeros(N)
            ret = dec.decode_with_ec(bytes(pay[b].tobytes()), pcm_out,
                                     N, None)
            assert ret == N
            assert (int(dec.rng) & 0xFFFFFFFF) \
                == (int(rngv[b]) & 0xFFFFFFFF), (b, f)


def test_fused_encode_quality_matches_scalar():
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.celt.encoder import CeltEncoder

    nbytes = 110
    sigs = _signals()
    frames = _fused_encode(sigs, nbytes)

    # fused quality, lane 0
    dec = CeltDecoder.create(FS, 1)
    out = []
    for f in range(NFRAMES):
        pcm_out = np.zeros(N)
        dec.decode_with_ec(bytes(frames[f][0][0].tobytes()), pcm_out,
                           N, None)
        out.append(pcm_out.copy())
    fused_snr = _best_snr(sigs[0].astype(np.float64),
                          np.concatenate(out))

    # float64 scalar encoder on the same signal / config
    enc = CeltEncoder.create(FS, 1)
    enc.disable_pf = 1
    enc.complexity = 5
    dec2 = CeltDecoder.create(FS, 1)
    out2 = []
    for f in range(NFRAMES):
        nb = enc.encode_with_ec(
            sigs[0, f * N:(f + 1) * N].astype(np.float64), N, nbytes)
        pay = bytes(enc._own_enc.buf[:nb])
        pcm_out = np.zeros(N)
        dec2.decode_with_ec(pay, pcm_out, N, None)
        out2.append(pcm_out.copy())
    scalar_snr = _best_snr(sigs[0].astype(np.float64),
                           np.concatenate(out2))
    assert fused_snr > scalar_snr - 1.0, (fused_snr, scalar_snr)

    # opus_compare psychoacoustic gate: the fused encoder must track
    # the scalar encoder on the conformance metric (band-energy
    # weighted, transient-sensitive), not just broadband SNR
    # (utils/compare.py ports tests/opus_compare.c)
    from opus_tpu.utils.compare import compare

    ref64 = sigs[0].astype(np.float64)

    def _q(sig):
        # align out the codec delay (compare assumes time alignment)
        best, best_sh = -1e9, 0
        for sh in range(0, 400):
            m = min(len(ref64), len(sig) - sh)
            if m < 2 * N:
                continue
            err2 = np.mean((ref64[N:m] - sig[sh:sh + m][N:m]) ** 2)
            s = 10 * np.log10(np.mean(ref64[N:m] ** 2) / (err2 + 1e-12))
            if s > best:
                best, best_sh = s, sh
        m = min(len(ref64), len(sig) - best_sh)
        ref16 = np.clip(np.round(ref64[:m] * 32768.0), -32768, 32767)
        ref_st = np.repeat(ref16, 2).astype(np.int16)
        t16 = np.clip(np.round(sig[best_sh:best_sh + m] * 32768.0),
                      -32768, 32767).astype(np.int16)
        _, qv = compare(ref_st, t16, channels=1, rate=48000)
        return qv

    q_fused = _q(np.concatenate(out))
    q_scalar = _q(np.concatenate(out2))
    # Q is rate- and length-sensitive (the >= 0 conformance bar applies
    # to the full high-rate vectors); the DRIFT gate is the instrument:
    # the fused encoder's float32 decisions must not lose psychoacoustic
    # ground against the float64 scalar encoder on transient material
    assert q_fused >= q_scalar - 2.0, (q_fused, q_scalar)


@pytest.mark.skipif(not os.path.exists(_LIB),
                    reason="reference libopus not built")
def test_fused_encode_reference_libopus_parity():
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
    frames = _fused_encode(sigs, 110)
    toc = bytes([(31 << 3)])        # CELT-only FB 20 ms, mono, code 0
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
            # OPUS_GET_FINAL_RANGE_REQUEST == 4031
            lib.opus_decoder_ctl(dec, 4031, ctypes.byref(fr))
            assert fr.value == (int(rngv[b]) & 0xFFFFFFFF), (b, f)
        lib.opus_decoder_destroy(dec)

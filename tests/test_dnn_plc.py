"""Deep PLC tests (reference: dnn/lpcnet_plc.c).

Contract: with identical random weights, our PLC state machine
(feature analysis catch-up, PLC-net prediction, FEC override, FARGAN
synthesis, cepstral attenuation) produces the same concealment
waveform as the reference within autoregressive float drift."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.dnn import plc as plcmod
from opus_tpu.dnn import pitchdnn as pdnn
from opus_tpu.dnn import fargan as fg
from opus_tpu.dnn.weights import write_blob

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libdnn_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="dnn oracle not built")

I16P = ctypes.POINTER(ctypes.c_int16)
F32P = ctypes.POINTER(ctypes.c_float)


def _models():
    return (plcmod.random_model(seed=21), pdnn.random_model(seed=22),
            fg.random_model(seed=23))


def _blob():
    p, d, f = _models()
    return write_blob(plcmod.model_to_arrays(p)
                      + pdnn.model_to_arrays(d)
                      + fg.model_to_arrays(f)), (p, d, f)


def _speech(n, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    phase = np.cumsum(110 * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))) \
        / 16000.0
    sig = (np.sin(2 * np.pi * phase) + 0.5 * np.sin(4 * np.pi * phase)) \
        * 6000 + 100 * rng.standard_normal(n)
    return np.clip(sig, -32767, 32767).astype(np.int16)


def test_plc_conceal_parity():
    blob, (p, d, f) = _blob()
    lib = ctypes.CDLL(_LIB)
    lib.plc_oracle_create.restype = ctypes.c_void_p
    h = lib.plc_oracle_create(blob, len(blob))
    assert h, "oracle rejected combined blob"
    ours = plcmod.LPCNetPLC(p, d, f)
    pcm = _speech(160 * 8)
    for i in range(8):
        x = pcm[i * 160:(i + 1) * 160].copy()
        lib.plc_oracle_update(ctypes.c_void_p(h),
                              x.ctypes.data_as(I16P))
        ours.update(x)
    for k in range(3):
        ref = np.zeros(160, np.int16)
        lib.plc_oracle_conceal(ctypes.c_void_p(h),
                               ref.ctypes.data_as(I16P))
        got = np.zeros(160, np.int16)
        ours.conceal(got)
        err = np.sqrt(np.mean((got.astype(np.float64) - ref) ** 2))
        scale = max(1.0, np.sqrt(np.mean(ref.astype(np.float64) ** 2)))
        assert err / scale < 2e-2, \
            f"conceal frame {k}: rel rms err {err / scale}"


def test_plc_fec_takes_precedence():
    blob, (p, d, f) = _blob()
    lib = ctypes.CDLL(_LIB)
    lib.plc_oracle_create.restype = ctypes.c_void_p
    h = lib.plc_oracle_create(blob, len(blob))
    ours = plcmod.LPCNetPLC(p, d, f)
    pcm = _speech(160 * 6, seed=12)
    for i in range(6):
        x = pcm[i * 160:(i + 1) * 160].copy()
        lib.plc_oracle_update(ctypes.c_void_p(h),
                              x.ctypes.data_as(I16P))
        ours.update(x)
    rng = np.random.default_rng(13)
    for _ in range(4):
        feats = (0.2 * rng.standard_normal(20)).astype(np.float32)
        lib.plc_oracle_fec_add(ctypes.c_void_p(h),
                               feats.ctypes.data_as(F32P))
        ours.fec_add(feats)
    for k in range(2):
        ref = np.zeros(160, np.int16)
        lib.plc_oracle_conceal(ctypes.c_void_p(h),
                               ref.ctypes.data_as(I16P))
        got = np.zeros(160, np.int16)
        ours.conceal(got)
        err = np.sqrt(np.mean((got.astype(np.float64) - ref) ** 2))
        scale = max(1.0, np.sqrt(np.mean(ref.astype(np.float64) ** 2)))
        assert err / scale < 2e-2, f"fec conceal {k}"


def test_plc_long_loss_attenuates():
    p, d, f = _models()
    ours = plcmod.LPCNetPLC(p, d, f)
    pcm = _speech(160 * 6, seed=14)
    for i in range(6):
        ours.update(pcm[i * 160:(i + 1) * 160])
    out = np.zeros(160, np.int16)
    c0 = []
    for k in range(25):
        ours.conceal(out)
        c0.append(float(ours.features[0]))
    # after 10+ lost frames the cepstral c0 attenuation ramps at
    # -2/frame until the -15 floor (reference: lpcnet_plc.c:196-198);
    # with random weights the un-attenuated prediction is roughly
    # stationary, so c0 must drop far below its early values
    assert ours.loss_count == 25
    assert c0[-1] <= -15.0 + 1e-6 or c0[-1] < min(c0[:5]) - 10

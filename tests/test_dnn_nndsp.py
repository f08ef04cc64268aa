"""Adaptive NN-DSP parity tests (reference: dnn/nndsp.c).

Contract: adaconv/adacomb/adashape match the reference C sample by
sample with identical random layer weights, across multiple streaming
frames (cross-fade, history and last-kernel state all exercised)."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.dnn import nndsp
from opus_tpu.dnn import nnet as nn
from opus_tpu.dnn.weights import write_blob, WeightArray, \
    WEIGHT_TYPE_FLOAT

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libdnn_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="dnn oracle not built")

F32P = ctypes.POINTER(ctypes.c_float)
FEATURE_DIM = 64        # small cond dim keeps the test fast
FRAME, OVERLAP = 80, 40
KSIZE = 16
GA, GB = 0.690776, 0.0
LOG_GAIN_LIMIT = -0.690776


def _fp(a):
    return a.ctypes.data_as(F32P)


def _lin(rng, m, n, bias=True):
    w = (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
    b = (rng.standard_normal(n) * 0.1).astype(np.float32) if bias \
        else None
    return nn.np_linear(w, b)


def _make(seed, in_ch, out_ch):
    rng = np.random.default_rng(seed)
    kernel = _lin(rng, FEATURE_DIM, in_ch * out_ch * KSIZE)
    gain = _lin(rng, FEATURE_DIM, out_ch)
    ggain = _lin(rng, FEATURE_DIM, 1)
    a1f = _lin(rng, 2 * FEATURE_DIM, FRAME)
    a1t = _lin(rng, 2 * 21, FRAME)
    a2 = _lin(rng, 2 * FRAME, FRAME)
    arrays = []
    for name, lay in (("kernel", kernel), ("gain", gain),
                      ("ggain", ggain), ("alpha1f", a1f),
                      ("alpha1t", a1t), ("alpha2", a2)):
        arrays.append(WeightArray(f"{name}_weights_float",
                                  WEIGHT_TYPE_FLOAT,
                                  np.asarray(lay.w).reshape(-1)))
        arrays.append(WeightArray(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                                  np.asarray(lay.bias)))
    blob = write_blob(arrays)
    lib = ctypes.CDLL(_LIB)
    lib.nndsp_oracle_create.restype = ctypes.c_void_p
    h = lib.nndsp_oracle_create(blob, len(blob), FEATURE_DIM,
                                in_ch * out_ch * KSIZE, out_ch, OVERLAP,
                                FRAME, FRAME // 4)
    assert h
    # the C LinearLayers point into the blob -- keep it alive
    _BLOB_KEEPALIVE.append(blob)
    return lib, h, dict(kernel=kernel, gain=gain, ggain=ggain,
                        alpha1f=a1f, alpha1t=a1t, alpha2=a2)


_BLOB_KEEPALIVE: list = []


@pytest.mark.parametrize("in_ch,out_ch", [(1, 1), (1, 2), (2, 2),
                                          (2, 1)])
def test_adaconv_parity(in_ch, out_ch):
    lib, h, L = _make(100 + in_ch * 10 + out_ch, in_ch, out_ch)
    rng = np.random.default_rng(1)
    window = nndsp.compute_overlap_window(OVERLAP)
    state = nndsp.adaconv_init(in_ch, out_ch, KSIZE)
    for fidx in range(4):
        x = (rng.standard_normal(in_ch * FRAME) * 0.5) \
            .astype(np.float32)
        feats = (rng.standard_normal(FEATURE_DIM) * 0.5) \
            .astype(np.float32)
        ref = np.zeros(out_ch * FRAME, np.float32)
        lib.nndsp_oracle_adaconv(ctypes.c_void_p(h), _fp(ref), _fp(x),
                                 _fp(feats), FEATURE_DIM, FRAME,
                                 OVERLAP, in_ch, out_ch, KSIZE,
                                 ctypes.c_float(GA), ctypes.c_float(GB))
        state, got = nndsp.adaconv_process_frame(
            state, x, feats, L["kernel"], L["gain"], FRAME, OVERLAP,
            in_ch, out_ch, KSIZE, KSIZE - 1, GA, GB, window)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"frame {fidx}")


def test_adacomb_parity():
    lib, h, L = _make(7, 1, 1)
    rng = np.random.default_rng(2)
    window = nndsp.compute_overlap_window(OVERLAP)
    state = nndsp.adacomb_init(KSIZE)
    for fidx, lag in enumerate((120, 120, 90, 240)):
        x = (rng.standard_normal(FRAME) * 0.5).astype(np.float32)
        feats = (rng.standard_normal(FEATURE_DIM) * 0.5) \
            .astype(np.float32)
        ref = np.zeros(FRAME, np.float32)
        lib.nndsp_oracle_adacomb(ctypes.c_void_p(h), _fp(ref), _fp(x),
                                 _fp(feats), lag, FEATURE_DIM, FRAME,
                                 OVERLAP, KSIZE, 8, ctypes.c_float(GA),
                                 ctypes.c_float(GB),
                                 ctypes.c_float(LOG_GAIN_LIMIT))
        state, got = nndsp.adacomb_process_frame(
            state, x, feats, L["kernel"], L["gain"], L["ggain"], lag,
            FRAME, OVERLAP, KSIZE, 8, GA, GB, LOG_GAIN_LIMIT, window)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"frame {fidx}")


def test_adashape_parity():
    lib, h, L = _make(8, 1, 1)
    rng = np.random.default_rng(3)
    state = nndsp.adashape_init(FEATURE_DIM, FRAME, 4)
    for fidx in range(4):
        x = (rng.standard_normal(FRAME) * 0.5).astype(np.float32)
        feats = (rng.standard_normal(FEATURE_DIM) * 0.5) \
            .astype(np.float32)
        ref = np.zeros(FRAME, np.float32)
        lib.nndsp_oracle_adashape(ctypes.c_void_p(h), _fp(ref), _fp(x),
                                  _fp(feats), FEATURE_DIM, FRAME, 4)
        state, got = nndsp.adashape_process_frame(
            state, x, feats, L["alpha1f"], L["alpha1t"], L["alpha2"],
            FRAME, 4)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"frame {fidx}")

"""OSCE LACE/NoLACE parity tests (reference: dnn/osce.c).

Contract: with identical random weights, our LACE and NoLACE
process-20ms-frame match the reference C (compiled with stand-in
dimension headers derived from the in-tree training code) within
float drift, across streaming frames."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.dnn import osce
from opus_tpu.dnn.weights import write_blob

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libosce_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="osce oracle not built")

F32P = ctypes.POINTER(ctypes.c_float)
I32P = ctypes.POINTER(ctypes.c_int32)
_KEEP: list = []


def _fp(a):
    return a.ctypes.data_as(F32P)


def _inputs(rng):
    x = (rng.standard_normal(320) * 0.3).astype(np.float32)
    feats = (rng.standard_normal((4, osce.NUM_FEATURES)) * 0.5) \
        .astype(np.float32)
    numbits = np.array([rng.uniform(60, 600),
                        rng.uniform(60, 600)], np.float32)
    periods = rng.integers(32, 258, 4).astype(np.int32)
    return x, feats, numbits, periods


def test_lace_parity():
    model = osce.random_lace_model(seed=50)
    blob = write_blob(osce.lace_model_to_arrays(model))
    _KEEP.append(blob)
    lib = ctypes.CDLL(_LIB)
    lib.lace_oracle_create.restype = ctypes.c_void_p
    h = lib.lace_oracle_create(blob, len(blob))
    assert h, "oracle rejected LACE blob"
    state = osce.lace_init_state()
    rng = np.random.default_rng(51)
    for fidx in range(3):
        x, feats, numbits, periods = _inputs(rng)
        ref = np.zeros(320, np.float32)
        lib.lace_oracle_process(ctypes.c_void_p(h), _fp(ref), _fp(x),
                                _fp(feats.reshape(-1).copy()),
                                _fp(numbits),
                                periods.ctypes.data_as(I32P))
        state, got = osce.lace_process_frame(model, state, x, feats,
                                             numbits, periods)
        np.testing.assert_allclose(got, ref, rtol=6e-3, atol=1e-4,
                                   err_msg=f"frame {fidx}")


def test_nolace_parity():
    model = osce.random_nolace_model(seed=60)
    blob = write_blob(osce.nolace_model_to_arrays(model))
    _KEEP.append(blob)
    lib = ctypes.CDLL(_LIB)
    lib.nolace_oracle_create.restype = ctypes.c_void_p
    h = lib.nolace_oracle_create(blob, len(blob))
    assert h, "oracle rejected NoLACE blob"
    state = osce.nolace_init_state()
    rng = np.random.default_rng(61)
    for fidx in range(3):
        x, feats, numbits, periods = _inputs(rng)
        ref = np.zeros(320, np.float32)
        lib.nolace_oracle_process(ctypes.c_void_p(h), _fp(ref), _fp(x),
                                  _fp(feats.reshape(-1).copy()),
                                  _fp(numbits),
                                  periods.ctypes.data_as(I32P))
        state, got = osce.nolace_process_frame(model, state, x, feats,
                                               numbits, periods)
        np.testing.assert_allclose(got, ref, rtol=6e-3, atol=1e-4,
                                   err_msg=f"frame {fidx}")

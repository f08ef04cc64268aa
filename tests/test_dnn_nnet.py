"""DNN layer runtime parity tests vs the reference C implementation
(reference: dnn/nnet.c, dnn/nnet_arch.h, dnn/parse_lpcnet_weights.c,
dnn/test_vec.c is the reference's own kernel self-test model).

Contract: with identical float32 weights, every layer op in
opus_tpu.dnn.nnet matches compute_generic_* from the reference within
float-reassociation tolerance; the weight-blob writer/parser round-trips
byte streams that the reference parse_weights accepts."""

import ctypes
import os

import numpy as np
import pytest

import opus_tpu.dnn.nnet as nn
from opus_tpu.dnn import weights as wt

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libnnet_oracle.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="nnet oracle not built")

F32P = ctypes.POINTER(ctypes.c_float)


class CLinearLayer(ctypes.Structure):
    # (reference: LinearLayer dnn/nnet.h:66)
    _fields_ = [("bias", F32P), ("subias", F32P),
                ("weights", ctypes.POINTER(ctypes.c_int8)),
                ("float_weights", F32P),
                ("weights_idx", ctypes.POINTER(ctypes.c_int)),
                ("diag", F32P), ("scale", F32P),
                ("nb_inputs", ctypes.c_int), ("nb_outputs", ctypes.c_int)]


class CConv2dLayer(ctypes.Structure):
    # (reference: Conv2dLayer dnn/nnet.h:79)
    _fields_ = [("bias", F32P), ("float_weights", F32P),
                ("in_channels", ctypes.c_int),
                ("out_channels", ctypes.c_int),
                ("ktime", ctypes.c_int), ("kheight", ctypes.c_int)]


def _lib():
    return ctypes.CDLL(_LIB)


def _fp(a):
    return a.ctypes.data_as(F32P)


def _mk_linear(rng, m, n, bias=True, diag=False):
    """Returns (CLinearLayer, keepalive, nn.Linear) with float weights.
    The C layout is column-major flat [j*N + i]; ours is [M, N]."""
    w = (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32) if bias else None
    d = rng.standard_normal(n).astype(np.float32) if diag else None
    cw = np.ascontiguousarray(w)          # [M, N] row-major == col-major NxM
    lay = CLinearLayer()
    lay.float_weights = _fp(cw)
    lay.bias = _fp(b) if bias else None
    lay.diag = _fp(d) if diag else None
    lay.nb_inputs, lay.nb_outputs = m, n
    keep = (cw, b, d)
    return lay, keep, nn.np_linear(w, b, d)


ACTS = [nn.ACTIVATION_LINEAR, nn.ACTIVATION_SIGMOID, nn.ACTIVATION_TANH,
        nn.ACTIVATION_RELU, nn.ACTIVATION_SOFTMAX, nn.ACTIVATION_SWISH,
        nn.ACTIVATION_EXP]


@pytest.mark.parametrize("act", ACTS)
def test_activation_parity(act):
    lib = _lib()
    rng = np.random.default_rng(act)
    x = (rng.standard_normal(257) * 4).astype(np.float32)
    out = np.empty_like(x)
    lib.compute_activation_c(_fp(out), _fp(x), len(x), act)
    ours = np.asarray(nn.compute_activation(x, act))
    np.testing.assert_allclose(ours, out, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("m,n", [(16, 32), (24, 24), (10, 7), (128, 96)])
def test_dense_parity(m, n):
    lib = _lib()
    rng = np.random.default_rng(m * 100 + n)
    lay, _keep, ours = _mk_linear(rng, m, n)
    x = rng.standard_normal(m).astype(np.float32)
    out = np.zeros(n, np.float32)
    lib.compute_generic_dense(ctypes.byref(lay), _fp(out), _fp(x),
                              nn.ACTIVATION_TANH, 0)
    got = np.asarray(nn.dense(ours, x, nn.ACTIVATION_TANH))
    np.testing.assert_allclose(got, out, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,diag", [(32, False), (64, True), (24, False)])
def test_gru_parity(n, diag):
    lib = _lib()
    rng = np.random.default_rng(n + diag)
    m = 20
    in_lay, _k1, in_ours = _mk_linear(rng, m, 3 * n)
    rec_lay, _k2, rec_ours = _mk_linear(rng, n, 3 * n, diag=diag)
    state_c = np.zeros(n, np.float32)
    state_j = np.zeros(n, np.float32)
    for step in range(5):
        x = rng.standard_normal(m).astype(np.float32)
        lib.compute_generic_gru(ctypes.byref(in_lay),
                                ctypes.byref(rec_lay),
                                _fp(state_c), _fp(x), 0)
        state_j = np.asarray(nn.gru(in_ours, rec_ours, state_j, x))
        np.testing.assert_allclose(state_j, state_c, rtol=1e-4,
                                   atol=1e-5, err_msg=f"step {step}")


@pytest.mark.parametrize("ksize,input_size,n", [(2, 16, 24), (3, 10, 32)])
def test_conv1d_parity(ksize, input_size, n):
    lib = _lib()
    rng = np.random.default_rng(ksize * 7 + n)
    m = ksize * input_size
    lay, _keep, ours = _mk_linear(rng, m, n)
    mem_c = np.zeros(m - input_size, np.float32)
    mem_j = np.zeros(m - input_size, np.float32)
    for step in range(4):
        x = rng.standard_normal(input_size).astype(np.float32)
        out_c = np.zeros(n, np.float32)
        lib.compute_generic_conv1d(ctypes.byref(lay), _fp(out_c),
                                   _fp(mem_c), _fp(x), input_size,
                                   nn.ACTIVATION_TANH, 0)
        out_j, mem_j = nn.conv1d(ours, mem_j, x, nn.ACTIVATION_TANH)
        np.testing.assert_allclose(np.asarray(out_j), out_c, rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(mem_j), mem_c, atol=0)


@pytest.mark.parametrize("dilation", [1, 2, 3])
def test_conv1d_dilation_parity(dilation):
    lib = _lib()
    rng = np.random.default_rng(dilation)
    ksize, input_size, n = 3, 8, 16
    m = ksize * input_size
    lay, _keep, ours = _mk_linear(rng, m, n)
    mem_c = np.zeros(input_size * dilation * (ksize - 1), np.float32)
    mem_j = mem_c.copy()
    for step in range(2 * dilation + 3):
        x = rng.standard_normal(input_size).astype(np.float32)
        out_c = np.zeros(n, np.float32)
        lib.compute_generic_conv1d_dilation(
            ctypes.byref(lay), _fp(out_c), _fp(mem_c), _fp(x),
            input_size, dilation, nn.ACTIVATION_RELU, 0)
        out_j, mem_j = nn.conv1d_dilated(ours, mem_j, x, dilation,
                                         nn.ACTIVATION_RELU)
        np.testing.assert_allclose(np.asarray(out_j), out_c, rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {step}")


def test_glu_parity():
    lib = _lib()
    rng = np.random.default_rng(9)
    n = 32
    lay, _keep, ours = _mk_linear(rng, n, n, bias=False)
    x = rng.standard_normal(n).astype(np.float32)
    out_c = np.zeros(n, np.float32)
    lib.compute_glu(ctypes.byref(lay), _fp(out_c), _fp(x), 0)
    got = np.asarray(nn.glu(ours, x))
    np.testing.assert_allclose(got, out_c, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ktime,kheight", [(3, 3), (2, 2), (1, 3)])
def test_conv2d_parity(ktime, kheight):
    lib = _lib()
    rng = np.random.default_rng(ktime * 10 + kheight)
    in_ch, out_ch, height = 3, 4, 10
    w = (rng.standard_normal((out_ch, in_ch, ktime, kheight)) / 3) \
        .astype(np.float32)
    b = rng.standard_normal(out_ch).astype(np.float32)
    lay = CConv2dLayer()
    cw = np.ascontiguousarray(w)
    lay.float_weights = _fp(cw)
    lay.bias = _fp(b)
    lay.in_channels, lay.out_channels = in_ch, out_ch
    lay.ktime, lay.kheight = ktime, kheight
    ours = nn.Conv2d(np.asarray(w), np.asarray(b))
    wpad = height + kheight - 1
    mem_c = np.zeros((ktime - 1) * in_ch * wpad, np.float32)
    mem_j = np.zeros((max(ktime - 1, 0), in_ch, wpad), np.float32)
    for step in range(3):
        x = rng.standard_normal((in_ch, wpad)).astype(np.float32)
        xc = np.ascontiguousarray(x.reshape(-1))
        out_c = np.zeros(out_ch * height, np.float32)
        lib.compute_conv2d_c(ctypes.byref(lay), _fp(out_c), _fp(mem_c),
                             _fp(xc), height, height,
                             nn.ACTIVATION_TANH)
        out_j, mem_j = nn.conv2d(ours, mem_j, x, height,
                                 nn.ACTIVATION_TANH)
        np.testing.assert_allclose(
            np.asarray(out_j).reshape(-1), out_c, rtol=1e-5, atol=1e-6,
            err_msg=f"step {step}")


def test_blob_roundtrip_vs_reference():
    """Our write_blob must be parseable by the C parse_weights and by
    our parse_blob, yielding identical arrays."""
    lib = _lib()
    rng = np.random.default_rng(4)
    arrays = [
        wt.WeightArray("dense_bias", wt.WEIGHT_TYPE_FLOAT,
                       rng.standard_normal(24).astype(np.float32)),
        wt.WeightArray("some_idx", wt.WEIGHT_TYPE_INT,
                       np.arange(10, dtype=np.int32)),
        wt.WeightArray("q_weights", wt.WEIGHT_TYPE_QWEIGHT,
                       rng.integers(-127, 127, 96).astype(np.int8)),
    ]
    blob = wt.write_blob(arrays)

    class CWeightArray(ctypes.Structure):
        _fields_ = [("name", ctypes.c_char_p), ("type", ctypes.c_int),
                    ("size", ctypes.c_int), ("data", ctypes.c_void_p)]

    listp = ctypes.POINTER(CWeightArray)()
    lib.parse_weights.restype = ctypes.c_int
    n = lib.parse_weights(ctypes.byref(listp), blob, len(blob))
    assert n == len(arrays)
    ours = wt.parse_blob(blob)
    for i, a in enumerate(arrays):
        c = listp[i]
        assert c.name.decode() == a.name
        assert c.type == a.type
        raw = ctypes.string_at(c.data, c.size)
        assert raw == a.data.tobytes()
        np.testing.assert_array_equal(ours[a.name].data, a.data)
    # malformed stream must raise (C returns -1)
    with pytest.raises(ValueError):
        wt.parse_blob(blob[:-7])
    bad = bytearray(blob)
    bad[0] = 0x58
    with pytest.raises(ValueError):
        wt.parse_blob(bytes(bad))


def test_int8_dequant_matches_cgemv():
    """Dequantized dense float weights approximate the C int8 kernel
    (quantization noise bounded, not bit-exact by design)."""
    lib = _lib()
    rng = np.random.default_rng(11)
    m, n = 32, 16      # cols multiple of 4, rows multiple of 8
    w8 = rng.integers(-127, 127, (n, m)).astype(np.int8)
    scale = (np.abs(rng.standard_normal(n)) / 300).astype(np.float32)
    blocked = w8.reshape(n // 8, 8, m // 4, 4).transpose(0, 2, 1, 3) \
        .reshape(-1).copy()
    lay = CLinearLayer()
    lay.weights = blocked.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    lay.scale = _fp(scale)
    lay.nb_inputs, lay.nb_outputs = m, n
    x = (rng.standard_normal(m) * 0.3).astype(np.float32)
    out_c = np.zeros(n, np.float32)
    lib.compute_generic_dense(ctypes.byref(lay), _fp(out_c), _fp(x),
                              nn.ACTIVATION_LINEAR, 0)
    arrays = {
        "w": wt.WeightArray("w", wt.WEIGHT_TYPE_QWEIGHT, blocked),
        "s": wt.WeightArray("s", wt.WEIGHT_TYPE_FLOAT, scale),
    }
    lin = wt.linear_params(arrays, weights="w", scale="s",
                           nb_inputs=m, nb_outputs=n)
    # C quantizes the input to round(127*x) (cgemv8x4 dnn/vec.h:288);
    # with the same quantized input our dequantized matrix is exact
    xq = np.floor(0.5 + 127 * x).astype(np.float32) / 127.0
    got_q = np.asarray(nn.linear(lin, xq))
    np.testing.assert_allclose(got_q, out_c, rtol=1e-5, atol=1e-6)
    # with the raw float input, only input-quantization noise remains
    got = np.asarray(nn.linear(lin, x))
    bound = np.abs(lin.w).sum(0).max() * (0.5 / 127)
    assert np.abs(got - out_c).max() <= bound
    # and the deblocking itself must be exact
    np.testing.assert_array_equal(
        wt.deblock_dense(blocked, n, m), w8.astype(np.float32))


def test_sparse_float_dequant_exact():
    """Sparse float 8x4 blocks expand to a dense matrix the C
    sparse_sgemv8x4 agrees with exactly (same values, summed)."""
    lib = _lib()
    rng = np.random.default_rng(12)
    m, n = 24, 16
    # build a sparse pattern: per 8-row block, pick some 4-col positions
    idx_stream, blocks = [], []
    dense = np.zeros((n, m), np.float32)
    for i in range(0, n, 8):
        positions = [0, 8, 16] if i == 0 else [4, 20]
        idx_stream.append(len(positions))
        for pos in positions:
            idx_stream.append(pos)
            blk = rng.standard_normal((8, 4)).astype(np.float32)
            # float sparse blocks are column-major w[c*8+r]
            # (sparse_sgemv8x4 dnn/vec.h:124)
            blocks.append(blk.T.reshape(-1).copy())
            dense[i:i + 8, pos:pos + 4] = blk
    idx = np.asarray(idx_stream, np.int32)
    w = np.concatenate(blocks)
    lay = CLinearLayer()
    lay.float_weights = _fp(w)
    lay.weights_idx = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    lay.nb_inputs, lay.nb_outputs = m, n
    x = rng.standard_normal(m).astype(np.float32)
    out_c = np.zeros(n, np.float32)
    lib.compute_generic_dense(ctypes.byref(lay), _fp(out_c), _fp(x),
                              nn.ACTIVATION_LINEAR, 0)
    got = wt.deblock_sparse(w, idx, n, m, col_major_blocks=True) @ x
    np.testing.assert_allclose(got, out_c, rtol=1e-5, atol=1e-6)


def test_batched_layers_match_loop():
    """All layer ops broadcast over a leading batch dim (the TPU path
    runs thousands of streams batched)."""
    rng = np.random.default_rng(13)
    m, n, b = 12, 18, 5
    _lay, _keep, lin = _mk_linear(rng, m, n)
    xs = rng.standard_normal((b, m)).astype(np.float32)
    batch = np.asarray(nn.dense(lin, xs, nn.ACTIVATION_SWISH))
    for i in range(b):
        one = np.asarray(nn.dense(lin, xs[i], nn.ACTIVATION_SWISH))
        np.testing.assert_allclose(batch[i], one, rtol=1e-6, atol=1e-7)

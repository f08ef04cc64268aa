"""OSCE speech enhancement models: LACE and NoLACE (reference:
dnn/osce.c; architecture from dnn/torch/osce/models/lace.py and
no_lace.py with the quantized-export kernel padding of
dnn/torch/weight-exchange/wexchange/torch/torch.py:64-75).

Both enhance the 16 kHz SILK decoder output per 20 ms frame (4 x 80
subframes) conditioned on 47 features/subframe + pitch embedding +
numbits embedding.  LACE: feature net -> 2 adaptive comb stages ->
adaptive conv.  NoLACE adds feature transforms between stages and a
2-channel shape-mix pipeline (3 TDShaper + 4 adaptive convs)."""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from . import nndsp
from . import nnet as nn
from .weights import linear_params, WeightArray, WEIGHT_TYPE_FLOAT

# Deployed model hyperparameters (dnn/torch/osce/utils/templates.py
# lace_setup / nolace_setup): 93 features, pitch_max 300, hidden 96,
# LACE cond 128, NoLACE cond 256, comb gain limit +10 dB, conv gain
# limits +-12 dB, global comb gains +-6 dB.
NUM_FEATURES = 93
PITCH_MAX = 300
PITCH_EMBEDDING_DIM = 64
NUMBITS_EMBEDDING_DIM = 8
LACE_COND_DIM = 128
NOLACE_COND_DIM = 256
HIDDEN_FEATURE_DIM = 96
FRAME_SIZE = 80          # 5 ms subframe at 16 kHz
OVERLAP_SIZE = 40
KERNEL_SIZE = 16         # 15 padded to 16 by the quantized export
COMB_LEFT_PADDING = 8    # 15//2 + 1 padding
CONV_LEFT_PADDING = KERNEL_SIZE - 1
PREEMPH = 0.85
_DB = 0.11512925464970229
COMB_GAIN_A = 6 * _DB            # global comb gain +-6 dB
COMB_GAIN_B = 0.0
CONV_GAIN_A = 12 * _DB           # adaptive conv gains +-12 dB
CONV_GAIN_B = 0.0
LOG_GAIN_LIMIT = 10 * _DB        # comb per-tap gain limit +10 dB
NUMBITS_RANGE = (50.0, 650.0)
TDSHAPE_AVG_POOL_K = 4
_FNET_IN = NUM_FEATURES + PITCH_EMBEDDING_DIM \
    + 2 * NUMBITS_EMBEDDING_DIM                       # 173


def numbits_embedding(numbits: float,
                      scales: np.ndarray) -> np.ndarray:
    """ScaleEmbedding (reference: compute_lace_numbits_embedding
    dnn/osce.c:122; scales are trained parameters exported as header
    constants)."""
    lo, hi = math.log(NUMBITS_RANGE[0]), math.log(NUMBITS_RANGE[1])
    x = min(max(math.log(max(numbits, 1e-9)), lo), hi) - (hi + lo) / 2
    return np.sin(x * scales - 0.5).astype(np.float32)


def default_numbits_scales() -> np.ndarray:
    """Init values of the trainable scale parameters
    (dnn/torch/osce/models/scale_embedding.py:61)."""
    lo, hi = math.log(NUMBITS_RANGE[0]), math.log(NUMBITS_RANGE[1])
    return (np.arange(1, NUMBITS_EMBEDDING_DIM + 1) * np.pi
            / (hi - lo)).astype(np.float32)


class FeatureNet(NamedTuple):
    """SilkFeatureNetPL (dnn/torch/osce/models/silk_feature_net_pl.py)"""
    conv1: nn.Linear           # 119 -> 64, tanh (k=1)
    conv2: nn.Linear           # 512 -> 256, tanh (k=2)
    tconv: nn.Linear           # 256 -> 1024, tanh (4x upsample)
    gru_input: nn.Linear       # 256 -> 768
    gru_recurrent: nn.Linear   # 256 -> 768


class AdaConvLayer(NamedTuple):
    kernel: nn.Linear
    gain: nn.Linear


class AdaCombLayer(NamedTuple):
    kernel: nn.Linear
    gain: nn.Linear
    global_gain: nn.Linear


class AdaShapeLayer(NamedTuple):
    alpha1f: nn.Linear
    alpha1t: nn.Linear
    alpha2: nn.Linear


class LACEModel(NamedTuple):
    pitch_embedding: np.ndarray    # [258, 64]
    numbits_scales: np.ndarray     # [8]
    fnet: FeatureNet
    cf1: AdaCombLayer
    cf2: AdaCombLayer
    af1: AdaConvLayer


class NoLACEModel(NamedTuple):
    pitch_embedding: np.ndarray
    numbits_scales: np.ndarray
    fnet: FeatureNet
    cf1: AdaCombLayer
    cf2: AdaCombLayer
    af1: AdaConvLayer              # 1 -> 2 channels
    af2: AdaConvLayer              # 2 -> 2
    af3: AdaConvLayer              # 2 -> 2
    af4: AdaConvLayer              # 2 -> 1
    tdshape1: AdaShapeLayer
    tdshape2: AdaShapeLayer
    tdshape3: AdaShapeLayer
    post_cf1: nn.Linear            # 512 -> 256 (k=2 conv), tanh
    post_cf2: nn.Linear
    post_af1: nn.Linear
    post_af2: nn.Linear
    post_af3: nn.Linear


class FeatureNetState(NamedTuple):
    conv2_mem: np.ndarray          # [4*hidden] (k=2 conv memory)
    gru: np.ndarray                # [cond_dim]


class LACEState(NamedTuple):
    fnet: FeatureNetState
    cf1: nndsp.AdaCombState
    cf2: nndsp.AdaCombState
    af1: nndsp.AdaConvState
    preemph_mem: float
    deemph_mem: float


class NoLACEState(NamedTuple):
    fnet: FeatureNetState
    cf1: nndsp.AdaCombState
    cf2: nndsp.AdaCombState
    af1: nndsp.AdaConvState
    af2: nndsp.AdaConvState
    af3: nndsp.AdaConvState
    af4: nndsp.AdaConvState
    tdshape1: nndsp.AdaShapeState
    tdshape2: nndsp.AdaShapeState
    tdshape3: nndsp.AdaShapeState
    post_cf1_mem: np.ndarray
    post_cf2_mem: np.ndarray
    post_af1_mem: np.ndarray
    post_af2_mem: np.ndarray
    post_af3_mem: np.ndarray
    preemph_mem: float
    deemph_mem: float


def lace_init_state() -> LACEState:
    return LACEState(
        FeatureNetState(np.zeros(4 * HIDDEN_FEATURE_DIM, np.float32),
                        np.zeros(LACE_COND_DIM, np.float32)),
        nndsp.adacomb_init(KERNEL_SIZE), nndsp.adacomb_init(KERNEL_SIZE),
        nndsp.adaconv_init(1, 1, KERNEL_SIZE), 0.0, 0.0)


def nolace_init_state() -> NoLACEState:
    def shape_state():
        return nndsp.adashape_init(NOLACE_COND_DIM, FRAME_SIZE,
                                   TDSHAPE_AVG_POOL_K)
    z = lambda: np.zeros(NOLACE_COND_DIM, np.float32)
    return NoLACEState(
        FeatureNetState(np.zeros(4 * HIDDEN_FEATURE_DIM, np.float32),
                        z()),
        nndsp.adacomb_init(KERNEL_SIZE), nndsp.adacomb_init(KERNEL_SIZE),
        nndsp.adaconv_init(1, 2, KERNEL_SIZE),
        nndsp.adaconv_init(2, 2, KERNEL_SIZE),
        nndsp.adaconv_init(2, 2, KERNEL_SIZE),
        nndsp.adaconv_init(2, 1, KERNEL_SIZE),
        shape_state(), shape_state(), shape_state(),
        z(), z(), z(), z(), z(), 0.0, 0.0)


_WINDOW = nndsp.compute_overlap_window(OVERLAP_SIZE)


def feature_net(model, state: FeatureNetState, features: np.ndarray,
                numbits: np.ndarray, periods: np.ndarray):
    """Per-20ms conditioning vectors, one per 5 ms subframe (reference:
    lace_feature_net dnn/osce.c:163).  features: [4, 47]; numbits:
    [2] (current, smoothed); periods: [4] ints.  Returns (new_state,
    cond [4, COND_DIM])."""
    fn: FeatureNet = model.fnet
    nb_emb = np.concatenate([
        numbits_embedding(float(numbits[0]), model.numbits_scales),
        numbits_embedding(float(numbits[1]), model.numbits_scales)])
    hidden = []
    for sf in range(4):
        row = np.concatenate([
            np.asarray(features[sf], np.float32),
            model.pitch_embedding[int(periods[sf])], nb_emb])
        hidden.append(np.asarray(
            nn.dense(fn.conv1, row, nn.ACTIVATION_TANH), np.float32))
    frame_vec = np.concatenate(hidden)               # [4*hidden]
    c2, conv2_mem = nn.conv1d(fn.conv2, state.conv2_mem, frame_vec,
                              nn.ACTIVATION_TANH)
    cond_dim = state.gru.shape[-1]
    up = np.asarray(nn.dense(fn.tconv, np.asarray(c2, np.float32),
                             nn.ACTIVATION_TANH), np.float32)
    gru = state.gru
    cond = np.empty((4, cond_dim), np.float32)
    for sf in range(4):
        gru = np.asarray(nn.gru(fn.gru_input, fn.gru_recurrent, gru,
                                up[sf * cond_dim:(sf + 1) * cond_dim]),
                         np.float32)
        cond[sf] = gru
    return FeatureNetState(np.asarray(conv2_mem, np.float32), gru), cond


def lace_process_frame(model: LACEModel, state: LACEState,
                       x_in: np.ndarray, features: np.ndarray,
                       numbits: np.ndarray, periods: np.ndarray):
    """One 20 ms frame (reference: lace_process_20ms_frame
    dnn/osce.c:238).  x_in: [320] 16 kHz.  Returns (state, x_out)."""
    x = np.empty(4 * FRAME_SIZE, np.float32)
    pre = state.preemph_mem
    for i in range(4 * FRAME_SIZE):
        x[i] = x_in[i] - PREEMPH * pre
        pre = x_in[i]
    fnet_state, cond = feature_net(model, state.fnet, features, numbits,
                                   periods)
    cf1, cf2, af1 = state.cf1, state.cf2, state.af1
    for sf in range(4):
        seg = slice(sf * FRAME_SIZE, (sf + 1) * FRAME_SIZE)
        cf1, x[seg] = nndsp.adacomb_process_frame(
            cf1, x[seg], cond[sf], model.cf1.kernel, model.cf1.gain,
            model.cf1.global_gain, int(periods[sf]), FRAME_SIZE,
            OVERLAP_SIZE, KERNEL_SIZE, COMB_LEFT_PADDING, COMB_GAIN_A,
            COMB_GAIN_B, LOG_GAIN_LIMIT, _WINDOW)
    for sf in range(4):
        seg = slice(sf * FRAME_SIZE, (sf + 1) * FRAME_SIZE)
        cf2, x[seg] = nndsp.adacomb_process_frame(
            cf2, x[seg], cond[sf], model.cf2.kernel, model.cf2.gain,
            model.cf2.global_gain, int(periods[sf]), FRAME_SIZE,
            OVERLAP_SIZE, KERNEL_SIZE, COMB_LEFT_PADDING, COMB_GAIN_A,
            COMB_GAIN_B, LOG_GAIN_LIMIT, _WINDOW)
    for sf in range(4):
        seg = slice(sf * FRAME_SIZE, (sf + 1) * FRAME_SIZE)
        af1, x[seg] = nndsp.adaconv_process_frame(
            af1, x[seg], cond[sf], model.af1.kernel, model.af1.gain,
            FRAME_SIZE, OVERLAP_SIZE, 1, 1, KERNEL_SIZE,
            CONV_LEFT_PADDING, CONV_GAIN_A, CONV_GAIN_B, _WINDOW)
    out = np.empty(4 * FRAME_SIZE, np.float32)
    de = state.deemph_mem
    for i in range(4 * FRAME_SIZE):
        out[i] = x[i] + PREEMPH * de
        de = out[i]
    return LACEState(fnet_state, cf1, cf2, af1, float(pre),
                     float(de)), out


def nolace_process_frame(model: NoLACEModel, state: NoLACEState,
                         x_in: np.ndarray, features: np.ndarray,
                         numbits: np.ndarray, periods: np.ndarray):
    """One 20 ms frame (reference: nolace_process_20ms_frame
    dnn/osce.c:509)."""
    x1 = np.empty(4 * FRAME_SIZE, np.float32)
    pre = state.preemph_mem
    for i in range(4 * FRAME_SIZE):
        x1[i] = x_in[i] - PREEMPH * pre
        pre = x_in[i]
    fnet_state, cond = feature_net(model, state.fnet, features, numbits,
                                   periods)
    s = state

    def post(layer, mem, f):
        out, new_mem = nn.conv1d(layer, mem, f, nn.ACTIVATION_TANH)
        return np.asarray(out, np.float32), \
            np.asarray(new_mem, np.float32)

    # 1st comb stage + feature transform
    cf1, post_cf1_mem = s.cf1, s.post_cf1_mem
    cond2 = np.empty_like(cond)
    for sf in range(4):
        seg = slice(sf * FRAME_SIZE, (sf + 1) * FRAME_SIZE)
        cf1, x1[seg] = nndsp.adacomb_process_frame(
            cf1, x1[seg], cond[sf], model.cf1.kernel, model.cf1.gain,
            model.cf1.global_gain, int(periods[sf]), FRAME_SIZE,
            OVERLAP_SIZE, KERNEL_SIZE, COMB_LEFT_PADDING, COMB_GAIN_A,
            COMB_GAIN_B, LOG_GAIN_LIMIT, _WINDOW)
        cond2[sf], post_cf1_mem = post(model.post_cf1, post_cf1_mem,
                                       cond[sf])
    cond = cond2
    # 2nd comb stage
    cf2, post_cf2_mem = s.cf2, s.post_cf2_mem
    cond2 = np.empty_like(cond)
    for sf in range(4):
        seg = slice(sf * FRAME_SIZE, (sf + 1) * FRAME_SIZE)
        cf2, x1[seg] = nndsp.adacomb_process_frame(
            cf2, x1[seg], cond[sf], model.cf2.kernel, model.cf2.gain,
            model.cf2.global_gain, int(periods[sf]), FRAME_SIZE,
            OVERLAP_SIZE, KERNEL_SIZE, COMB_LEFT_PADDING, COMB_GAIN_A,
            COMB_GAIN_B, LOG_GAIN_LIMIT, _WINDOW)
        cond2[sf], post_cf2_mem = post(model.post_cf2, post_cf2_mem,
                                       cond[sf])
    cond = cond2
    # af1: 1 -> 2 channels
    af1, post_af1_mem = s.af1, s.post_af1_mem
    x2 = np.empty(8 * FRAME_SIZE, np.float32)
    cond2 = np.empty_like(cond)
    for sf in range(4):
        seg1 = slice(sf * FRAME_SIZE, (sf + 1) * FRAME_SIZE)
        seg2 = slice(2 * sf * FRAME_SIZE, 2 * (sf + 1) * FRAME_SIZE)
        af1, x2[seg2] = nndsp.adaconv_process_frame(
            af1, x1[seg1], cond[sf], model.af1.kernel, model.af1.gain,
            FRAME_SIZE, OVERLAP_SIZE, 1, 2, KERNEL_SIZE,
            CONV_LEFT_PADDING, CONV_GAIN_A, CONV_GAIN_B, _WINDOW)
        cond2[sf], post_af1_mem = post(model.post_af1, post_af1_mem,
                                       cond[sf])
    cond = cond2

    def shape_mix(shape_state, shape_layer, af_state, af_layer, x_src,
                  x_dst, post_layer, post_mem, out_ch):
        nonlocal cond
        cond2 = np.empty_like(cond) if post_layer is not None else None
        for sf in range(4):
            base = 2 * sf * FRAME_SIZE
            ch2 = slice(base + FRAME_SIZE, base + 2 * FRAME_SIZE)
            shape_state, x_src[ch2] = nndsp.adashape_process_frame(
                shape_state, x_src[ch2], cond[sf], shape_layer.alpha1f,
                shape_layer.alpha1t, shape_layer.alpha2, FRAME_SIZE,
                TDSHAPE_AVG_POOL_K)
            dst = slice(out_ch * sf * FRAME_SIZE,
                        out_ch * (sf + 1) * FRAME_SIZE)
            af_state, x_dst[dst] = nndsp.adaconv_process_frame(
                af_state, x_src[slice(base, base + 2 * FRAME_SIZE)],
                cond[sf], af_layer.kernel, af_layer.gain, FRAME_SIZE,
                OVERLAP_SIZE, 2, out_ch, KERNEL_SIZE,
                CONV_LEFT_PADDING, CONV_GAIN_A, CONV_GAIN_B, _WINDOW)
            if post_layer is not None:
                cond2[sf], post_mem = post(post_layer, post_mem,
                                           cond[sf])
        if post_layer is not None:
            cond = cond2
        return shape_state, af_state, post_mem

    x1b = np.empty(8 * FRAME_SIZE, np.float32)
    td1, af2, post_af2_mem = shape_mix(
        s.tdshape1, model.tdshape1, s.af2, model.af2, x2, x1b,
        model.post_af2, s.post_af2_mem, 2)
    x2b = np.empty(8 * FRAME_SIZE, np.float32)
    td2, af3, post_af3_mem = shape_mix(
        s.tdshape2, model.tdshape2, s.af3, model.af3, x1b, x2b,
        model.post_af3, s.post_af3_mem, 2)
    x_final = np.empty(4 * FRAME_SIZE, np.float32)
    td3, af4, _ = shape_mix(
        s.tdshape3, model.tdshape3, s.af4, model.af4, x2b, x_final,
        None, None, 1)
    out = np.empty(4 * FRAME_SIZE, np.float32)
    de = state.deemph_mem
    for i in range(4 * FRAME_SIZE):
        out[i] = x_final[i] + PREEMPH * de
        de = out[i]
    return NoLACEState(fnet_state, cf1, cf2, af1, af2, af3, af4,
                       td1, td2, td3, post_cf1_mem, post_cf2_mem,
                       post_af1_mem, post_af2_mem, post_af3_mem,
                       float(pre), float(de)), out


# ---------------------------------------------------------------------
# model construction

def _rl(rng, m, n, bias=True):
    w = (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
    b = (rng.standard_normal(n) * 0.1).astype(np.float32) if bias \
        else None
    return nn.np_linear(w, b)


def _random_fnet(rng, cond) -> FeatureNet:
    return FeatureNet(_rl(rng, _FNET_IN, HIDDEN_FEATURE_DIM),
                      _rl(rng, 2 * 4 * HIDDEN_FEATURE_DIM, cond),
                      _rl(rng, cond, 4 * cond),
                      _rl(rng, cond, 3 * cond),
                      _rl(rng, cond, 3 * cond))


def _random_comb(rng, cond) -> AdaCombLayer:
    return AdaCombLayer(_rl(rng, cond, KERNEL_SIZE),
                        _rl(rng, cond, 1), _rl(rng, cond, 1))


def _random_conv(rng, cond, in_ch, out_ch) -> AdaConvLayer:
    return AdaConvLayer(
        _rl(rng, cond, in_ch * out_ch * KERNEL_SIZE),
        _rl(rng, cond, out_ch))


def _random_shape(rng, cond) -> AdaShapeLayer:
    tenv = FRAME_SIZE // TDSHAPE_AVG_POOL_K
    return AdaShapeLayer(_rl(rng, 2 * cond, FRAME_SIZE),
                         _rl(rng, 2 * (tenv + 1), FRAME_SIZE),
                         _rl(rng, 2 * FRAME_SIZE, FRAME_SIZE))


def random_lace_model(seed=0) -> LACEModel:
    rng = np.random.default_rng(seed)
    c = LACE_COND_DIM
    emb = (rng.standard_normal((PITCH_MAX + 1, PITCH_EMBEDDING_DIM))
           / 8).astype(np.float32)
    return LACEModel(emb, default_numbits_scales(),
                     _random_fnet(rng, c),
                     _random_comb(rng, c), _random_comb(rng, c),
                     _random_conv(rng, c, 1, 1))


def random_nolace_model(seed=0) -> NoLACEModel:
    rng = np.random.default_rng(seed)
    c = NOLACE_COND_DIM
    emb = (rng.standard_normal((PITCH_MAX + 1, PITCH_EMBEDDING_DIM))
           / 8).astype(np.float32)
    return NoLACEModel(
        emb, default_numbits_scales(), _random_fnet(rng, c),
        _random_comb(rng, c), _random_comb(rng, c),
        _random_conv(rng, c, 1, 2), _random_conv(rng, c, 2, 2),
        _random_conv(rng, c, 2, 2), _random_conv(rng, c, 2, 1),
        _random_shape(rng, c), _random_shape(rng, c),
        _random_shape(rng, c),
        _rl(rng, 2 * c, c), _rl(rng, 2 * c, c), _rl(rng, 2 * c, c),
        _rl(rng, 2 * c, c), _rl(rng, 2 * c, c))


def _put(out, name, lin):
    out.append(WeightArray(f"{name}_weights_float", WEIGHT_TYPE_FLOAT,
                           np.asarray(lin.w, np.float32).reshape(-1)))
    if lin.bias is not None:
        out.append(WeightArray(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                               np.asarray(lin.bias, np.float32)))


def lace_model_to_arrays(model: LACEModel, prefix="lace"):
    """Blob arrays, names per the osce export script
    (dnn/torch/osce/export_model_weights.py)."""
    out = [WeightArray(f"{prefix}_pitch_embedding_weights_float",
                       WEIGHT_TYPE_FLOAT,
                       model.pitch_embedding.reshape(-1))]
    _put(out, f"{prefix}_fnet_conv1", model.fnet.conv1)
    _put(out, f"{prefix}_fnet_conv2", model.fnet.conv2)
    _put(out, f"{prefix}_fnet_tconv", model.fnet.tconv)
    _put(out, f"{prefix}_fnet_gru_input", model.fnet.gru_input)
    _put(out, f"{prefix}_fnet_gru_recurrent", model.fnet.gru_recurrent)
    for nm, lay in (("cf1", model.cf1), ("cf2", model.cf2)):
        _put(out, f"{prefix}_{nm}_kernel", lay.kernel)
        _put(out, f"{prefix}_{nm}_gain", lay.gain)
        _put(out, f"{prefix}_{nm}_global_gain", lay.global_gain)
    _put(out, f"{prefix}_af1_kernel", model.af1.kernel)
    _put(out, f"{prefix}_af1_gain", model.af1.gain)
    return out


def nolace_model_to_arrays(model: NoLACEModel):
    out = [WeightArray("nolace_pitch_embedding_weights_float",
                       WEIGHT_TYPE_FLOAT,
                       model.pitch_embedding.reshape(-1))]
    _put(out, "nolace_fnet_conv1", model.fnet.conv1)
    _put(out, "nolace_fnet_conv2", model.fnet.conv2)
    _put(out, "nolace_fnet_tconv", model.fnet.tconv)
    _put(out, "nolace_fnet_gru_input", model.fnet.gru_input)
    _put(out, "nolace_fnet_gru_recurrent", model.fnet.gru_recurrent)
    for nm, lay in (("cf1", model.cf1), ("cf2", model.cf2)):
        _put(out, f"nolace_{nm}_kernel", lay.kernel)
        _put(out, f"nolace_{nm}_gain", lay.gain)
        _put(out, f"nolace_{nm}_global_gain", lay.global_gain)
    for nm, lay in (("af1", model.af1), ("af2", model.af2),
                    ("af3", model.af3), ("af4", model.af4)):
        _put(out, f"nolace_{nm}_kernel", lay.kernel)
        _put(out, f"nolace_{nm}_gain", lay.gain)
    for nm, lay in (("tdshape1", model.tdshape1),
                    ("tdshape2", model.tdshape2),
                    ("tdshape3", model.tdshape3)):
        _put(out, f"nolace_{nm}_alpha1_f", lay.alpha1f)
        _put(out, f"nolace_{nm}_alpha1_t", lay.alpha1t)
        _put(out, f"nolace_{nm}_alpha2", lay.alpha2)
    for nm in ("post_cf1", "post_cf2", "post_af1", "post_af2",
               "post_af3"):
        _put(out, f"nolace_{nm}", getattr(model, nm))
    return out


# ---------------------------------------------------------------------
# decoder-side enhancer wrapper

OSCE_METHOD_NONE = 0
OSCE_METHOD_LACE = 1
OSCE_METHOD_NOLACE = 2


class OSCEEnhancer:
    """Per-channel SILK output enhancer (reference: osce_enhance_frame
    dnn/osce.c:1546 + osce_reset :1381).  Enhancement applies only to
    16 kHz / 4-subframe (20 ms WB) frames; after a reset the first
    frame passes through and the second cross-fades over 10 ms."""

    def __init__(self, method: int, model):
        from . import osce_features as OF
        self._OF = OF
        self.method = method
        self.model = model
        self.reset()

    def reset(self):
        self.features = self._OF.init_feature_state()
        if self.method == OSCE_METHOD_LACE:
            self.state = lace_init_state()
        elif self.method == OSCE_METHOD_NOLACE:
            self.state = nolace_init_state()
        else:
            self.state = None
        self.reset_count = 2

    def enhance_frame(self, xq, num_bits, pred_coef_q12, pitch_lags,
                      ltp_coef_q14, gains_q16, signal_type, lpc_order,
                      fs_khz, nb_subfr):
        """Enhance 320 int16 samples in place; returns the new xq."""
        OF = self._OF
        if fs_khz != 16 or nb_subfr != 4:
            self.reset()
            return xq
        self.features, feats, numbits, periods = OF.calculate_features(
            self.features, xq, num_bits, pred_coef_q12, pitch_lags,
            ltp_coef_q14, gains_q16, signal_type, lpc_order)
        x_in = np.asarray(xq[:320], np.float32) / 32768.0
        if self.method == OSCE_METHOD_LACE:
            self.state, out = lace_process_frame(
                self.model, self.state, x_in, feats, numbits, periods)
        elif self.method == OSCE_METHOD_NOLACE:
            self.state, out = nolace_process_frame(
                self.model, self.state, x_in, feats, numbits, periods)
        else:
            out = x_in
        if self.reset_count > 1:
            out = x_in
            self.reset_count -= 1
        elif self.reset_count:
            # 10 ms cross-fade (osce_cross_fade_10ms osce_features.c:545)
            w = OF.OSCE_WINDOW[:160]
            out = out.copy()
            out[:160] = w * out[:160] + (1.0 - w) * x_in[:160]
            self.reset_count = 0
        tmp = np.clip(32768.0 * out, -32767.0, 32767.0)
        return np.floor(0.5 + tmp).astype(np.int64)

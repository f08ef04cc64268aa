"""Neural pitch estimator (reference: dnn/pitchdnn.c, dnn/pitchdnn.h;
architecture from dnn/torch/neural-pitch/models.py PitchDNN).

Joint instantaneous-frequency + cross-correlation estimator: the IF
branch is two dense layers, the xcorr branch two streaming 2-D convs
over the 224 lag bins, merged into a GRU and upsampled to 180 pitch
logits; the output is a softmax-refined argmax mapped to the LPCNet
pitch parameter in [-1.5, 1.5]."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nnet as nn
from .weights import linear_params, conv2d_params

PITCH_MIN_PERIOD = 32
PITCH_MAX_PERIOD = 256
NB_XCORR_FEATURES = PITCH_MAX_PERIOD - PITCH_MIN_PERIOD      # 224
PITCH_IF_MAX_FREQ = 30
PITCH_IF_FEATURES = 3 * PITCH_IF_MAX_FREQ - 2                # 88
_GRU_DIM = 64


class PitchDNNModel(NamedTuple):
    if_up1: nn.Linear              # 88 -> 64, tanh
    if_up2: nn.Linear              # 64 -> 64, tanh
    conv1: nn.Conv2d               # 1 -> 4 ch, 3x3
    conv2: nn.Conv2d               # 4 -> 1 ch, 3x3
    downsampler: nn.Linear         # 288 -> 64, tanh
    gru_input: nn.Linear           # 64 -> 192
    gru_recurrent: nn.Linear       # 64 -> 192
    final: nn.Linear               # 64 -> 180+, linear


class PitchDNNState(NamedTuple):
    gru: jax.Array                 # [..., 64]
    conv1_mem: jax.Array           # [..., 2, 1, 226]
    conv2_mem: jax.Array           # [..., 2, 4, 226]


def init_state(batch_shape=()) -> PitchDNNState:
    z = jnp.zeros
    return PitchDNNState(
        gru=z(batch_shape + (_GRU_DIM,)),
        conv1_mem=z(batch_shape + (2, 1, NB_XCORR_FEATURES + 2)),
        conv2_mem=z(batch_shape + (2, 4, NB_XCORR_FEATURES + 2)))


def compute_pitch(model: PitchDNNModel, state: PitchDNNState,
                  if_features: jax.Array, xcorr_features: jax.Array):
    """(reference: compute_pitchdnn dnn/pitchdnn.c:40).  Returns
    (new_state, pitch in [-1.5, 1.5])."""
    h = NB_XCORR_FEATURES
    if1 = nn.dense(model.if_up1, if_features, nn.ACTIVATION_TANH)
    if2 = nn.dense(model.if_up2, if1, nn.ACTIVATION_TANH)
    # xcorr branch: height padded by 1 on each side (the C writes the
    # 224 bins at offset 1 of a 226 buffer, pitchdnn.c:50)
    x = jnp.asarray(xcorr_features, jnp.float32)
    pad = jnp.zeros(x.shape[:-1] + (1,))
    x1 = jnp.concatenate([pad, x, pad], axis=-1)[..., None, :]
    c1, m1 = nn.conv2d(model.conv1, state.conv1_mem, x1, h,
                       nn.ACTIVATION_TANH)
    c1p = jnp.concatenate([jnp.zeros(c1.shape[:-1] + (1,)), c1,
                           jnp.zeros(c1.shape[:-1] + (1,))], axis=-1)
    c2, m2 = nn.conv2d(model.conv2, state.conv2_mem, c1p, h,
                       nn.ACTIVATION_TANH)
    down_in = jnp.concatenate([c2[..., 0, :], if2], axis=-1)
    down = nn.dense(model.downsampler, down_in, nn.ACTIVATION_TANH)
    gru = nn.gru(model.gru_input, model.gru_recurrent, state.gru, down)
    logits = nn.dense(model.final, gru, nn.ACTIVATION_LINEAR)[..., :180]
    pos = jnp.argmax(logits, axis=-1)
    # softmax-weighted refinement over [pos-2, pos+2] (pitchdnn.c:70)
    idx = jnp.arange(180)
    window = (idx >= jnp.maximum(0, pos - 2)[..., None]) \
        & (idx <= jnp.minimum(179, pos + 2)[..., None])
    p = jnp.where(window, jnp.exp(logits), 0.0)
    refined = jnp.sum(p * idx, axis=-1) / jnp.sum(p, axis=-1)
    pitch = (1.0 / 60.0) * refined - 1.5
    return PitchDNNState(gru, m1, m2), pitch


def _rl(rng, m, n, bias=True):
    w = (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
    b = (rng.standard_normal(n) * 0.1).astype(np.float32) if bias \
        else None
    return nn.np_linear(w, b)


def random_model(seed=0) -> PitchDNNModel:
    r = np.random.default_rng(seed)

    def conv(ic, oc):
        w = (r.standard_normal((oc, ic, 3, 3)) / 3).astype(np.float32)
        b = (r.standard_normal(oc) * 0.1).astype(np.float32)
        return nn.Conv2d(jnp.asarray(w), jnp.asarray(b))

    return PitchDNNModel(
        if_up1=_rl(r, PITCH_IF_FEATURES, 64),
        if_up2=_rl(r, 64, 64),
        conv1=conv(1, 4), conv2=conv(4, 1),
        downsampler=_rl(r, NB_XCORR_FEATURES + 64, 64),
        gru_input=_rl(r, 64, 192), gru_recurrent=_rl(r, 64, 192),
        final=_rl(r, 64, 192))


def model_to_arrays(model: PitchDNNModel):
    """Serialize to blob arrays (inverse of model_from_arrays)."""
    from .weights import WeightArray, WEIGHT_TYPE_FLOAT
    out = []

    def put(name, lin):
        out.append(WeightArray(f"{name}_weights_float",
                               WEIGHT_TYPE_FLOAT,
                               np.asarray(lin.w, np.float32)
                               .reshape(-1)))
        if lin.bias is not None:
            out.append(WeightArray(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                                   np.asarray(lin.bias, np.float32)))

    put("dense_if_upsampler_1", model.if_up1)
    put("dense_if_upsampler_2", model.if_up2)
    put("dense_downsampler", model.downsampler)
    put("dense_final_upsampler", model.final)
    put("gru_1_input", model.gru_input)
    put("gru_1_recurrent", model.gru_recurrent)
    for name, conv in (("conv2d_1", model.conv1),
                       ("conv2d_2", model.conv2)):
        from .weights import WeightArray as WA
        out.append(WA(f"{name}_weights_float", WEIGHT_TYPE_FLOAT,
                      np.asarray(conv.w, np.float32).reshape(-1)))
        out.append(WA(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                      np.asarray(conv.bias, np.float32)))
    return out


def model_from_arrays(arrays) -> PitchDNNModel:
    """(names per dnn/torch/neural-pitch/export_neuralpitch_weights.py)"""
    def lin(name, m, n):
        return linear_params(arrays,
                             float_weights=f"{name}_weights_float",
                             bias=f"{name}_bias",
                             nb_inputs=m, nb_outputs=n)
    return PitchDNNModel(
        if_up1=lin("dense_if_upsampler_1", PITCH_IF_FEATURES, 64),
        if_up2=lin("dense_if_upsampler_2", 64, 64),
        conv1=conv2d_params(arrays, bias="conv2d_1_bias",
                            float_weights="conv2d_1_weights_float",
                            in_channels=1, out_channels=4, ktime=3,
                            kheight=3),
        conv2=conv2d_params(arrays, bias="conv2d_2_bias",
                            float_weights="conv2d_2_weights_float",
                            in_channels=4, out_channels=1, ktime=3,
                            kheight=3),
        downsampler=lin("dense_downsampler", NB_XCORR_FEATURES + 64, 64),
        gru_input=lin("gru_1_input", 64, 192),
        gru_recurrent=lin("gru_1_recurrent", 64, 192),
        final=lin("dense_final_upsampler", 64, 192))

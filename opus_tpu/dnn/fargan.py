"""FARGAN auto-regressive vocoder (reference: dnn/fargan.c,
dnn/fargan.h; architecture from dnn/torch/fargan/fargan.py
FARGANCond/FARGANSub).

Synthesizes 16 kHz speech from 20-dim LPCNet features, 40-sample
subframes, 4 per 10 ms frame.  The pitch buffer feeds a gain-normalized
prediction tap back into every layer (the "pitch gate").  Used by the
deep-PLC path and DRED recovery.  TPU-first: a pure function over a
Linear pytree; the subframe recursion is a lax.scan-able step with a
flat state tuple."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nnet as nn
from .weights import linear_params

FARGAN_CONT_SAMPLES = 320
FARGAN_NB_SUBFRAMES = 4
FARGAN_SUBFRAME_SIZE = 40
FARGAN_FRAME_SIZE = FARGAN_NB_SUBFRAMES * FARGAN_SUBFRAME_SIZE
FARGAN_COND_SIZE = 80
FARGAN_DEEMPHASIS = 0.85
PITCH_MAX_PERIOD = 256          # (pitchdnn.h:10)
NB_FEATURES = 20
NB_BANDS = 18

SIG_NET_INPUT_SIZE = FARGAN_COND_SIZE + 2 * FARGAN_SUBFRAME_SIZE + 4
_PEMBED_DIMS = 12
_FWC0_OUT = 192
_GRU_SIZES = (160, 128, 128)


class FARGANModel(NamedTuple):
    pembed: jax.Array                  # [224, 12] pitch embedding
    cond_fdense1: nn.Linear            # 32 -> 64, tanh, no bias
    cond_fconv1: nn.Linear             # 192 -> 128 (k=3), no bias
    cond_fdense2: nn.Linear            # 128 -> 320, tanh, no bias
    cond_gain_dense: nn.Linear         # 80 -> 1
    fwc0_conv: nn.Linear               # 328 -> 192 (k=2), no bias
    fwc0_glu: nn.Linear                # 192 -> 192, no bias
    gain_dense_out: nn.Linear          # 192 -> 4, sigmoid
    gru_input: tuple                   # (272->480, 240->384, 208->384)
    gru_recurrent: tuple               # (160->480, 128->384, 128->384)
    gru_glu: tuple                     # per-GRU GLU gates
    skip_dense: nn.Linear              # 688 -> 128, tanh, no bias
    skip_glu: nn.Linear                # 128 -> 128, no bias
    sig_dense_out: nn.Linear           # 128 -> 40, tanh, no bias


class FARGANState(NamedTuple):
    pitch_buf: jax.Array               # [..., 256]
    cond_conv1_mem: jax.Array          # [..., 128]
    fwc0_mem: jax.Array                # [..., 164]
    gru: tuple                         # ([...,160],[...,128],[...,128])
    deemph_mem: jax.Array              # [...]
    last_period: jax.Array             # [...] int32


def init_state(batch_shape=()) -> FARGANState:
    z = jnp.zeros
    return FARGANState(
        pitch_buf=z(batch_shape + (PITCH_MAX_PERIOD,)),
        cond_conv1_mem=z(batch_shape + (128,)),
        fwc0_mem=z(batch_shape + (SIG_NET_INPUT_SIZE,)),
        gru=tuple(z(batch_shape + (g,)) for g in _GRU_SIZES),
        deemph_mem=z(batch_shape),
        last_period=z(batch_shape, jnp.int32))


def period_from_feature(features: jax.Array) -> jax.Array:
    """Pitch period from feature NB_BANDS (reference: fargan.c:207)."""
    f = features[..., NB_BANDS]
    return jnp.floor(
        0.5 + 256.0 / 2.0 ** ((1.0 / 60.0) * ((f + 1.5) * 60.0))
    ).astype(jnp.int32)


def compute_cond(model: FARGANModel, conv1_mem: jax.Array,
                 features: jax.Array, period: jax.Array):
    """(reference: compute_fargan_cond dnn/fargan.c:43).  Returns
    (cond [..., 320], new conv mem)."""
    idx = jnp.clip(period - 32, 0, 223)
    emb = nn.embedding(model.pembed, idx)
    dense_in = jnp.concatenate(
        [jnp.asarray(features[..., :NB_FEATURES], jnp.float32), emb],
        axis=-1)
    conv1_in = nn.dense(model.cond_fdense1, dense_in, nn.ACTIVATION_TANH)
    fdense2_in, conv1_mem = nn.conv1d(model.cond_fconv1, conv1_mem,
                                      conv1_in, nn.ACTIVATION_TANH)
    cond = nn.dense(model.cond_fdense2, fdense2_in, nn.ACTIVATION_TANH)
    return cond, conv1_mem


def run_subframe(model: FARGANModel, state: FARGANState,
                 cond: jax.Array, period: jax.Array):
    """One 40-sample subframe (reference: run_fargan_subframe
    dnn/fargan.c:69).  cond: [..., 80].  Returns (state, pcm [..., 40])
    with pcm already deemphasized."""
    sf = FARGAN_SUBFRAME_SIZE
    gain = jnp.exp(nn.dense(model.cond_gain_dense, cond,
                            nn.ACTIVATION_LINEAR))        # [..., 1]
    gain_1 = 1.0 / (1e-5 + gain)

    # pred: 44 samples from the pitch buffer, one period back, wrapping
    # forward if the period is shorter than the subframe
    pos0 = PITCH_MAX_PERIOD - period - 2                  # [...]
    steps = jnp.arange(sf + 4)
    pos = pos0[..., None] + steps
    pos = jnp.where(pos >= PITCH_MAX_PERIOD, pos - period[..., None],
                    pos)
    # clamp like the C's max(0,pos); the upper clamp also guards the
    # un-primed period==0 case (jax gathers fill OOB with NaN)
    pos = jnp.clip(pos, 0, PITCH_MAX_PERIOD - 1)
    pred = jnp.clip(gain_1 * jnp.take_along_axis(
        state.pitch_buf, pos, axis=-1), -1.0, 1.0)
    prev = jnp.clip(gain_1 * state.pitch_buf[..., -sf:], -1.0, 1.0)

    fwc0_in = jnp.concatenate([cond, pred, prev], axis=-1)
    gru1_base, fwc0_mem = nn.conv1d(model.fwc0_conv, state.fwc0_mem,
                                    fwc0_in, nn.ACTIVATION_TANH)
    gru1_base = nn.glu(model.fwc0_glu, gru1_base)
    pitch_gate = nn.dense(model.gain_dense_out, gru1_base,
                          nn.ACTIVATION_SIGMOID)           # [..., 4]

    def gated(base, k):
        return jnp.concatenate(
            [base, pitch_gate[..., k:k + 1] * pred[..., 2:2 + sf], prev],
            axis=-1)

    g1 = nn.gru(model.gru_input[0], model.gru_recurrent[0],
                state.gru[0], gated(gru1_base, 0))
    g1g = nn.glu(model.gru_glu[0], g1)
    g2 = nn.gru(model.gru_input[1], model.gru_recurrent[1],
                state.gru[1], gated(g1g, 1))
    g2g = nn.glu(model.gru_glu[1], g2)
    g3 = nn.gru(model.gru_input[2], model.gru_recurrent[2],
                state.gru[2], gated(g2g, 2))
    g3g = nn.glu(model.gru_glu[2], g3)

    skip_cat = jnp.concatenate(
        [g1g, g2g, g3g, gru1_base,
         pitch_gate[..., 3:4] * pred[..., 2:2 + sf], prev], axis=-1)
    skip = nn.dense(model.skip_dense, skip_cat, nn.ACTIVATION_TANH)
    skip = nn.glu(model.skip_glu, skip)
    pcm = nn.dense(model.sig_dense_out, skip, nn.ACTIVATION_TANH) * gain

    pitch_buf = jnp.concatenate([state.pitch_buf[..., sf:], pcm],
                                axis=-1)
    # deemphasis: IIR y[n] = x[n] + 0.85*y[n-1] (fargan.c:62); a plain
    # scan beats the parallel-prefix form at this length (40 samples)
    def deemph(mem, x):
        y = x + FARGAN_DEEMPHASIS * mem
        return y, y
    mem, out = jax.lax.scan(deemph, state.deemph_mem,
                            jnp.moveaxis(pcm, -1, 0))
    out = jnp.moveaxis(out, 0, -1)
    new_state = FARGANState(pitch_buf, state.cond_conv1_mem, fwc0_mem,
                            (g1, g2, g3), mem, state.last_period)
    return new_state, out


def synthesize_frame(model: FARGANModel, state: FARGANState,
                     features: jax.Array):
    """One 10 ms frame = 160 samples (reference: fargan_synthesize_impl
    dnn/fargan.c:200).  Returns (state, pcm [..., 160])."""
    period = period_from_feature(features)
    cond, conv1_mem = compute_cond(model, state.cond_conv1_mem,
                                   features, period)
    state = state._replace(cond_conv1_mem=conv1_mem)
    outs = []
    for s in range(FARGAN_NB_SUBFRAMES):
        sub_cond = cond[..., s * FARGAN_COND_SIZE:
                        (s + 1) * FARGAN_COND_SIZE]
        state, pcm = run_subframe(model, state, sub_cond,
                                  state.last_period)
        outs.append(pcm)
    state = state._replace(last_period=period)
    return state, jnp.concatenate(outs, axis=-1)


def cont(model: FARGANModel, state: FARGANState, pcm0: jax.Array,
         features0: jax.Array) -> FARGANState:
    """Prime the vocoder from 320 samples of real output + 5 feature
    frames before concealment starts (reference: fargan_cont
    dnn/fargan.c:142)."""
    period = jnp.zeros(features0.shape[:-2], jnp.int32)
    cond = None
    for i in range(5):
        f = features0[..., i, :]
        state = state._replace(last_period=period)
        period = period_from_feature(f)
        cond, mem = compute_cond(model, state.cond_conv1_mem, f, period)
        state = state._replace(cond_conv1_mem=mem)
    # preemphasized continuation signal
    x0 = jnp.concatenate(
        [jnp.zeros_like(pcm0[..., :1]),
         pcm0[..., 1:] - FARGAN_DEEMPHASIS * pcm0[..., :-1]], axis=-1)
    pitch_buf = state.pitch_buf.at[..., PITCH_MAX_PERIOD
                                   - FARGAN_FRAME_SIZE:].set(
        x0[..., :FARGAN_FRAME_SIZE])
    state = state._replace(pitch_buf=pitch_buf)
    for i in range(FARGAN_NB_SUBFRAMES):
        sub_cond = cond[..., i * FARGAN_COND_SIZE:
                        (i + 1) * FARGAN_COND_SIZE]
        state, _ = run_subframe(model, state, sub_cond,
                                state.last_period)
        seg = x0[..., FARGAN_FRAME_SIZE + i * FARGAN_SUBFRAME_SIZE:
                 FARGAN_FRAME_SIZE + (i + 1) * FARGAN_SUBFRAME_SIZE]
        pitch_buf = state.pitch_buf.at[..., PITCH_MAX_PERIOD
                                       - FARGAN_SUBFRAME_SIZE:].set(seg)
        state = state._replace(pitch_buf=pitch_buf)
    return state._replace(deemph_mem=pcm0[..., -1])


def _rl(rng, m, n, bias=False):
    w = (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
    b = (rng.standard_normal(n) * 0.1).astype(np.float32) if bias \
        else None
    return nn.np_linear(w, b)


def random_model(seed=0) -> FARGANModel:
    r = np.random.default_rng(seed)
    gin = (272, 240, 208)
    gout = (480, 384, 384)
    return FARGANModel(
        pembed=jnp.asarray(r.standard_normal((224, _PEMBED_DIMS)),
                           jnp.float32),
        cond_fdense1=_rl(r, NB_FEATURES + _PEMBED_DIMS, 64),
        cond_fconv1=_rl(r, 192, 128),
        cond_fdense2=_rl(r, 128, 4 * FARGAN_COND_SIZE),
        cond_gain_dense=_rl(r, FARGAN_COND_SIZE, 1, bias=True),
        fwc0_conv=_rl(r, 2 * SIG_NET_INPUT_SIZE, _FWC0_OUT),
        fwc0_glu=_rl(r, _FWC0_OUT, _FWC0_OUT),
        gain_dense_out=_rl(r, _FWC0_OUT, 4, bias=True),
        gru_input=tuple(_rl(r, gin[k], gout[k]) for k in range(3)),
        gru_recurrent=tuple(_rl(r, _GRU_SIZES[k], gout[k])
                            for k in range(3)),
        gru_glu=tuple(_rl(r, _GRU_SIZES[k], _GRU_SIZES[k])
                      for k in range(3)),
        skip_dense=_rl(r, 688, 128),
        skip_glu=_rl(r, 128, 128),
        sig_dense_out=_rl(r, 128, FARGAN_SUBFRAME_SIZE))


def model_to_arrays(model: FARGANModel):
    """Serialize to blob arrays (inverse of model_from_arrays)."""
    from .weights import WeightArray, WEIGHT_TYPE_FLOAT
    out = [WeightArray("cond_net_pembed_weights_float",
                       WEIGHT_TYPE_FLOAT,
                       np.asarray(model.pembed, np.float32)
                       .reshape(-1))]

    def put(name, lin):
        out.append(WeightArray(f"{name}_weights_float",
                               WEIGHT_TYPE_FLOAT,
                               np.asarray(lin.w, np.float32)
                               .reshape(-1)))
        if lin.bias is not None:
            out.append(WeightArray(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                                   np.asarray(lin.bias, np.float32)))

    put("cond_net_fdense1", model.cond_fdense1)
    put("cond_net_fconv1", model.cond_fconv1)
    put("cond_net_fdense2", model.cond_fdense2)
    put("sig_net_cond_gain_dense", model.cond_gain_dense)
    put("sig_net_fwc0_conv", model.fwc0_conv)
    put("sig_net_fwc0_glu_gate", model.fwc0_glu)
    put("sig_net_gain_dense_out", model.gain_dense_out)
    for k in range(3):
        put(f"sig_net_gru{k+1}_input", model.gru_input[k])
        put(f"sig_net_gru{k+1}_recurrent", model.gru_recurrent[k])
        put(f"sig_net_gru{k+1}_glu_gate", model.gru_glu[k])
    put("sig_net_skip_dense", model.skip_dense)
    put("sig_net_skip_glu_gate", model.skip_glu)
    put("sig_net_sig_dense_out", model.sig_dense_out)
    return out


def model_from_arrays(arrays) -> FARGANModel:
    """Load from a parsed weight blob (names per
    dnn/torch/fargan/export_fargan_weights.py)."""
    def lin(name, m, n, bias=False):
        return linear_params(
            arrays, float_weights=f"{name}_weights_float",
            bias=f"{name}_bias" if bias else None,
            nb_inputs=m, nb_outputs=n)
    gin = (272, 240, 208)
    gout = (480, 384, 384)
    pembed = arrays["cond_net_pembed_weights_float"].data \
        .astype(np.float32).reshape(224, _PEMBED_DIMS)
    return FARGANModel(
        pembed=jnp.asarray(pembed),
        cond_fdense1=lin("cond_net_fdense1", 32, 64),
        cond_fconv1=lin("cond_net_fconv1", 192, 128),
        cond_fdense2=lin("cond_net_fdense2", 128, 320),
        cond_gain_dense=lin("sig_net_cond_gain_dense", 80, 1, bias=True),
        fwc0_conv=lin("sig_net_fwc0_conv", 328, 192),
        fwc0_glu=lin("sig_net_fwc0_glu_gate", 192, 192),
        gain_dense_out=lin("sig_net_gain_dense_out", 192, 4, bias=True),
        gru_input=tuple(lin(f"sig_net_gru{k+1}_input", gin[k], gout[k])
                        for k in range(3)),
        gru_recurrent=tuple(
            lin(f"sig_net_gru{k+1}_recurrent", _GRU_SIZES[k], gout[k])
            for k in range(3)),
        gru_glu=tuple(lin(f"sig_net_gru{k+1}_glu_gate", _GRU_SIZES[k],
                          _GRU_SIZES[k]) for k in range(3)),
        skip_dense=lin("sig_net_skip_dense", 688, 128),
        skip_glu=lin("sig_net_skip_glu_gate", 128, 128),
        sig_dense_out=lin("sig_net_sig_dense_out", 128, 40))

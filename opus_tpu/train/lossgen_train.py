"""JAX training loop for the generative packet-loss model (reference:
dnn/torch/lossgen/{lossgen.py,train_lossgen.py,export_lossgen.py}).

The reference trains a 2 -> 8 -> GRU16 -> GRU16 -> 1 next-step loss
predictor on real loss traces (`loss_sorted.txt`) with BCE on the next
packet's loss flag, AdamW(lr=3e-3, betas=(0.8, 0.98)) and a
1/(1 + 1e-3 * step) LR schedule.  This twin trains the same
architecture natively in JAX — the forward pass *is* the runtime's
(opus_tpu.dnn.nnet gru/dense with the z|r|h gate order), so exported
weights drop straight into opus_tpu.dnn.lossgen with no gate
reordering — and, with no egress for the reference corpus, draws
bursty traces from a Gilbert-Elliott two-state channel.

Export writes the runtime TLV blob format (dnn/weights.write_blob,
reference write_lpcnet_weights.c:54) under the names
lossgen.model_from_arrays expects.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..dnn import nnet as nn
from ..dnn.weights import WEIGHT_TYPE_FLOAT, WeightArray, write_blob

GRU1 = 16
GRU2 = 16


class LossGenParams(NamedTuple):
    """Pytree twin of lossgen.LossGenModel (same field order)."""
    dense_in: nn.Linear        # 2 -> 8, tanh
    gru1_input: nn.Linear      # 8 -> 48
    gru1_recurrent: nn.Linear  # 16 -> 48
    gru2_input: nn.Linear      # 16 -> 48
    gru2_recurrent: nn.Linear  # 16 -> 48
    dense_out: nn.Linear       # 16 -> 1 (logit)


def init_params(seed: int = 0) -> LossGenParams:
    r = np.random.default_rng(seed)

    def lin(m, k):
        w = (r.standard_normal((m, k)) / np.sqrt(m)).astype(np.float32)
        return nn.np_linear(w, np.zeros(k, np.float32))

    return LossGenParams(lin(2, 8), lin(8, 3 * GRU1),
                         lin(GRU1, 3 * GRU1), lin(GRU1, 3 * GRU2),
                         lin(GRU2, 3 * GRU2), lin(GRU2, 1))


def forward(params: LossGenParams, loss, perc):
    """Batched sequence forward: loss/perc [B, T] -> logits [B, T].

    Identical math to LossGen._impl (dnn/lossgen.c:116-154) scanned
    over time."""
    x = jnp.stack([loss, perc], axis=-1)             # [B, T, 2]
    h = nn.dense(params.dense_in, x, nn.ACTIVATION_TANH)

    def step(carry, ht):
        g1, g2 = carry
        g1 = nn.gru(params.gru1_input, params.gru1_recurrent, g1, ht)
        g2 = nn.gru(params.gru2_input, params.gru2_recurrent, g2, g1)
        out = nn.linear(params.dense_out, g2)[..., 0]
        return (g1, g2), out

    b = loss.shape[0]
    g0 = (jnp.zeros((b, GRU1), jnp.float32),
          jnp.zeros((b, GRU2), jnp.float32))
    _, logits = jax.lax.scan(step, g0, jnp.swapaxes(h, 0, 1))
    return jnp.swapaxes(logits, 0, 1)                # [B, T]


def bce_next_step(params: LossGenParams, loss, perc, eps=1e-5):
    """Reference objective: predict packet t+1 from packets <= t."""
    p = jax.nn.sigmoid(forward(params, loss, perc)[:, :-1])
    target = loss[:, 1:]
    return jnp.mean(-target * jnp.log(p + eps)
                    - (1 - target) * jnp.log(1 - p + eps))


def gilbert_elliott_traces(n_seq: int, seq_len: int, rng) -> np.ndarray:
    """Bursty loss traces from a two-state Markov channel with
    per-sequence random burstiness (stand-in for the reference's
    loss_sorted.txt measured corpus)."""
    p_gb = rng.uniform(0.002, 0.08, n_seq)       # good -> bad
    p_bg = rng.uniform(0.05, 0.5, n_seq)         # bad -> good
    l_g = rng.uniform(0.0, 0.02, n_seq)          # loss prob in good
    l_b = rng.uniform(0.5, 1.0, n_seq)           # loss prob in bad
    state = (rng.random(n_seq) < p_gb / np.maximum(p_gb + p_bg, 1e-9))
    out = np.empty((n_seq, seq_len), np.float32)
    for t in range(seq_len):
        pl = np.where(state, l_b, l_g)
        out[:, t] = rng.random(n_seq) < pl
        flip = rng.random(n_seq) < np.where(state, p_bg, p_gb)
        state = state ^ flip
    return out


def running_perc(loss: np.ndarray) -> np.ndarray:
    """perc = lfilter([.001], [1, -.999], loss) (train_lossgen.py)."""
    out = np.empty_like(loss)
    acc = np.zeros(loss.shape[0], loss.dtype)
    for t in range(loss.shape[1]):
        acc = 0.999 * acc + 0.001 * loss[:, t]
        out[:, t] = acc
    return out


def perturb_perc(perc: np.ndarray, rng) -> np.ndarray:
    """The reference dataset's per-item jitter: perc += (r0 + r1) *
    perc * (1 - perc) with r0 per-sequence, r1 per-step."""
    r0 = rng.normal(scale=0.1, size=(perc.shape[0], 1))
    r1 = rng.normal(scale=0.1, size=perc.shape)
    return (perc + (r0 + r1) * perc * (1 - perc)).astype(np.float32)


def train(steps: int = 400, batch: int = 64, seq_len: int = 400,
          lr: float = 3e-3, lr_decay: float = 1e-3, seed: int = 0,
          log_every: int = 0):
    """Returns (params, history) where history is the per-step BCE."""
    rng = np.random.default_rng(seed)
    params = init_params(seed)
    sched = lambda step: lr / (1.0 + lr_decay * step)
    opt = optax.adamw(sched, b1=0.8, b2=0.98, eps=1e-8)
    opt_state = opt.init(params)

    @jax.jit
    def update(params, opt_state, loss, perc):
        val, grads = jax.value_and_grad(bce_next_step)(params, loss,
                                                       perc)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    history = []
    for i in range(steps):
        traces = gilbert_elliott_traces(batch, seq_len, rng)
        perc = perturb_perc(running_perc(traces), rng)
        params, opt_state, val = update(params, opt_state,
                                        jnp.asarray(traces),
                                        jnp.asarray(perc))
        history.append(float(val))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}: bce {history[-1]:.5f}")
    return params, history


def export_blob(params: LossGenParams) -> bytes:
    """Runtime TLV blob under the names model_from_arrays reads."""
    names = ("lossgen_dense_in", "lossgen_gru1_input",
             "lossgen_gru1_recurrent", "lossgen_gru2_input",
             "lossgen_gru2_recurrent", "lossgen_dense_out")
    arrays = []
    for name, lin in zip(names, params):
        # linear_params reads float_weights as [nb_inputs, nb_outputs]
        # row-major flat — exactly Linear.w's layout
        w = np.asarray(lin.w, np.float32).reshape(-1)
        arrays.append(WeightArray(f"{name}_weights_float",
                                  WEIGHT_TYPE_FLOAT, w))
        arrays.append(WeightArray(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                                  np.asarray(lin.bias, np.float32)))
    return write_blob(arrays)

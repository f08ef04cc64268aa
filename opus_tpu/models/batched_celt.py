"""Batched TPU CELT synthesis: the decode-side DSP as one jittable step over
thousands of independent streams (SURVEY.md §2.6: streams are the batch axis).

The per-stream scalar decoder (opus_tpu.celt.decoder) produces the symbol
tensors (band shapes X, band log-energies); this module turns them into PCM
on the MXU:

  denormalise (band gains)  ->  IMDCT (basis matmul)  ->  TDAC overlap  ->
  deemphasis (first-order IIR as associative scan)

State per stream is a flat pytree of arrays, so sharding over a device mesh
is a NamedSharding on the leading axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..celt.modes import mode_create
from ..celt.tables import E_MEANS
from ..ops.mdct import _backward_basis, _window


class SynthState(NamedTuple):
    """Per-stream synthesis carry state (leading dim = batch)."""
    tail: jax.Array        # [B, overlap/2] raw IMDCT tail
    deemph: jax.Array      # [B] deemphasis memory


def init_state(batch: int, fs: int = 48000, frame_size: int = 960):
    mode = mode_create(fs, frame_size)
    return SynthState(
        tail=jnp.zeros((batch, mode.overlap // 2), jnp.float32),
        deemph=jnp.zeros((batch,), jnp.float32),
    )


def _band_map(mode, lm: int) -> np.ndarray:
    m = 1 << lm
    n = mode.shortMdctSize << lm
    bm = np.full(n, mode.nbEBands, dtype=np.int32)  # out-of-band -> gain 0
    for i in range(mode.nbEBands):
        bm[m * mode.eBands[i]:m * mode.eBands[i + 1]] = i
    return bm


@partial(jax.jit, static_argnames=("fs", "frame_size", "lm", "transient"))
def synthesis_step(x, band_log_e, state: SynthState, *, fs: int = 48000,
                   frame_size: int = 960, lm: int = 3,
                   transient: bool = False):
    """One frame of batched CELT synthesis.

    x:          [B, N] unit-norm band shapes (interleaved MDCT layout)
    band_log_e: [B, nbEBands] decoded band log2-energies
    returns (pcm [B, N] float in [-1, 1], new state)
    """
    mode = mode_create(fs, frame_size)
    n = mode.shortMdctSize << lm
    overlap = mode.overlap
    ov2 = overlap // 2
    nblocks = (1 << lm) if transient else 1
    n2 = n // nblocks

    # --- denormalise: per-band gain, gathered to per-bin ---
    bm = jnp.asarray(_band_map(mode, lm))
    e_means = jnp.asarray(np.asarray(E_MEANS[:mode.nbEBands], np.float32))
    lg = band_log_e + e_means
    gains = jnp.exp2(jnp.minimum(32.0, lg))
    gains = jnp.concatenate([gains, jnp.zeros_like(gains[:, :1])], axis=-1)
    freq = x * gains[:, bm]

    # --- IMDCT per short block (interleaved layout freq[b + nblocks*k]) ---
    spec = freq.reshape(-1, n2, nblocks).transpose(0, 2, 1)  # [B, blocks, N2]
    basis = jnp.asarray(_backward_basis(n2, overlap))
    core = jnp.matmul(spec, basis, preferred_element_type=jnp.float32)

    # --- TDAC blend across blocks (sequential in blocks, tiny) ---
    w = jnp.asarray(_window(overlap).astype(np.float32))
    w_lo, w_hi = w[:ov2], w[overlap - 1:ov2 - 1:-1]
    tails = jnp.concatenate(
        [state.tail[:, None, :], core[:, :-1, n2 - ov2:]], axis=1)
    cur = core[:, :, ov2 - 1::-1]
    head = w_hi * tails - w_lo * cur
    mid = (w_lo * tails + w_hi * cur)[:, :, ::-1]
    sig = jnp.concatenate([head, mid, core[:, :, ov2:n2 - ov2]], axis=-1)
    sig = sig.reshape(-1, n)
    new_tail = core[:, -1, n2 - ov2:]

    # --- deemphasis y[n] = x[n] + c*y[n-1] as an associative scan ---
    coef = jnp.float32(mode.preemph[0])
    a = jnp.full_like(sig, coef)
    a = a.at[:, 0].set(coef)  # uniform decay; carry handled via injection
    x0 = sig.at[:, 0].add(coef * state.deemph)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, br + ar * bl

    _, y = jax.lax.associative_scan(combine, (a, x0), axis=1)
    pcm = y * (1.0 / 32768.0)
    return pcm, SynthState(tail=new_tail, deemph=y[:, -1])

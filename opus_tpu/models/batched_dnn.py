"""Batched TPU execution of the neural stacks (SURVEY.md SS2.6: the
reference scales by running many independent codecs; here the batch
axis is a leading dim through every DNN state).

The JAX modules in opus_tpu.dnn are written batch-polymorphic; this
module packages them as jitted, scan-over-frames step functions and
shards the stream axis over a device mesh, so thousands of FARGAN
vocoder streams (deep-PLC/DRED synthesis) or RDOVAE decoders run as a
single XLA program on the MXU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dnn import fargan as fg
from ..dnn import rdovae


def fargan_batch_step(model: fg.FARGANModel):
    """Returns a jitted (state, features[B,20]) -> (state, pcm[B,160])
    step over a stream batch."""

    def step(state, features):
        return fg.synthesize_frame(model, state, features)

    return jax.jit(step)


def fargan_synthesize_frames(model: fg.FARGANModel,
                             state: fg.FARGANState,
                             features: jax.Array):
    """Scan over T feature frames for a whole batch in one XLA call.
    features: [T, B, 20] -> pcm [T, B, 160]."""

    def body(s, f):
        s, pcm = fg.synthesize_frame(model, s, f)
        return s, pcm

    return jax.lax.scan(body, state, features)


def rdovae_decode_frames(model: rdovae.RDOVAEDec,
                         initial_state: jax.Array,
                         latents: jax.Array):
    """Batched DRED recovery: latents [T, B, 81] -> features
    [T, B, 80] (4 x 20 per qframe), initial_state [B, 24]."""
    state = rdovae.dec_init_state(model, initial_state)

    def body(s, z):
        s, q = rdovae.decode_qframe(model, s, z)
        return s, q

    return jax.lax.scan(body, state, latents)


def shard_fargan_state(mesh, state: fg.FARGANState) -> fg.FARGANState:
    """Shard every leaf of the vocoder state over the 'dp' mesh axis
    (stream batch is the leading dim everywhere)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), state)

"""Mesh/sharding utilities.

The codec is embarrassingly parallel over streams (SURVEY.md §2.6): per-stream
state becomes leading-dim-B arrays sharded over the 'dp' mesh axis; shared
tables (mode constants, DNN weights) are replicated (later: tensor-parallel
over 'tp' for the big DNN matmuls).  No cross-stream communication exists in
the algorithm, so collectives only appear in weight broadcast and (future)
tp-sharded DNN layers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: int | None = None, tp: int = 1) -> Mesh:
    """Create a (dp, tp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_streams(mesh: Mesh, tree):
    """Shard every array in the pytree over its leading (stream) axis."""
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicated(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

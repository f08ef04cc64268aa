"""First-order IIR (deemphasis) as a Pallas TPU kernel.

The decode-side deemphasis y[n] = x[n] + c*y[n-1] (reference:
deemphasis celt/celt_decoder.c:318; FARGAN uses the same form,
dnn/fargan.c:62) is the only sequential op left in the batched
synthesis pipeline.  A sample-by-sample lax.scan serializes 960 steps;
this kernel computes it blockwise on the MXU instead:

  within a block of K samples:  y = L @ x + c^(k+1) * carry
  where L[i, j] = c^(i-j) for i >= j (lower-triangular Toeplitz)

so each K-sample block is one [B, K] x [K, K] matmul, and only the
carry (one scalar per stream) crosses blocks.  The grid iterates over
blocks sequentially (TPU grid order), keeping the carry in VMEM
scratch.  For a 20 ms frame this turns 960 dependent steps into
960/K dependent matmuls over the whole stream batch."""

from __future__ import annotations

from functools import partial, lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
TILE_B = 512        # batch tile: keeps VMEM usage bounded


@lru_cache(maxsize=None)
def _toeplitz(coef: float, k: int) -> np.ndarray:
    """L[i, j] = coef^(i-j) for i >= j else 0 (applied as x @ L.T)."""
    i = np.arange(k)
    d = i[:, None] - i[None, :]
    return np.where(d >= 0, float(coef) ** np.maximum(d, 0),
                    0.0).astype(np.float32)


@lru_cache(maxsize=None)
def _powers(coef: float, k: int) -> np.ndarray:
    """coef^(n+1) for n in [0, k): the carry's contribution."""
    return (float(coef) ** (np.arange(k) + 1)).astype(np.float32)


def _kernel(x_ref, mem_ref, lt_ref, pw_ref, y_ref, mem_out_ref,
            carry_ref):
    i = pl.program_id(1)          # sample-block index (fastest)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = mem_ref[:]

    x = x_ref[:]                                  # [TILE_B, BLOCK]
    # y = x @ L^T + carry * powers; HIGHEST precision keeps the IIR
    # within float32 accuracy (default MXU bf16 passes cost ~3e-3)
    y = jnp.dot(x, lt_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    y = y + carry_ref[:] * pw_ref[:]              # [B,1]*[1,BLOCK]
    y_ref[:] = y
    carry_ref[:] = y[:, BLOCK - 1:BLOCK]

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        mem_out_ref[:] = carry_ref[:]


@partial(jax.jit, static_argnames=("coef", "interpret"))
def deemphasis(x: jax.Array, mem: jax.Array, coef: float,
               interpret: bool = False):
    """Batched y[n] = x[n] + coef*y[n-1].  x: [B, N], mem: [B] initial
    y[-1].  Returns (y [B, N], new mem [B]).  N is zero-padded up to a
    multiple of 128 internally (e.g. the 960-sample 20 ms frame)."""
    b, n0 = x.shape
    n = ((n0 + BLOCK - 1) // BLOCK) * BLOCK
    if n != n0:
        x = jnp.pad(x, ((0, 0), (0, n - n0)))
    lt = jnp.asarray(_toeplitz(coef, BLOCK).T)    # x @ L.T form
    pw = jnp.asarray(_powers(coef, BLOCK)).reshape(1, BLOCK)
    b0 = b
    tb = min(TILE_B, b)
    if b % tb:
        pad_b = ((b + tb - 1) // tb) * tb - b
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        mem = jnp.pad(mem, (0, pad_b))
        b = b + pad_b
    mem2 = mem.reshape(b, 1).astype(jnp.float32)
    y, mem_out = pl.pallas_call(
        _kernel,
        grid=(b // tb, n // BLOCK),
        in_specs=[
            pl.BlockSpec((tb, BLOCK), lambda bi, i: (bi, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda bi, i: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, BLOCK), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, BLOCK), lambda bi, i: (bi, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda bi, i: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tb, 1), jnp.float32)],
        interpret=interpret,
    )(x.astype(jnp.float32), mem2, lt, pw)
    if b != b0:
        y = y[:b0]
        mem_out = mem_out[:b0]
    if n != n0:
        return y[:, :n0], y[:, n0 - 1]
    return y, mem_out.reshape(-1)


def deemphasis_scan(x: jax.Array, mem: jax.Array, coef: float):
    """Reference lax.scan implementation (for CPU and testing)."""
    def body(m, col):
        y = col + coef * m
        return y, y
    new_mem, ys = jax.lax.scan(body, mem, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(ys, 0, -1), new_mem

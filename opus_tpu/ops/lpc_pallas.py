"""Order-16 LPC synthesis recursion as a Pallas TPU kernel.

The SILK decoder's hot recurrence (reference: silk_decode_core
silk/decode_core.c:195-216) is

    pred  = order/2 + sum_j SMULWB(state[j], a_rev[j])      (int32 wrap)
    v     = ADD_SAT32(res[i], LSHIFT_SAT32(pred, 4))
    state = shift_in(state, v)

per sample — a true serial dependency that cannot be blocked without
changing the truncating fixed-point semantics.  The lax.scan version
(opus_tpu/models/batched_silk.py:_lpc_subframe) lowers to an XLA while
loop whose carry round-trips through memory each step and whose
per-step overhead dwarfs the 16 multiplies of useful work.

This kernel keeps everything resident in VMEM/vector registers:

 - each of the 16 state taps is one full [8, 128] VPU tile, so every
   vector op advances 1024 streams at once (a [1, 128] layout wastes
   7/8 of each op);
 - the per-sample state shift is register renaming in an unrolled
   8-sample block, not a data shuffle;
 - the grid walks B/1024 superblocks, each running the whole subframe.

Bit-exact with the scan (same fixed-point semantics; verified in
tests/test_lpc_pallas.py), so batched_silk can switch freely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8                  # int32 sublanes per VPU tile
TILE = SUBL * LANES       # 1024 streams per superblock
MAX_LPC_ORDER = 16
UNROLL = 8                # divides every SILK subframe length (40/80)
_I32_MAX = 2147483647
_I32_MIN = -2147483648


# silk_fixed twins with Python-literal constants: module-level jnp
# scalars would be captured consts, which pallas_call rejects
def _smulwb(a, b):
    return (a >> 16) * b + ((jnp.bitwise_and(a, 0xFFFF) * b) >> 16)


def _add_sat32(a, b):
    s = a + b
    overflow = ((a ^ b) >= 0) & ((a ^ s) < 0)
    return jnp.where(overflow,
                     jnp.where(a >= 0, _I32_MAX, _I32_MIN), s)


def _lshift_sat32(a, shift: int):
    hi = _I32_MAX >> shift
    lo = _I32_MIN >> shift
    return jnp.where(a > hi, _I32_MAX,
                     jnp.where(a < lo, _I32_MIN, a << shift))


def _kernel(sf: int, order_half: int, res_ref, a_ref, s0_ref, v_ref,
            sn_ref):
    # refs: res [1, sf, 8, 128]; a/s0/sn [1, 16, 8, 128]; v like res
    aj = [a_ref[0, j] for j in range(MAX_LPC_ORDER)]        # [8,128]

    def body(blk, state):                  # tuple of 16 [8, 128]
        r_blk = res_ref[0, pl.ds(blk * UNROLL, UNROLL)]     # [U,8,128]
        s = list(state)
        outs = []
        for t in range(UNROLL):
            # balanced add tree: dependency depth 4 instead of 16
            # (int32 adds wrap identically in any association order)
            terms = [_smulwb(s[j], aj[j]) for j in range(MAX_LPC_ORDER)]
            while len(terms) > 1:
                terms = [terms[i] + terms[i + 1]
                         for i in range(0, len(terms), 2)]
            pred = order_half + terms[0]
            v = _add_sat32(r_blk[t], _lshift_sat32(pred, 4))
            outs.append(v)
            s = s[1:] + [v]
        v_ref[0, pl.ds(blk * UNROLL, UNROLL)] = jnp.stack(outs, axis=0)
        return tuple(s)

    state = tuple(s0_ref[0, j] for j in range(MAX_LPC_ORDER))
    state = jax.lax.fori_loop(0, sf // UNROLL, body, state)
    sn_ref[0] = jnp.stack(list(state), axis=0)


@partial(jax.jit, static_argnames=("order_half", "interpret"))
def lpc_subframe(slpc, res, a_rev, order_half: int,
                 interpret: bool = False):
    """Drop-in twin of batched_silk._lpc_subframe.

    slpc: [B, 16] i32 state (most recent last); res: [B, sf] i32;
    a_rev: [B, 16] i32 (int16-valued, reversed coefficients).
    Returns (v [B, sf] i32, new slpc [B, 16] i32).
    """
    b, sf = res.shape
    bp = ((b + TILE - 1) // TILE) * TILE
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        slpc = jnp.pad(slpc, pad)
        res = jnp.pad(res, pad)
        a_rev = jnp.pad(a_rev, pad)
    g = bp // TILE

    def to_tiles(x):                       # [Bp, K] -> [G, K, 8, 128]
        k = x.shape[1]
        return x.reshape(g, SUBL, LANES, k).transpose(0, 3, 1, 2)

    res_t = to_tiles(res)
    a_t = to_tiles(a_rev)
    s_t = to_tiles(slpc)

    v_t, sn_t = pl.pallas_call(
        partial(_kernel, sf, order_half),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, sf, SUBL, LANES), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MAX_LPC_ORDER, SUBL, LANES),
                         lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MAX_LPC_ORDER, SUBL, LANES),
                         lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sf, SUBL, LANES), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MAX_LPC_ORDER, SUBL, LANES),
                         lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, sf, SUBL, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, MAX_LPC_ORDER, SUBL, LANES),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(res_t, a_t, s_t)

    def from_tiles(x):                     # [G, K, 8, 128] -> [Bp, K]
        return x.transpose(0, 2, 3, 1).reshape(bp, x.shape[1])

    return from_tiles(v_t)[:b], from_tiles(sn_t)[:b]

"""SILK fixed-point macros as int32-exact JAX ops.

The SILK decoder is specified in 32-bit fixed point (reference:
silk/SigProc_FIX.h, macros.h).  TPUs have no int64, so the 64-bit
intermediates are decomposed into exact int32 sequences:

  SMULWB(a, b) = (a * b16) >> 16
               = (a >> 16) * b16  +  (((a & 0xffff) * b16) >> 16)
    both partial products fit int32, so the identity is value-exact.

  SMULWW(a, b) = (a * b) >> 16
               = wrap32(a * (b >> 16)) + SMULWB(a, b & 0xffff-as-u16)
    exact modulo 2^32 — which is the reference semantics, since the C
    code assigns the 64-bit product's low 32 bits.

Additions follow two's-complement wrap (XLA int32 semantics), matching
the reference; saturating ops (ADD_SAT32 / LSHIFT_SAT32 / SAT16) are
implemented with explicit overflow checks.  The scalar oracle for all of
these is opus_tpu/silk/macros.py (tests/test_silk_fixed.py fuzzes them
against each other).
"""

from __future__ import annotations

import jax.numpy as jnp

I32_MAX = jnp.int32(2147483647)
I32_MIN = jnp.int32(-2147483648)


def smulwb(a, b):
    """(a32 * b.int16) >> 16, value-exact.  b must hold int16 values."""
    ah = a >> 16
    al = jnp.bitwise_and(a, 0xFFFF)          # [0, 65535]
    return ah * b + ((al * b) >> 16)


def smulww(a, b):
    """(a32 * b32) >> 16, exact mod 2^32 (reference C wraps to int32)."""
    bh = b >> 16
    bl = jnp.bitwise_and(b, 0xFFFF)
    # (a * bl) >> 16 with bl in [0, 65535]:
    ah = a >> 16
    al = jnp.bitwise_and(a, 0xFFFF)
    lo = jnp.right_shift(
        (al.astype(jnp.uint32) * bl.astype(jnp.uint32)),
        jnp.uint32(16)).astype(jnp.int32)
    return a * bh + ah * bl + lo


def sat16(a):
    return jnp.clip(a, -32768, 32767)


def add_sat32(a, b):
    s = a + b                                 # wraps
    overflow = ((a ^ b) >= 0) & ((a ^ s) < 0)
    return jnp.where(overflow, jnp.where(a >= 0, I32_MAX, I32_MIN), s)


def lshift_sat32(a, shift: int):
    hi = I32_MAX >> shift
    lo = I32_MIN >> shift
    return jnp.where(a > hi, I32_MAX,
                     jnp.where(a < lo, I32_MIN, a << shift))


def rshift_round(a, shift: int):
    if shift == 1:
        return (a >> 1) + jnp.bitwise_and(a, 1)
    return ((a >> (shift - 1)) + 1) >> 1

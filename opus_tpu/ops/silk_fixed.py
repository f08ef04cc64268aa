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

import jax
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


# --------------------------------------------------------------------- #
# 64-bit emulation on int32 lanes (TPUs have no int64): products as      #
# (hi, lo) uint32 limb pairs, with the rounded shifts the SILK NLSF/LPC  #
# math needs (silk/Inlines.h, NLSF2A.c, LPC_inv_pred_gain.c)             #
# --------------------------------------------------------------------- #

_U32 = jnp.uint32


def mul64(a, b):
    """Signed 32x32 -> 64-bit product as (hi int32-bits, lo) uint32."""
    au = a.astype(_U32)
    bu = b.astype(_U32)
    a_lo = au & 0xFFFF
    a_hi = au >> 16
    b_lo = bu & 0xFFFF
    b_hi = bu >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (ll & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi_u = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    # unsigned -> signed product correction: subtract (a<0)*b and (b<0)*a
    hi = hi_u - jnp.where(a < 0, bu, _U32(0)) - jnp.where(b < 0, au,
                                                          _U32(0))
    return hi.astype(jnp.int32), lo


def shr64(hi, lo, s):
    """Arithmetic right shift of a 64-bit (hi,lo) by dynamic s in [0,63];
    returns the low 32 bits of the result (callers guarantee fit)."""
    s = s.astype(_U32) if hasattr(s, "astype") else jnp.uint32(s)
    hiu = hi.astype(_U32)
    small = s < 32
    s1 = jnp.where(small, s, _U32(0))
    lo_part = jnp.where(s1 == 0, lo, (lo >> s1)
                        | (hiu << (_U32(32) - s1)))
    big_sh = jnp.where(small, _U32(0), s - 32)
    hi_shift = (hi >> big_sh.astype(jnp.int32)).astype(_U32)
    return jnp.where(small, lo_part, hi_shift).astype(jnp.int32)


def rshift_round64(hi, lo, s):
    """RSHIFT_ROUND64 of a 64-bit (hi,lo) by dynamic s >= 1, low 32 bits.

    ((v >> (s-1)) + 1) >> 1  ==  (v + (1 << (s-1))) >> s, computed in
    64-bit limbs so the intermediate never truncates."""
    s = s if hasattr(s, "astype") else jnp.asarray(s, jnp.int32)
    sm1 = (s - 1).astype(_U32)
    rc_lo = jnp.where(sm1 < 32, _U32(1) << jnp.minimum(sm1, 31), _U32(0))
    rc_hi = jnp.where(sm1 >= 32,
                      _U32(1) << jnp.minimum(sm1 - 32, 31), _U32(0))
    lo2 = lo + rc_lo
    carry = (lo2 < lo).astype(_U32)
    hi2 = (hi.astype(_U32) + rc_hi + carry).astype(jnp.int32)
    return shr64(hi2, lo2, s)


def smmul(a, b):
    """(a*b) >> 32, signed (silk_SMMUL)."""
    hi, _ = mul64(a, b)
    return hi


def clz32(x):
    xu = x.astype(_U32)
    return jnp.where(xu == 0, 32, jax.lax.clz(xu)).astype(jnp.int32)


def div32(a, b):
    """C-style truncating int32 division (silk_DIV32_16 / silk_DIV32)."""
    return jax.lax.div(a, b)


def inverse32_varq(b32, qres):
    """silk_INVERSE32_varQ (Inlines.h:139); qres static int."""
    absb = jnp.where(b32 > 0, b32, -b32)
    b_headrm = clz32(absb) - 1
    b32_nrm = (b32.astype(_U32) << b_headrm.astype(_U32)).astype(jnp.int32)
    denom = jnp.int32(b32_nrm >> 16)       # int16 value in int32
    b32_inv = jax.lax.div(jnp.int32((1 << 29) - 1 >> 0) * 0
                          + jnp.int32(0x7FFFFFFF >> 2), denom)
    result = (b32_inv.astype(_U32) << 16).astype(jnp.int32)
    err_q32 = ((jnp.int32(1 << 29)
                - smulwb(b32_nrm, b32_inv)).astype(_U32) << 3) \
        .astype(jnp.int32)
    # SMLAWW(result, err_q32, b32_inv)
    result = result + smulww(err_q32, b32_inv)
    lshift = 61 - b_headrm - qres
    le0 = lshift <= 0
    shl = jnp.minimum(-lshift, 31)
    sat = lshift_sat32_dyn(result, jnp.where(le0, shl, 0))
    shr = jnp.where((~le0) & (lshift < 32), lshift, 31).astype(_U32)
    shifted = result >> shr
    out = jnp.where(le0, sat, jnp.where(lshift < 32, shifted, 0))
    return out


def div32_varq(a32, b32, qres):
    """silk_DIV32_varQ (Inlines.h:93); qres static int."""
    absa = jnp.where(a32 > 0, a32, -a32)
    a_headrm = clz32(absa) - 1
    a32_nrm = (a32.astype(_U32) << a_headrm.astype(_U32)).astype(jnp.int32)
    absb = jnp.where(b32 > 0, b32, -b32)
    b_headrm = clz32(absb) - 1
    b32_nrm = (b32.astype(_U32) << b_headrm.astype(_U32)).astype(jnp.int32)
    denom = jnp.int32(b32_nrm >> 16)
    b32_inv = jax.lax.div(jnp.int32(0x7FFFFFFF >> 2), denom)
    result = smulwb(a32_nrm, b32_inv)
    a32_nrm = a32_nrm - ((smmul(b32_nrm, result).astype(_U32) << 3)
                         .astype(jnp.int32))
    result = result + smulwb(a32_nrm, b32_inv)
    lshift = 29 + a_headrm - b_headrm - qres
    lt0 = lshift < 0
    shl = jnp.minimum(-lshift, 31)
    sat = lshift_sat32_dyn(result, jnp.where(lt0, shl, 0))
    shr = jnp.where((~lt0) & (lshift < 32), lshift, 31).astype(_U32)
    shifted = result >> shr
    return jnp.where(lt0, sat, jnp.where(lshift < 32, shifted, 0))


def lshift_sat32_dyn(a, shift):
    """LSHIFT_SAT32 with dynamic per-lane shift."""
    sh = shift.astype(_U32) if hasattr(shift, "astype") \
        else jnp.uint32(shift)
    hi = I32_MAX >> sh
    lo = I32_MIN >> sh
    return jnp.where(a > hi, I32_MAX,
                     jnp.where(a < lo, I32_MIN,
                               (a.astype(_U32) << sh).astype(jnp.int32)))


def log2lin(in_log_q7):
    """silk_log2lin, exact int32 (silk/log2lin.c)."""
    neg = in_log_q7 < 0
    big = in_log_q7 >= 3967
    v = jnp.clip(in_log_q7, 0, 3966)
    out = jnp.int32(1) << (v >> 7).astype(_U32)
    frac_q7 = v & 0x7F
    poly = frac_q7 + ((frac_q7 * (128 - frac_q7) * jnp.int32(-174)) >> 16)
    small = v < 2048
    out2 = jnp.where(small, out + ((out * poly) >> 7),
                     out + (out >> 7) * poly)
    return jnp.where(neg, 0, jnp.where(big, I32_MAX, out2))

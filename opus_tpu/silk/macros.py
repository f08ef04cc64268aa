"""SILK fixed-point macro semantics as exact Python int functions
(reference: silk/SigProc_FIX.h, silk/macros.h, silk/Inlines.h).

The SILK decoder is specified in fixed point; these helpers reproduce the
exact 32/64-bit arithmetic on unbounded Python ints.  Where the reference
relies on well-defined wraparound (_ovflw variants), we wrap explicitly.
"""

from __future__ import annotations

INT16_MAX = 32767
INT16_MIN = -32768
INT32_MAX = 2147483647
INT32_MIN = -2147483648


def wrap32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def wrap16(x: int) -> int:
    x &= 0xFFFF
    return x - 0x10000 if x >= 0x8000 else x


def SAT16(x: int) -> int:
    return INT16_MAX if x > INT16_MAX else (INT16_MIN if x < INT16_MIN else x)


def SAT32(x: int) -> int:
    return INT32_MAX if x > INT32_MAX else (INT32_MIN if x < INT32_MIN else x)


def SMULWB(a: int, b: int) -> int:
    """(a32 * b.int16) >> 16."""
    return (a * wrap16(b)) >> 16


def SMLAWB(a: int, b: int, c: int) -> int:
    return a + ((b * wrap16(c)) >> 16)


def SMULWW(a: int, b: int) -> int:
    return (a * b) >> 16


def SMLAWW(a: int, b: int, c: int) -> int:
    return a + ((b * c) >> 16)


def SMULBB(a: int, b: int) -> int:
    return wrap16(a) * wrap16(b)


def SMLABB(a: int, b: int, c: int) -> int:
    return a + wrap16(b) * wrap16(c)


def SMLABB_ovflw(a: int, b: int, c: int) -> int:
    return wrap32(wrap32(a) + wrap16(b) * wrap16(c))


def ADD32_ovflw(a: int, b: int) -> int:
    return wrap32(a + b)


def SUB32_ovflw(a: int, b: int) -> int:
    return wrap32(a - b)


def SMULWT(a: int, b: int) -> int:
    return (a * (b >> 16)) >> 16


def SMULBT(a: int, b: int) -> int:
    return wrap16(a) * (b >> 16)


def SMMUL(a: int, b: int) -> int:
    return (a * b) >> 32


def RSHIFT_ROUND(a: int, shift: int) -> int:
    if shift == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (shift - 1)) + 1) >> 1


RSHIFT_ROUND64 = RSHIFT_ROUND


def LSHIFT_SAT32(a: int, shift: int) -> int:
    return SAT32(a << shift)


def ADD_SAT32(a: int, b: int) -> int:
    return SAT32(a + b)


def SUB_SAT32(a: int, b: int) -> int:
    return SAT32(a - b)


def ADD_SAT16(a: int, b: int) -> int:
    return SAT16(a + b)


def CLZ32(x: int) -> int:
    x &= 0xFFFFFFFF
    return 32 - x.bit_length()


def silk_abs(x: int) -> int:
    return abs(x)


def SILK_FIX_CONST(c: float, q: int) -> int:
    return int(c * (1 << q) + 0.5)


def silk_RAND(seed: int) -> int:
    """RAND_MULTIPLIER * seed + RAND_INCREMENT, wrapped to int32."""
    return wrap32(907633515 + wrap32(seed * 196314165))


def DIV32_16(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


DIV32 = DIV32_16


def INVERSE32_varQ(b32: int, qres: int) -> int:
    """Approximate (1 << qres) / b32 (reference: Inlines.h:139)."""
    assert b32 != 0 and qres > 0
    b_headrm = CLZ32(abs(b32)) - 1
    b32_nrm = wrap32(b32 << b_headrm)
    b32_inv = DIV32_16(INT32_MAX >> 2, wrap16(b32_nrm >> 16))
    result = b32_inv << 16
    err_q32 = ((1 << 29) - SMULWB(b32_nrm, b32_inv)) << 3
    result = SMLAWW(result, err_q32, b32_inv)
    lshift = 61 - b_headrm - qres
    if lshift <= 0:
        return LSHIFT_SAT32(result, -lshift)
    if lshift < 32:
        return result >> lshift
    return 0


def DIV32_varQ(a32: int, b32: int, qres: int) -> int:
    """Approximate (a32 << qres) / b32 (reference: Inlines.h:93)."""
    assert b32 != 0 and qres >= 0
    a_headrm = CLZ32(abs(a32)) - 1
    a32_nrm = wrap32(a32 << a_headrm)
    b_headrm = CLZ32(abs(b32)) - 1
    b32_nrm = wrap32(b32 << b_headrm)
    b32_inv = DIV32_16(INT32_MAX >> 2, wrap16(b32_nrm >> 16))
    result = SMULWB(a32_nrm, b32_inv)
    a32_nrm = SUB32_ovflw(a32_nrm, wrap32(SMMUL(b32_nrm, result) << 3))
    result = SMLAWB(result, a32_nrm, b32_inv)
    lshift = 29 + a_headrm - b_headrm - qres
    if lshift < 0:
        return LSHIFT_SAT32(result, -lshift)
    if lshift < 32:
        return result >> lshift
    return 0


def log2lin(in_log_q7: int) -> int:
    """(reference: silk/log2lin.c)"""
    if in_log_q7 < 0:
        return 0
    if in_log_q7 >= 3967:
        return INT32_MAX
    out = 1 << (in_log_q7 >> 7)
    frac_q7 = in_log_q7 & 0x7F
    if in_log_q7 < 2048:
        out = out + ((out * SMLAWB(frac_q7, SMULBB(frac_q7, 128 - frac_q7),
                                   -174)) >> 7)
    else:
        out = out + (out >> 7) * SMLAWB(frac_q7, SMULBB(frac_q7, 128 - frac_q7),
                                        -174)
    return out


def lin2log(in_lin: int) -> int:
    """(reference: silk/lin2log.c)"""
    lz, frac_q7 = CLZ_FRAC(in_lin)
    frac_q7 = SMLAWB(frac_q7, SMULBB(frac_q7, 128 - frac_q7), 179)
    return ((31 - lz) << 7) + frac_q7


def CLZ_FRAC(inp: int):
    lz = CLZ32(inp)
    frac_q7 = ((inp * (1 << 24 >> 0)) >> 0)  # placeholder; computed below
    frac_q7 = (ROR32(inp, 24 - lz)) & 0x7f
    return lz, frac_q7


def ROR32(a32: int, rot: int) -> int:
    u = a32 & 0xFFFFFFFF
    if rot == 0:
        return wrap32(u)
    if rot < 0:
        m = -rot
        v = ((u << m) | (u >> (32 - m))) & 0xFFFFFFFF
    else:
        v = ((u << (32 - rot)) | (u >> rot)) & 0xFFFFFFFF
    return wrap32(v)


def SQRT_APPROX(x: int) -> int:
    """(reference: Inlines.h silk_SQRT_APPROX)"""
    if x <= 0:
        return 0
    lz, frac_q7 = CLZ_FRAC(x)
    if lz & 1:
        y = 32768
    else:
        y = 46214
    y >>= (lz >> 1)
    y = SMLAWB(y, y, SMULBB(213, frac_q7))
    return y


def sum_sqr_shift(x) -> tuple[int, int]:
    """Energy with right-shift to fit in int32 with headroom
    (reference: silk/sum_sqr_shift.c).  Returns (energy, shift)."""
    n = len(x)

    def accumulate(shft):
        nrg = n if shft_is_first[0] else 0
        i = 0
        while i < n - 1:
            tmp = (SMULBB(x[i], x[i])
                   + SMULBB(x[i + 1], x[i + 1])) & 0xFFFFFFFF
            nrg = wrap32(nrg + (tmp >> shft))
            i += 2
        if i < n:
            tmp = SMULBB(x[i], x[i]) & 0xFFFFFFFF
            nrg = wrap32(nrg + (tmp >> shft))
        return nrg

    shft_is_first = [True]
    shft = 31 - CLZ32(n)
    nrg = accumulate(shft)
    shft = max(0, shft + 3 - CLZ32(nrg))
    shft_is_first[0] = False
    nrg = accumulate(shft)
    return nrg, shft

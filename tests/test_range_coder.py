"""Entropy-layer tests: self round-trip + differential vs the reference oracle.

Mirrors the strategy of the reference's celt/tests/test_unit_entropy.c and
test_unit_laplace.c (see SURVEY.md §4 tier 1), plus a randomized differential
check against the actual reference coder compiled as a shared library.
"""

import ctypes
import random

import pytest

from opus_tpu.bitstream.range_coder import RangeEncoder, RangeDecoder
from opus_tpu.bitstream import laplace

from oracle import OracleEncoder, OracleDecoder


def random_ops(rng, n):
    """A random schedule of coder operations with matched enc/dec forms."""
    ops = []
    for _ in range(n):
        kind = rng.randrange(6)
        if kind == 0:
            ft = rng.randrange(2, 1 << 15)
            s = rng.randrange(ft)
            ops.append(("encode", s, ft))
        elif kind == 1:
            bits = rng.randrange(1, 16)
            total = 1 << bits
            s = rng.randrange(total)
            ops.append(("encode_bin", s, bits))
        elif kind == 2:
            logp = rng.randrange(1, 15)
            ops.append(("bit_logp", rng.randrange(2), logp))
        elif kind == 3:
            # random strictly-decreasing icdf table ending in 0
            nsym = rng.randrange(2, 10)
            icdf = sorted(rng.sample(range(0, 256), nsym), reverse=True)
            icdf[-1] = 0
            ftb = 8
            s = rng.randrange(nsym)
            ops.append(("icdf", s, tuple(icdf), ftb))
        elif kind == 4:
            ft = rng.randrange(2, 1 << 20)
            fl = rng.randrange(ft)
            ops.append(("uint", fl, ft))
        else:
            bits = rng.randrange(1, 25)
            val = rng.randrange(1 << bits)
            ops.append(("bits", val, bits))
    return ops


def enc_apply(enc, op):
    if op[0] == "encode":
        enc.encode(op[1], op[1] + 1, op[2])
    elif op[0] == "encode_bin":
        enc.encode_bin(op[1], op[1] + 1, op[2])
    elif op[0] == "bit_logp":
        enc.enc_bit_logp(op[1], op[2])
    elif op[0] == "icdf":
        enc.enc_icdf(op[1], op[2], op[3])
    elif op[0] == "uint":
        enc.enc_uint(op[1], op[2])
    elif op[0] == "bits":
        enc.enc_bits(op[1], op[2])


def dec_apply(dec, op):
    if op[0] == "encode":
        fs = dec.decode(op[2])
        dec.update(fs, fs + 1, op[2])
        return fs
    if op[0] == "encode_bin":
        fs = dec.decode_bin(op[2])
        dec.update(fs, fs + 1, 1 << op[2])
        return fs
    if op[0] == "bit_logp":
        return dec.dec_bit_logp(op[2])
    if op[0] == "icdf":
        return dec.dec_icdf(op[1:][1], op[3]) if False else dec.dec_icdf(op[2], op[3])
    if op[0] == "uint":
        return dec.dec_uint(op[2])
    if op[0] == "bits":
        return dec.dec_bits(op[2])


def op_value(op):
    return op[1]


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_random(seed):
    rng = random.Random(seed)
    ops = random_ops(rng, 200)
    enc = RangeEncoder(4096)
    tells = []
    for op in ops:
        enc_apply(enc, op)
        tells.append((enc.tell(), enc.tell_frac()))
    enc.done()
    assert enc.error == 0

    dec = RangeDecoder(enc.data())
    for i, op in enumerate(ops):
        got = dec_apply(dec, op)
        assert got == op_value(op), (i, op, got)
        assert (dec.tell(), dec.tell_frac()) == tells[i], (i, op)


def oracle_enc_apply(o, op):
    lib, ctx = o.lib, ctypes.byref(o.ctx)
    if op[0] == "encode":
        lib.ec_encode(ctx, op[1], op[1] + 1, op[2])
    elif op[0] == "encode_bin":
        lib.ec_encode_bin(ctx, op[1], op[1] + 1, op[2])
    elif op[0] == "bit_logp":
        lib.ec_enc_bit_logp(ctx, op[1], op[2])
    elif op[0] == "icdf":
        table = bytes(op[2])
        lib.ec_enc_icdf(ctx, op[1], table, op[3])
    elif op[0] == "uint":
        lib.ec_enc_uint(ctx, op[1], op[2])
    elif op[0] == "bits":
        lib.ec_enc_bits(ctx, op[1], op[2])


@pytest.mark.parametrize("seed", range(8))
def test_differential_vs_reference(seed):
    """Byte-exact agreement with the reference encoder, and cross-decode."""
    rng = random.Random(1000 + seed)
    ops = random_ops(rng, 300)

    enc = RangeEncoder(8192)
    oenc = OracleEncoder(8192)
    for i, op in enumerate(ops):
        enc_apply(enc, op)
        oracle_enc_apply(oenc, op)
        assert enc.tell() == oenc.tell(), (i, op)
        assert enc.tell_frac() == oenc.tell_frac(), (i, op)
        assert enc.rng == oenc.ctx.rng, (i, op)
        assert enc.val == oenc.ctx.val, (i, op)
    enc.done()
    oenc.lib.ec_enc_done(ctypes.byref(oenc.ctx))
    assert enc.error == 0 and oenc.ctx.error == 0
    assert enc.data() == oenc.data()

    # our decoder reads the reference's bytes
    dec = RangeDecoder(oenc.data())
    for op in ops:
        assert dec_apply(dec, op) == op_value(op)


@pytest.mark.parametrize("seed", range(4))
def test_laplace_differential(seed):
    rng = random.Random(77 + seed)
    vals = [rng.randrange(-30, 31) for _ in range(64)]
    fss = [rng.randrange(1, 16000) for _ in vals]
    decays = [rng.randrange(32, 11456) for _ in vals]

    enc = RangeEncoder(4096)
    oenc = OracleEncoder(4096)
    coded = []
    for v, fs, dc in zip(vals, fss, decays):
        coded.append(laplace.laplace_encode(enc, v, fs, dc))
        cv = ctypes.c_int(v)
        oenc.lib.ec_laplace_encode(ctypes.byref(oenc.ctx), ctypes.byref(cv), fs, dc)
        assert cv.value == coded[-1]
    enc.done()
    oenc.lib.ec_enc_done(ctypes.byref(oenc.ctx))
    assert enc.data() == oenc.data()

    dec = RangeDecoder(enc.data())
    for c, fs, dc in zip(coded, fss, decays):
        assert laplace.laplace_decode(dec, fs, dc) == c


@pytest.mark.parametrize("seed", range(4))
def test_laplace_p0_roundtrip(seed):
    rng = random.Random(99 + seed)
    vals = [rng.randrange(-25, 26) for _ in range(64)]
    p0s = [rng.randrange(1, 32000) for _ in vals]
    decays = [rng.randrange(64, 30000) for _ in vals]

    enc = RangeEncoder(65536)
    oenc = OracleEncoder(65536)
    for v, p0, dc in zip(vals, p0s, decays):
        laplace.laplace_encode_p0(enc, v, p0, dc)
        oenc.lib.ec_laplace_encode_p0(ctypes.byref(oenc.ctx), v, p0, dc)
    enc.done()
    oenc.lib.ec_enc_done(ctypes.byref(oenc.ctx))
    assert enc.data() == oenc.data()

    dec = RangeDecoder(enc.data())
    for v, p0, dc in zip(vals, p0s, decays):
        assert laplace.laplace_decode_p0(dec, p0, dc) == v


def test_patch_initial_bits_and_shrink():
    enc = RangeEncoder(64)
    enc.enc_bit_logp(1, 3)
    for i in range(20):
        enc.enc_uint(i % 7, 9)
    enc.patch_initial_bits(2, 2)
    enc.enc_bits(0x3A, 7)
    enc.done()

    oenc = OracleEncoder(64)
    oenc.lib.ec_enc_bit_logp(ctypes.byref(oenc.ctx), 1, 3)
    for i in range(20):
        oenc.lib.ec_enc_uint(ctypes.byref(oenc.ctx), i % 7, 9)
    oenc.lib.ec_enc_patch_initial_bits(ctypes.byref(oenc.ctx), 2, 2)
    oenc.lib.ec_enc_bits(ctypes.byref(oenc.ctx), 0x3A, 7)
    oenc.lib.ec_enc_done(ctypes.byref(oenc.ctx))
    assert enc.data() == oenc.data()


def test_tell_matches_from_fresh_state():
    enc = RangeEncoder(16)
    assert enc.tell() == 1  # documented surprising property of the coder
    dec = RangeDecoder(b"\x00" * 16)
    assert dec.tell() == 1

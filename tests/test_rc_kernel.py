"""Kernel-safe range decoder (opus_tpu/ops/rc_kernel.py) vs the Python
coder: every primitive fuzzed over random masked op sequences, state
compared field-for-field.  Streams are [B]-shaped here (the ops are
shape-agnostic; the Pallas kernel runs them as [R, 128])."""

import numpy as np
import jax.numpy as jnp
import pytest

from opus_tpu.bitstream.range_coder import RangeDecoder
from opus_tpu.ops import rc_kernel as K

from test_range_vec import ICDF_T, _gen, _py_encode

ICDF = np.asarray(ICDF_T, np.uint8)


@pytest.mark.parametrize("seed", [3, 11])
def test_rc_kernel_decoder_exact(seed):
    B, S, STEPS = 48, 96, 36
    kinds, active, params, values = _gen(seed, B, STEPS)
    pencs = _py_encode(kinds, active, params, values, B, S)
    bufs = np.stack([np.frombuffer(bytes(pe.buf[:S]), np.uint8)
                     for pe in pencs])
    bufw = jnp.asarray(K.pack_words(bufs, S))          # [W, B]
    stj = jnp.full((B,), S, jnp.int32)
    d = K.rk_init(bufw, stj)
    pdecs = [RangeDecoder(bytes(bufs[b])) for b in range(B)]
    for t in range(STEPS):
        am = jnp.asarray(active[t])
        k = kinds[t]
        pv = jnp.asarray(params[t].astype(np.int32))
        if k == 0:
            fs, d = K.rk_decode(d, pv, am)
            d = K.rk_update(d, bufw, stj, fs, fs + 1, pv, am)
            got = np.asarray(fs)
            for b in range(B):
                if active[t, b]:
                    w = pdecs[b].decode(int(params[t][b]))
                    pdecs[b].update(w, w + 1, int(params[t][b]))
                    assert got[b] == w, (t, b)
        elif k == 1:
            r, d = K.rk_dec_bit_logp(d, bufw, stj, int(params[t][0]), am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_bit_logp(
                        int(params[t][b])), (t, b)
        elif k == 2:
            r, d = K.rk_dec_icdf(d, bufw, stj, ICDF_T, 4, am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_icdf(ICDF_T, 4), (t, b)
        elif k == 3:
            r, d = K.rk_dec_bits(d, bufw, stj, jnp.where(am, pv, 0), am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_bits(
                        int(params[t][b])), (t, b)
        else:
            r, d = K.rk_dec_uint(d, bufw, stj, pv, am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_uint(
                        int(params[t][b])), (t, b)
    for b in range(B):
        p = pdecs[b]
        assert (int(d["rng"][b]), int(d["val"][b]), int(d["offs"][b]),
                int(d["nbits_total"][b]), int(d["end_offs"][b]),
                int(d["end_window"][b]), int(d["nend_bits"][b]),
                int(d["rem"][b])) == \
            (p.rng, p.val, p.offs, p.nbits_total, p.end_offs,
             p.end_window, p.nend_bits, p.rem), f"lane {b} state"
        assert int(K.rk_tell(d)[b]) == p.tell()
        assert int(K.rk_tell_frac(d)[b]) == p.tell_frac()


def test_rc_kernel_per_lane_logp_and_bin():
    """Per-lane logp arrays and rk_decode_bin vs the scalar coder."""
    rng = np.random.default_rng(9)
    B, S = 32, 64
    from opus_tpu.bitstream.range_coder import RangeEncoder
    pencs = [RangeEncoder(S) for _ in range(B)]
    seq = []
    for t in range(24):
        logp = rng.integers(1, 9, B)
        bit = rng.integers(0, 2, B)
        ftb = int(rng.integers(2, 10))
        v = rng.integers(0, 1 << ftb, B)
        seq.append((logp, bit, ftb, v))
        for b in range(B):
            pencs[b].enc_bit_logp(int(bit[b]), int(logp[b]))
            pencs[b].encode_bin(int(v[b]), int(v[b]) + 1, ftb)
    for pe in pencs:
        pe.done()
    bufs = np.stack([np.frombuffer(bytes(pe.buf[:S]), np.uint8)
                     for pe in pencs])
    bufw = jnp.asarray(K.pack_words(bufs, S))
    stj = jnp.full((B,), S, jnp.int32)
    d = K.rk_init(bufw, stj)
    pdecs = [RangeDecoder(bytes(bufs[b])) for b in range(B)]
    for logp, bit, ftb, v in seq:
        r, d = K.rk_dec_bit_logp(d, bufw, stj,
                                 jnp.asarray(logp, jnp.int32))
        fs, d = K.rk_decode_bin(d, ftb)
        d = K.rk_update(d, bufw, stj, fs, fs + 1, 1 << ftb)
        rg, fg = np.asarray(r), np.asarray(fs)
        for b in range(B):
            assert rg[b] == pdecs[b].dec_bit_logp(int(logp[b])), b
            w = pdecs[b].decode_bin(ftb)
            pdecs[b].update(w, w + 1, 1 << ftb)
            assert fg[b] == w == v[b], b

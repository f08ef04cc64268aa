"""Vectorized range coder (opus_tpu/ops/range_vec.py) vs the Python
coder: every primitive fuzzed over random masked op sequences, decoder
state compared field-for-field, encoder output compared byte-for-byte
(including the carry-resolution scan)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opus_tpu.bitstream.range_coder import RangeEncoder, RangeDecoder
from opus_tpu.ops import range_vec as V

ICDF_T = (8, 6, 4, 2, 1, 0)
ICDF = np.asarray(ICDF_T, np.uint8)


def _gen(seed, B, STEPS):
    rng = np.random.default_rng(seed)
    kinds = rng.integers(0, 5, STEPS)
    active = rng.random((STEPS, B)) < 0.8
    params, values = [], []
    for t in range(STEPS):
        k = kinds[t]
        if k == 0:
            p = rng.integers(2, 300, B)
            v = (rng.random(B) * p).astype(np.int64)
        elif k == 1:
            p = np.full(B, int(rng.integers(1, 15)))
            v = rng.integers(0, 2, B)
        elif k == 2:
            p = np.full(B, 4)
            v = rng.integers(0, 6, B)
        elif k == 3:
            p = rng.integers(1, 20, B)
            v = (rng.random(B) * (1 << p)).astype(np.int64)
        else:
            p = 2 + rng.integers(0, 1 << rng.integers(2, 20, B),
                                 B).astype(np.int64)
            v = (rng.random(B) * p).astype(np.int64)
        params.append(p)
        values.append(v)
    return kinds, active, params, values


def _py_encode(kinds, active, params, values, B, S):
    pencs = [RangeEncoder(S) for _ in range(B)]
    for t in range(len(kinds)):
        k = kinds[t]
        for b in range(B):
            if not active[t, b]:
                continue
            p, v = int(params[t][b]), int(values[t][b])
            if k == 0:
                pencs[b].encode(v, v + 1, p)
            elif k == 1:
                pencs[b].enc_bit_logp(v, p)
            elif k == 2:
                pencs[b].enc_icdf(v, ICDF_T, 4)
            elif k == 3:
                pencs[b].enc_bits(v, p)
            else:
                pencs[b].enc_uint(v, p)
    for pe in pencs:
        pe.done()
    return pencs


@pytest.mark.parametrize("seed", [2, 7])
def test_encoder_byte_exact(seed):
    B, S, STEPS = 48, 96, 36
    kinds, active, params, values = _gen(seed, B, STEPS)
    pencs = _py_encode(kinds, active, params, values, B, S)
    e = V.re_init(B, S)
    for t in range(STEPS):
        am = jnp.asarray(active[t])
        k = kinds[t]
        pv = jnp.asarray(params[t].astype(np.int32))
        vv = jnp.asarray(values[t].astype(np.int32))
        if k == 0:
            e = V.re_encode(e, vv, vv + 1, pv, am)
        elif k == 1:
            e = V.re_enc_bit_logp(e, vv.astype(bool) & am,
                                  int(params[t][0]), am)
        elif k == 2:
            e = V.re_enc_icdf(e, vv, ICDF, 4, am)
        elif k == 3:
            e = V.re_enc_bits(e, vv, jnp.where(am, pv, 0), am)
        else:
            e = V.re_enc_uint(e, vv, pv, am)
    out, err = V.re_finalize(e, S)
    out, err = np.asarray(out), np.asarray(err)
    for b in range(B):
        if pencs[b].error:
            continue
        assert not err[b], f"lane {b} flagged error"
        assert out[b].tobytes() == bytes(pencs[b].buf[:S]), f"lane {b}"


@pytest.mark.parametrize("seed", [1, 5])
def test_decoder_exact(seed):
    B, S, STEPS = 48, 96, 36
    kinds, active, params, values = _gen(seed, B, STEPS)
    pencs = _py_encode(kinds, active, params, values, B, S)
    bufs = np.stack([np.frombuffer(bytes(pe.buf[:S]), np.uint8)
                     for pe in pencs]).astype(np.int32)
    bufj = jnp.asarray(bufs)
    stj = jnp.full((B,), S, jnp.int32)
    d = V.rd_init(bufj, stj)
    pdecs = [RangeDecoder(bytes(bufs[b].astype(np.uint8)))
             for b in range(B)]
    for t in range(STEPS):
        am = jnp.asarray(active[t])
        k = kinds[t]
        pv = jnp.asarray(params[t].astype(np.int32))
        if k == 0:
            fs, d = V.rd_decode(d, pv, am)
            d = V.rd_update(d, bufj, stj, fs, fs + 1, pv, am)
            got = np.asarray(fs)
            for b in range(B):
                if active[t, b]:
                    w = pdecs[b].decode(int(params[t][b]))
                    pdecs[b].update(w, w + 1, int(params[t][b]))
                    assert got[b] == w, (t, b)
        elif k == 1:
            r, d = V.rd_dec_bit_logp(d, bufj, stj, int(params[t][0]), am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_bit_logp(
                        int(params[t][b])), (t, b)
        elif k == 2:
            r, d = V.rd_dec_icdf(d, bufj, stj, ICDF, 4, am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_icdf(ICDF_T, 4), (t, b)
        elif k == 3:
            r, d = V.rd_dec_bits(d, bufj, stj, jnp.where(am, pv, 0), am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_bits(
                        int(params[t][b])), (t, b)
        else:
            r, d = V.rd_dec_uint(d, bufj, stj, pv, am)
            got = np.asarray(r)
            for b in range(B):
                if active[t, b]:
                    assert got[b] == pdecs[b].dec_uint(
                        int(params[t][b])), (t, b)
    for b in range(B):
        p = pdecs[b]
        assert (int(d.rng[b]), int(d.val[b]), int(d.offs[b]),
                int(d.nbits_total[b]), int(d.end_offs[b]),
                int(d.end_window[b]), int(d.nend_bits[b]),
                int(d.rem[b])) == \
            (p.rng, p.val, p.offs, p.nbits_total, p.end_offs,
             p.end_window, p.nend_bits, p.rem), f"lane {b} state"
        assert int(V.rd_tell(d)[b]) == p.tell()
        assert int(V.rd_tell_frac(d)[b]) == p.tell_frac()

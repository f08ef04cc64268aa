"""Kernel-safe range ENCODER (opus_tpu/ops/rc_enc_kernel.py) vs the
Python coder: masked op-sequence fuzz, produced bytes / final range /
tell compared per lane, plus the dry (tell-only) mode against the real
encode.  [B]-shaped lanes here; the Pallas kernels run the same ops as
[R, 128]."""

import numpy as np
import jax.numpy as jnp
import pytest

from opus_tpu.ops import rc_enc_kernel as RE

from test_range_vec import ICDF_T, _gen, _py_encode


def _drive(kinds, active, params, values, B, S):
    e = RE.re_init((B,))
    dig = RE.PageBuf(jnp.zeros((S + 4, B), jnp.int32), is_ref=False)
    end = RE.PageBuf(jnp.zeros((S + 1, B), jnp.int32), is_ref=False)
    for t in range(len(kinds)):
        am = jnp.asarray(active[t])
        k = kinds[t]
        pv = jnp.asarray(params[t].astype(np.int32))
        vv = jnp.asarray(values[t].astype(np.int32))
        if k == 0:
            e = RE.re_encode(e, dig, vv, vv + 1, pv, am)
        elif k == 1:
            e = RE.re_enc_bit_logp(e, dig, vv & am.astype(np.int32),
                                   int(params[t][0]), am)
        elif k == 2:
            e = RE.re_enc_icdf(e, dig, vv, ICDF_T, 4, am)
        elif k == 3:
            e = RE.re_enc_bits(e, end, vv, jnp.where(am, pv, 0), am)
        else:
            e = RE.re_enc_uint(e, dig, end, vv, pv, am)
    e = RE.re_done(e, dig)
    return e, dig, end


@pytest.mark.parametrize("seed", [2, 7, 19])
def test_enc_kernel_byte_exact(seed):
    B, S, STEPS = 48, 96, 36
    kinds, active, params, values = _gen(seed, B, STEPS)
    pencs = _py_encode(kinds, active, params, values, B, S)
    e, dig, end = _drive(kinds, active, params, values, B, S)
    out, err, rng = RE.finalize(e, dig.buf, end.buf, S)
    out = np.asarray(out)
    for b in range(B):
        assert int(np.asarray(err)[b]) == 0
        ref = bytes(pencs[b].buf[:S])
        assert out[b].tobytes() == ref, b
        assert int(np.asarray(rng)[b]) == (pencs[b].rng & 0xFFFFFFFF), b


def test_enc_kernel_tell_matches_scalar():
    B, S, STEPS = 32, 96, 24
    kinds, active, params, values = _gen(5, B, STEPS)
    from opus_tpu.bitstream.range_coder import RangeEncoder, \
        ec_tell_frac
    pencs = [RangeEncoder(S) for _ in range(B)]
    e = RE.re_init((B,))
    e_dry = RE.re_init((B,))
    dig = RE.PageBuf(jnp.zeros((S + 4, B), jnp.int32), is_ref=False)
    end = RE.PageBuf(jnp.zeros((S + 1, B), jnp.int32), is_ref=False)
    for t in range(STEPS):
        am = jnp.asarray(active[t])
        k = kinds[t]
        pv = jnp.asarray(params[t].astype(np.int32))
        vv = jnp.asarray(values[t].astype(np.int32))
        if k == 3:      # raw bits shift tell but not rng; keep both
            e = RE.re_enc_bits(e, end, vv, jnp.where(am, pv, 0), am)
            e_dry = RE.re_enc_bits(e_dry, end, vv,
                                   jnp.where(am, pv, 0), am)
        else:
            if k == 0:
                args = (vv, vv + 1, pv)
            elif k == 1:
                args = None
            if k == 0:
                e = RE.re_encode(e, dig, *args, am)
                e_dry = RE.re_encode(e_dry, dig, *args, am, dry=True)
            elif k == 1:
                e = RE.re_enc_bit_logp(e, dig, vv, int(params[t][0]),
                                       am)
                e_dry = RE.re_enc_bit_logp(e_dry, dig, vv,
                                           int(params[t][0]), am,
                                           dry=True)
            elif k == 2:
                e = RE.re_enc_icdf(e, dig, vv, ICDF_T, 4, am)
                e_dry = RE.re_enc_icdf(e_dry, dig, vv, ICDF_T, 4, am,
                                       dry=True)
            else:
                e = RE.re_enc_uint(e, dig, end, vv, pv, am)
                e_dry = RE.re_enc_uint(e_dry, dig, end, vv, pv, am)
        for b in range(B):
            if not active[t][b]:
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
        tells = np.asarray(RE.re_tell(e))
        tfs = np.asarray(RE.re_tell_frac(e))
        # dry mode tracks the exact same (rng, nbits_total)
        assert np.array_equal(np.asarray(e["rng"]),
                              np.asarray(e_dry["rng"]))
        assert np.array_equal(np.asarray(e["nbits_total"]),
                              np.asarray(e_dry["nbits_total"]))
        for b in range(B):
            assert tells[b] == pencs[b].tell(), (t, b)
            assert tfs[b] == ec_tell_frac(pencs[b]), (t, b)

"""Fuzz the int32-decomposed JAX fixed-point ops (opus_tpu/ops/silk_fixed)
against the exact Python macros (opus_tpu/silk/macros.py)."""

import numpy as np
import jax.numpy as jnp

from opus_tpu.silk import macros as M
from opus_tpu.ops import silk_fixed as F


def _rand_i32(rng, n):
    # mix uniform full-range with small and boundary values
    v = rng.integers(-2**31, 2**31, n, dtype=np.int64)
    v[: n // 8] = rng.integers(-1000, 1000, n // 8)
    v[n // 8: n // 4] = np.asarray(
        [0, 1, -1, 2**31 - 1, -2**31, 65536, -65536, 0x7FFF])[
            np.arange(n // 8) % 8]
    return v.astype(np.int32)


def _rand_i16(rng, n):
    v = rng.integers(-2**15, 2**15, n, dtype=np.int64)
    v[:4] = [0, 1, -32768, 32767]
    return v.astype(np.int32)


def test_smulwb():
    rng = np.random.default_rng(1)
    a = _rand_i32(rng, 4096)
    b = _rand_i16(rng, 4096)
    got = np.asarray(F.smulwb(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray([M.wrap32(M.SMULWB(int(x), int(y)))
                       for x, y in zip(a, b)], np.int64).astype(np.int32)
    assert np.array_equal(got, want)


def test_smulww_mod32():
    rng = np.random.default_rng(2)
    a = _rand_i32(rng, 4096)
    b = _rand_i32(rng, 4096)
    got = np.asarray(F.smulww(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray([M.wrap32(M.SMULWW(int(x), int(y)))
                       for x, y in zip(a, b)], np.int64).astype(np.int32)
    assert np.array_equal(got, want)


def test_saturating_ops():
    rng = np.random.default_rng(3)
    a = _rand_i32(rng, 4096)
    b = _rand_i32(rng, 4096)
    got = np.asarray(F.add_sat32(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray([M.ADD_SAT32(int(x), int(y)) for x, y in zip(a, b)],
                      np.int32)
    assert np.array_equal(got, want)
    got = np.asarray(F.lshift_sat32(jnp.asarray(a), 4))
    want = np.asarray([M.LSHIFT_SAT32(int(x), 4) for x in a], np.int32)
    assert np.array_equal(got, want)
    got = np.asarray(F.sat16(jnp.asarray(a)))
    want = np.asarray([M.SAT16(int(x)) for x in a], np.int32)
    assert np.array_equal(got, want)


def test_rshift_round():
    rng = np.random.default_rng(4)
    # value ranges seen at the call sites (post-SMULWW, pre-SAT16)
    a = _rand_i32(rng, 4096)
    for shift in (1, 2, 8, 12):
        safe = a if shift > 1 else a[np.abs(a) < 2**30]
        got = np.asarray(F.rshift_round(jnp.asarray(safe), shift))
        want = np.asarray([M.RSHIFT_ROUND(int(x), shift) for x in safe],
                          np.int64)
        ok = want == got.astype(np.int64)
        assert np.all(ok), (shift, safe[~ok][:5])

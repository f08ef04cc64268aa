"""Pallas LPC synthesis kernel (opus_tpu/ops/lpc_pallas.py): bit-exact
vs the lax.scan reference implementation in batched_silk."""

import numpy as np
import jax.numpy as jnp
import pytest

from opus_tpu.models.batched_silk import _lpc_subframe
from opus_tpu.ops.lpc_pallas import lpc_subframe


@pytest.mark.parametrize("b,sf,order", [(4, 80, 16), (130, 40, 10),
                                        (1, 80, 16)])
def test_lpc_pallas_bit_exact(b, sf, order):
    rng = np.random.default_rng(42 + b)
    res = jnp.asarray(
        rng.integers(-1 << 24, 1 << 24, size=(b, sf)), jnp.int32)
    a = rng.integers(-28000, 28000, size=(b, 16))
    a[:, order:] = 0
    a16 = jnp.asarray(a, jnp.int32)
    a_rev = jnp.asarray(a[:, ::-1].copy(), jnp.int32)
    slpc = jnp.asarray(
        rng.integers(-1 << 27, 1 << 27, size=(b, 16)), jnp.int32)

    # _lpc_subframe takes the unreversed coeffs and reverses internally
    v_ref, s_ref = _lpc_subframe(slpc, res, a16, order >> 1)
    v, s = lpc_subframe(slpc, res, a_rev, order >> 1, interpret=True)
    assert np.array_equal(np.asarray(v), np.asarray(v_ref))
    assert np.array_equal(np.asarray(s), np.asarray(s_ref))


def test_lpc_pallas_saturation_paths():
    """Extreme states/residuals exercise ADD_SAT32/LSHIFT_SAT32."""
    b, sf = 8, 32
    rng = np.random.default_rng(0)
    res = jnp.asarray(rng.choice(
        np.array([2**31 - 1, -2**31, 0, 12345], np.int64),
        size=(b, sf)).astype(np.int32))
    a_rev = jnp.asarray(
        rng.integers(-32768, 32767, size=(b, 16)), jnp.int32)
    slpc = jnp.asarray(rng.choice(
        np.array([2**30, -2**30, 7, -7], np.int64),
        size=(b, 16)).astype(np.int32))
    v_ref, s_ref = _lpc_subframe(slpc, res, a_rev[:, ::-1], 8)
    v, s = lpc_subframe(slpc, res, a_rev, 8, interpret=True)
    assert np.array_equal(np.asarray(v), np.asarray(v_ref))
    assert np.array_equal(np.asarray(s), np.asarray(s_ref))

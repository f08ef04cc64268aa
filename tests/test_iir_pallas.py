"""Pallas blocked-IIR deemphasis kernel tests: must match the
sample-by-sample scan exactly within float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_tpu.ops import iir_pallas as ip


@pytest.mark.parametrize("b,n", [(8, 128), (8, 960 + 64), (16, 256)])
def test_deemphasis_matches_scan(b, n):
    if n % 128:
        n = (n // 128) * 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal(b), jnp.float32)
    coef = 0.85
    y_ref, m_ref = ip.deemphasis_scan(x, mem, coef)
    y, m = ip.deemphasis(x, mem, coef, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)


def test_deemphasis_carry_across_calls():
    rng = np.random.default_rng(2)
    b = 8
    x = jnp.asarray(rng.standard_normal((b, 512)), jnp.float32)
    mem = jnp.zeros(b)
    y_full, _ = ip.deemphasis(x, mem, 0.85, interpret=True)
    y1, m1 = ip.deemphasis(x[:, :256], mem, 0.85, interpret=True)
    y2, _ = ip.deemphasis(x[:, 256:], m1, 0.85, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], 1)),
                               np.asarray(y_full), rtol=1e-5, atol=1e-5)

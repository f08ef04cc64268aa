"""TIC/TOC profiler + XLA cost extraction (opus_tpu/utils/profiler.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from opus_tpu.utils.profiler import Profiler, jit_cost


def test_sections_accumulate():
    prof = Profiler()
    for _ in range(3):
        with prof("a"):
            time.sleep(0.01)
    with prof("b"):
        time.sleep(0.005)
    assert prof.count("a") == 3
    assert prof.total("a") >= 0.03
    assert prof.mean("b") >= 0.005
    rep = prof.report()
    assert "a" in rep and "b" in rep and "calls" in rep
    prof.reset()
    assert prof.count("a") == 0


def test_block_synchronizes_device_work():
    prof = Profiler()

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((256, 256))
    f(x).block_until_ready()          # compile outside the timer
    with prof("matmul", block=f(x)):
        pass
    assert prof.total("matmul") > 0


def test_jit_cost_reports_flops():
    @jax.jit
    def f(x):
        return x @ x

    x = jnp.ones((128, 128), jnp.float32)
    cost = jit_cost(f, x)
    # 128^3 * 2 flops; CPU/TPU backends both report an estimate
    if cost:
        assert cost.get("flops", 0) >= 2 * 128 ** 3 * 0.5
    mdct_cost = jit_cost(f, x)
    assert isinstance(mdct_cost, dict)

"""Lightweight tracing/profiling: TIC/TOC section timers plus XLA cost
extraction for the jitted paths.

The reference ships a TIC/TOC macro profiler (celt/os_support.h /
silk/debug.h: counters accumulated per named section, dumped at exit).
This is the same idea as a context manager, with two TPU-aware
additions: `block` synchronizes device work before stopping the clock
(async dispatch otherwise attributes device time to the wrong section),
and `jit_cost` pulls FLOP/byte estimates out of XLA's compiled cost
analysis so per-op budgets can be asserted in tests.

    from opus_tpu.utils.profiler import Profiler
    prof = Profiler()
    with prof("symbol_pass"):
        ...
    with prof("synthesis", block=out):   # out: jax array to sync on
        ...
    print(prof.report())
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class Profiler:
    def __init__(self):
        self._acc = defaultdict(float)
        self._n = defaultdict(int)
        self._order = []

    @contextmanager
    def __call__(self, name: str, block=None):
        if name not in self._acc:
            self._order.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                import jax
                jax.block_until_ready(block)
            self._acc[name] += time.perf_counter() - t0
            self._n[name] += 1

    def total(self, name: str) -> float:
        return self._acc[name]

    def count(self, name: str) -> int:
        return self._n[name]

    def mean(self, name: str) -> float:
        return self._acc[name] / max(1, self._n[name])

    def reset(self):
        self._acc.clear()
        self._n.clear()
        self._order.clear()

    def report(self) -> str:
        tot = sum(self._acc.values()) or 1e-12
        lines = [f"{'section':<24}{'calls':>7}{'total s':>10}"
                 f"{'mean ms':>10}{'share':>7}"]
        for name in sorted(self._order, key=lambda n: -self._acc[n]):
            a = self._acc[name]
            lines.append(f"{name:<24}{self._n[name]:>7}{a:>10.3f}"
                         f"{1e3 * self.mean(name):>10.3f}"
                         f"{100 * a / tot:>6.1f}%")
        return "\n".join(lines)


def jit_cost(fn, *args, **kwargs) -> dict:
    """FLOP/byte estimates for a jitted function at given example args
    (XLA compiled cost analysis). Returns {} when the backend doesn't
    expose an estimate (e.g. CPU interpret paths)."""
    try:
        compiled = fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        return dict(cost) if cost else {}
    except Exception:
        return {}

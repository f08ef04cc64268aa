"""Mosaic (Pallas TPU) op-cost microbenchmarks.

The decode/encode symbol kernels execute a few hundred thousand vector
ops per frame on [8, 128] lane tiles; this tool measures what each op
class actually costs on the hardware so optimization effort lands where
the cycles are.  Each case runs `body` UNROLL times inside a
lax.fori_loop of TRIPS iterations in one pallas_call; cost is reported
in ns per op-instance (one [8, 128] tile op).

Run:  python tools/kbench_ops.py [case ...]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

u32 = jnp.uint32
i32 = jnp.int32
f32 = jnp.float32
SH = (8, 128)

UNROLL = 64
TRIPS = 256


def timed(make_kernel, n_ops_per_unroll, name, extra_in=None,
          trips=TRIPS, unroll=UNROLL):
    ins = [jnp.ones(SH, i32)]
    if extra_in is not None:
        ins.append(extra_in)
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins]

    def kern(*refs):
        x_ref = refs[0]
        o_ref = refs[-1]
        aux = refs[1] if len(refs) == 3 else None
        body = make_kernel(aux)

        def loop(t, acc):
            for _ in range(unroll):
                acc = body(acc, t)
            return acc

        o_ref[:] = jax.lax.fori_loop(0, trips, loop, x_ref[:])

    @jax.jit
    def f(*a):
        return pl.pallas_call(
            kern, in_specs=in_specs,
            out_shape=jax.ShapeDtypeStruct(SH, i32))(*a)

    r = f(*ins)
    r.block_until_ready()
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*ins)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    n = trips * unroll * n_ops_per_unroll
    print(f"{name:34s} {dt*1e9/n:9.2f} ns/op   ({dt*1e3:.2f} ms total,"
          f" {n} ops)")
    return dt * 1e9 / n


def case_add(aux):
    def body(acc, t):
        return acc + 1
    return body


def case_mul_i32(aux):
    def body(acc, t):
        return acc * 3
    return body


def case_mul_u32(aux):
    def body(acc, t):
        return (acc.astype(u32) * u32(2654435761)).astype(i32)
    return body


def case_div_u32(aux):
    def body(acc, t):
        return (acc.astype(u32) // (t.astype(u32) + 3)).astype(i32) + acc
    return body


def case_div_u32_by_const(aux):
    def body(acc, t):
        return (acc.astype(u32) // u32(77)).astype(i32) + acc
    return body


def case_select(aux):
    def body(acc, t):
        return jnp.where(acc > t, acc, acc + 1)
    return body


def case_cmp_add(aux):
    def body(acc, t):
        return acc + (acc > t).astype(i32)
    return body


def case_shift_var(aux):
    def body(acc, t):
        return (acc.astype(u32) >> (acc.astype(u32) & u32(7))).astype(i32) + 1
    return body


def case_f32_mad(aux):
    def body(acc, t):
        a = acc.astype(f32)
        return (a * f32(1.0001) + f32(1.0)).astype(i32)
    return body


def case_clz(aux):
    def body(acc, t):
        return jax.lax.clz(acc.astype(u32)).astype(i32) + acc
    return body


def make_case_dyn_read(n_rows):
    def case(aux):
        def body(acc, t):
            w = aux[pl.ds(jnp.minimum(t, 8), n_rows)]
            return acc + w[0].astype(i32)
        return case_noop if aux is None else body
    return case


def main():
    want = set(sys.argv[1:])

    def run(name, *a, **k):
        if want and name not in want:
            return
        timed(*a, name=name, **k)

    run("add", case_add, 1, )
    run("mul_i32", case_mul_i32, 1)
    run("mul_u32", case_mul_u32, 2)
    run("div_u32", case_div_u32, 1)
    run("div_u32_const", case_div_u32_by_const, 1)
    run("select", case_select, 2)
    run("cmp_add", case_cmp_add, 2)
    run("shift_var", case_shift_var, 3)
    run("f32_mad", case_f32_mad, 3)
    run("clz", case_clz, 2)

    # dynamic-offset VMEM window read: aux [64, 8, 128], read 8 rows at
    # traced offset, fold row 0 in
    if not want or "dyn_read8" in want:
        aux = jnp.ones((64,) + SH, i32)

        def mk(aux_ref):
            def body(acc, t):
                w = aux_ref[pl.ds(jnp.minimum(t % 50, 50), 8)]
                return acc + w[0]
            return body
        timed(mk, 1, "dyn_read8(rows from [64,8,128])", extra_in=aux,
              unroll=16)

    # page-sweep read: 40 compare+selects over [40, 8, 128]
    if not want or "page_sweep40" in want:
        aux = jnp.ones((40,) + SH, i32)

        def mk(aux_ref):
            pages = [aux_ref[w] for w in range(40)]

            def body(acc, t):
                idx = acc & 31
                out = pages[0]
                for w in range(1, 40):
                    out = jnp.where(idx == w, pages[w], out)
                return acc + out
            return body
        timed(mk, 80, "page_sweep40 (per cmp+sel)", extra_in=aux,
              unroll=4)

    # switch dispatch: fori_loop over SMEM node table, 5 branches each
    # doing 32 adds
    if not want or "switch5" in want:
        nodes = jnp.arange(400, dtype=i32) % 5

        def kern(nodes_ref, x_ref, o_ref):
            def mk(j):
                def br(acc):
                    for _ in range(32):
                        acc = acc + (j + 1)
                    return acc
                return br
            branches = [mk(j) for j in range(5)]

            def loop(t, acc):
                return jax.lax.switch(nodes_ref[t], branches, acc)
            o_ref[:] = jax.lax.fori_loop(0, 400, loop, x_ref[:])

        @jax.jit
        def f(n, x):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_shape=jax.ShapeDtypeStruct(SH, i32))(n, x)
        x = jnp.ones(SH, i32)
        r = f(nodes, x)
        r.block_until_ready()
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(nodes, x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{'switch5 (400 nodes x 32 adds)':34s} "
              f"{dt*1e9/400:9.2f} ns/node  ({dt*1e3:.2f} ms total)")


def case_noop(acc, t):
    return acc


if __name__ == "__main__":
    main()

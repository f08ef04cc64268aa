"""NumPy twin of the jax/jnp surface used by opus_tpu.models.celt_dec_fused
and opus_tpu.ops.rc_kernel, so the fused symbol-pass logic can run
eagerly in numpy (seconds) instead of through an XLA compile of the
~1M-op graph (minutes-hours on one CPU core).

Usage:
    from tests.np_shim import install, uninstall
    mods = install()       # rebinds jnp/jax inside the fused modules
    ...run fused functions with numpy arrays...
    uninstall(mods)

Integer semantics match XLA: fixed-width wrapping via numpy dtypes.
"""

from __future__ import annotations

import numpy as np


class _Lax:
    @staticmethod
    def fori_loop(lo, hi, body, carry):
        for t in range(int(lo), int(hi)):
            carry = body(t, carry)
        return carry

    @staticmethod
    def scan(f, carry, xs):
        n = len(xs[0]) if isinstance(xs, (tuple, list)) else len(xs)
        ys = []
        for t in range(n):
            x = tuple(v[t] for v in xs) if isinstance(xs, (tuple, list)) \
                else xs[t]
            carry, y = f(carry, x)
            ys.append(y)
        return carry, np.stack(ys) if ys else np.zeros(0)

    @staticmethod
    def cond(pred, tf, ff, *ops):
        return tf(*ops) if bool(np.any(pred)) else ff(*ops)

    @staticmethod
    def rsqrt(x):
        return (1.0 / np.sqrt(x)).astype(np.asarray(x).dtype)

    @staticmethod
    def clz(x):
        x = np.asarray(x, np.uint32)
        n = np.full(x.shape, 32, np.int32)
        v = x.copy()
        for sh in (16, 8, 4, 2, 1):
            big = v >= (np.uint32(1) << sh)
            n = np.where(big, n - sh, n)
            v = np.where(big, v >> np.uint32(sh), v)
        return (n - (v > 0).astype(np.int32)).astype(np.uint32)

    @staticmethod
    def associative_scan(fn, elems, axis=0):
        # sequential left fold (matches the parallel scan's semantics)
        elems = tuple(np.asarray(e) for e in elems)
        n = elems[0].shape[axis]
        outs = [np.empty_like(e) for e in elems]
        acc = None
        for t in range(n):
            cur = tuple(np.take(e, t, axis=axis) for e in elems)
            acc = cur if acc is None else fn(acc, cur)
            for o, a in zip(outs, acc):
                sl = [slice(None)] * o.ndim
                sl[axis] = t
                o[tuple(sl)] = a
        return tuple(outs)

    @staticmethod
    def dynamic_index_in_dim(x, i, axis=0, keepdims=True):
        out = np.take(x, int(i), axis=axis)
        return np.expand_dims(out, axis) if keepdims else out

    @staticmethod
    def dynamic_slice_in_dim(x, start, size, axis=0):
        sl = [slice(None)] * np.ndim(x)
        start = int(start)
        sl[axis] = slice(start, start + size)
        return np.asarray(x)[tuple(sl)]

    @staticmethod
    def dynamic_update_slice_in_dim(x, upd, start, axis=0):
        out = np.array(x)
        sl = [slice(None)] * out.ndim
        start = int(start)
        sl[axis] = slice(start, start + np.shape(upd)[axis])
        out[tuple(sl)] = upd
        return out

    @staticmethod
    def broadcasted_iota(dtype, shape, dimension):
        r = np.arange(shape[dimension], dtype=dtype)
        view = [1] * len(shape)
        view[dimension] = shape[dimension]
        return np.broadcast_to(r.reshape(view), shape)


class _Jnp:
    uint32 = np.uint32
    int32 = np.int32
    int64 = np.int64
    float32 = np.float32
    bool_ = np.bool_

    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def asarray(x, dtype=None):
        return np.asarray(x, dtype)

    @staticmethod
    def where(c, a, b):
        c = np.asarray(c)
        a = np.asarray(a)
        b = np.asarray(b)
        if a.dtype != b.dtype:
            # match jnp promotion for our (int const, typed array) mixes
            if a.dtype.kind in "ui" and b.dtype.kind in "ui":
                tgt = a.dtype if a.dtype.itemsize >= b.dtype.itemsize \
                    else b.dtype
                a = a.astype(tgt)
                b = b.astype(tgt)
        return np.where(c, a, b)

    @staticmethod
    def take(a, idx, axis=None):
        return np.take(np.asarray(a), np.asarray(idx), axis=axis)

    @staticmethod
    def matmul(a, b, preferred_element_type=None):
        out = np.matmul(a, b)
        return out.astype(preferred_element_type) \
            if preferred_element_type is not None else out

    @staticmethod
    def exp2(x):
        x = np.asarray(x)
        return np.exp2(x).astype(
            x.dtype if x.dtype.kind == "f" else np.float32)


class _Tree:
    @staticmethod
    def map(fn, *trees):
        import jax as _real_jax
        return _real_jax.tree.map(fn, *trees)


class _Jax:
    lax = _Lax()
    tree = _Tree()


_SHIM_JNP = _Jnp()
_SHIM_JAX = _Jax()


def _np_rowset(arr, idx, val):
    out = np.array(arr)
    idx = np.asarray(idx)
    ok = (idx >= 0) & (idx < out.shape[1])
    rows = np.arange(out.shape[0])[ok]
    out[rows, idx[ok]] = np.broadcast_to(np.asarray(val),
                                         idx.shape)[ok].astype(out.dtype)
    return out


def install(extra_modules=()):
    """Rebind jnp/jax inside the fused modules; returns the restore
    list for uninstall()."""
    import opus_tpu.ops.rc_kernel as K
    import opus_tpu.models.celt_dec_fused as F
    import opus_tpu.ops.range_vec as V
    import opus_tpu.ops.range_plan as P

    mods = list(extra_modules) + [K, F, V, P]
    # jnp.float32(x) & co build DEVICE scalars; rebind the modules'
    # dtype-constructor globals to numpy scalar types so shimmed
    # modules stay off the jax runtime entirely
    np_dtypes = {"f32": np.float32, "i32": np.int32, "u32": np.uint32}
    saved = []
    for m in mods:
        old = {a: getattr(m, a) for a in
               ("jnp", "jax", "_rowset", *np_dtypes) if hasattr(m, a)}
        saved.append((m, old))
        m.jnp = _SHIM_JNP
        m.jax = _SHIM_JAX
        if "_rowset" in old:
            m._rowset = _np_rowset
        for a, d in np_dtypes.items():
            if a in old:
                setattr(m, a, d)
    return saved


def uninstall(saved):
    for m, old in saved:
        for a, v in old.items():
            setattr(m, a, v)

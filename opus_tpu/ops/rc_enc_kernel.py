"""Kernel-safe vectorized RFC 6716 §4.1 range ENCODER: [R, 128] lanes,
traceable inside a Pallas TPU kernel (and runnable as plain jnp on CPU
for differential tests) — the encode twin of ops/rc_kernel.py.

Byte output uses the deferred-carry design of ops/range_vec.py: the
encoder appends raw 9-bit carry_out digits (entenc.c:44
ec_enc_carry_out) and end-window raw-bit bytes to page buffers, and the
base-256 carry resolution + byte assembly happen OUTSIDE the kernel in
XLA (`finalize`, one associative scan).  Buffer appends are gather-free
masked page sweeps — Mosaic has no per-lane scatter — through a small
buffer adapter that mutates a VMEM ref inside a kernel trace and
rebuilds a jnp array outside.

Mosaic portability rules (learned on the decode kernel): no unsigned
vector min/max (cmp+select instead), no vector<i1> loop carries, no
literal splats stored into switch/loop carries.

Bit-exact with bitstream/range_coder.py's encoder; fuzzed in
tests/test_rc_enc_kernel.py.  Reference: celt/entenc.c (ec_encode :43,
ec_enc_bit_logp :151, ec_enc_icdf :164, ec_enc_uint :186, ec_enc_bits
:204, ec_enc_done :219).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rc_kernel import (_sel, _umin, _umax, _ilog, i32, u32, SYM_BITS,
                        CODE_BITS, SYM_MAX, CODE_SHIFT, CODE_TOP,
                        CODE_BOT, WINDOW_SIZE, BITRES, UINT_BITS,
                        _TELL_CORRECTION)


class PageBuf:
    """[D, *sh] i32 page buffer with masked per-lane appends.

    Wraps either a jnp array (functional rebuild; CPU/XLA tests) or a
    Pallas VMEM ref (in-place stores).  `append` writes `val` at page
    `idx` on the lanes where `mask`."""

    def __init__(self, buf, is_ref: bool):
        self.buf = buf
        self.is_ref = is_ref
        self.npages = buf.shape[0]

    def append(self, idx, val, mask):
        val = jnp.asarray(val, i32)
        if self.is_ref:
            for w in range(self.npages):
                self.buf[w] = jnp.where(mask & (idx == w), val,
                                        self.buf[w])
        else:
            pages = [jnp.where(mask & (idx == w), val, self.buf[w])
                     for w in range(self.npages)]
            self.buf = jnp.stack(pages)


def re_init(shape) -> dict:
    """Encoder lane state; pair with PageBuf digit/end buffers sized
    [nbytes+4, *shape] / [nbytes+1, *shape]."""
    z = jnp.zeros(shape, i32)
    return dict(ndigits=z, nend=z, end_window=jnp.zeros(shape, u32),
                nend_bits=z,
                nbits_total=jnp.full(shape, CODE_BITS + 1, i32),
                rng=jnp.full(shape, CODE_TOP, u32),
                val=jnp.zeros(shape, u32), error=z)


def _normalize(e: dict, dig: PageBuf, active) -> dict:
    """ec_enc_normalize (entenc.c:78): emit <= 3 digits."""
    e = dict(e)
    for _ in range(3):
        need = active & (e["rng"] <= u32(CODE_BOT))
        c = (e["val"] >> CODE_SHIFT).astype(i32)      # 9-bit digit
        dig.append(e["ndigits"], c, need)
        e["ndigits"] = _sel(need, e["ndigits"] + 1, e["ndigits"])
        e["val"] = _sel(need, (e["val"] << SYM_BITS) & u32(CODE_TOP - 1),
                        e["val"])
        e["rng"] = _sel(need, e["rng"] << SYM_BITS, e["rng"])
        e["nbits_total"] = _sel(need, e["nbits_total"] + SYM_BITS,
                                e["nbits_total"])
    return e


def _masked(new: dict, old: dict, active):
    return {k: _sel(active, new[k], old[k]) for k in new}


def re_encode(e: dict, dig: PageBuf, fl, fh, ft, active=None,
              dry=False):
    """ec_encode.  With dry=True only (rng, nbits_total) evolve and
    nothing is written — the exact tell tracker for decision trials
    (the rng walk never depends on val/carry state)."""
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    flu = jnp.asarray(fl).astype(u32)
    fhu = jnp.asarray(fh).astype(u32)
    ftu = _umax(jnp.asarray(ft).astype(u32), u32(1))
    r = e["rng"] // ftu
    big = flu > 0
    new = dict(e)
    if not dry:
        new["val"] = _sel(big, e["val"] + e["rng"] - r * (ftu - flu),
                          e["val"])
    new["rng"] = _sel(big, r * (fhu - flu), e["rng"] - r * (ftu - fhu))
    if dry:
        for _ in range(3):
            need = active & (new["rng"] <= u32(CODE_BOT))
            new["rng"] = _sel(need, new["rng"] << SYM_BITS, new["rng"])
            new["nbits_total"] = _sel(need, new["nbits_total"] + SYM_BITS,
                                      new["nbits_total"])
        return _masked(new, e, active)
    new = _normalize(new, dig, active)
    return _masked(new, e, active)


def re_encode_bin(e: dict, dig: PageBuf, fl, fh, bits: int, active=None,
                  dry=False):
    """ec_encode_bin: ft = 1<<bits static."""
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    flu = jnp.asarray(fl).astype(u32)
    fhu = jnp.asarray(fh).astype(u32)
    r = e["rng"] >> bits
    total = u32(1 << bits)
    big = flu > 0
    new = dict(e)
    if not dry:
        new["val"] = _sel(big, e["val"] + e["rng"] - r * (total - flu),
                          e["val"])
    new["rng"] = _sel(big, r * (fhu - flu), e["rng"] - r * (total - fhu))
    if dry:
        for _ in range(3):
            need = active & (new["rng"] <= u32(CODE_BOT))
            new["rng"] = _sel(need, new["rng"] << SYM_BITS, new["rng"])
            new["nbits_total"] = _sel(need, new["nbits_total"] + SYM_BITS,
                                      new["nbits_total"])
        return _masked(new, e, active)
    new = _normalize(new, dig, active)
    return _masked(new, e, active)


def re_enc_bit_logp(e: dict, dig: PageBuf, bit, logp, active=None,
                    dry=False):
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    r = e["rng"]
    if isinstance(logp, int):
        s = r >> logp
    else:
        s = r >> jnp.asarray(logp).astype(u32)
    b = jnp.asarray(bit) != 0
    new = dict(e)
    if not dry:
        new["val"] = _sel(b, e["val"] + (r - s), e["val"])
    new["rng"] = _sel(b, s, r - s)
    if dry:
        for _ in range(3):
            need = active & (new["rng"] <= u32(CODE_BOT))
            new["rng"] = _sel(need, new["rng"] << SYM_BITS, new["rng"])
            new["nbits_total"] = _sel(need, new["nbits_total"] + SYM_BITS,
                                      new["nbits_total"])
        return _masked(new, e, active)
    new = _normalize(new, dig, active)
    return _masked(new, e, active)


def re_enc_icdf(e: dict, dig: PageBuf, s, icdf, ftb: int, active=None,
                dry=False):
    """icdf: python tuple (descending), unrolled as literal selects."""
    icdf = tuple(int(v) for v in icdf)
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    si = jnp.clip(jnp.asarray(s, i32), 0, len(icdf) - 1)
    cur = jnp.full(si.shape, np.uint32(icdf[0]), u32)
    prev = jnp.full(si.shape, np.uint32(1 << ftb), u32)  # unused at s=0
    for t, v in enumerate(icdf[1:], 1):
        cur = _sel(si == t, u32(np.uint32(v)), cur)
        prev = _sel(si == t, u32(np.uint32(icdf[t - 1])), prev)
    r = e["rng"] >> ftb
    pos = si > 0
    new = dict(e)
    if not dry:
        new["val"] = _sel(pos, e["val"] + e["rng"] - r * prev, e["val"])
    new["rng"] = _sel(pos, r * (prev - cur), e["rng"] - r * cur)
    if dry:
        for _ in range(3):
            need = active & (new["rng"] <= u32(CODE_BOT))
            new["rng"] = _sel(need, new["rng"] << SYM_BITS, new["rng"])
            new["nbits_total"] = _sel(need, new["nbits_total"] + SYM_BITS,
                                      new["nbits_total"])
        return _masked(new, e, active)
    new = _normalize(new, dig, active)
    return _masked(new, e, active)


def re_enc_bits(e: dict, end: PageBuf, fl, bits, active=None,
                dry=False):
    """Raw bits into the end window (entenc.c:204); bits [sh] i32
    (0 = no-op).  Raw bits never touch rng, so dry mode only advances
    nbits_total."""
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    bits = jnp.broadcast_to(jnp.asarray(bits, i32), e["rng"].shape)
    act = active & (bits > 0)
    if dry:
        new = dict(e, nbits_total=e["nbits_total"] + bits)
        return _masked(new, e, act)
    window = e["end_window"]
    used = e["nend_bits"]
    nend = e["nend"]
    flush = act & (used + bits > WINDOW_SIZE)
    for _ in range(4):
        need = flush & (used >= SYM_BITS)
        end.append(nend, (window & u32(SYM_MAX)).astype(i32), need)
        nend = _sel(need, nend + 1, nend)
        window = _sel(need, window >> SYM_BITS, window)
        used = _sel(need, used - SYM_BITS, used)
    window = window | (jnp.asarray(fl).astype(u32)
                       << jnp.maximum(used, 0).astype(u32))
    used = used + bits
    new = dict(e, end_window=window, nend_bits=used, nend=nend,
               nbits_total=e["nbits_total"] + bits)
    return _masked(new, e, act)


def re_enc_uint(e: dict, dig: PageBuf, end: PageBuf, fl, ft,
                active=None, dry=False):
    """ec_enc_uint with the >8-bit raw-bit split, one traced path."""
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    ftm = _umax(jnp.asarray(ft).astype(u32), u32(2)) - 1
    ftm = jnp.broadcast_to(ftm, e["rng"].shape)
    ftb = _ilog(ftm)
    big = ftb > UINT_BITS
    sh = jnp.maximum(ftb - UINT_BITS, 0).astype(u32)
    flu = jnp.asarray(fl).astype(u32)
    hi = (flu >> sh).astype(i32)
    e = re_encode(e, dig, hi, hi + 1, ((ftm >> sh) + 1).astype(i32),
                  active, dry=dry)
    mask = (u32(1) << sh) - 1
    e = re_enc_bits(e, end, (flu & mask).astype(i32),
                    _sel(active & big, sh.astype(i32), 0), active & big,
                    dry=dry)
    return e


def re_tell(e: dict):
    return e["nbits_total"] - _ilog(e["rng"])


def re_tell_frac(e: dict):
    nbits = (e["nbits_total"] << BITRES).astype(u32)
    l = _ilog(e["rng"])
    r = e["rng"] >> (l - 16).astype(u32)
    b = (r >> 12).astype(i32) - 8
    corr = jnp.zeros_like(r)
    for idx, cv in enumerate(_TELL_CORRECTION):
        corr = _sel(jnp.clip(b, 0, 7) == idx, u32(cv), corr)
    b = b + (r > corr).astype(i32)
    return (nbits - ((l << 3) + b).astype(u32)).astype(i32)


def re_done(e: dict, dig: PageBuf, active=None):
    """ec_enc_done's value flush (entenc.c:219): appends the final
    digits; the byte assembly happens in `finalize`."""
    if active is None:
        active = jnp.ones(e["rng"].shape, bool)
    l = CODE_BITS - _ilog(e["rng"])
    msk = (u32(CODE_TOP - 1) >> l.astype(u32))
    end = (e["val"] + msk) & ~msk
    over = (end | msk) >= e["val"] + e["rng"]
    l = _sel(over, l + 1, l)
    msk = _sel(over, msk >> 1, msk)
    end = _sel(over, (e["val"] + msk) & ~msk, end)
    e = dict(e)
    for _ in range(2):
        need = active & (l > 0)
        dig.append(e["ndigits"], (end >> CODE_SHIFT).astype(i32), need)
        e["ndigits"] = _sel(need, e["ndigits"] + 1, e["ndigits"])
        end = _sel(need, (end << SYM_BITS) & u32(CODE_TOP - 1), end)
        l = l - SYM_BITS
    # flush the raw-bit window into the end buffer is left to finalize
    # (it needs no kernel-side state)
    return e


def finalize(e_np: dict, digits, endbuf, nbytes: int):
    """XLA-side carry resolution + byte assembly (range_vec.re_finalize
    semantics).  digits: [D, B] i32 raw 9-bit digits; endbuf: [E, B].
    e_np: the kernel's output lane state flattened to [B].  Returns
    (bytes u8 [B, nbytes], error [B] i32, rng [B] u32)."""
    digits = jnp.asarray(digits).T            # [B, D]
    endbuf = jnp.asarray(endbuf).T            # [B, E]
    b = digits.shape[0]
    window = e_np["end_window"]
    used = e_np["nend_bits"]
    nend = e_np["nend"]
    # flush whole bytes left in the end window
    ebuf = endbuf
    for _ in range(4):
        need = used >= SYM_BITS
        idx = _sel(need, nend, ebuf.shape[1])
        onehot = (jnp.arange(ebuf.shape[1])[None, :] == idx[:, None])
        ebuf = jnp.where(onehot, (window & u32(SYM_MAX))
                         .astype(i32)[:, None], ebuf)
        nend = _sel(need, nend + 1, nend)
        window = _sel(need, window >> SYM_BITS, window)
        used = _sel(need, used - SYM_BITS, used)

    # carry resolution: compose f(c) = (d + c) >> 8 last-to-first
    def comb(a, bseg):
        a0, a1 = a
        b0, b1 = bseg
        return (jnp.where(a0 == 0, b0, b1), jnp.where(a1 == 0, b0, b1))

    d_rev = digits[:, ::-1]
    c0 = (d_rev >> 8) & 1
    c1 = ((d_rev + 1) >> 8) & 1
    f0, _f1 = jax.lax.associative_scan(comb, (c0, c1), axis=1)
    carry_in_rev = jnp.concatenate(
        [jnp.zeros((b, 1), i32), f0[:, :-1]], axis=1)
    resolved = (digits + carry_in_rev[:, ::-1]) & 0xFF

    dcap = digits.shape[1]
    pos = jnp.arange(nbytes)[None, :]
    head = jnp.where(pos < e_np["ndigits"][:, None],
                     jnp.pad(resolved, ((0, 0),
                                        (0, max(0, nbytes - dcap))))
                     [:, :nbytes], 0)
    ecap = ebuf.shape[1]
    tail_idx = nbytes - 1 - pos
    tail_gidx = jnp.broadcast_to(jnp.clip(tail_idx, 0, ecap),
                                 (b, nbytes))
    tail = jnp.where((tail_idx >= 0) & (tail_idx < nend[:, None]),
                     jnp.take_along_axis(
                         jnp.pad(ebuf, ((0, 0), (0, 1))), tail_gidx,
                         axis=1), 0)
    out = head | tail
    has_left = used > 0
    lpos = nbytes - nend - 1
    leftover = jnp.where(has_left[:, None] & (pos == lpos[:, None]),
                         (window & u32(0xFF)).astype(i32)[:, None], 0)
    out = (out | leftover).astype(jnp.uint8)
    error = e_np["error"] \
        | ((e_np["ndigits"] + nend) > nbytes).astype(i32)
    return out, error, e_np["rng"]

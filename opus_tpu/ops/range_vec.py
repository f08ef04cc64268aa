"""Vectorized RFC 6716 §4.1 range coder: B independent streams as [B]
uint32 lanes on the TPU.

This is the "entropy coder lifted to a vectorized symbol-sequence pass"
from SURVEY.md §7: every primitive advances all B coder states with one
batch of int32/uint32 vector ops, under an `active` mask so callers can
express data-dependent control flow (different streams decoding
different symbol sequences) as masked straight-line code inside one jit.

The packet buffer (read-only) and the encoder's output buffers are kept
OUT of the per-op state: masked ops select only the [B] scalars, and
buffer writes are masked scatters — so the state threads cheaply through
`lax.scan` loops and the graphs stay small.

Semantics are bit-exact with opus_tpu/bitstream/range_coder.py (itself
bit-exact with celt/entdec.c + entenc.c); tests/test_range_vec.py fuzzes
every op against the Python coder.

Encoder carry handling: the sequential coder's rem/ext machinery is
equivalent to base-256 carry propagation over the raw carry_out digits,
so the vectorized encoder appends 9-bit digits to a per-stream buffer
and resolves all carries at finalization with one associative scan
(renders the byte stream exactly; see re_finalize)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SYM_BITS = 8
CODE_BITS = 32
SYM_MAX = (1 << SYM_BITS) - 1
CODE_SHIFT = CODE_BITS - SYM_BITS - 1        # 23
CODE_TOP = 1 << (CODE_BITS - 1)
CODE_BOT = CODE_TOP >> SYM_BITS              # 1 << 23
CODE_EXTRA = (CODE_BITS - 2) % SYM_BITS + 1  # 7
UINT_BITS = 8
WINDOW_SIZE = 32
BITRES = 3

_TELL_CORRECTION = np.array(
    [35733, 38967, 42495, 46340, 50535, 55109, 60097, 65535], np.uint32)

u32 = jnp.uint32
i32 = jnp.int32


def _ilog(v):
    """EC_ILOG: bit length of v (0 -> 0), on uint32 lanes."""
    return jnp.where(v == 0, 0,
                     32 - jax.lax.clz(v.astype(u32))).astype(i32)


def _sel(mask, a, b):
    return jnp.where(mask, a, b)


def _rowset(arr, idx, val):
    """arr[b, idx[b]] = val[b] with out-of-range idx dropped.  Module-
    level so tests/np_shim.py can rebind it for eager numpy runs."""
    b = arr.shape[0]
    return arr.at[jnp.arange(b), idx].set(val, mode="drop")


def _rowtake(arr, idx):
    """arr[b, idx[b]] (idx must be in range)."""
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def _tree_sel(mask, new, old):
    return jax.tree.map(lambda n, o: jnp.where(
        mask if n.ndim == 1 else mask.reshape((-1,) + (1,) * (n.ndim - 1)),
        n, o), new, old)


# ===================================================================== #
# decoder                                                               #
# ===================================================================== #

class RD(NamedTuple):
    """Per-stream decoder scalars; the packet bytes live outside (passed
    as `buf` [B, S] int32 + `storage` [B] to ops that refill)."""
    offs: jax.Array         # [B] i32
    end_offs: jax.Array     # [B] i32
    end_window: jax.Array   # [B] u32
    nend_bits: jax.Array    # [B] i32
    nbits_total: jax.Array  # [B] i32
    rng: jax.Array          # [B] u32
    val: jax.Array          # [B] u32
    ext: jax.Array          # [B] u32 (saved divisor between decode/update)
    rem: jax.Array          # [B] i32
    error: jax.Array        # [B] i32


def _read_byte(buf, storage, offs):
    idx = jnp.clip(offs, 0, buf.shape[1] - 1)
    b = jnp.take_along_axis(buf, idx[:, None], axis=1)[:, 0]
    ok = offs < storage
    return _sel(ok, b, 0), _sel(ok, offs + 1, offs)


def _read_byte_from_end(buf, storage, end_offs):
    idx = jnp.clip(storage - end_offs - 1, 0, buf.shape[1] - 1)
    b = jnp.take_along_axis(buf, idx[:, None], axis=1)[:, 0]
    ok = end_offs < storage
    return _sel(ok, b, 0), _sel(ok, end_offs + 1, end_offs)


def _rd_normalize(d: RD, buf, storage) -> RD:
    # rng grows >= 8 bits per iteration and a symbol consumes < 24 bits,
    # so 3 masked iterations always suffice
    for _ in range(3):
        need = d.rng <= u32(CODE_BOT)
        byte, offs = _read_byte(buf, storage, d.offs)
        sym = ((d.rem << SYM_BITS) | byte) >> (SYM_BITS - CODE_EXTRA)
        val = ((d.val << SYM_BITS)
               + (u32(SYM_MAX) & ~sym.astype(u32))) & u32(CODE_TOP - 1)
        d = d._replace(
            offs=_sel(need, offs, d.offs),
            nbits_total=_sel(need, d.nbits_total + SYM_BITS,
                             d.nbits_total),
            rng=_sel(need, d.rng << SYM_BITS, d.rng),
            val=_sel(need, val, d.val),
            rem=_sel(need, byte, d.rem))
    return d


def rd_init(buf: jax.Array, storage: jax.Array) -> RD:
    """buf: [B, S] int32 byte values; storage: [B] lengths."""
    b = buf.shape[0]
    z = jnp.zeros((b,), i32)
    d = RD(offs=z, end_offs=z,
           end_window=jnp.zeros((b,), u32), nend_bits=z,
           nbits_total=jnp.full((b,), CODE_BITS + 1
                                - ((CODE_BITS - CODE_EXTRA) // SYM_BITS)
                                * SYM_BITS, i32),
           rng=jnp.full((b,), 1 << CODE_EXTRA, u32),
           val=jnp.zeros((b,), u32), ext=jnp.zeros((b,), u32),
           rem=z, error=z)
    byte, offs = _read_byte(buf, storage, d.offs)
    d = d._replace(rem=byte, offs=offs,
                   val=(d.rng - 1 - (byte >> (SYM_BITS - CODE_EXTRA))
                        .astype(u32)))
    return _rd_normalize(d, buf, storage)


def rd_decode(d: RD, ft, active=None):
    """ec_decode: returns (fs, state with saved divisor)."""
    ftu = jnp.maximum(ft.astype(u32), 1)
    ext = d.rng // ftu
    s = d.val // ext
    fs = ftu - jnp.minimum(s + 1, ftu)
    new = d._replace(ext=ext)
    if active is not None:
        new = _tree_sel(active, new, d)
        fs = _sel(active, fs, 0)
    return fs.astype(i32), new


def rd_update(d: RD, buf, storage, fl, fh, ft, active=None):
    flu, fhu, ftu = fl.astype(u32), fh.astype(u32), ft.astype(u32)
    s = d.ext * (ftu - fhu)
    val = d.val - s
    rng = _sel(flu > 0, d.ext * (fhu - flu), d.rng - s)
    new = _rd_normalize(d._replace(val=val, rng=rng), buf, storage)
    if active is not None:
        new = _tree_sel(active, new, d)
    return new


def rd_dec_bit_logp(d: RD, buf, storage, logp: int, active=None):
    r = d.rng
    s = r >> logp
    ret = d.val < s
    new = d._replace(val=_sel(ret, d.val, d.val - s),
                     rng=_sel(ret, s, r - s))
    new = _rd_normalize(new, buf, storage)
    if active is not None:
        new = _tree_sel(active, new, d)
        ret = ret & active
    return ret.astype(i32), new


def rd_dec_icdf(d: RD, buf, storage, icdf, ftb: int, active=None):
    """icdf: [T] or [B, T] uint/int table (descending).  Vectorized as a
    parallel threshold count instead of the sequential scan."""
    tab = jnp.asarray(icdf).astype(u32)
    if tab.ndim == 1:
        tab = tab[None, :]
    r = (d.rng >> ftb)[:, None]
    s_all = r * tab                       # [B, T]
    dv = d.val[:, None]
    ret = jnp.sum((dv < s_all).astype(i32), axis=1)
    idx = jnp.clip(ret, 0, tab.shape[1] - 1)
    s = jnp.take_along_axis(s_all, idx[:, None], axis=1)[:, 0]
    t = jnp.where(ret > 0,
                  jnp.take_along_axis(
                      s_all, jnp.clip(ret - 1, 0, tab.shape[1] - 1)[:, None],
                      axis=1)[:, 0],
                  d.rng)
    new = _rd_normalize(d._replace(val=d.val - s, rng=t - s), buf, storage)
    if active is not None:
        new = _tree_sel(active, new, d)
        ret = _sel(active, ret, 0)
    return ret, new


def rd_dec_bits(d: RD, buf, storage, bits, active=None):
    """Raw bits from the end window; bits: [B] i32 (0 allowed = no-op)."""
    window = d.end_window
    avail = d.nend_bits
    end_offs = d.end_offs
    need0 = avail < bits
    for _ in range(4):
        need = need0 & (avail <= WINDOW_SIZE - SYM_BITS)
        byte, eo = _read_byte_from_end(buf, storage, end_offs)
        window = _sel(need,
                      window | (byte.astype(u32) << avail.astype(u32)),
                      window)
        avail = _sel(need, avail + SYM_BITS, avail)
        end_offs = _sel(need, eo, end_offs)
    bitsu = jnp.maximum(bits, 0).astype(u32)
    mask = jnp.where(bits >= 32, u32(0xFFFFFFFF), (u32(1) << bitsu) - 1)
    ret = window & mask
    window = _sel(bits >= 32, u32(0), window >> bitsu)
    avail = avail - bits
    new = d._replace(end_window=window, nend_bits=avail,
                     end_offs=end_offs,
                     nbits_total=d.nbits_total + bits)
    if active is not None:
        new = _tree_sel(active, new, d)
        ret = _sel(active, ret, 0)
    return ret.astype(i32), new


def rd_dec_uint(d: RD, buf, storage, ft, active=None):
    """ft: [B] i32/u32 (> 1).  Handles the >8-bit split per stream."""
    if active is None:
        active = jnp.ones(ft.shape, bool)
    ftm = jnp.maximum(ft.astype(u32), 2) - 1
    ftb = _ilog(ftm)
    big = ftb > UINT_BITS
    # small path
    fs_small, d1 = rd_decode(d, (ftm + 1).astype(i32), active & ~big)
    d1 = rd_update(d1, buf, storage, fs_small, fs_small + 1,
                   (ftm + 1).astype(i32), active & ~big)
    # big path
    sh = jnp.maximum(ftb - UINT_BITS, 0).astype(u32)
    ftrunc = ((ftm >> sh) + 1).astype(i32)
    fs_big, d2 = rd_decode(d1, ftrunc, active & big)
    d2 = rd_update(d2, buf, storage, fs_big, fs_big + 1, ftrunc,
                   active & big)
    lo, d3 = rd_dec_bits(d2, buf, storage,
                         _sel(active & big, sh.astype(i32), 0),
                         active & big)
    t = ((fs_big.astype(u32) << sh) | lo.astype(u32))
    err = active & big & (t > ftm)
    t = jnp.minimum(t, ftm)
    ret = _sel(big, t.astype(i32), fs_small)
    d3 = d3._replace(error=d3.error | err.astype(i32))
    ret = _sel(active, ret, 0)
    return ret, d3


def rd_tell(d: RD):
    return d.nbits_total - _ilog(d.rng)


def rd_tell_frac(d: RD):
    nbits = (d.nbits_total << BITRES).astype(u32)
    l = _ilog(d.rng)
    r = d.rng >> (l - 16).astype(u32)
    b = (r >> 12).astype(i32) - 8
    corr = jnp.asarray(_TELL_CORRECTION)
    b = b + (r > corr[jnp.clip(b, 0, 7)]).astype(i32)
    return (nbits - ((l << 3) + b).astype(u32)).astype(i32)


# ===================================================================== #
# encoder                                                               #
# ===================================================================== #

class RE(NamedTuple):
    """Per-stream encoder state.  The digit/end buffers are appended to
    with masked scatters (never tree-selected), so they thread cheaply
    through scans."""
    digits: jax.Array       # [B, D] i32 raw carry_out digits (9-bit)
    ndigits: jax.Array      # [B] i32
    endbuf: jax.Array       # [B, E] i32 raw-bit bytes (from the end)
    nend: jax.Array         # [B] i32
    end_window: jax.Array   # [B] u32
    nend_bits: jax.Array    # [B] i32
    nbits_total: jax.Array  # [B] i32
    rng: jax.Array          # [B] u32
    val: jax.Array          # [B] u32
    error: jax.Array        # [B] i32


def _re_scalars(e: RE):
    return (e.ndigits, e.nend, e.end_window, e.nend_bits, e.nbits_total,
            e.rng, e.val, e.error)


def _re_sel(mask, new: RE, old: RE) -> RE:
    """Select only the scalar fields; buffer writes are already masked."""
    sc = [jnp.where(mask, n, o) for n, o in zip(_re_scalars(new),
                                                _re_scalars(old))]
    return RE(new.digits, sc[0], new.endbuf, sc[1], sc[2], sc[3], sc[4],
              sc[5], sc[6], sc[7])


def re_init(batch: int, nbytes: int) -> RE:
    z = jnp.zeros((batch,), i32)
    return RE(digits=jnp.zeros((batch, nbytes + 4), i32), ndigits=z,
              endbuf=jnp.zeros((batch, nbytes + 1), i32), nend=z,
              end_window=jnp.zeros((batch,), u32), nend_bits=z,
              nbits_total=jnp.full((batch,), CODE_BITS + 1, i32),
              rng=jnp.full((batch,), CODE_TOP, u32),
              val=jnp.zeros((batch,), u32), error=z)


def _append_digit(e: RE, c, mask) -> RE:
    idx = _sel(mask, e.ndigits, e.digits.shape[1])   # OOB -> dropped
    digits = _rowset(e.digits, idx, c.astype(i32))
    return e._replace(digits=digits,
                      ndigits=_sel(mask, e.ndigits + 1, e.ndigits))


def _re_normalize(e: RE, active) -> RE:
    for _ in range(3):
        need = active & (e.rng <= u32(CODE_BOT))
        c = (e.val >> CODE_SHIFT).astype(i32)
        e = _append_digit(e, c, need)
        e = e._replace(
            val=_sel(need, (e.val << SYM_BITS) & u32(CODE_TOP - 1), e.val),
            rng=_sel(need, e.rng << SYM_BITS, e.rng),
            nbits_total=_sel(need, e.nbits_total + SYM_BITS,
                             e.nbits_total))
    return e


def re_encode(e: RE, fl, fh, ft, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    flu, fhu, ftu = fl.astype(u32), fh.astype(u32), jnp.maximum(
        ft.astype(u32), 1)
    r = e.rng // ftu
    big = flu > 0
    val = _sel(big, e.val + e.rng - r * (ftu - flu), e.val)
    rng = _sel(big, r * (fhu - flu), e.rng - r * (ftu - fhu))
    new = _re_normalize(e._replace(val=val, rng=rng), active)
    return _re_sel(active, new, e)


def re_encode_bin(e: RE, fl, fh, bits: int, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    flu, fhu = fl.astype(u32), fh.astype(u32)
    r = e.rng >> bits
    total = u32(1 << bits)
    big = flu > 0
    val = _sel(big, e.val + e.rng - r * (total - flu), e.val)
    rng = _sel(big, r * (fhu - flu), e.rng - r * (total - fhu))
    new = _re_normalize(e._replace(val=val, rng=rng), active)
    return _re_sel(active, new, e)


def re_enc_bit_logp(e: RE, bit, logp, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    r = e.rng
    if not isinstance(logp, int):
        logp = logp.astype(u32)
    s = r >> logp
    bit = bit.astype(bool) if hasattr(bit, "astype") else jnp.asarray(
        bit, bool)
    val = _sel(bit, e.val + (r - s), e.val)
    rng = _sel(bit, s, r - s)
    new = _re_normalize(e._replace(val=val, rng=rng), active)
    return _re_sel(active, new, e)


def re_enc_icdf(e: RE, s, icdf, ftb: int, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    tab = jnp.asarray(icdf).astype(u32)
    if tab.ndim == 1:
        tab = tab[None, :]
    bsz = e.rng.shape[0]
    tabb = jnp.broadcast_to(tab, (bsz, tab.shape[1]))
    si = jnp.clip(s, 0, tab.shape[1] - 1)
    cur = jnp.take_along_axis(tabb, si[:, None], axis=1)[:, 0]
    prev = jnp.take_along_axis(
        tabb, jnp.clip(si - 1, 0, tab.shape[1] - 1)[:, None],
        axis=1)[:, 0]
    r = e.rng >> ftb
    pos = s > 0
    val = _sel(pos, e.val + e.rng - r * prev, e.val)
    rng = _sel(pos, r * (prev - cur), e.rng - r * cur)
    new = _re_normalize(e._replace(val=val, rng=rng), active)
    return _re_sel(active, new, e)


def re_enc_bits(e: RE, fl, bits, active=None):
    """Raw bits to the end window; bits: [B] i32 (0 = no-op)."""
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    act = active & (bits > 0)
    window = e.end_window
    used = e.nend_bits
    endbuf, nend = e.endbuf, e.nend
    flush = act & (used + bits > WINDOW_SIZE)
    b = e.endbuf.shape[0]
    for _ in range(4):
        need = flush & (used >= SYM_BITS)
        idx = _sel(need, nend, endbuf.shape[1])
        endbuf = _rowset(endbuf, idx,
                         (window & u32(SYM_MAX)).astype(i32))
        nend = _sel(need, nend + 1, nend)
        window = _sel(need, window >> SYM_BITS, window)
        used = _sel(need, used - SYM_BITS, used)
    window = window | (fl.astype(u32) << jnp.maximum(used, 0).astype(u32))
    used = used + bits
    new = e._replace(endbuf=endbuf, nend=nend, end_window=window,
                     nend_bits=used, nbits_total=e.nbits_total + bits)
    return _re_sel(act, new, e)


def re_enc_uint(e: RE, fl, ft, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    ftm = jnp.maximum(ft.astype(u32), 2) - 1
    ftb = _ilog(ftm)
    big = ftb > UINT_BITS
    flu = fl.astype(u32)
    # small
    e = re_encode(e, fl, fl + 1, (ftm + 1).astype(i32), active & ~big)
    # big
    sh = jnp.maximum(ftb - UINT_BITS, 0).astype(u32)
    e = re_encode(e, (flu >> sh).astype(i32),
                  (flu >> sh).astype(i32) + 1,
                  ((ftm >> sh) + 1).astype(i32), active & big)
    mask = (u32(1) << sh) - 1
    e = re_enc_bits(e, (flu & mask).astype(i32),
                    _sel(active & big, sh.astype(i32), 0), active & big)
    return e


def re_tell(e: RE):
    return e.nbits_total - _ilog(e.rng)


def re_tell_frac(e: RE):
    nbits = (e.nbits_total << BITRES).astype(u32)
    l = _ilog(e.rng)
    r = e.rng >> (l - 16).astype(u32)
    b = (r >> 12).astype(i32) - 8
    corr = jnp.asarray(_TELL_CORRECTION)
    b = b + (r > corr[jnp.clip(b, 0, 7)]).astype(i32)
    return (nbits - ((l << 3) + b).astype(u32)).astype(i32)


def re_finalize(e: RE, nbytes: int):
    """ec_enc_done: flush the value, resolve digit carries with a scan,
    and assemble the [B, nbytes] byte tensor (range bytes forward, raw
    bits backward).  Returns (bytes u8 [B, nbytes], error [B])."""
    l = CODE_BITS - _ilog(e.rng)
    msk = (u32(CODE_TOP - 1) >> l.astype(u32))
    end = (e.val + msk) & ~msk
    over = (end | msk) >= e.val + e.rng
    l = _sel(over, l + 1, l)
    msk = _sel(over, msk >> 1, msk)
    end = _sel(over, (e.val + msk) & ~msk, end)
    for _ in range(2):
        need = l > 0
        e = _append_digit(e, (end >> CODE_SHIFT).astype(i32), need)
        end = _sel(need, (end << SYM_BITS) & u32(CODE_TOP - 1), end)
        l = l - SYM_BITS
    # flush the raw-bit window
    window = e.end_window
    used = e.nend_bits
    endbuf, nend = e.endbuf, e.nend
    b = endbuf.shape[0]
    for _ in range(4):
        need = used >= SYM_BITS
        idx = _sel(need, nend, endbuf.shape[1])
        endbuf = _rowset(endbuf, idx,
                         (window & u32(SYM_MAX)).astype(i32))
        nend = _sel(need, nend + 1, nend)
        window = _sel(need, window >> SYM_BITS, window)
        used = _sel(need, used - SYM_BITS, used)

    # resolve digit carries: bytes = base-256 normalization of the digit
    # string, carry propagating from later digits to earlier ones
    def comb(a, bseg):
        # functions f(c) = (d + c) >> 8 composed last-to-first over the
        # digit string; scan applies `a` first then `bseg`: h = b(a(c))
        a0, a1 = a
        b0, b1 = bseg
        return (jnp.where(a0 == 0, b0, b1), jnp.where(a1 == 0, b0, b1))

    digits = e.digits                      # [B, D]
    d_rev = digits[:, ::-1]
    c0 = (d_rev >> 8) & 1
    c1 = ((d_rev + 1) >> 8) & 1
    f0, _f1 = jax.lax.associative_scan(comb, (c0, c1), axis=1)
    carry_in_rev = jnp.concatenate(
        [jnp.zeros((digits.shape[0], 1), i32), f0[:, :-1]], axis=1)
    carry_in = carry_in_rev[:, ::-1]
    resolved = (digits + carry_in) & 0xFF

    # assemble: head range bytes + zero gap + tail raw-bit bytes
    dcap = digits.shape[1]
    pos = jnp.arange(nbytes)[None, :]
    head = jnp.where(pos < e.ndigits[:, None],
                     jnp.pad(resolved,
                             ((0, 0), (0, max(0, nbytes - dcap))))[:,
                                                                   :nbytes],
                     0)
    ecap = endbuf.shape[1]
    tail_idx = nbytes - 1 - pos
    tail_gidx = jnp.broadcast_to(jnp.clip(tail_idx, 0, ecap), (b, nbytes))
    tail = jnp.where((tail_idx >= 0) & (tail_idx < nend[:, None]),
                     jnp.take_along_axis(
                         jnp.pad(endbuf, ((0, 0), (0, 1))),
                         tail_gidx, axis=1), 0)
    out = head | tail
    has_left = used > 0
    lpos = nbytes - nend - 1
    leftover = jnp.where(has_left[:, None] & (pos == lpos[:, None]),
                         (window & u32(0xFF)).astype(i32)[:, None], 0)
    out = out | leftover
    error = e.error | ((e.ndigits + nend) > nbytes).astype(i32)
    return out.astype(jnp.uint8), error

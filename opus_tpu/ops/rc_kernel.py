"""Kernel-safe vectorized RFC 6716 §4.1 range decoder: B independent
streams as [R, 128] int32/uint32 lanes, traceable inside a Pallas TPU
kernel (and runnable as plain jnp on CPU for differential tests).

This is the on-chip twin of opus_tpu/ops/range_vec.py with three
kernel-driven design changes (reference: celt/entdec.c):

  * state tensors are shape-agnostic ([R, 128] on TPU so every
    elementwise op fills the 8x128 VPU; [B]-shaped on CPU tests),
  * the packet bytes are packed 4-per-int32-word into a [W, *shape]
    tensor and a byte read is a flat mask-reduce over the W word pages
    (no take_along_axis: Mosaic's per-lane gather only spans one
    128-lane tile, and each packet byte is consumed exactly once so the
    total gather cost per frame is tiny),
  * icdf tables are unrolled as python-int literals at trace time
    (immediate operands instead of VMEM scalar reloads).

Bit-exact with bitstream/range_coder.py; fuzzed in
tests/test_rc_kernel.py against the scalar coder.
"""

from __future__ import annotations

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

_TELL_CORRECTION = (35733, 38967, 42495, 46340, 50535, 55109, 60097, 65535)

u32 = jnp.uint32
i32 = jnp.int32

# state dict keys (all arrays share one shape)
_KEYS = ("offs", "end_offs", "end_window", "nend_bits", "nbits_total",
         "rng", "val", "ext", "rem", "error")


def _sel(mask, a, b):
    return jnp.where(mask, a, b)


def _umin(a, b):
    """Unsigned min as cmp+select (Mosaic has no arith.minui lowering)."""
    return _sel(a < b, a, b)


def _umax(a, b):
    return _sel(a > b, a, b)


def _ilog(v):
    """EC_ILOG: bit length of v (0 -> 0)."""
    return jnp.where(v == 0, 0, 32 - jax.lax.clz(v.astype(u32))).astype(i32)


def pack_words(buf_bytes: np.ndarray, nbytes_cap: int) -> np.ndarray:
    """Host-side packing: [B, S] uint8 -> [W, B] int32 little-endian
    words (W = ceil(nbytes_cap/4)); reshape to [W, R, 128] by the caller
    for the TPU layout."""
    b, s = buf_bytes.shape
    w = (nbytes_cap + 3) // 4
    padded = np.zeros((b, w * 4), np.uint32)
    padded[:, :min(s, w * 4)] = buf_bytes[:, :w * 4]
    words = (padded[:, 0::4] | (padded[:, 1::4] << 8)
             | (padded[:, 2::4] << 16) | (padded[:, 3::4] << 24))
    return words.astype(np.int32).T.copy()              # [W, B]


_MASKED_READS = False


class masked_reads:
    """Context: route read_word through the gather-free mask-reduce.

    Mosaic (Pallas TPU) has no per-lane gather, so inside a kernel trace
    the word fetch runs as a compare/select sweep over the W word pages
    instead of take_along_axis.  Each packet byte is consumed once, so
    the sweep cost is bounded by the payload size."""

    def __enter__(self):
        global _MASKED_READS
        self._prev = _MASKED_READS
        _MASKED_READS = True

    def __exit__(self, *exc):
        global _MASKED_READS
        _MASKED_READS = self._prev


def read_word(buf, widx):
    """buf: [W, *shape] i32 word pages; widx: [*shape] i32 word index.
    One per-lane gather on the XLA path; a page mask-reduce under
    masked_reads() (Pallas trace)."""
    idx = jnp.clip(widx, 0, buf.shape[0] - 1)
    if _MASKED_READS:
        acc = buf[0]
        for w in range(1, buf.shape[0]):
            acc = _sel(idx == w, buf[w], acc)
        return acc
    return jnp.take_along_axis(buf, idx[None, ...], axis=0)[0]


def read_byte_at(buf, pos):
    """Byte value at per-lane byte offset pos (clipped into the buffer);
    caller masks validity."""
    w = read_word(buf, jnp.clip(pos >> 2, 0, buf.shape[0] - 1))
    sh = ((pos & 3) << 3).astype(u32)
    return ((w.astype(u32) >> sh) & u32(0xFF)).astype(i32)


def _read_byte(buf, storage, offs):
    ok = offs < storage
    b = read_byte_at(buf, offs)
    return _sel(ok, b, 0), _sel(ok, offs + 1, offs)


def _read_byte_from_end(buf, storage, end_offs):
    ok = end_offs < storage
    b = read_byte_at(buf, storage - end_offs - 1)
    return _sel(ok, b, 0), _sel(ok, end_offs + 1, end_offs)


def _normalize(d: dict, buf, storage) -> dict:
    # rng grows >= 8 bits per iteration and a symbol consumes < 24 bits,
    # so 3 masked iterations always suffice (entdec.c ec_dec_normalize);
    # unrolled inline: a fori_loop would cost MORE graph here (per-call
    # closure functions + carry plumbing exceed the ~17-op body)
    d = dict(d)

    def body(_t, carry):
        offs0, nbt, rng, val0, rem = carry
        need = rng <= u32(CODE_BOT)
        byte, offs = _read_byte(buf, storage, offs0)
        sym = ((rem << SYM_BITS) | byte) >> (SYM_BITS - CODE_EXTRA)
        val = ((val0 << SYM_BITS)
               + (u32(SYM_MAX) & ~sym.astype(u32))) & u32(CODE_TOP - 1)
        return (_sel(need, offs, offs0),
                _sel(need, nbt + SYM_BITS, nbt),
                _sel(need, rng << SYM_BITS, rng),
                _sel(need, val, val0),
                _sel(need, byte, rem))

    (d["offs"], d["nbits_total"], d["rng"], d["val"],
     d["rem"]) = jax.lax.fori_loop(
        0, 3, body, (d["offs"], d["nbits_total"], d["rng"], d["val"],
                     d["rem"]))
    return d


def _masked(d_new: dict, d_old: dict, active):
    if active is None:
        return d_new
    return {k: _sel(active, d_new[k], d_old[k]) for k in d_new}


def rk_init(buf, storage) -> dict:
    """buf: [W, *shape] i32 words; storage: [*shape] byte lengths."""
    shape = storage.shape
    z = jnp.zeros(shape, i32)
    d = dict(offs=z, end_offs=z, end_window=jnp.zeros(shape, u32),
             nend_bits=z,
             nbits_total=jnp.full(shape, CODE_BITS + 1
                                  - ((CODE_BITS - CODE_EXTRA) // SYM_BITS)
                                  * SYM_BITS, i32),
             rng=jnp.full(shape, 1 << CODE_EXTRA, u32),
             val=jnp.zeros(shape, u32), ext=jnp.zeros(shape, u32),
             rem=z, error=z)
    byte, offs = _read_byte(buf, storage, d["offs"])
    d["rem"] = byte
    d["offs"] = offs
    d["val"] = (d["rng"] - 1
                - (byte >> (SYM_BITS - CODE_EXTRA)).astype(u32))
    return _normalize(d, buf, storage)


def rk_decode(d: dict, ft, active=None):
    """ec_decode: returns (fs, state with saved divisor)."""
    ftu = _umax(jnp.asarray(ft).astype(u32), u32(1))
    ftu = jnp.broadcast_to(ftu, d["rng"].shape)
    ext = d["rng"] // ftu
    s = d["val"] // ext
    fs = ftu - _umin(s + 1, ftu)
    new = dict(d)
    new["ext"] = ext
    new = _masked(new, d, active)
    if active is not None:
        fs = _sel(active, fs, 0)
    return fs.astype(i32), new


def rk_decode_bin(d: dict, bits: int, active=None):
    """ec_decode_bin: ft = 1<<bits (static); saves the shift divisor."""
    ext = d["rng"] >> bits
    s = d["val"] // ext
    total = u32(1 << bits)
    fs = total - _umin(s + 1, total)
    new = dict(d)
    new["ext"] = ext
    new = _masked(new, d, active)
    if active is not None:
        fs = _sel(active, fs, 0)
    return fs.astype(i32), new


def rk_update(d: dict, buf, storage, fl, fh, ft, active=None):
    flu = jnp.asarray(fl).astype(u32)
    fhu = jnp.asarray(fh).astype(u32)
    ftu = jnp.asarray(ft).astype(u32)
    s = d["ext"] * (ftu - fhu)
    new = dict(d)
    new["val"] = d["val"] - s
    new["rng"] = _sel(flu > 0, d["ext"] * (fhu - flu), d["rng"] - s)
    new = _normalize(new, buf, storage)
    return _masked(new, d, active)


def rk_dec_bit_logp(d: dict, buf, storage, logp, active=None):
    """logp: python int or per-lane i32/u32 array."""
    r = d["rng"]
    if isinstance(logp, int):
        s = r >> logp
    else:
        s = r >> jnp.asarray(logp).astype(u32)
    ret = d["val"] < s
    new = dict(d)
    new["val"] = _sel(ret, d["val"], d["val"] - s)
    new["rng"] = _sel(ret, s, r - s)
    new = _normalize(new, buf, storage)
    new = _masked(new, d, active)
    if active is not None:
        ret = ret & active
    return ret.astype(i32), new


def rk_dec_icdf(d: dict, buf, storage, icdf, ftb: int, active=None):
    """icdf: python tuple/list of ints (descending) — unrolled as
    literal compares.  Returns (symbol index, state)."""
    icdf = tuple(int(v) for v in icdf)
    r = d["rng"] >> ftb
    dv = d["val"]
    # ret = count of table entries with dv < r*tab[t]  (all t, since the
    # scalar scan stops at the first tab with dv >= r*tab and ret equals
    # the number of larger thresholds passed; r*tab is descending in t)
    parts = [(dv < r * u32(t)).astype(i32) for t in icdf]
    # tree-reduce to avoid a serial add chain on the VPU
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    ret = parts[0]
    # s = r*tab[ret], t = ret>0 ? r*tab[ret-1] : rng
    s = jnp.zeros_like(dv)
    t = d["rng"]
    for idx, tv in enumerate(icdf):
        s = _sel(ret == idx, r * u32(tv), s)
        if idx > 0:
            t = _sel(ret == idx, r * u32(icdf[idx - 1]), t)
    new = dict(d)
    new["val"] = dv - s
    new["rng"] = t - s
    new = _normalize(new, buf, storage)
    new = _masked(new, d, active)
    if active is not None:
        ret = _sel(active, ret, 0)
    return ret, new


def rk_dec_bits(d: dict, buf, storage, bits, active=None):
    """Raw bits from the end window; bits: i32 array (0 = no-op)."""
    bits = jnp.broadcast_to(jnp.asarray(bits, i32), d["rng"].shape)
    window = d["end_window"]
    avail = d["nend_bits"]
    end_offs = d["end_offs"]
    need0 = avail < bits

    def refill(_t, carry):
        window, avail, end_offs = carry
        need = need0 & (avail <= WINDOW_SIZE - SYM_BITS)
        byte, eo = _read_byte_from_end(buf, storage, end_offs)
        window = _sel(need,
                      window | (byte.astype(u32) << avail.astype(u32)),
                      window)
        avail = _sel(need, avail + SYM_BITS, avail)
        end_offs = _sel(need, eo, end_offs)
        return window, avail, end_offs

    window, avail, end_offs = jax.lax.fori_loop(
        0, 4, refill, (window, avail, end_offs))
    bitsu = jnp.maximum(bits, 0).astype(u32)
    mask = jnp.where(bits >= 32, u32(0xFFFFFFFF), (u32(1) << bitsu) - 1)
    ret = window & mask
    window = _sel(bits >= 32, u32(0), window >> bitsu)
    avail = avail - bits
    new = dict(d)
    new["end_window"] = window
    new["nend_bits"] = avail
    new["end_offs"] = end_offs
    new["nbits_total"] = d["nbits_total"] + bits
    new = _masked(new, d, active)
    if active is not None:
        ret = _sel(active, ret, 0)
    return ret.astype(i32), new


def rk_dec_uint(d: dict, buf, storage, ft, active=None):
    """ft: i32/u32 array (> 1).  Handles the >8-bit split per lane.

    The small (ftb <= 8) and big paths share one decode/update: for the
    small path sh == 0, so ftrunc == ftm + 1 and the raw-bits read is a
    0-bit no-op — one traced path instead of two."""
    if active is None:
        active = jnp.ones(d["rng"].shape, bool)
    ftm = _umax(jnp.asarray(ft).astype(u32), u32(2)) - 1
    ftm = jnp.broadcast_to(ftm, d["rng"].shape)
    ftb = _ilog(ftm)
    big = ftb > UINT_BITS
    sh = jnp.maximum(ftb - UINT_BITS, 0).astype(u32)
    ftrunc = ((ftm >> sh) + 1).astype(i32)
    fs, d1 = rk_decode(d, ftrunc, active)
    d1 = rk_update(d1, buf, storage, fs, fs + 1, ftrunc, active)
    lo, d2 = rk_dec_bits(d1, buf, storage,
                         _sel(active & big, sh.astype(i32), 0),
                         active & big)
    t = ((fs.astype(u32) << sh) | lo.astype(u32))
    err = active & big & (t > ftm)
    t = _umin(t, ftm)
    ret = _sel(big, t.astype(i32), fs)
    d2 = dict(d2)
    d2["error"] = d2["error"] | err.astype(i32)
    ret = _sel(active, ret, 0)
    return ret, d2


def rk_tell(d: dict):
    return d["nbits_total"] - _ilog(d["rng"])


def rk_tell_frac(d: dict):
    nbits = (d["nbits_total"] << BITRES).astype(u32)
    l = _ilog(d["rng"])
    r = d["rng"] >> (l - 16).astype(u32)
    b = (r >> 12).astype(i32) - 8
    corr = jnp.zeros_like(b)
    for idx, cv in enumerate(_TELL_CORRECTION):
        corr = _sel(jnp.clip(b, 0, 7) == idx, u32(cv), corr.astype(u32))
    b = b + (r > corr).astype(i32)
    return (nbits - ((l << 3) + b).astype(u32)).astype(i32)

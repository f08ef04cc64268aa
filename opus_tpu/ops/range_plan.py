"""Two-pass vectorized range ENCODER: trace-time symbol planning + one
scan.

The inline-encoder problem: interleaving full range-encoder ops with the
encoder's decision logic costs ~200 HLO ops per coded symbol (state
selects, buffer scatters, carry bookkeeping), and a CELT frame codes
thousands of symbols — the XLA graph explodes.  But the *decisions* only
ever need `ec_tell`/`ec_tell_frac`, and tell depends ONLY on
(nbits_total, rng) — and rng's evolution depends only on the coded
symbols, never on val/carry state (celt/entenc.c:78-115: the val update
reads rng, not vice versa).

So encoding happens in two passes:

  pass 1 (this API, used inline with the decision logic): maintain the
    EXACT (rng, nbits_total) tell tracker (~15 HLO ops per symbol) and
    record each symbol on a trace-time linked list — a python-side
    structure, zero HLO cost.  Every libopus encoder primitive reduces
    to either ec_encode(fl, fh, ft) with fl/fh/ft < 2^16
    (ec_enc_bit_logp and ec_enc_icdf are ec_encode with derived
    cumulative frequencies; ec_enc_uint splits into one ec_encode plus
    raw bits) or a raw-bits word (<= 32 bits, written backward from the
    buffer end).

  pass 2 (re_finalize): stack the recorded symbols to [T, B] tensors
    and play them through the real [B]-lane encoder
    (opus_tpu/ops/range_vec.py) with ONE lax.scan — its graph cost is
    paid once, not per symbol — then range_vec.re_finalize resolves
    carries with the associative scan and assembles the bytes.

The API mirrors range_vec's re_* functions so encoder modules can swap
`from ..ops import range_vec as V` for `from ..ops import range_plan`.
The plan object must stay inside one trace (no lax control-flow
boundaries between sink ops), which the fused encoders satisfy.

Reference: celt/entenc.c (ec_encode :43, ec_enc_bit_logp :151,
ec_enc_icdf :164, ec_enc_uint :186, ec_enc_bits :204, ec_tell_frac
entcode.c:69)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import range_vec as RV
from .range_vec import (_sel, _ilog, i32, u32, CODE_BITS, CODE_TOP,
                        CODE_BOT, SYM_BITS, BITRES, _TELL_CORRECTION)

UINT_BITS = 8
K_ENCODE = 0
K_RAW = 1


class PlanRE:
    """Pass-1 state: exact tell tracker + trace-time symbol chain.

    `ops` is a persistent linked list: () for empty, else
    (parent_ops, (kind, w0, w1, active)) — sharing tails is what makes
    the functional threading O(1) per op."""

    __slots__ = ("ops", "nbits_total", "rng", "error")

    def __init__(self, ops, nbits_total, rng, error):
        self.ops = ops
        self.nbits_total = nbits_total
        self.rng = rng
        self.error = error

    def _replace(self, **kw):
        return PlanRE(kw.get("ops", self.ops),
                      kw.get("nbits_total", self.nbits_total),
                      kw.get("rng", self.rng),
                      kw.get("error", self.error))


def re_init(batch: int, nbytes: int) -> PlanRE:
    return PlanRE((), jnp.full((batch,), CODE_BITS + 1, i32),
                  jnp.full((batch,), CODE_TOP, u32),
                  jnp.zeros((batch,), i32))


def _entries(e: PlanRE):
    out = []
    node = e.ops
    while node != ():
        node, entry = node
        out.append(entry)
    out.reverse()
    return out


def _rng_norm(rng, nbits, active):
    # a symbol consumes < 16 bits, so 2 masked iterations suffice
    for _ in range(2):
        need = active & (rng <= u32(CODE_BOT))
        rng = _sel(need, rng << SYM_BITS, rng)
        nbits = _sel(need, nbits + SYM_BITS, nbits)
    return rng, nbits


def re_encode(e: PlanRE, fl, fh, ft, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    fl = jnp.asarray(fl, i32)
    fh = jnp.asarray(fh, i32)
    ft = jnp.asarray(ft, i32)
    flu, fhu = fl.astype(u32), fh.astype(u32)
    ftu = jnp.maximum(ft.astype(u32), 1)
    r = e.rng // ftu
    rng = _sel(flu > 0, r * (fhu - flu), e.rng - r * (ftu - fhu))
    rng, nbits = _rng_norm(rng, e.nbits_total, active)
    return PlanRE((e.ops, (K_ENCODE, fl, fh | (ft << 16), active)),
                  _sel(active, nbits, e.nbits_total),
                  _sel(active, rng, e.rng), e.error)


def re_encode_bin(e: PlanRE, fl, fh, bits: int, active=None):
    return re_encode(e, fl, fh, jnp.full(e.rng.shape, 1 << bits, i32),
                     active)


def re_enc_bit_logp(e: PlanRE, bit, logp, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    bit = jnp.asarray(bit)
    b = bit if bit.dtype == jnp.bool_ else (bit != 0)
    if isinstance(logp, int):
        ft = jnp.full(e.rng.shape, 1 << logp, i32)
    else:
        ft = (1 << logp.astype(u32)).astype(i32)
    # ec_enc_bit_logp == ec_encode(b ? ft-1 : 0, b ? ft : ft-1, ft)
    fl = _sel(b, ft - 1, 0)
    fh = _sel(b, ft, ft - 1)
    return re_encode(e, fl, fh, ft, active)


def re_enc_icdf(e: PlanRE, s, icdf, ftb: int, active=None):
    tab = jnp.asarray(icdf).astype(i32)
    if tab.ndim == 1:
        tab = tab[None, :]
    bsz = e.rng.shape[0]
    tabb = jnp.broadcast_to(tab, (bsz, tab.shape[1]))
    si = jnp.clip(s, 0, tab.shape[1] - 1)
    cur = jnp.take_along_axis(tabb, si[:, None], axis=1)[:, 0]
    prev = jnp.take_along_axis(
        tabb, jnp.clip(si - 1, 0, tab.shape[1] - 1)[:, None], axis=1)[:, 0]
    ft = 1 << ftb
    fl = _sel(si > 0, ft - prev, 0)
    fh = ft - cur
    return re_encode(e, fl, fh, jnp.full(e.rng.shape, ft, i32), active)


def re_enc_bits(e: PlanRE, fl, bits, active=None):
    """Raw bits (written backward from the end in pass 2)."""
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    bits = jnp.asarray(bits, i32)
    act = active & (bits > 0)
    fl = jnp.broadcast_to(jnp.asarray(fl, i32), e.rng.shape)
    bits = jnp.broadcast_to(bits, e.rng.shape)
    return PlanRE((e.ops, (K_RAW, fl, bits, act)),
                  e.nbits_total + _sel(act, bits, 0), e.rng, e.error)


def re_enc_uint(e: PlanRE, fl, ft, active=None):
    if active is None:
        active = jnp.ones(e.rng.shape, bool)
    ftm = jnp.maximum(jnp.asarray(ft).astype(u32), 2) - 1
    ftb = _ilog(ftm)
    big = ftb > UINT_BITS
    flu = jnp.asarray(fl).astype(u32)
    # small
    e = re_encode(e, jnp.asarray(fl, i32), jnp.asarray(fl, i32) + 1,
                  (ftm + 1).astype(i32), active & ~big)
    # big: top UINT_BITS+1 bits through the range coder, rest raw
    sh = jnp.maximum(ftb - UINT_BITS, 0).astype(u32)
    e = re_encode(e, (flu >> sh).astype(i32),
                  (flu >> sh).astype(i32) + 1,
                  ((ftm >> sh) + 1).astype(i32), active & big)
    mask = (u32(1) << sh) - 1
    e = re_enc_bits(e, (flu & mask).astype(i32),
                    _sel(active & big, sh.astype(i32), 0), active & big)
    return e


def re_tell(e: PlanRE):
    return e.nbits_total - _ilog(e.rng)


def re_tell_frac(e: PlanRE):
    nbits = (e.nbits_total << BITRES).astype(u32)
    l = _ilog(e.rng)
    r = e.rng >> (l - 16).astype(u32)
    b = (r >> 12).astype(i32) - 8
    corr = jnp.asarray(_TELL_CORRECTION)
    b = b + (r > corr[jnp.clip(b, 0, 7)]).astype(i32)
    return (nbits - ((l << 3) + b).astype(u32)).astype(i32)


def re_select(mask, a: PlanRE, b: PlanRE, base: PlanRE) -> PlanRE:
    """Per-lane select between two plans that extend the SAME `base`
    with the SAME static op sequence (e.g. the coarse-energy
    intra/inter trials, quant_bands.c:260)."""
    ea = _entries(a)
    eb = _entries(b)
    nbase = len(_entries(base))
    assert len(ea) == len(eb), (len(ea), len(eb))
    ops = base.ops
    for (ka, w0a, w1a, acta), (kb, w0b, w1b, actb) in zip(ea[nbase:],
                                                          eb[nbase:]):
        assert ka == kb
        ops = (ops, (ka, _sel(mask, w0a, w0b), _sel(mask, w1a, w1b),
                     _sel(mask, acta, actb)))
    return PlanRE(ops,
                  _sel(mask, a.nbits_total, b.nbits_total),
                  _sel(mask, a.rng, b.rng),
                  _sel(mask, a.error, b.error))


def re_finalize(e: PlanRE, nbytes: int):
    """Pass 2: play the plan through the real [B]-lane encoder with one
    scan, then assemble bytes (range_vec.re_finalize).  Returns
    (bytes u8 [B, nbytes], error [B], rng [B] u32)."""
    entries = _entries(e)
    b = e.rng.shape[0]
    real = RV.re_init(b, nbytes)
    if entries:
        kinds = jnp.asarray([k for k, _, _, _ in entries], i32)
        w0s = jnp.stack([w0 for _, w0, _, _ in entries])     # [T, B]
        w1s = jnp.stack([w1 for _, _, w1, _ in entries])
        acts = jnp.stack([a for _, _, _, a in entries])

        def step(r, xs):
            kind, w0, w1, act = xs
            is_enc = act & (kind == K_ENCODE)
            is_raw = act & (kind == K_RAW)
            fh = w1 & 0xFFFF
            ft = (w1 >> 16) & 0xFFFF
            r = RV.re_encode(r, w0, fh, ft, is_enc)
            r = RV.re_enc_bits(r, w0, _sel(is_raw, w1, 0), is_raw)
            return r, jnp.zeros((), i32)

        real, _ = jax.lax.scan(step, real, (kinds, w0s, w1s, acts))
    out, err = RV.re_finalize(real, nbytes)
    return out, err | (e.error != 0), real.rng

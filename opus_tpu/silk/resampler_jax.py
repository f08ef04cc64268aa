"""Batched SILK upsampler (decoder direction) as device ops, bit-exact
with the scalar Resampler (opus_tpu/silk/resampler.py).

The hybrid decode path needs SILK's internal 16 kHz output resampled to
the 48 kHz API rate on device (reference: silk_resampler_private_IIR_FIR
silk/resampler_private_IIR_FIR.c, driven from silk_Decode).  The
reference resampler is a 2x allpass-cascade upsampler (up2_HQ) followed
by a 12-phase 8-tap fractional FIR:

  * up2_HQ is a 6-state IIR recurrence -> one lax.scan over the frame's
    input samples with [B]-wide int32 lanes (truncating fixed-point
    makes the recurrence non-linear, so it cannot be a matmul),
  * the fractional FIR reads 8 consecutive 2x samples at an offset that
    advances by a CONSTANT step per output -> every output's source
    window and coefficient phase are static, so the whole FIR collapses
    into 8 static gathers + multiply-adds (vector ops, no scan).

All arithmetic is int32-exact (ops/silk_fixed.py); fuzzed against the
scalar resampler in tests/test_hybrid_dec_fused.py."""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.silk_fixed import smulwb, sat16, rshift_round
from .tables import UP2_HQ_0, UP2_HQ_1, RESAMPLER_FRAC_FIR_12, \
    RESAMPLER_ORDER_FIR_12, RESAMPLER_MAX_BATCH_SIZE_MS
from .resampler import Resampler

i32 = jnp.int32


def _c16(v: int) -> int:
    """Reinterpret a coefficient's low 16 bits as signed (SMULWB takes
    the bottom halfword signed; some Q16 allpass coefs exceed 32767)."""
    return ((int(v) + 0x8000) & 0xFFFF) - 0x8000


class UpsamplerState(NamedTuple):
    s_iir: jax.Array      # [B, 6] i32 allpass cascade state
    s_fir: jax.Array      # [B, 8] i32 FIR tail (2x-domain samples)
    delay: jax.Array      # [B, input_delay] i32 input tail


@lru_cache(maxsize=None)
def _fir_plan(fs_in_khz: int, frame_ms: int):
    """Static FIR gather plan: mirrors Resampler.process()'s batching
    exactly and returns (idx [n_out, 8], coef [n_out, 8], input_delay,
    n_out).  Indices address Z = concat(s_fir(8), up2(seq)) where seq is
    the reference's processing order (delay head + rest)."""
    rs = Resampler(fs_in_khz * 1000, 48000)
    assert rs.fn == rs.IIR_FIR
    inv = rs.inv_ratio_q16
    order = RESAMPLER_ORDER_FIR_12
    n_in_total = fs_in_khz * frame_ms
    delay = rs.input_delay
    batch_cap = fs_in_khz * RESAMPLER_MAX_BATCH_SIZE_MS

    # the two _iir_fir calls: head (1 ms) then the rest, each split into
    # batches of <= batch_cap input samples
    calls = [fs_in_khz, n_in_total - fs_in_khz]
    idx_rows, coef_rows = [], []
    zpos = order          # up2 output write position within Z
    for n_call in calls:
        pos = 0
        while pos < n_call:
            n_in = min(n_call - pos, batch_cap)
            buf_base = zpos - order
            index_q16 = 0
            while index_q16 < (n_in << 17):
                ti = ((index_q16 & 0xFFFF) * 12) >> 16
                b = index_q16 >> 16
                taps = (list(RESAMPLER_FRAC_FIR_12[ti])
                        + list(RESAMPLER_FRAC_FIR_12[11 - ti])[::-1])
                idx_rows.append([buf_base + b + j for j in range(8)])
                coef_rows.append(taps)
                index_q16 += inv
            zpos += 2 * n_in
            pos += n_in
    idx = np.asarray(idx_rows, np.int32)
    coef = np.asarray(coef_rows, np.int32)
    return idx, coef, delay, len(idx_rows)


def upsampler_init(batch: int, fs_in_khz: int = 16) -> UpsamplerState:
    rs = Resampler(fs_in_khz * 1000, 48000)
    return UpsamplerState(
        s_iir=jnp.zeros((batch, 6), i32),
        s_fir=jnp.zeros((batch, RESAMPLER_ORDER_FIR_12), i32),
        delay=jnp.zeros((batch, rs.input_delay), i32))


def _up2_hq_scan(x, s_iir):
    """x: [B, N] i32 int16-valued; returns ([B, 2N] i32, new s_iir).
    Reference: silk_resampler_private_up2_HQ."""
    c00, c01, c02 = (_c16(UP2_HQ_0[0]), _c16(UP2_HQ_0[1]),
                     _c16(UP2_HQ_0[2]))
    c10, c11, c12 = (_c16(UP2_HQ_1[0]), _c16(UP2_HQ_1[1]),
                     _c16(UP2_HQ_1[2]))

    def step(s, xt):
        s0, s1, s2, s3, s4, s5 = (s[:, 0], s[:, 1], s[:, 2], s[:, 3],
                                  s[:, 4], s[:, 5])
        in32 = xt << 10
        y = in32 - s0
        xx = smulwb(y, c00)
        o1 = s0 + xx
        s0 = in32 + xx
        y = o1 - s1
        xx = smulwb(y, c01)
        o2 = s1 + xx
        s1 = o1 + xx
        y = o2 - s2
        xx = y + smulwb(y, c02)
        o1 = s2 + xx
        s2 = o2 + xx
        out_even = sat16(rshift_round(o1, 10))
        y = in32 - s3
        xx = smulwb(y, c10)
        o1 = s3 + xx
        s3 = in32 + xx
        y = o1 - s4
        xx = smulwb(y, c11)
        o2 = s4 + xx
        s4 = o1 + xx
        y = o2 - s5
        xx = y + smulwb(y, c12)
        o1 = s5 + xx
        s5 = o2 + xx
        out_odd = sat16(rshift_round(o1, 10))
        return (jnp.stack([s0, s1, s2, s3, s4, s5], axis=1),
                (out_even, out_odd))

    s_fin, (ev, od) = jax.lax.scan(step, s_iir, x.T)
    y = jnp.stack([ev, od], axis=-1)                   # [N, B, 2]
    y = y.transpose(1, 0, 2).reshape(x.shape[0], -1)   # [B, 2N]
    return y, s_fin


def upsample_to_48k(x, st: UpsamplerState, fs_in_khz: int = 16,
                    frame_ms: int = 20):
    """x: [B, fs_in_khz*frame_ms] i32 (int16-valued) -> ([B, 48*frame_ms]
    i32 int16-valued, new state).  Bit-exact with
    Resampler(fs_in*1000, 48000).process()."""
    idx, coef, delay, n_out = _fir_plan(fs_in_khz, frame_ms)
    n_in = fs_in_khz * frame_ms
    # reference processing order: [delay tail | x[:n_in - delay]]
    seq = jnp.concatenate([st.delay, x[:, :n_in - delay]], axis=1)
    y, s_iir = _up2_hq_scan(seq, st.s_iir)
    z = jnp.concatenate([st.s_fir, y], axis=1)       # [B, 8 + 2*n_in]
    acc = jnp.zeros((x.shape[0], n_out), i32)
    for j in range(8):
        acc = acc + z[:, idx[:, j]] * coef[None, :, j]
    out = sat16(rshift_round(acc, 15))
    new_st = UpsamplerState(
        s_iir=s_iir, s_fir=z[:, -RESAMPLER_ORDER_FIR_12:],
        delay=x[:, n_in - delay:])
    return out, new_st

"""Batched end-to-end SILK decode: packets in, int16 PCM out.

Host side: the native C symbol pass (opus_tpu/native/silk_dec.c) turns
each stream's SILK payload into symbol tensors (excitation exc_Q14,
per-subframe gains + derived gain terms, LPC/LTP coefficients, pitch
lags, flags).  Device side: one jitted step runs the full decode_core —
LTP-buffer rewhitening (batched order-16 analysis FIR), the 5-tap LTP
prediction recursion (chunked over the pitch-lag feedback distance), and
the order-16 LPC synthesis recursion (lax.scan) — entirely in int32
wrap-exact fixed point (opus_tpu/ops/silk_fixed.py), so the PCM is
bit-identical to the scalar decoder.

This is the SURVEY.md §7 decode split for SILK (reference pipeline:
silk_decode_core silk/decode_core.c:38, whitening :135-160, LTP :178,
LPC synthesis :195-216); bench.py includes this path.  Losses/PLC fall
back to the scalar decoder (opus_tpu/silk/decoder.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.silk_fixed import (smulwb, smulww, sat16, add_sat32,
                              lshift_sat32, rshift_round)
from ..native.silk_symbols import SilkSymbolBatch

LTP_ORDER = 5
MAX_LPC_ORDER = 16
CHUNK = 10          # LTP chunk; safe while pitch lag - 2 >= CHUNK (min
                    # lag is 2 ms = 16 samples at 8 kHz, so distance >= 14)


class SilkState(NamedTuple):
    slpc: jax.Array     # [B, 16] int32 sLPC_Q14 tail
    out_buf: jax.Array  # [B, ltp_mem] int32 (int16-valued xq history)


def init_state(batch: int, fs_khz: int = 16) -> SilkState:
    return SilkState(
        slpc=jnp.zeros((batch, MAX_LPC_ORDER), jnp.int32),
        out_buf=jnp.zeros((batch, 20 * fs_khz), jnp.int32),
    )


def _analysis_fir(inp, a, order: int):
    """Batched silk_LPC_analysis_filter (silk/LPC_analysis_filter.c).

    inp: [B, M] int32 (int16 values), a: [B, 16] int32 (int16 values).
    Returns [B, M] int32; entries ix < order are zeroed like the
    reference.  All arithmetic wraps in int32 (SMLABB_ovflw chain).
    """
    b, m = inp.shape
    pad = jnp.concatenate([jnp.zeros((b, MAX_LPC_ORDER), jnp.int32), inp],
                          axis=1)
    # windows[b, ix, j] = inp[b, ix - 1 - j]
    idx = (jnp.arange(m)[:, None] + MAX_LPC_ORDER - 1
           - jnp.arange(MAX_LPC_ORDER)[None, :])
    win = pad[:, idx]                                   # [B, M, 16]
    acc = jnp.sum(win * a[:, None, :], axis=-1, dtype=jnp.int32)
    out32 = (inp << 12) - acc
    out = sat16(rshift_round(out32, 12))
    return jnp.where(jnp.arange(m)[None, :] < order, 0, out)


def _ltp_subframe(sltp, exc_sub, b5, lag, buf_idx: int, sf: int):
    """5-tap LTP prediction recursion over one subframe (decode_core.c:178).

    sltp: [B, T] int32; exc_sub: [B, sf]; b5: [B, 5]; lag: [B].
    Returns (res [B, sf], updated sltp).  Processed in CHUNK-sample
    blocks: the recursion feedback distance is lag - LTP_ORDER//2 - 2
    >= 14 samples, so samples within a chunk are independent.
    """
    bsz = sltp.shape[0]
    res_chunks = []
    for c in range(sf // CHUNK):
        p0 = buf_idx + c * CHUNK - lag - 2              # [B]
        seg = jax.vmap(lambda row, s: jax.lax.dynamic_slice(
            row, (s,), (CHUNK + 4,)))(sltp, p0)         # [B, CHUNK+4]
        pred = jnp.full((bsz, CHUNK), 2, jnp.int32)
        for j in range(LTP_ORDER):
            pred = pred + smulwb(seg[:, 4 - j:4 - j + CHUNK], b5[:, j:j + 1])
        res = exc_sub[:, c * CHUNK:(c + 1) * CHUNK] + (pred << 1)
        sltp = jax.lax.dynamic_update_slice(
            sltp, res << 1, (0, buf_idx + c * CHUNK))
        res_chunks.append(res)
    return jnp.concatenate(res_chunks, axis=1), sltp


def _lpc_subframe(slpc, res, a16, order_half: int):
    """Order-16 LPC synthesis recursion (decode_core.c:195-216).

    slpc: [B, 16] state (most recent last); res: [B, sf]; a16: [B, 16].
    Returns (v [B, sf] sLPC_Q14 values, new slpc).

    On TPU the recursion runs as the Pallas kernel (ops/lpc_pallas.py,
    register-resident state, ~1.7x the scan); elsewhere as lax.scan.
    Both are bit-exact twins (tests/test_lpc_pallas.py).
    """
    a_rev = a16[:, ::-1]
    if jax.default_backend() == "tpu":
        from ..ops.lpc_pallas import lpc_subframe
        return lpc_subframe(slpc, res, a_rev, order_half)

    def step(state, r):
        pred = order_half + jnp.sum(smulwb(state, a_rev), axis=1,
                                    dtype=jnp.int32)
        v = add_sat32(r, lshift_sat32(pred, 4))
        return jnp.concatenate([state[:, 1:], v[:, None]], axis=1), v

    new_slpc, vs = jax.lax.scan(step, slpc, res.T)
    return vs.T, new_slpc


@partial(jax.jit, static_argnames=("fs_khz", "nb_subfr"))
def silk_decode_step(exc, a_q12, b_q14, pitch_l, gain_q10, gain_adj,
                     whiten_gain, voiced, rewhiten2, state: SilkState,
                     *, fs_khz: int = 16, nb_subfr: int = 4):
    """One SILK frame of batched decode_core, int32 wrap-exact.

    exc:         [B, L] int32 exc_Q14
    a_q12:       [B, 2, 16] int32 (int16 values)
    b_q14:       [B, 4, 5] int32 (int16 values)
    pitch_l:     [B, 4] int32
    gain_q10 / gain_adj / whiten_gain: [B, 4] int32
    voiced:      [B] bool; rewhiten2: [B] bool (voiced & NLSF interp)
    returns (xq [B, L] int32 (int16 values), new state)
    """
    sf = 5 * fs_khz
    ltp_mem = 20 * fs_khz
    order = MAX_LPC_ORDER if fs_khz >= 16 else 10
    order_half = order >> 1
    b, l = exc.shape
    sltp = jnp.zeros((b, ltp_mem + l), jnp.int32)
    t_idx = jnp.arange(ltp_mem + l, dtype=jnp.int32)[None, :]
    slpc = state.slpc
    xq_subs = []

    whit0 = None
    for k in range(nb_subfr):
        lag = pitch_l[:, k]
        adj = gain_adj[:, k:k + 1]
        # --- gain-change rescale of the LPC state (decode_core.c:115) ---
        slpc = smulww(adj, slpc)

        # --- LTP buffer maintenance ---
        buf_idx = ltp_mem + k * sf
        if k == 0:
            # rewhiten from the previous frame's output (voiced streams)
            whit0 = _analysis_fir(state.out_buf, a_q12[:, 0, :], order)
            fill = smulwb(whiten_gain[:, 0:1],
                          jnp.concatenate(
                              [whit0, jnp.zeros((b, l), jnp.int32)], axis=1))
            mask = (t_idx >= (ltp_mem - lag - 2)[:, None]) \
                & (t_idx < ltp_mem) & voiced[:, None]
            sltp = jnp.where(mask, fill, sltp)
        else:
            rewhiten_here = rewhiten2 if (k == 2 and nb_subfr == 4) \
                else jnp.zeros_like(voiced)
            # non-rewhitened voiced subframes: rescale the tap window
            win = (t_idx >= (buf_idx - lag - 2)[:, None]) \
                & (t_idx < buf_idx) & voiced[:, None] \
                & ~rewhiten_here[:, None]
            sltp = jnp.where(win, smulww(adj, sltp), sltp)
            if k == 2 and nb_subfr == 4:
                # NLSF-interpolated frames rewhiten again at subframe 2
                # over [prev frame output, current xq[:2*sf]]
                xq01 = jnp.concatenate(xq_subs, axis=1)
                whit2 = _analysis_fir(
                    jnp.concatenate([state.out_buf, xq01], axis=1),
                    a_q12[:, 1, :], order)
                fill2 = smulwb(
                    whiten_gain[:, 2:3],
                    jnp.concatenate(
                        [whit2, jnp.zeros((b, l - 2 * sf), jnp.int32)],
                        axis=1))
                mask2 = (t_idx >= (buf_idx - lag - 2)[:, None]) \
                    & (t_idx < buf_idx) & rewhiten_here[:, None]
                sltp = jnp.where(mask2, fill2, sltp)

        # --- LTP prediction -> residual ---
        exc_sub = exc[:, k * sf:(k + 1) * sf]
        lag_safe = jnp.maximum(lag, 2 * fs_khz)   # unvoiced lag=0: clamp so
        res_ltp, sltp = _ltp_subframe(sltp, exc_sub, b_q14[:, k, :],
                                      lag_safe, buf_idx, sf)
        res = jnp.where(voiced[:, None], res_ltp, exc_sub)

        # --- LPC synthesis ---
        v, slpc = _lpc_subframe(slpc, res, a_q12[:, k >> 1, :], order_half)
        xq_subs.append(sat16(rshift_round(
            smulww(v, gain_q10[:, k:k + 1]), 8)))

    xq = jnp.concatenate(xq_subs, axis=1)
    out_buf = jnp.concatenate([state.out_buf, xq], axis=1)[:, -ltp_mem:]
    return xq, SilkState(slpc=slpc, out_buf=out_buf)


class BatchedSilkDecoder:
    """Packets-in -> PCM-out batched SILK decoder (mono).

    Host C symbol pass + jitted int32-exact TPU synthesis.  Output is
    int16 PCM at the SILK internal rate (8/12/16 kHz); resampling to the
    API rate is a separate batched stage.
    """

    def __init__(self, batch: int, fs_khz: int = 16, nb_subfr: int = 4,
                 frames_per_packet: int = 1, nthreads: int | None = None):
        self.sym = SilkSymbolBatch(batch, fs_khz, nb_subfr,
                                   frames_per_packet, nthreads)
        self.batch = batch
        self.fs_khz = fs_khz
        self.nb_subfr = nb_subfr
        self.nframes = frames_per_packet
        self.frame_length = nb_subfr * 5 * fs_khz
        self.state = init_state(batch, fs_khz)

    def decode(self, payloads: list[bytes]) -> np.ndarray:
        """Decode one packet per stream -> int16 PCM
        [B, nframes*frame_length] at the internal rate."""
        exc, outs, rets = self.sym.decode(payloads)
        if np.any(rets != 0):
            raise RuntimeError(f"SILK symbol decode failed: {rets}")
        f = self.sym.fields
        a = f("a_q12")                       # [B, F, 2, 16]
        bq = f("b_q14")                      # [B, F, 4, 5]
        pitch = f("pitchL")                  # [B, F, 4]
        g10 = f("gain_q10")
        gadj = f("gain_adj_q16")
        wg = f("whiten_gain_q31")
        st = f("signal_type")                # [B, F]
        rw2 = f("rewhiten2")
        pcm = []
        for fr in range(self.nframes):
            xq, self.state = silk_decode_step(
                jnp.asarray(exc[:, fr]), jnp.asarray(a[:, fr]),
                jnp.asarray(bq[:, fr]), jnp.asarray(pitch[:, fr]),
                jnp.asarray(g10[:, fr]), jnp.asarray(gadj[:, fr]),
                jnp.asarray(wg[:, fr]), jnp.asarray(st[:, fr] == 2),
                jnp.asarray(rw2[:, fr] != 0), self.state,
                fs_khz=self.fs_khz, nb_subfr=self.nb_subfr)
            pcm.append(xq)
        out = pcm[0] if self.nframes == 1 else jnp.concatenate(pcm, axis=1)
        return np.asarray(out, np.int16)

"""Batched end-to-end CELT decode: packets in, PCM out.

Host side: the native C symbol pass (opus_tpu/native/celt_dec.c) turns each
stream's frame into symbol tensors (X, band energies, postfilter params,
flags).  Device side: one jitted step runs denormalise -> IMDCT (long and
short-block paths, selected per stream) -> TDAC overlap -> comb postfilter
(recursive at the per-stream pitch lag, evaluated in lag-safe chunks) ->
deemphasis, all batched over streams on the MXU/VPU.

This is the SURVEY.md §7 decode split (reference pipeline:
celt_decode_with_ec celt/celt_decoder.c:1619, celt_synthesis :413,
comb_filter celt/celt.c:238, deemphasis :318); bench.py measures this path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..celt.modes import mode_create
from ..celt.tables import E_MEANS, COMB_GAINS, COMBFILTER_MINPERIOD
from ..ops.mdct import _backward_basis, _window
from ..native.celt_symbols import CeltSymbolBatch

HIST = 1026             # comb-filter history: COMBFILTER_MAXPERIOD + 2
CHUNK = 12              # comb chunk; must be <= COMBFILTER_MINPERIOD - 2


class DecState(NamedTuple):
    tail: jax.Array     # [BC, overlap/2] raw IMDCT tail (pre-postfilter)
    hist: jax.Array     # [BC, HIST] postfiltered output history
    deemph: jax.Array   # [BC] deemphasis memory


def init_state(batch_ch: int, overlap: int = 120) -> DecState:
    return DecState(
        tail=jnp.zeros((batch_ch, overlap // 2), jnp.float32),
        hist=jnp.zeros((batch_ch, HIST), jnp.float32),
        deemph=jnp.zeros((batch_ch,), jnp.float32),
    )


def _band_map(mode, lm: int) -> np.ndarray:
    m = 1 << lm
    n = mode.shortMdctSize << lm
    bm = np.full(n, mode.nbEBands, dtype=np.int32)
    for i in range(mode.nbEBands):
        bm[m * mode.eBands[i]:m * mode.eBands[i + 1]] = i
    return bm


def _tdac(core: jax.Array, tail: jax.Array, overlap: int):
    """core: [BC, nblocks, n2+?]; returns (sig [BC, nblocks*n2], new tail)."""
    n2 = core.shape[-1]
    ov2 = overlap // 2
    w = jnp.asarray(_window(overlap).astype(np.float32))
    w_lo, w_hi = w[:ov2], w[overlap - 1:ov2 - 1:-1]
    tails = jnp.concatenate([tail[:, None, :], core[:, :-1, n2 - ov2:]],
                            axis=1)
    cur = core[:, :, ov2 - 1::-1]
    head = w_hi * tails - w_lo * cur
    mid = (w_lo * tails + w_hi * cur)[:, :, ::-1]
    sig = jnp.concatenate([head, mid, core[:, :, ov2:n2 - ov2]], axis=-1)
    return sig.reshape(core.shape[0], -1), core[:, -1, n2 - ov2:]


@partial(jax.jit, static_argnames=("fs", "frame_size", "lm", "channels"))
def decode_step_packed(packed, state: DecState, *, fs: int = 48000,
                       frame_size: int = 960, lm: int = 3,
                       channels: int = 1):
    """Unpack one fused [B, C*N + C*nb + 14] f32 input tensor (a tunneled
    TPU pays high per-transfer latency, so the host ships one array) and
    run decode_step."""
    mode = mode_create(fs, frame_size)
    n = frame_size
    nb = mode.nbEBands
    c = channels
    b = packed.shape[0]
    x = packed[:, :c * n].reshape(b, c, n)
    e = packed[:, c * n:c * n + c * nb].reshape(b, c, nb)
    o = c * n + c * nb
    periods = packed[:, o:o + 3].astype(jnp.int32)
    tgains = packed[:, o + 3:o + 12].reshape(b, 3, 3)
    transient = packed[:, o + 12] != 0
    silence = packed[:, o + 13] != 0
    return decode_step(x, e, transient, silence, periods, tgains, state,
                       fs=fs, frame_size=frame_size, lm=lm,
                       channels=channels)


@partial(jax.jit, static_argnames=("fs", "frame_size", "lm", "channels"))
def decode_step(x, band_log_e, transient, silence, periods, tap_gains,
                state: DecState, *, fs: int = 48000, frame_size: int = 960,
                lm: int = 3, channels: int = 1):
    """One frame of batched CELT decode DSP.

    x:          [B, C, N] normalized band shapes
    band_log_e: [B, C, nbEBands]
    transient:  [B] bool; silence: [B] bool
    periods:    [B, 3] int32 comb lags for phases (old, current, new)
    tap_gains:  [B, 3, 3] f32 per-phase tap gains (gain * COMB_GAINS[tapset])
    state:      arrays with leading dim B*C
    returns (pcm [B, C, N] float in [-1, 1], new state)
    """
    mode = mode_create(fs, frame_size)
    n = mode.shortMdctSize << lm
    overlap = mode.overlap
    nshort = 1 << lm
    n2s = mode.shortMdctSize
    b, c = x.shape[0], x.shape[1]
    bc = b * c

    # --- denormalise ---
    bm = jnp.asarray(_band_map(mode, lm))
    e_means = jnp.asarray(np.asarray(E_MEANS[:mode.nbEBands], np.float32))
    gains = jnp.exp2(jnp.minimum(32.0, band_log_e + e_means))
    gains = jnp.concatenate([gains, jnp.zeros_like(gains[..., :1])], axis=-1)
    freq = x * gains[..., bm]
    freq = jnp.where(silence[:, None, None], 0.0, freq).reshape(bc, n)

    # --- IMDCT: long and short paths, select per stream ---
    basis_l = jnp.asarray(_backward_basis(n, overlap))
    core_l = jnp.matmul(freq[:, None, :], basis_l,
                        preferred_element_type=jnp.float32)
    sig_l, tail_l = _tdac(core_l, state.tail, overlap)
    if lm > 0:
        basis_s = jnp.asarray(_backward_basis(n2s, overlap))
        spec_s = freq.reshape(bc, n2s, nshort).transpose(0, 2, 1)
        core_s = jnp.matmul(spec_s, basis_s,
                            preferred_element_type=jnp.float32)
        sig_s, tail_s = _tdac(core_s, state.tail, overlap)
        tsel = jnp.repeat(transient, c)
        sig = jnp.where(tsel[:, None], sig_s, sig_l)
        new_tail = jnp.where(tsel[:, None], tail_s, tail_l)
    else:
        sig, new_tail = sig_l, tail_l

    # --- comb postfilter (recursive; lag-safe chunks of CHUNK samples) ---
    # blend profile: [0,overlap) fades phase0->phase1 taps, the next
    # overlap samples fade phase1->phase2, the rest is pure phase2
    # (reference: the two comb_filter calls in celt_decode_with_ec)
    w = _window(overlap).astype(np.float32)
    prof = np.ones(n, np.float32)
    prof[:overlap] = w * w
    if lm > 0:
        prof[overlap:2 * overlap] = w * w
    fprof = jnp.asarray(prof)
    # per-chunk phase selectors: (a_phase, b_phase) indices into periods
    nch = n // CHUNK
    pa = np.zeros(nch, np.int32)
    pb = np.full(nch, 2, np.int32)
    for j in range(nch):
        s0 = j * CHUNK
        if lm > 0:
            pa[j] = 0 if s0 < overlap else (1 if s0 < 2 * overlap else 2)
            pb[j] = 1 if s0 < overlap else 2
        else:
            pa[j] = 0 if s0 < overlap else 1
            pb[j] = 1
    pa = jnp.asarray(pa)
    pb = jnp.asarray(pb)

    periods_bc = jnp.repeat(periods, c, axis=0)          # [BC, 3]
    tgains_bc = jnp.repeat(tap_gains, c, axis=0)         # [BC, 3, 3]
    any_gain = jnp.any(tgains_bc != 0.0)

    def run_comb(sig):
        ybuf = jnp.concatenate(
            [state.hist, jnp.zeros((bc, n), jnp.float32)], axis=1)
        xch = sig.reshape(bc, nch, CHUNK).transpose(1, 0, 2)  # [nch, BC, CH]
        fch = fprof.reshape(nch, CHUNK)

        def taps_at(ybuf, s0, t, g):
            # 5-tap comb at per-stream lag t, samples [s0, s0+CHUNK)
            starts = HIST + s0 - t - 2
            seg = jax.vmap(lambda row, s: jax.lax.dynamic_slice(
                row, (s,), (CHUNK + 4,)))(ybuf, starts)
            return (g[:, 0:1] * seg[:, 2:CHUNK + 2]
                    + g[:, 1:2] * (seg[:, 3:CHUNK + 3] + seg[:, 1:CHUNK + 1])
                    + g[:, 2:3] * (seg[:, 4:CHUNK + 4] + seg[:, 0:CHUNK]))

        def body(ybuf, inp):
            xc, fc, ja, jb, s0 = inp
            ta = jnp.take(periods_bc, ja, axis=1)
            tb = jnp.take(periods_bc, jb, axis=1)
            ga = jnp.take(tgains_bc, ja, axis=1)
            gb = jnp.take(tgains_bc, jb, axis=1)
            out = xc + (1.0 - fc) * taps_at(ybuf, s0, ta, ga) \
                + fc * taps_at(ybuf, s0, tb, gb)
            ybuf = jax.lax.dynamic_update_slice(ybuf, out, (0, HIST + s0))
            return ybuf, out

        s0s = jnp.arange(nch, dtype=jnp.int32) * CHUNK
        ybuf, outs = jax.lax.scan(body, ybuf, (xch, fch, pa, pb, s0s))
        return outs.transpose(1, 0, 2).reshape(bc, n), ybuf[:, n:n + HIST]

    def skip_comb(sig):
        ybuf = jnp.concatenate([state.hist, sig], axis=1)
        return sig, ybuf[:, n:n + HIST]

    filt, new_hist = jax.lax.cond(any_gain, run_comb, skip_comb, sig)

    # --- deemphasis y[n] = x[n] + coef*y[n-1], associative scan ---
    coef = jnp.float32(mode.preemph[0])
    a = jnp.full_like(filt, coef)
    x0 = filt.at[:, 0].add(coef * state.deemph)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, br + ar * bl

    _, y = jax.lax.associative_scan(combine, (a, x0), axis=1)
    pcm = (y * (1.0 / 32768.0)).reshape(b, c, n)
    return pcm, DecState(tail=new_tail, hist=new_hist, deemph=y[:, -1])


class BatchedCeltDecoder:
    """Packets-in -> PCM-out batched CELT decoder.

    Host C symbol pass + jitted TPU synthesis.  Streams are independent;
    per-stream state lives partly in C (entropy/energy state) and partly
    on device (synthesis/postfilter/deemphasis memory).
    """

    def __init__(self, batch: int, channels: int = 1, fs: int = 48000,
                 frame_size: int = 960, nthreads: int | None = None):
        self.sym = CeltSymbolBatch(batch, channels, fs, frame_size, nthreads)
        self.batch = batch
        self.C = channels
        self.fs = fs
        self.N = frame_size
        self.lm = self.sym.lm
        mode = self.sym.mode
        self.nb = mode.nbEBands
        self.overlap = mode.overlap
        self.state = init_state(batch * channels, mode.overlap)
        self._comb = np.asarray(COMB_GAINS, np.float32)

    def pack(self, frames: list[bytes]) -> np.ndarray:
        """Host C symbol pass -> one fused f32 tensor for the device."""
        X, E, pf, flags, rets = self.sym.decode(frames)
        if np.any(rets != 0):
            raise RuntimeError(f"symbol decode failed: {rets}")
        b = self.batch
        periods = np.maximum(pf[:, :3], COMBFILTER_MINPERIOD)
        tgains = (pf[:, 3:6, None]
                  * self._comb[flags[:, 5:8]]).reshape(b, 9)
        packed = np.concatenate(
            [X, E, periods, tgains, flags[:, 1:2], flags[:, 0:1]],
            axis=1, dtype=np.float32)
        return packed

    def decode(self, frames: list[bytes]) -> np.ndarray:
        """Decode one frame per stream -> float PCM [B, C, N] in [-1, 1]."""
        pcm, self.state = decode_step_packed(
            jnp.asarray(self.pack(frames)), self.state, fs=self.fs,
            frame_size=self.N, lm=self.lm, channels=self.C)
        return pcm

"""Batched end-to-end CELT encode: PCM in, packets out.

Device side: one jitted step runs preemphasis (an order-1 FIR), the
long- and short-block forward MDCTs (basis matmuls on the MXU), band
energies, log-energies and band normalization, batched over streams.
Host side: the native C symbol-encode pass (opus_tpu/native/celt_enc.c)
turns the spectra into CELT packet bytes (transient/tf/dynalloc/trim
decisions, coarse+fine energy, allocation, PVQ search, range encoding),
threaded over the batch.

This is the SURVEY.md §7 encode split (reference pipeline:
celt_encode_with_ec celt/celt_encoder.c:1726, compute_mdcts :511);
bench.py measures this path together with the batched decoder.

The TPU DSP runs in float32 (the MXU's natural precision), so encoder
*decisions* can differ from the float64 scalar encoder on ties; every
produced stream is still a valid CELT stream (gated against both our
decoder and reference libopus in tests/test_batched_celt_enc.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..celt.modes import mode_create
from ..celt.tables import E_MEANS
from ..ops.mdct import _forward_basis
from ..native.celt_enc_symbols import CeltEncSymbolBatch

PREEMPH = 0.85
SIG_SCALE = 32768.0


class EncState(NamedTuple):
    mem: jax.Array    # [B] preemphasis memory (scaled domain)
    hist: jax.Array   # [B, overlap] preemphasized history


def init_state(batch: int, overlap: int = 120) -> EncState:
    return EncState(mem=jnp.zeros((batch,), jnp.float32),
                    hist=jnp.zeros((batch, overlap), jnp.float32))


def _band_mask(mode, lm: int) -> np.ndarray:
    m = 1 << lm
    n = mode.shortMdctSize << lm
    w = np.zeros((n, mode.nbEBands), np.float32)
    for i in range(mode.nbEBands):
        w[m * mode.eBands[i]:m * mode.eBands[i + 1], i] = 1.0
    return w


def _band_map(mode, lm: int) -> np.ndarray:
    m = 1 << lm
    n = mode.shortMdctSize << lm
    bm = np.zeros(n, dtype=np.int32)
    for i in range(mode.nbEBands):
        bm[m * mode.eBands[i]:m * mode.eBands[i + 1]] = i
    return bm


@partial(jax.jit, static_argnames=("fs", "frame_size", "lm"))
def encode_dsp(pcm, state: EncState, *, fs: int = 48000,
               frame_size: int = 960, lm: int = 3):
    """One frame of batched CELT encode DSP.

    pcm: [B, N] float32 in [-1, 1].
    Returns (x_l, x_s [B, N], ble_l, ble_s [B, nbE], new state).
    """
    mode = mode_create(fs, frame_size)
    n = frame_size
    overlap = mode.overlap
    nshort = 1 << lm
    n2s = mode.shortMdctSize
    b = pcm.shape[0]

    # --- preemphasis: y[i] = x[i] - coef * x[i-1] (celt_encoder.c:557) ---
    x = pcm * SIG_SCALE
    inp = x - jnp.concatenate([state.mem[:, None],
                               PREEMPH * x[:, :-1]], axis=1)
    new_mem = PREEMPH * x[:, -1]
    full = jnp.concatenate([state.hist, inp], axis=1)   # [B, N+overlap]
    new_hist = full[:, n:]

    # --- forward MDCTs (basis matmuls) ---
    basis_l = jnp.asarray(_forward_basis(n, overlap).astype(np.float32))
    freq_l = jnp.matmul(full[:, None, :], basis_l,
                        preferred_element_type=jnp.float32)[:, 0, :]
    if lm > 0:
        basis_s = jnp.asarray(
            _forward_basis(n2s, overlap).astype(np.float32))
        segs = jnp.stack([full[:, k * n2s:k * n2s + n2s + overlap]
                          for k in range(nshort)], axis=1)  # [B, S, n2s+ov]
        spec = jnp.matmul(segs, basis_s,
                          preferred_element_type=jnp.float32)  # [B, S, n2s]
        freq_s = spec.transpose(0, 2, 1).reshape(b, n)
    else:
        freq_s = freq_l

    # --- band energies + normalization ---
    mask = jnp.asarray(_band_mask(mode, lm))
    bm = jnp.asarray(_band_map(mode, lm))
    e_means = jnp.asarray(np.asarray(E_MEANS[:mode.nbEBands], np.float32))

    def bands(freq):
        e2 = jnp.matmul(freq * freq, mask,
                        preferred_element_type=jnp.float32)
        band_e = jnp.sqrt(1e-27 + e2)
        ble = jnp.log2(band_e) - e_means
        xn = freq * (1.0 / (1e-27 + band_e))[:, bm]
        return xn, ble

    x_l, ble_l = bands(freq_l)
    x_s, ble_s = bands(freq_s)
    # pack into one array: a tunneled TPU pays high per-transfer latency,
    # so ship one [B, 2N+2nbE] tensor instead of four
    packed = jnp.concatenate([x_l, x_s, ble_l, ble_s], axis=1)
    return packed, EncState(mem=new_mem, hist=new_hist)


class BatchedCeltEncoder:
    """PCM-in -> packets-out batched CELT encoder (mono, CBR).

    Jitted TPU DSP (preemph + dual MDCT + energies) + host C symbol
    pass.  Produces raw CELT frames of exactly `nbytes` bytes; wrap with
    a CELT-only TOC byte for standard Opus packets.
    """

    def __init__(self, batch: int, fs: int = 48000, frame_size: int = 960,
                 nbytes: int = 160, complexity: int = 5,
                 nthreads: int | None = None):
        self.sym = CeltEncSymbolBatch(batch, fs, frame_size, nbytes,
                                      complexity, nthreads)
        self.batch = batch
        self.fs = fs
        self.N = frame_size
        self.lm = self.sym.lm
        self.state = init_state(batch, self.sym.mode.overlap)

    def dsp(self, pcm: np.ndarray):
        """Run the device DSP stage only; returns the packed device array
        (lets callers overlap the transfer with host work)."""
        packed, self.state = encode_dsp(
            jnp.asarray(pcm, jnp.float32), self.state,
            fs=self.fs, frame_size=self.N, lm=self.lm)
        return packed

    def symbols(self, pcm: np.ndarray, packed):
        """Host C symbol pass from the packed device DSP output."""
        n, nb = self.N, self.sym.nb
        host = np.asarray(packed, np.float64)
        pays, rngs, rets = self.sym.encode(
            np.asarray(pcm, np.float64), host[:, :n], host[:, n:2 * n],
            host[:, 2 * n:2 * n + nb], host[:, 2 * n + nb:])
        if np.any(rets < 0):
            raise RuntimeError(f"symbol encode failed: {rets}")
        return pays, rngs

    def encode(self, pcm: np.ndarray):
        """pcm [B, N] float in [-1, 1] -> (payloads list[bytes],
        final ranges [B] u32)."""
        return self.symbols(pcm, self.dsp(pcm))

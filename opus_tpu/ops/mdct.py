"""MDCT analysis/synthesis for CELT, TPU-native.

The reference implements the MDCT as a pre/post-rotated N/4 complex FFT with
an in-buffer windowed fold (celt/mdct.c:122 forward, :268 backward).  On TPU
the transform is expressed as a single basis matmul per short block — the MXU
eats [B*streams, N2+overlap] @ [N2+overlap, N2] for breakfast, the basis is a
compile-time constant that XLA keeps in VMEM, and there is no bit-reversal or
twiddle bookkeeping.  (A split-radix Pallas FFT only becomes worthwhile for
N2 ≥ ~1920; the standard modes top out at N2=960.)

Transform definition (matches celt/tests/test_unit_mdct.c::check):
    fwd:  out[k] = (4/N) * sum_n u[n] cos(2*pi*(n+.5+N/4)*(k+.5)/N)
    bwd:  t[n]   =         sum_k S[k] cos(2*pi*(n+.5+N/4)*(k+.5)/N)
with N = 2*N2, u the input windowed over `overlap` taper samples at each end
of its N2+overlap support (zero-padded to N).

The backward direction exposes the same TDAC blend the reference performs
in-buffer ("mirror" loop, celt/mdct.c:377): each block consumes the previous
block's trailing overlap/2 samples and produces N2 finished samples plus a new
trailing tail carried to the next block/frame.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _forward_basis(n2: int, overlap: int) -> np.ndarray:
    """[N2+overlap, N2] matrix including the window taper and 4/N scale."""
    n = 2 * n2
    pad = (n2 - overlap) // 2
    j = np.arange(n2 + overlap, dtype=np.float64)
    k = np.arange(n2, dtype=np.float64)
    w = _window(overlap)
    taper = np.ones(n2 + overlap)
    taper[:overlap] = w
    taper[n2:] = w[::-1]
    phase = 2 * np.pi * (pad + j[:, None] + 0.5 + n / 4) * (k[None, :] + 0.5) / n
    return (np.cos(phase) * taper[:, None] * (4.0 / n)).astype(np.float32)


@lru_cache(maxsize=None)
def _backward_basis(n2: int, overlap: int) -> np.ndarray:
    """[N2, N2] matrix: spectrum -> t[N2/2 : N2/2+N2].

    The reference's FFT region lands at buffer offset overlap/2, but in
    *time* it spans [N2/2, 3*N2/2) of the length-N IMDCT output regardless
    of overlap (verified against clt_mdct_backward for overlap < N2)."""
    n = 2 * n2
    m = np.arange(n2, dtype=np.float64) + n2 / 2
    k = np.arange(n2, dtype=np.float64)
    phase = 2 * np.pi * (m[:, None] + 0.5 + n / 4) * (k[None, :] + 0.5) / n
    return np.cos(phase).astype(np.float32).T  # [N2(spec), N2(time)]


@lru_cache(maxsize=None)
def _window(overlap: int) -> np.ndarray:
    i = np.arange(overlap, dtype=np.float64)
    inner = np.sin(0.5 * np.pi * (i + 0.5) / overlap)
    return np.sin(0.5 * np.pi * inner * inner)


def mdct_forward(x: jax.Array, n2: int, overlap: int) -> jax.Array:
    """x: [..., N2+overlap] (already includes the history overlap) -> [..., N2]."""
    basis = jnp.asarray(_forward_basis(n2, overlap))
    return jnp.matmul(x, basis, preferred_element_type=jnp.float32)


def imdct_core(spec: jax.Array, n2: int, overlap: int) -> jax.Array:
    """spec: [..., N2] -> raw time samples t[overlap/2 : overlap/2+N2]."""
    basis = jnp.asarray(_backward_basis(n2, overlap))
    return jnp.matmul(spec, basis, preferred_element_type=jnp.float32)


def tdac_blend(old: jax.Array, core: jax.Array, overlap: int) -> jax.Array:
    """One block of the reference's in-buffer mirror (celt/mdct.c:377).

    old:  [..., overlap/2]  prior buffer contents (previous block's raw tail)
    core: [..., N2]         this block's raw t samples
    returns the block's finished N2 output samples; the caller carries
    core[..., N2-overlap/2:] forward as the next `old`.
    """
    ov2 = overlap // 2
    w = jnp.asarray(_window(overlap).astype(np.float32))
    w_lo = w[:ov2]                      # w[i]
    w_hi = w[overlap - 1: ov2 - 1: -1]  # w[overlap-1-i]
    n2 = core.shape[-1]
    cur = core[..., ov2 - 1::-1]        # core[ov/2-1-i]
    head = w_hi * old - w_lo * cur                      # out[i], i<ov/2
    mid = (w_lo * old + w_hi * cur)[..., ::-1]          # out[ov-1-i] reversed
    # local positions [overlap, N2) come straight from core; the final ov/2
    # raw samples are the tail consumed by the NEXT block's blend.
    return jnp.concatenate([head, mid, core[..., ov2:n2 - ov2]], axis=-1)


def imdct_with_overlap(spec: jax.Array, prev_tail: jax.Array,
                       n2: int, overlap: int) -> tuple[jax.Array, jax.Array]:
    """Full frame synthesis over B short blocks.

    spec:      [..., B, N2] per-block MDCT spectra
    prev_tail: [..., overlap/2] raw tail carried from the previous frame
    returns (pcm [..., B*N2], new_tail [..., overlap/2])
    """
    ov2 = overlap // 2
    nblocks = spec.shape[-2]
    n2 = spec.shape[-1]
    core = imdct_core(spec, n2, overlap)            # [..., B, N2]
    tails = jnp.concatenate(
        [prev_tail[..., None, :], core[..., :-1, n2 - ov2:]], axis=-2)
    blended = tdac_blend(tails, core, overlap)       # [..., B, N2]
    out = blended.reshape(*blended.shape[:-2], nblocks * n2)
    new_tail = core[..., -1, n2 - ov2:]
    return out, new_tail

"""Soft clipping for float->int16 conversion (reference: src/opus.c:39
opus_pcm_soft_clip_impl).

When a decoded float signal overshoots [-1, 1], plain saturation creates
hard discontinuities.  The reference instead applies, per zero-crossing-
bounded region containing a peak |x| > 1, the quadratic non-linearity
x <- x + a*x^2 with `a` chosen so the region's peak lands exactly at
+/-1, carrying `a` across frame boundaries to stay continuous.  This is
a faithful re-implementation (float32 arithmetic, same operation order)
validated bit-exactly against the reference's public opus_pcm_soft_clip.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def pcm_soft_clip(x: np.ndarray, channels: int,
                  declip_mem: np.ndarray) -> np.ndarray:
    """In-place soft clip of interleaved float32 PCM.

    x: float32 array of length N*channels (interleaved).
    declip_mem: float32 array [channels], persistent across calls.
    Returns x (modified in place).
    """
    if channels < 1 or x.size < 1:
        return x
    assert x.dtype == np.float32
    n = x.size // channels
    # Domain clamp: the non-linearity's derivative is zero outside [-2, 2],
    # so clamping there introduces no discontinuity.
    np.clip(x, F32(-2.0), F32(2.0), out=x)
    for c in range(channels):
        ch = x[c::channels]
        a = F32(declip_mem[c])
        # Keep applying the previous frame's non-linearity until the signal
        # crosses zero, so the curve stays continuous across the boundary.
        for i in range(n):
            if ch[i] * a >= 0:
                break
            ch[i] = ch[i] + a * ch[i] * ch[i]
        curr = 0
        x0 = ch[0]
        while True:
            over = np.nonzero(np.abs(ch[curr:]) > F32(1.0))[0]
            if over.size == 0:
                a = F32(0.0)
                break
            i = curr + int(over[0])
            peak_pos = i
            start = end = i
            maxval = abs(ch[i])
            while start > 0 and ch[i] * ch[start - 1] >= 0:
                start -= 1
            while end < n and ch[i] * ch[end] >= 0:
                if abs(ch[end]) > maxval:
                    maxval = abs(ch[end])
                    peak_pos = end
                end += 1
            special = start == 0 and ch[i] * ch[0] >= 0
            # a such that maxval + a*maxval^2 == 1 (tiny boost keeps the
            # result strictly inside +/-1 under -ffast-math in the ref).
            a = (maxval - F32(1.0)) / (maxval * maxval)
            a = a + a * F32(2.4e-7)
            if ch[i] > 0:
                a = -a
            seg = ch[start:end]
            ch[start:end] = seg + a * seg * seg
            if special and peak_pos >= 2:
                # Ramp from the frame's first sample to the peak to avoid a
                # discontinuity at the frame start.
                offset = x0 - ch[0]
                delta = offset / F32(peak_pos)
                for j in range(curr, peak_pos):
                    offset = offset - delta
                    v = ch[j] + offset
                    ch[j] = min(F32(1.0), max(F32(-1.0), v))
            curr = end
            if curr == n:
                break
        declip_mem[c] = a
    return x


def float2int16(x: np.ndarray) -> np.ndarray:
    """FLOAT2INT16 (reference: celt/float_cast.h): scale, saturate, round."""
    y = np.asarray(x, dtype=np.float32) * F32(32768.0)
    y = np.clip(y, F32(-32768.0), F32(32767.0))
    return np.round(y).astype(np.int16)

"""Fully fused on-device HYBRID decoder (tracked config 4): packets in,
48 kHz PCM out, one jit — SILK-WB and the CELT high band share a single
range decoder, exactly like the reference frame loop.

Composition (reference src/opus_decoder.c:432-646):

  1. the fused SILK decoder parses and synthesizes the 16 kHz low band
     (models/fused_silk_dec.py) and hands back its live range-decoder
     state,
  2. the redundancy signal bit is parsed in vector form (:522-541);
     lanes carrying redundancy flag `error` for scalar fallback (the
     5 ms CELT redundancy frame + crossfade is a transition feature,
     not the steady-state path),
  3. the SILK range state bridges into the kernel-safe coder format and
     the fused CELT decoder continues from it with start=17
     (models/celt_dec_fused.py; the 5-band high tree is small enough
     that the unrolled-XLA path compiles quickly even at 20 ms),
  4. SILK's output upsamples 16->48 kHz on device, bit-exact with the
     reference resampler (silk/resampler_jax.py), and the CELT
     synthesis is accumulated on top (celt_accum, :608).

Scope: mono, 20 ms, steady-state hybrid (no mode transitions, no
redundancy, no loss) — out-of-envelope lanes set `error` and callers
re-decode those streams on the scalar path, the same contract as
FusedSilkDecoder.  Oracle: models/opus_decoder.py (scalar, bit-exact
SILK + float64 CELT) in tests/test_hybrid_dec_fused.py."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import range_vec as V
from ..ops import rc_kernel as K
from ..ops.range_vec import i32, _sel
from ..silk.resampler_jax import (UpsamplerState, upsampler_init,
                                  upsample_to_48k)
from .fused_silk_dec import (FusedSilkState, fused_init_state,
                             fused_silk_decode)
from .celt_dec_fused import (DecTabs, fused_celt_init_state,
                             fused_celt_decode_to_pcm)

f32 = jnp.float32


def rd_to_kdict(rd: V.RD) -> dict:
    """range_vec.RD -> rc_kernel state dict (identical field semantics;
    both implement RFC 6716 §4.1 with the same state variables)."""
    return {k: getattr(rd, k) for k in K._KEYS}


def bytes_to_words(buf):
    """[B, S] i32 byte values -> [W, B] packed little-endian words (the
    rc_kernel buffer layout)."""
    b, s = buf.shape
    w = (s + 3) // 4
    pad = jnp.pad(buf, ((0, 0), (0, w * 4 - s))).astype(jnp.uint32)
    words = (pad[:, 0::4] | (pad[:, 1::4] << 8)
             | (pad[:, 2::4] << 16) | (pad[:, 3::4] << 24))
    return words.astype(i32).T


def hybrid_init_state(batch: int, tabs: DecTabs) -> dict:
    return dict(silk=fused_init_state(batch, 16),
                celt=fused_celt_init_state(batch, tabs),
                rs=upsampler_init(batch, 16))


def fused_hybrid_decode(buf, lens, state: dict, tabs: DecTabs):
    """One 20 ms hybrid frame per stream, fully on device.

    buf: [B, S] i32 payload bytes (the packet frame, no TOC); lens: [B]
    i32.  Returns (pcm [B, 960] f32, new state, error [B] bool)."""
    assert tabs.start == 17
    b = buf.shape[0]

    # ---- SILK low band, 16 kHz internal (src/opus_decoder.c:461) ----
    xq16, silk_state, err, rd = fused_silk_decode(
        buf, lens, state["silk"], fs_khz=16, nb_subfr=4, return_rc=True)

    # ---- redundancy signaling (src/opus_decoder.c:522-541) ----
    active = jnp.ones((b,), bool)
    tell = V.rd_tell(rd)
    can_red = active & (tell + 17 + 20 <= 8 * lens)
    red_bit, rd = V.rd_dec_bit_logp(rd, buf, lens, 12, can_red)
    red = can_red & (red_bit != 0)
    _c2s, rd = V.rd_dec_bit_logp(rd, buf, lens, 1, red)
    rb_, rd = V.rd_dec_uint(rd, buf, lens, jnp.full((b,), 256, i32), red)
    red_bytes = _sel(red, rb_ + 2, 0)
    lens2 = lens - red_bytes
    err = err | red | (lens2 * 8 < V.rd_tell(rd)) | (rd.error != 0)

    # ---- CELT high band from the same coder, start=17 (:595-608) ----
    words = bytes_to_words(buf)
    pcm_c, celt_state, err_c = fused_celt_decode_to_pcm(
        words, lens2, state["celt"], tabs, d0=rd_to_kdict(rd))
    err = err | err_c

    # ---- 16 -> 48 kHz upsample + accumulate (:476, :608) ----
    silk48, rs_state = upsample_to_48k(xq16, state["rs"], 16, 20)
    pcm = pcm_c[:, 0, :] + silk48.astype(f32) * f32(1.0 / 32768.0)

    new_state = dict(silk=silk_state, celt=celt_state, rs=rs_state)
    return pcm, new_state, err


class FusedHybridDecoder:
    """Packets-in -> 48 kHz-PCM-out mono hybrid decoder, one jit."""

    def __init__(self, batch: int, end: int = 21,
                 max_payload: int = 512):
        self.batch = batch
        self.P = max_payload
        self.tabs = DecTabs(48000, 960, start=17, end=end)
        self.state = hybrid_init_state(batch, self.tabs)
        self._step = jax.jit(
            lambda bb, ll, ss: fused_hybrid_decode(bb, ll, ss,
                                                   self.tabs))

    def decode(self, payloads):
        buf = np.zeros((self.batch, self.P), np.int32)
        lens = np.zeros(self.batch, np.int32)
        for i, p in enumerate(payloads):
            a = np.frombuffer(p, np.uint8)
            buf[i, :len(a)] = a
            lens[i] = len(a)
        pcm, self.state, err = self._step(jnp.asarray(buf),
                                          jnp.asarray(lens), self.state)
        return np.asarray(pcm), np.asarray(err)

"""Batched end-to-end neural loss recovery: DRED payloads -> RDOVAE
feature decode -> FARGAN continuation + synthesis, for a whole stream
batch in ONE jit (tracked config 5, BASELINE.md).

The scalar composition of these stages lives in
opus_tpu/dnn/dred_dec.py (reference: opus_dred_parse/process
src/opus_decoder.c:1551/1588 feeding the deep-PLC + FARGAN stack,
src/opus_decoder.c:735-760 and dnn/fargan.c:142/200).  Here the cheap
per-packet range decode stays on the host (bytes -> quantized latents,
dnn/dred_decoder.c:53) and everything heavy — the RDOVAE decoder GRU
stack over latent chunks, the FARGAN priming pass over the last good
PCM, and the concealment synthesis scan — runs as one fused device
program over the stream batch:

    state0   [B, 24]      RDOVAE initial-state vectors
    latents  [T, B, 81]   newest-first latent chunks (+q-level scalar)
    pcm0     [B, 320]     last 20 ms of in-order decoded output
    cont_idx [B, 5]       feature rows priming the vocoder (oldest
                          first, matching fargan_cont dnn/fargan.c:142)
    play_idx [B, F]       feature rows to synthesize, playback order
                          (decreasing DRED row = forward time,
                          src/opus_decoder.c:752)
      -> pcm [B, F*160]   concealment waveform at 16 kHz

Per-stream offsets differ (each stream's loss lands at a different
point in its DRED window), so the playback order is data: host-side
index math (`playback_rows`) mirroring feed_dred_fec, one gather on
device.  Rows < 0 select a zero feature vector — the analogue of
fec_add(None) padding when the DRED window undershoots the loss.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..dnn import dred, fargan as fg, rdovae
from ..dnn.dred_dec import dred_find_payload


class ParsedBatch(NamedTuple):
    state0: np.ndarray        # [B, 24]
    latents: np.ndarray       # [T, B, 81] newest first, zero padded
    nb_latents: np.ndarray    # [B] int32  valid chunks per stream
    dred_offset: np.ndarray   # [B] int32  (dred_decode offsets)
    has_dred: np.ndarray      # [B] bool


def parse_batch(stats: dred.DREDStats, packets: List[Optional[bytes]],
                max_dred_samples: int, fs: int) -> ParsedBatch:
    """Host stage: range-decode every stream's DRED extension payload
    (cheap, ~100 bytes each) and stack the results zero-padded to the
    widest latent window."""
    b = len(packets)
    decs = []
    for data in packets:
        found = dred_find_payload(data) if data is not None else None
        if found is None:
            decs.append(None)
            continue
        payload, frame_offset = found
        res = dred.dred_decode(stats, payload,
                               max_dred_samples * 400 // fs // 4,
                               frame_offset)
        decs.append(res if res.nb_latents else None)
    tmax = max([d.nb_latents for d in decs if d is not None],
               default=1)
    state0 = np.zeros((b, rdovae.DRED_STATE_DIM), np.float32)
    lat = np.zeros((tmax, b, rdovae.DRED_LATENT_DIM + 1), np.float32)
    nb = np.zeros(b, np.int32)
    offs = np.zeros(b, np.int32)
    has = np.zeros(b, bool)
    for i, d in enumerate(decs):
        if d is None:
            continue
        state0[i] = d.state
        lat[:d.nb_latents, i] = d.latents
        nb[i] = d.nb_latents
        offs[i] = d.dred_offset
        has[i] = True
    return ParsedBatch(state0, lat, nb, offs, has)


def playback_rows(parsed: ParsedBatch, loss_offset_frames: np.ndarray,
                  n_frames: int):
    """Feature-row schedule mirroring feed_dred_fec
    (src/opus_decoder.c:752): row r holds the features r*10 ms before
    the newest DRED point.  With the loss starting
    loss_offset_frames*10 ms past the anchor, concealment frame t
    (forward in time) reads row

        base - 2 - t,   base = floor(loss_offset_frames
                                     + dred_offset / 4)

    — the combined floor and the -2 frame bias both match the
    reference (the 5-ms synthesis overlap compensates the missing 0.5
    rounding offset).  Both offsets enter with a PLUS sign, exactly as
    in feed_dred_fec: feature_offset = init_frames - i - 2
    + floor((loss_samples + dred_offset*F10/4)/F10).  Also returns the
    5 fargan_cont priming rows (oldest first): the frames immediately
    before the loss, base - 2 + (5 - j); the last two coincide with
    the reference's init_frames rows (blend == 0).  Rows outside
    [0, 4*nb_latents) are -1 (zero features)."""
    b = len(parsed.nb_latents)
    play = np.full((b, n_frames), -1, np.int32)
    cont = np.full((b, 5), -1, np.int32)
    for i in range(b):
        if not parsed.has_dred[i]:
            continue
        hi = 4 * int(parsed.nb_latents[i]) - 1
        base = int(np.floor(float(loss_offset_frames[i])
                            + float(parsed.dred_offset[i]) / 4.0))
        for t in range(n_frames):
            r = base - 2 - t
            play[i, t] = r if 0 <= r <= hi else -1
        for j in range(5):
            r = base - 2 + (5 - j)
            cont[i, j] = r if 0 <= r <= hi else -1
    return cont, play


class BatchedDREDRecovery:
    """One fused device program per (B, T, F) shape: RDOVAE decode
    scan + FARGAN cont + synthesis scan."""

    def __init__(self, dec_model: rdovae.RDOVAEDec,
                 stats: dred.DREDStats,
                 fargan_model: fg.FARGANModel):
        self.dec_model = dec_model
        self.stats = stats
        self.fargan = fargan_model
        self._fn = jax.jit(self._pipeline, static_argnums=())

    def _pipeline(self, state0, latents, pcm0, cont_idx, play_idx):
        dm, fm = self.dec_model, self.fargan
        dstate = rdovae.dec_init_state(dm, state0)

        def dstep(s, z):
            return rdovae.decode_qframe(dm, s, z)

        _, qframes = jax.lax.scan(dstep, dstate, latents)  # [T, B, 80]
        t, b = qframes.shape[0], qframes.shape[1]
        feats = qframes.transpose(1, 0, 2).reshape(
            b, 4 * t, rdovae.DRED_NUM_FEATURES)
        # row -1 -> zero features (fec_add(None))
        feats = jnp.concatenate(
            [feats, jnp.zeros((b, 1, rdovae.DRED_NUM_FEATURES))],
            axis=1)
        f_cont = jnp.take_along_axis(
            feats, cont_idx[..., None] % (4 * t + 1), axis=1)
        f_play = jnp.take_along_axis(
            feats, play_idx[..., None] % (4 * t + 1), axis=1)

        fstate = fg.init_state((b,))
        fstate = fg.cont(fm, fstate, pcm0, f_cont)

        def fstep(s, f):
            return fg.synthesize_frame(fm, s, f)

        fstate, pcm = jax.lax.scan(fstep, fstate,
                                   f_play.transpose(1, 0, 2))
        return pcm.transpose(1, 0, 2).reshape(b, -1)

    def recover(self, parsed: ParsedBatch, pcm0: np.ndarray,
                loss_offset_frames: np.ndarray, n_frames: int):
        """pcm0: [B, 320] last good output (float, 16 kHz).  Returns
        [B, n_frames*160] concealment PCM."""
        cont_idx, play_idx = playback_rows(parsed, loss_offset_frames,
                                           n_frames)
        return self._fn(jnp.asarray(parsed.state0),
                        jnp.asarray(parsed.latents),
                        jnp.asarray(pcm0, jnp.float32).reshape(
                            len(parsed.nb_latents), -1),
                        jnp.asarray(cont_idx), jnp.asarray(play_idx))

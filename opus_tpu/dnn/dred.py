"""DRED deep-redundancy coding: latent quantization ladder + range
coding (reference: dnn/dred_coding.c, dnn/dred_encoder.c:241-384,
dnn/dred_decoder.c; payload rides extension id 126,
dnn/dred_config.h:32).

Every 20 ms the RDOVAE encoder (opus_tpu.dnn.rdovae) produces one
latent (newest at index 0 of the buffer).  A DRED payload codes the
initial decoder state plus every other latent (40 ms hop), newest
first, on a rate ladder: chunk i uses quantizer level
q0 + dQ_table[dQ]*i/16 clamped to qmax, so older redundancy gets
progressively coarser.  Each (level, dim) has trained scale/dead-zone/
decay/p0 statistics driving a Laplace coder with explicit p0.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..bitstream.range_coder import RangeEncoder, RangeDecoder
from ..bitstream.laplace import laplace_encode_p0, laplace_decode_p0
from .nnet import tanh_approx
from .rdovae import DRED_LATENT_DIM, DRED_STATE_DIM, \
    DRED_NUM_REDUNDANCY_FRAMES, DRED_MAX_LATENTS

DRED_EXTENSION_ID = 126            # (dred_config.h:32)
DRED_EXPERIMENTAL_VERSION = 12     # (dred_config.h:35)
DRED_MIN_BYTES = 8
DRED_MAX_DATA_SIZE = 1000
DRED_ENC_Q0 = 6
DRED_ENC_Q1 = 15
DRED_NUM_QUANTIZATION_LEVELS = 16
DRED_MAX_FRAMES = 4 * DRED_MAX_LATENTS

# (reference: dQ_table dnn/dred_coding.c:41)
_DQ_TABLE = (0, 2, 3, 4, 6, 8, 12, 16)


def compute_quantizer(q0: int, dq: int, qmax: int, i: int) -> int:
    """(reference: compute_quantizer dnn/dred_coding.c:39)"""
    quant = q0 + (_DQ_TABLE[dq] * i + 8) // 16
    return qmax if quant > qmax else quant


class DREDStats(NamedTuple):
    """Per-(level, dim) Q8 coding statistics (reference:
    dnn/torch/rdovae/export_rdovae_weights.py dump_statistical_model;
    shipped as dred_rdovae_stats_data.c)."""
    latent_scale: np.ndarray       # [16, LATENT] uint8
    latent_dead_zone: np.ndarray
    latent_r: np.ndarray
    latent_p0: np.ndarray
    state_scale: np.ndarray        # [16, STATE] uint8
    state_dead_zone: np.ndarray
    state_r: np.ndarray
    state_p0: np.ndarray


def random_stats(seed=0) -> DREDStats:
    """Plausible random statistics for structural tests (real tables
    ship with the model file)."""
    r = np.random.default_rng(seed)

    def tab(dim):
        scale = r.integers(40, 255, (16, dim)).astype(np.uint8)
        dz = r.integers(0, 60, (16, dim)).astype(np.uint8)
        decay = r.integers(30, 250, (16, dim)).astype(np.uint8)
        p0 = r.integers(10, 240, (16, dim)).astype(np.uint8)
        return scale, dz, decay, p0

    ls, ld, lr, lp = tab(DRED_LATENT_DIM)
    ss, sd, sr, sp = tab(DRED_STATE_DIM)
    return DREDStats(ls, ld, lr, lp, ss, sd, sr, sp)


def quantize_latents(x: np.ndarray, scale, dzone) -> np.ndarray:
    """Dead-zone quantization (reference: dred_encode_latents
    dnn/dred_encoder.c:241-263; uses the approx tanh)."""
    x = np.asarray(x, np.float32)
    delta = dzone.astype(np.float32) / 256.0
    xq = x * scale.astype(np.float32) / 256.0
    dead = np.asarray(tanh_approx(xq / (delta + 0.1)), np.float32)
    xq = xq - delta * dead
    return np.floor(0.5 + xq).astype(np.int32)


def _encode_latents(enc: RangeEncoder, x, scale, dzone, r, p0):
    q = quantize_latents(x, scale, dzone)
    for i in range(len(q)):
        if r[i] == 0 or p0[i] == 255:
            continue    # impossible symbol: coded as implicit zero
        laplace_encode_p0(enc, int(q[i]), int(p0[i]) << 7,
                          int(r[i]) << 7)


def _decode_latents(dec: RangeDecoder, scale, r, p0, dim) -> np.ndarray:
    """(reference: dred_decode_latents dnn/dred_decoder.c:43)"""
    x = np.zeros(dim, np.float32)
    for i in range(dim):
        if r[i] == 0 or p0[i] == 255:
            q = 0
        else:
            q = laplace_decode_p0(dec, int(p0[i]) << 7, int(r[i]) << 7)
        s = int(scale[i])
        x[i] = q * 256.0 / (1 if s == 0 else s)
    return x


def dred_encode(stats: DREDStats, latents: np.ndarray,
                states: np.ndarray, nb_latents: int, dred_offset: int,
                activity: np.ndarray, *, q0: int = DRED_ENC_Q0,
                dq: int = 3, qmax: int = DRED_ENC_Q1,
                max_chunks: int = DRED_MAX_LATENTS,
                max_bytes: int = DRED_MAX_DATA_SIZE) -> bytes | None:
    """Encode a DRED payload (reference: dred_encode_silk_frame
    dnn/dred_encoder.c:280).  latents: [T, LATENT] newest first;
    states: [T, STATE]; activity: per-2.5ms voice activity flags
    [DRED_MAX_FRAMES*4].  Returns the payload or None (no DRED)."""
    activity = np.asarray(activity)

    def voice_active(offset):
        # (reference: dred_voice_active dnn/dred_encoder.c:271)
        lo = 8 * offset
        return bool(activity[lo:min(lo + 16, 4 * DRED_MAX_FRAMES)].any())

    latent_offset = 0
    extra_dred_offset = 0
    while latent_offset < nb_latents - 1 \
            and not voice_active(latent_offset):
        latent_offset += 1
        extra_dred_offset += 1

    enc = RangeEncoder(max_bytes)
    enc.enc_uint(q0, 16)
    enc.enc_uint(dq, 8)
    total_offset = 16 - (dred_offset - extra_dred_offset * 8)
    assert total_offset >= 0
    if total_offset > 31:
        enc.enc_uint(1, 2)
        enc.enc_uint(total_offset >> 5, 256)
        enc.enc_uint(total_offset & 31, 32)
    else:
        enc.enc_uint(0, 2)
        enc.enc_uint(total_offset, 32)
    assert qmax >= q0
    if q0 < 14 and dq > 0:
        # qmax symbol: 0 => qmax==15, else uniform over (q0, 15)
        assert qmax > q0
        nvals = 15 - (q0 + 1)
        if qmax >= 15:
            enc.encode(0, nvals, 2 * nvals)
        else:
            enc.encode(nvals + qmax - (q0 + 1), nvals + qmax - q0,
                       2 * nvals)
    _encode_latents(enc, states[latent_offset],
                    stats.state_scale[q0], stats.state_dead_zone[q0],
                    stats.state_r[q0], stats.state_p0[q0])
    if enc.tell() > 8 * max_bytes:
        return None
    bak = enc.save_state()
    dred_encoded = 0
    prev_active = False
    for i in range(0, min(2 * max_chunks, nb_latents - latent_offset), 2):
        q_level = compute_quantizer(q0, dq, qmax, i // 2)
        _encode_latents(enc, latents[i + latent_offset],
                        stats.latent_scale[q_level],
                        stats.latent_dead_zone[q_level],
                        stats.latent_r[q_level],
                        stats.latent_p0[q_level])
        if enc.tell() > 8 * max_bytes:
            if i == 0:
                return None
            break
        active = voice_active(i + latent_offset)
        if active or prev_active:
            bak = enc.save_state()
            dred_encoded = i + 2
        prev_active = active
    if dred_encoded == 0 or (dred_encoded <= 2 and extra_dred_offset):
        return None
    enc.restore_state(bak)
    nbytes = (enc.tell() + 7) // 8
    enc.shrink(nbytes)
    enc.done()
    return bytes(enc.data()[:nbytes])


class DREDDecoded(NamedTuple):
    dred_offset: int
    nb_latents: int
    state: np.ndarray              # [STATE]
    latents: np.ndarray            # [nb, LATENT+1] newest first


def dred_decode(stats: DREDStats, payload: bytes,
                max_dred_features: int,
                dred_frame_offset: int = 0) -> DREDDecoded:
    """(reference: dred_ec_decode dnn/dred_decoder.c:53)"""
    dec = RangeDecoder(payload)
    q0 = dec.dec_uint(16)
    dq = dec.dec_uint(8)
    extra_offset = 32 * dec.dec_uint(256) if dec.dec_uint(2) else 0
    dred_offset = 16 - dec.dec_uint(32) - extra_offset \
        + dred_frame_offset
    min_feature_frames = max(0, (4 * max_dred_features
                                 + dred_offset + 3) // 4)
    qmax = 15
    if q0 < 14 and dq > 0:
        nvals = 15 - (q0 + 1)
        ft = 2 * nvals
        s = dec.decode(ft)
        if s >= nvals:
            qmax = q0 + (s - nvals) + 1
            dec.update(s, s + 1, ft)
        else:
            dec.update(0, nvals, ft)
    state = _decode_latents(dec, stats.state_scale[q0],
                            stats.state_r[q0], stats.state_p0[q0],
                            DRED_STATE_DIM)
    out = []
    num_bytes = len(payload)
    i = 0
    while i < min(DRED_NUM_REDUNDANCY_FRAMES,
                  (min_feature_frames + 1) // 2):
        if 8 * num_bytes - dec.tell() <= 7:
            break
        q_level = compute_quantizer(q0, dq, qmax, i // 2)
        lat = _decode_latents(dec, stats.latent_scale[q_level],
                              stats.latent_r[q_level],
                              stats.latent_p0[q_level], DRED_LATENT_DIM)
        out.append(np.concatenate(
            [lat, [q_level * 0.125 - 1.0]]).astype(np.float32))
        i += 2
    latents = np.stack(out) if out else \
        np.zeros((0, DRED_LATENT_DIM + 1), np.float32)
    return DREDDecoded(dred_offset, len(out), state, latents)

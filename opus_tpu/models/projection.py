"""Projection (ambisonics) encoder/decoder, mapping family 3
(reference: src/opus_projection_encoder.c, src/opus_projection_decoder.c,
src/mapping_matrix.c).

Channel-order-N ambisonics is mixed by a fixed Q15 matrix into coupled
streams, multistream-coded, and demixed on decode.  The matrices are
batched matmuls -- on the TPU path these run as single jnp.dot ops."""

from __future__ import annotations

import math

import numpy as np

from . import mapping_matrix_data as MM
from .multistream import OpusMSEncoder, OpusMSDecoder

_ORDER_MATRICES = {
    2: (MM.FOA_MIXING, MM.FOA_DEMIXING),
    3: (MM.SOA_MIXING, MM.SOA_DEMIXING),
    4: (MM.TOA_MIXING, MM.TOA_DEMIXING),
    5: (MM.FOURTHOA_MIXING, MM.FOURTHOA_DEMIXING),
    6: (MM.FIFTHOA_MIXING, MM.FIFTHOA_DEMIXING),
}


def order_plus_one_from_channels(channels: int) -> int:
    """(reference: get_order_plus_one_from_channels
    opus_projection_encoder.c:92)"""
    if channels < 1 or channels > 227:
        raise ValueError("bad channel count")
    opo = int(math.isqrt(channels))
    nondiegetic = channels - opo * opo
    if nondiegetic not in (0, 2):
        raise ValueError("bad ambisonics channel count")
    return opo


def streams_from_channels(channels: int):
    """(reference: get_streams_from_channels, family 3)"""
    order_plus_one_from_channels(channels)
    return (channels + 1) // 2, channels // 2


def _matrix(m) -> np.ndarray:
    return np.asarray(m["data"], dtype=np.float64).reshape(
        m["cols"], m["rows"]).T / 32768.0   # stored column-wise


class OpusProjectionEncoder:
    def __init__(self, fs: int, channels: int, application: str = "audio"):
        opo = order_plus_one_from_channels(channels)
        if opo not in _ORDER_MATRICES:
            raise ValueError(f"unsupported ambisonics order {opo - 1}")
        self.channels = channels
        self.streams, self.coupled_streams = streams_from_channels(channels)
        mix, demix = _ORDER_MATRICES[opo]
        self.mixing = _matrix(mix)
        self.demixing_q15 = demix   # raw, for the header blob
        nondiegetic = channels - opo * opo
        # input channel c maps to matrix column c for ACN channels; the 2
        # nondiegetic channels use the last two matrix columns
        self.in_cols = list(range(opo * opo)) + (
            [mix["cols"] - 2, mix["cols"] - 1] if nondiegetic else [])
        internal = 2 * self.coupled_streams + (self.streams
                                               - self.coupled_streams)
        self.internal = internal
        mapping = list(range(internal))
        self.ms = OpusMSEncoder(fs, internal, self.streams,
                                self.coupled_streams, mapping, application)

    def set_bitrate(self, bitrate):
        self.ms.set_bitrate(bitrate)

    def get_demixing_matrix_gain(self) -> int:
        """Matrix gain in dB, S7.8 format (reference:
        OPUS_PROJECTION_GET_DEMIXING_MATRIX_GAIN, opus_projection.h:72).
        The demixing tables with large dynamic range are rescaled to fit
        int16; this returns the compensating playback gain."""
        return self.demixing_q15["gain"]

    def get_demixing_matrix(self) -> bytes:
        """Serialized demixing matrix for the stream header (reference:
        OPUS_PROJECTION_GET_DEMIXING_MATRIX): int16 LE, the sub-matrix
        [channels x internal] of the full table."""
        d = self.demixing_q15
        full = np.asarray(d["data"], dtype=np.int64).reshape(
            d["cols"], d["rows"]).T
        rows = self.in_cols
        sub = full[np.ix_(rows, range(self.internal))]
        # serialized column-major like the reference's in-memory layout
        # (MATRIX_INDEX(rows, row, col) == rows*col + row)
        return np.asfortranarray(sub).T.astype("<i2").T.tobytes(order="F")

    def encode(self, pcm: np.ndarray, frame_size: int) -> bytes:
        pcm = np.asarray(pcm, dtype=np.float64).reshape(
            frame_size, self.channels)
        M = self.mixing[np.ix_(range(self.internal), self.in_cols)]
        internal = pcm @ M.T            # [frame, internal]: one matmul
        return self.ms.encode(internal.reshape(-1), frame_size)


class OpusProjectionDecoder:
    def __init__(self, fs: int, channels: int, streams: int,
                 coupled_streams: int, demixing_matrix: bytes):
        internal = 2 * coupled_streams + (streams - coupled_streams)
        want = channels * internal * 2
        if len(demixing_matrix) != want:
            raise ValueError(f"demixing matrix must be {want} bytes")
        self.channels = channels
        self.internal = internal
        # blob is column-major [channels x internal]
        self.demixing_int = np.frombuffer(demixing_matrix, dtype="<i2") \
            .astype(np.int32).reshape(internal, channels).T
        self.demixing = self.demixing_int.astype(np.float64) / 32768.0
        mapping = list(range(internal))
        self.ms = OpusMSDecoder(fs, internal, streams, coupled_streams,
                                mapping)

    def decode(self, data: bytes, frame_size: int | None = None):
        internal = self.ms.decode(data, frame_size)
        x = internal.reshape(-1, self.internal)
        return (x @ self.demixing.T).reshape(-1)

    def decode_int16(self, data: bytes, frame_size: int | None = None):
        """Integer demix path, bit-matching the reference's
        mapping_matrix_multiply_channel_out_short (mapping_matrix.c:192):
        internal channels are quantized to int16 FIRST, then demixed as
        Q15 integer dot products with per-term (x+16384)>>15 rounding."""
        from ..utils.soft_clip import float2int16
        internal = self.ms.decode(data, frame_size)
        x = float2int16(internal).astype(np.int32) \
            .reshape(-1, self.internal)                 # [frame, internal]
        terms = (x[:, None, :] * self.demixing_int[None, :, :]
                 + 16384) >> 15                         # [frame, ch, int]
        return terms.sum(axis=2).astype(np.int16).reshape(-1)

"""Multistream decode with the elementary streams as a second batch
axis (SURVEY.md §2.6): the N streams of each multistream packet decode
as one [N]-batch through the C symbol pass + TPU synthesis, and the
channel mapping (or an ambisonic demixing matrix) applies as a single
[C, N] matmul on device instead of a per-channel Python loop.

Scope: the uniform layout the batch axis wants — all elementary
streams mono CELT-only at a common frame size (the ambisonics /
mapping-family-0 shape; reference loops these one stream at a time in
opus_multistream_decode, src/opus_multistream_decoder.c:225).  Mixed
SILK/coupled layouts stay on the scalar OpusMSDecoder.

Stacking packets: decode() also accepts a LIST of multistream packets
(e.g. the same ambisonic scene at several time offsets, or several
independent scenes with identical layout) and decodes streams x packets
lanes in one device step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..bitstream import packet as pkt
from .batched_decode import BatchedCeltDecoder


def split_ms_packet(data: bytes, streams: int) -> list[bytes]:
    """Multistream packet -> per-stream single-frame payload bytes
    (reference framing: self-delimited for all but the last stream,
    src/opus_multistream_decoder.c:141)."""
    out = []
    pos = 0
    for s in range(streams):
        self_delimited = s != streams - 1
        parsed = pkt.packet_parse(data[pos:],
                                  self_delimited=self_delimited)
        if isinstance(parsed, int):
            raise ValueError(f"invalid stream {s} ({parsed})")
        if parsed.count != 1:
            raise ValueError("batched MS decode expects one frame per "
                             "stream packet")
        if pkt.packet_get_mode(bytes([parsed.toc & 0xFC]) + b"\0") \
                != pkt.Mode.CELT_ONLY:
            raise ValueError("batched MS decode is CELT-only")
        out.append(parsed.frames[0])
        pos += parsed.packet_offset
    return out


class BatchedMSDecoder:
    """Streams-as-lanes multistream decoder (CELT-only mono streams)."""

    def __init__(self, fs: int, channels: int, streams: int,
                 mapping=None, demix: np.ndarray | None = None,
                 frame_size: int | None = None, npackets: int = 1):
        """mapping: opus channel mapping (mono entries only) OR demix: a
        [channels, streams] mixing matrix applied on device (ambisonic
        demixing).  Exactly one must be given."""
        self.fs = fs
        self.channels = channels
        self.streams = streams
        self.npackets = npackets
        self.N = frame_size or fs // 50
        if (mapping is None) == (demix is None):
            raise ValueError("give exactly one of mapping/demix")
        if demix is None:
            m = np.zeros((channels, streams))
            for c, s in enumerate(mapping):
                if s != 255:
                    if s >= streams:
                        raise ValueError("coupled entries unsupported")
                    m[c, s] = 1.0
            demix = m
        if demix.shape != (channels, streams):
            raise ValueError("demix shape mismatch")
        self._demix = jnp.asarray(demix, jnp.float32)
        self.dec = BatchedCeltDecoder(streams * npackets, 1, fs, self.N)

    def decode(self, data) -> np.ndarray:
        """One multistream packet (bytes) -> [frame*channels] float PCM
        interleaved; a list of packets -> [P, frame*channels]."""
        packets = [data] if isinstance(data, (bytes, bytearray)) else \
            list(data)
        if len(packets) != self.npackets:
            raise ValueError("packet count != configured npackets")
        frames = []
        for p in packets:
            frames += split_ms_packet(bytes(p), self.streams)
        pcm = self.dec.decode(frames)                    # [P*S, 1, N]
        pcm = pcm.reshape(self.npackets, self.streams, self.N)
        # channel mapping / demixing as one matmul over the stream axis
        out = jnp.einsum("cs,psn->pcn", self._demix, pcm)
        out = np.asarray(out)                            # [P, C, N]
        inter = out.transpose(0, 2, 1).reshape(self.npackets, -1)
        return inter[0] if isinstance(data, (bytes, bytearray)) else \
            inter

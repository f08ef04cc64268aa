"""Top-level Opus decoder (reference: src/opus_decoder.c).

Currently supports the CELT-only path end-to-end; SILK and hybrid land with
the SILK core.  Mirrors opus_decode_native / opus_decode_frame flow:
packet parse -> per-frame range decode -> codec cores -> PLC routing.
"""

from __future__ import annotations

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.range_coder import RangeDecoder
from ..celt.decoder import CeltDecoder, resampling_factor


class OpusDecoder:
    def __init__(self, fs: int, channels: int):
        if fs not in (8000, 12000, 16000, 24000, 48000):
            raise ValueError("bad sample rate")
        if channels not in (1, 2):
            raise ValueError("bad channel count")
        self.fs = fs
        self.channels = channels
        self.celt = CeltDecoder.create(fs, channels)
        self.celt.disable_inv = 1 if channels == 1 else 0
        self.celt.signalling = 0
        self.stream_channels = channels
        self.prev_mode = 0
        self.prev_redundancy = False
        self.last_packet_duration = 0
        self.rangeFinal = 0
        self.frame_size = fs // 400
        self.mode = 0
        self.bandwidth = 0

    def decode(self, data: bytes | None, frame_size: int | None = None,
               decode_fec: bool = False) -> np.ndarray:
        """Decode one packet -> float PCM [-1,1], shape [samples*channels]
        interleaved.  data=None runs PLC for frame_size samples."""
        if data is None or len(data) == 0:
            if frame_size is None:
                frame_size = self.last_packet_duration or self.fs // 50
            return self._decode_frames(None, [], frame_size)
        parsed = pkt.packet_parse(data)
        if isinstance(parsed, int):
            raise ValueError(f"invalid packet ({parsed})")
        self.mode = pkt.packet_get_mode(data)
        self.bandwidth = pkt.packet_get_bandwidth(data)
        self.frame_size = pkt.packet_get_samples_per_frame(data, self.fs)
        self.stream_channels = pkt.packet_get_nb_channels(data)
        nb_samples = self.frame_size * parsed.count
        if frame_size is None:
            frame_size = nb_samples
        if nb_samples * 25 > self.fs * 3:
            raise ValueError("invalid packet duration")
        return self._decode_frames(data, parsed.frames, frame_size)

    def _decode_frames(self, data, frames, frame_size) -> np.ndarray:
        if data is None:
            pcm = np.zeros(frame_size * self.channels)
            if self.prev_mode == 0:
                return pcm
            self._decode_frame(None, pcm, frame_size)
            self.last_packet_duration = frame_size
            return pcm
        out = []
        for frame in frames:
            pcm = np.zeros(self.frame_size * self.channels)
            self._decode_frame(frame, pcm, self.frame_size)
            out.append(pcm)
        self.last_packet_duration = self.frame_size * len(frames)
        return np.concatenate(out) if out else np.zeros(0)

    def _decode_frame(self, frame: bytes | None, pcm: np.ndarray,
                      frame_size: int):
        c = self.celt
        if frame is None:
            mode = pkt.Mode.CELT_ONLY if self.prev_redundancy else self.prev_mode
            if mode != pkt.Mode.CELT_ONLY:
                raise NotImplementedError("SILK PLC not implemented yet")
            c.decode_with_ec(None, pcm, frame_size, None)
            self.rangeFinal = 0
            return
        mode = self.mode
        if mode != pkt.Mode.CELT_ONLY:
            raise NotImplementedError("SILK/hybrid decode lands with the "
                                      "SILK core")
        dec = RangeDecoder(frame)
        endband = {pkt.Bandwidth.NARROWBAND: 13,
                   pkt.Bandwidth.MEDIUMBAND: 17,
                   pkt.Bandwidth.WIDEBAND: 17,
                   pkt.Bandwidth.SUPERWIDEBAND: 19,
                   pkt.Bandwidth.FULLBAND: 21}[self.bandwidth]
        c.end = endband
        c.stream_channels = self.stream_channels
        c.start = 0
        if (self.prev_mode not in (0, mode)) and not self.prev_redundancy:
            c.reset()
        ret = c.decode_with_ec(frame, pcm, frame_size, dec)
        if ret < 0:
            raise RuntimeError(f"celt decode failed ({ret})")
        self.rangeFinal = c.rng
        self.prev_mode = mode
        self.prev_redundancy = False

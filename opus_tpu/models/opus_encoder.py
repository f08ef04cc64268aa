"""Top-level Opus encoder (reference: src/opus_encoder.c).

Round 1 scope: the CELT-only path (restricted-lowdelay application
equivalent) with CBR/VBR/CVBR.  SILK and hybrid encode, mode/bandwidth
decision machinery, DTX and redundancy land next.
"""

from __future__ import annotations

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.range_coder import RangeEncoder
from ..celt.encoder import CeltEncoder, OPUS_BITRATE_MAX


class OpusEncoder:
    def __init__(self, fs: int, channels: int,
                 application: str = "restricted-lowdelay"):
        if fs not in (8000, 12000, 16000, 24000, 48000):
            raise ValueError("bad sample rate")
        self.fs = fs
        self.channels = channels
        self.application = application
        self.celt = CeltEncoder.create(fs, channels)
        self.bitrate = 64000 * channels
        self.vbr = 1
        self.constrained_vbr = 1
        self.complexity = 9
        self.bandwidth = pkt.Bandwidth.FULLBAND
        self.mode = pkt.Mode.CELT_ONLY
        # delay compensation buffer (Fs/250 lookahead like the reference's
        # total_buffer) -- restricted-lowdelay uses no extra delay
        self.max_payload = 1276

    def set_bitrate(self, bitrate: int):
        self.bitrate = bitrate

    def set_vbr(self, vbr: bool, constrained: bool = True):
        self.vbr = 1 if vbr else 0
        self.constrained_vbr = 1 if constrained else 0

    def encode(self, pcm: np.ndarray, frame_size: int) -> bytes:
        """pcm: float interleaved [-1,1], frame_size samples/channel.
        Returns the packet."""
        if self.mode != pkt.Mode.CELT_ONLY:
            raise NotImplementedError("SILK/hybrid encode lands next round")
        celt = self.celt
        celt.complexity = self.complexity
        celt.bitrate = self.bitrate
        celt.vbr = self.vbr
        celt.constrained_vbr = self.constrained_vbr

        # endband from bandwidth
        endband = {pkt.Bandwidth.NARROWBAND: 13,
                   pkt.Bandwidth.MEDIUMBAND: 17,
                   pkt.Bandwidth.WIDEBAND: 17,
                   pkt.Bandwidth.SUPERWIDEBAND: 19,
                   pkt.Bandwidth.FULLBAND: 21}[self.bandwidth]
        celt.end = endband
        celt.start = 0

        frame_rate = self.fs // frame_size
        max_data = self.max_payload
        if not self.vbr:
            # CBR: fixed packet size from bitrate
            cbr_bytes = min(max_data,
                            (self.bitrate * frame_size
                             + 4 * self.fs) // (8 * self.fs))
            max_data = cbr_bytes
        nb_compressed = max_data - 1

        enc = RangeEncoder(nb_compressed)
        ret = celt.encode_with_ec(pcm, frame_size, nb_compressed, enc)
        if ret < 0:
            raise RuntimeError(f"celt encode failed ({ret})")
        self.rangeFinal = celt.rng
        toc = pkt.gen_toc(pkt.Mode.CELT_ONLY, frame_rate, self.bandwidth,
                          self.channels)
        return bytes([toc]) + bytes(enc.buf[:ret])

"""Opus Custom: non-standard sampling rates and frame sizes through the
raw CELT codec (reference: include/opus_custom.h,
celt/celt_encoder.c:1871-1894 signalling byte,
celt/celt_decoder.c:1199-1224 header parse, toOpus/fromOpus tables
celt/celt.h:199-233).

A custom mode is any (Fs, frame_size) accepted by
opus_tpu.celt.modes.mode_create; packets carry a one-byte header
(band-trim | LM | stereo) unless signalling is disabled."""

from __future__ import annotations

import numpy as np

from ..bitstream.range_coder import RangeEncoder
from ..celt.decoder import CeltDecoder
from ..celt.encoder import CeltEncoder
from ..celt.modes import mode_create
from ..utils.soft_clip import float2int16

# (reference: toOpusTable/fromOpusTable celt/celt.h:200-214)
_TO_OPUS = (0xE0, 0xE8, 0xF0, 0xF8, 0xC0, 0xC8, 0xD0, 0xD8,
            0xA0, 0xA8, 0xB0, 0xB8, 0x00, 0x00, 0x00, 0x00,
            0x80, 0x88, 0x90, 0x98)
_FROM_OPUS = (0x80, 0x88, 0x90, 0x98, 0x40, 0x48, 0x50, 0x58,
              0x20, 0x28, 0x30, 0x38, 0x00, 0x08, 0x10, 0x18)


def _to_opus(c: int) -> int:
    ret = _TO_OPUS[c >> 3] if c < 0xA0 else 0
    if ret == 0:
        raise ValueError("unrepresentable custom header")
    return ret | (c & 0x7)


def _from_opus(c: int) -> int:
    if c < 0x80:
        raise ValueError("invalid custom packet header")
    return _FROM_OPUS[(c >> 3) - 16] | (c & 0x7)


class OpusCustomMode:
    """(reference: opus_custom_mode_create celt/modes.c:227)"""

    def __init__(self, fs: int, frame_size: int):
        self.mode = mode_create(fs, frame_size)
        self.fs = fs
        self.frame_size = frame_size

    @property
    def is_standard(self) -> bool:
        """Modes whose custom header is Opus-TOC-converted: the 48 kHz
        standard family always; the 96 kHz QEXT family in QEXT builds
        (celt_encoder.c:1879 applies toOpus unconditionally there)."""
        return (self.mode.Fs == 48000 and self.mode.shortMdctSize == 120) \
            or (self.mode.Fs == 96000
                and self.mode.shortMdctSize in (240, 180))


class OpusCustomEncoder:
    """(reference: opus_custom_encoder_init celt/celt_encoder.c:234)"""

    def __init__(self, mode: OpusCustomMode, channels: int):
        if channels not in (1, 2):
            raise ValueError("bad channel count")
        self.custom_mode = mode
        self.channels = channels
        st = CeltEncoder(mode=mode.mode, channels=channels,
                         stream_channels=channels)
        st.upsample = 1
        st.end = mode.mode.effEBands
        st.reset()
        self.celt = st

    def set_bitrate(self, bitrate):
        self.celt.bitrate = bitrate
        self.celt.vbr = 1

    def set_complexity(self, c):
        self.celt.complexity = max(0, min(10, c))

    def set_qext(self, enabled: int):
        """Enable the quality extensions (reference: OPUS_SET_QEXT)."""
        self.celt.enable_qext = 1 if enabled else 0

    def encode(self, pcm: np.ndarray, frame_size: int,
               max_bytes: int = 1275) -> bytes:
        """pcm: float [-1,1] interleaved.  Returns the packet including
        the one-byte custom header (reference signalling path
        celt_encoder.c:1871-1894)."""
        if frame_size != self.custom_mode.frame_size * \
                (frame_size // self.custom_mode.frame_size) or \
                frame_size % self.custom_mode.mode.shortMdctSize:
            pass   # frame size checked by the core encoder
        mode = self.custom_mode.mode
        lm = 0
        while mode.shortMdctSize << lm < frame_size and lm < mode.maxLM:
            lm += 1
        if mode.shortMdctSize << lm != frame_size:
            raise ValueError("frame size not supported by mode")
        end = self.celt.end
        tmp = (mode.effEBands - end) >> 1
        self.celt.end = max(1, mode.effEBands - tmp)
        header = (tmp << 5) | (lm << 3) | ((self.channels == 2) << 2)
        if self.custom_mode.is_standard:
            header = _to_opus(header)
        enc = RangeEncoder(max_bytes - 1)
        n = self.celt.encode_with_ec(np.asarray(pcm, np.float64),
                                     frame_size, max_bytes - 1, enc)
        if n < 0:
            raise RuntimeError(f"encode failed ({n})")
        qext = self.celt.qext_payload
        if qext:
            # code-3 + padding packaging of the extension payload
            # (reference: celt_encoder.c:2565-2578)
            q = len(qext)
            padlen = (q + 253) // 254
            pad = bytes([255] * (padlen - 1)) \
                + bytes([254 if q % 254 == 0 else q % 254])
            return bytes([header | 0x03, 0x41]) + pad \
                + bytes(enc.buf[:n]) + qext
        return bytes([header]) + bytes(enc.buf[:n])


class OpusCustomDecoder:
    """(reference: opus_custom_decoder_init celt/celt_decoder.c)"""

    def __init__(self, mode: OpusCustomMode, channels: int):
        if channels not in (1, 2):
            raise ValueError("bad channel count")
        self.custom_mode = mode
        self.channels = channels
        st = CeltDecoder(mode=mode.mode, channels=channels,
                         stream_channels=channels)
        st.downsample = 1
        st.end = mode.mode.effEBands
        st.signalling = 1
        st.reset()
        self.celt = st

    def decode(self, data: bytes | None,
               frame_size: int) -> np.ndarray:
        """Returns float PCM [frame_size*channels]; data=None runs
        PLC (reference: celt_decode_with_ec header parse
        celt_decoder.c:1199-1224)."""
        mode = self.custom_mode.mode
        if data is None or len(data) == 0:
            pcm = np.zeros(frame_size * self.channels)
            self.celt.decode_with_ec(None, pcm, frame_size, None)
            return pcm
        data0 = data[0]
        if self.custom_mode.is_standard:
            data0 = _from_opus(data0)
            if data0 < 0:
                raise ValueError("invalid custom packet header")
        self.celt.end = max(1, mode.effEBands - 2 * (data0 >> 5))
        lm = (data0 >> 3) & 0x3
        c = 1 + ((data0 >> 2) & 0x1)
        if lm > mode.maxLM:
            raise ValueError("invalid packet")
        self.celt.stream_channels = c
        payload = data[1:]
        qext_payload = None
        if (data[0] & 0x03) == 0x03 and len(payload) >= 1:
            # code-3 padding carrying the quality extension
            # (reference: celt_decoder.c:1216-1242)
            if payload[0] & 0x40:
                body = payload[1:]
                length = len(body)
                padding = 0
                pos = 0
                while True:
                    if length <= 0:
                        raise ValueError("invalid packet")
                    p = body[pos]
                    pos += 1
                    length -= 1
                    tmp = 254 if p == 255 else p
                    length -= tmp
                    padding += tmp
                    if p != 255:
                        break
                padding -= 1
                if length <= 0 or padding < 0:
                    raise ValueError("invalid packet")
                body = body[pos:]
                if padding > 0 and body[length] == 124 << 1:
                    qext_payload = bytes(body[length + 1:
                                              length + 1 + padding])
                payload = body[:length]
            else:
                payload = payload[1:]
        pcm = np.zeros(frame_size * self.channels)
        n = self.celt.decode_with_ec(payload, pcm, frame_size, None,
                                     qext_payload=qext_payload)
        if n < 0:
            raise ValueError(f"decode failed ({n})")
        return pcm

    def decode_int16(self, data: bytes | None,
                     frame_size: int) -> np.ndarray:
        return float2int16(self.decode(data, frame_size))

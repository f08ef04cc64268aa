"""Multistream Opus encoder/decoder (reference:
src/opus_multistream_encoder.c, src/opus_multistream_decoder.c,
src/opus_multistream.c).

N elementary Opus streams (coupled = stereo, uncoupled = mono) packed
back-to-back with self-delimited framing for all but the last stream,
plus a channel mapping table."""

from __future__ import annotations

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.repacketizer import Repacketizer
from .opus_decoder import OpusDecoder
from .opus_encoder import OpusEncoder

OPUS_AUTO = None

# (reference: vorbis_mappings src/opus_multistream_encoder.c:52)
VORBIS_MAPPINGS = (
    (1, 0, (0,)),
    (1, 1, (0, 1)),
    (2, 1, (0, 2, 1)),
    (2, 2, (0, 1, 2, 3)),
    (3, 2, (0, 4, 1, 2, 3)),
    (4, 2, (0, 4, 1, 2, 3, 5)),
    (4, 3, (0, 4, 1, 2, 3, 5, 6)),
    (5, 3, (0, 6, 1, 2, 3, 4, 5, 7)),
)


def default_surround_layout(channels: int):
    """(reference: opus_multistream_surround_encoder_init, family 1)"""
    if not 1 <= channels <= 8:
        raise ValueError("surround layout supports 1-8 channels")
    streams, coupled, mapping = VORBIS_MAPPINGS[channels - 1]
    return streams, coupled, list(mapping)




# (reference: channel_pos src/opus_multistream_encoder.c:152)
def _channel_pos(channels):
    pos = [0] * 8
    if channels == 4:
        pos[:4] = [1, 3, 1, 3]
    elif channels in (3, 5, 6):
        pos[:6] = [1, 2, 3, 1, 3, 0]
    elif channels == 7:
        pos[:7] = [1, 2, 3, 1, 3, 2, 0]
    elif channels == 8:
        pos[:8] = [1, 2, 3, 1, 3, 1, 3, 0]
    return pos


def _log_sum(a, b):
    """log2(2^a + 2^b) on energy-log2 values (reference: logSum
    src/opus_multistream_encoder.c:193)."""
    return np.logaddexp2(2 * a, 2 * b) / 2


def surround_analysis(pcm, channels, fs, mem, preemph_mem):
    """Per-channel 21-band masking (reference: surround_analysis
    src/opus_multistream_encoder.c:230).  pcm: float interleaved
    [len*channels]; mem: [channels, overlap]; preemph_mem: [channels].
    Returns bandLogE [channels, 21] (masking offsets, <=0 mostly)."""
    from ..celt.modes import mode_create
    from ..celt.decoder import resampling_factor
    from ..celt.energy import compute_band_energies, amp2log2
    from ..ops.mdct import _forward_basis
    mode = mode_create(48000, 960)
    upsample = resampling_factor(fs)
    length = len(pcm) // channels
    frame_size = length * upsample
    lm = 0
    while lm < mode.maxLM and mode.shortMdctSize << lm != frame_size:
        lm += 1
    freq_size = mode.shortMdctSize << lm
    overlap = mode.overlap
    basis = _forward_basis(freq_size, overlap).astype(np.float64)
    band_log_e = np.zeros((channels, 21))
    mask_log_e = np.full((3, 21), -28.0)
    pos = _channel_pos(channels)
    x2 = pcm.reshape(-1, channels)
    for c in range(channels):
        buf = np.empty(frame_size + overlap)
        buf[:overlap] = mem[c]
        # preemphasis with upsampling (celt_preemphasis equivalent:
        # zero-stuff by `upsample` and preemph in the 32768 domain)
        xin = np.zeros(frame_size)
        xin[::upsample] = x2[:, c] * 32768.0 * upsample
        coef0 = mode.preemph[0]
        m = preemph_mem[c]
        for i in range(frame_size):
            v = xin[i]
            buf[overlap + i] = v - m
            m = coef0 * v
        preemph_mem[c] = m
        ssum = float(np.dot(buf, buf))
        if not (ssum < 1e18) or np.isnan(ssum):
            buf[:] = 0
            preemph_mem[c] = 0.0
        band_e = np.zeros(21)
        freq = np.empty(freq_size)
        spec = buf[:freq_size + overlap] @ basis
        freq[:] = spec
        if upsample != 1:
            bound = freq_size // upsample
            freq[:bound] *= upsample
            freq[bound:] = 0
        tmp_e = np.zeros(21)
        compute_band_energies(mode, freq, tmp_e, 21, 1, lm)
        band_e = np.maximum(band_e, tmp_e)
        ble = np.zeros(21)
        amp2log2(mode, 21, 21, band_e, ble, 1)
        band_log_e[c] = ble
        for i in range(1, 21):
            band_log_e[c, i] = max(band_log_e[c, i],
                                   band_log_e[c, i - 1] - 1.0)
        for i in range(19, -1, -1):
            band_log_e[c, i] = max(band_log_e[c, i],
                                   band_log_e[c, i + 1] - 2.0)
        if pos[c] == 1:
            mask_log_e[0] = _log_sum(mask_log_e[0], band_log_e[c])
        elif pos[c] == 3:
            mask_log_e[2] = _log_sum(mask_log_e[2], band_log_e[c])
        elif pos[c] == 2:
            mask_log_e[0] = _log_sum(mask_log_e[0],
                                     band_log_e[c] - .5)
            mask_log_e[2] = _log_sum(mask_log_e[2],
                                     band_log_e[c] - .5)
        mem[c] = buf[frame_size:frame_size + overlap]
    mask_log_e[1] = np.minimum(mask_log_e[0], mask_log_e[2])
    channel_offset = .5 * np.log2(2.0 / (channels - 1))
    mask_log_e += channel_offset
    for c in range(channels):
        if pos[c] != 0:
            band_log_e[c] -= mask_log_e[pos[c] - 1]
        else:
            band_log_e[c] = 0.0
    return band_log_e


def surround_rate_allocation(bitrate_bps, streams, coupled_streams,
                             frame_size, fs, lfe_stream=-1):
    """(reference: surround_rate_allocation
    src/opus_multistream_encoder.c:702).  Returns per-stream bitrates."""
    nb_lfe = 1 if lfe_stream != -1 else 0
    nb_coupled = coupled_streams
    nb_uncoupled = streams - nb_coupled - nb_lfe
    nb_normal = 2 * nb_coupled + nb_uncoupled
    channel_offset = 40 * max(50, fs // frame_size)
    if bitrate_bps is None:
        bitrate = nb_normal * (channel_offset + fs + 10000) + 8000 * nb_lfe
    else:
        bitrate = bitrate_bps
    lfe_offset = min(bitrate // 20, 3000) + 15 * max(50, fs // frame_size)
    stream_offset = (bitrate - channel_offset * nb_normal
                     - lfe_offset * nb_lfe) // nb_normal // 2
    stream_offset = max(0, min(20000, stream_offset))
    coupled_ratio = 512
    lfe_ratio = 32
    total = (nb_uncoupled << 8) + coupled_ratio * nb_coupled \
        + nb_lfe * lfe_ratio
    channel_rate = 256 * (bitrate - lfe_offset * nb_lfe
                          - stream_offset * (nb_coupled + nb_uncoupled)
                          - channel_offset * nb_normal) // total
    rates = []
    for i in range(streams):
        if i < coupled_streams:
            rates.append(2 * channel_offset
                         + max(0, stream_offset
                               + (channel_rate * coupled_ratio >> 8)))
        elif i != lfe_stream:
            rates.append(channel_offset + max(0, stream_offset
                                              + channel_rate))
        else:
            rates.append(max(0, lfe_offset
                             + (channel_rate * lfe_ratio >> 8)))
    return rates


class OpusMSEncoder:
    """(reference: opus_multistream_encoder_init
    src/opus_multistream_encoder.c)"""

    def __init__(self, fs, channels, streams, coupled_streams, mapping,
                 application="audio"):
        if streams < 1 or coupled_streams > streams \
                or channels < streams + coupled_streams \
                or len(mapping) != channels:
            raise ValueError("bad layout")
        for m in mapping:
            if m != 255 and m >= streams + coupled_streams:
                raise ValueError("bad mapping entry")
        self.fs = fs
        self.channels = channels
        self.streams = streams
        self.coupled_streams = coupled_streams
        self.mapping = list(mapping)
        self.bitrate = None
        self.lfe_stream = -1
        self.surround = False
        self._sa_mem = np.zeros((channels, 120))
        self._sa_preemph = np.zeros(channels)
        self.encoders = []
        for s in range(streams):
            ch = 2 if s < coupled_streams else 1
            self.encoders.append(OpusEncoder(fs, ch, application))

    @classmethod
    def create_surround(cls, fs, channels, application="audio"):
        streams, coupled, mapping = default_surround_layout(channels)
        enc = cls(fs, channels, streams, coupled, mapping, application)
        enc.surround = channels > 2
        if channels in (6, 8):  # 5.1 / 7.1: last mapped channel is the LFE
            enc.lfe_stream = streams - 1
        return enc

    def set_bitrate(self, bitrate):
        self.bitrate = bitrate

    def _stream_channels(self, s):
        """Input channel indices feeding stream s (reference:
        get_left_channel/get_right_channel/get_mono_channel
        src/opus_multistream.c:57-95)."""
        if s < self.coupled_streams:
            left = self.mapping.index(2 * s) if 2 * s in self.mapping \
                else None
            right = self.mapping.index(2 * s + 1) \
                if 2 * s + 1 in self.mapping else None
            return left, right
        idx = self.coupled_streams + s
        return (self.mapping.index(idx) if idx in self.mapping else None,)

    def encode24(self, pcm: np.ndarray, frame_size: int) -> bytes:
        """24-bit multistream encode (reference:
        opus_multistream_encode24 include/opus_multistream.h:415)."""
        pcm = np.asarray(pcm, dtype=np.int64)
        return self.encode(pcm.astype(np.float64) / 8388608.0,
                           frame_size)

    def encode(self, pcm: np.ndarray, frame_size: int) -> bytes:
        """pcm: float interleaved [channels * frame_size]."""
        pcm = np.asarray(pcm, dtype=np.float64).reshape(-1)
        if len(pcm) != frame_size * self.channels:
            raise ValueError("pcm length mismatch")
        rates = surround_rate_allocation(
            self.bitrate, self.streams, self.coupled_streams, frame_size,
            self.fs, self.lfe_stream)
        band_smr = None
        if self.surround:
            # masking between channels (reference: surround_analysis
            # call at opus_multistream_encoder.c:869 and per-stream
            # OPUS_SET_ENERGY_MASK at :1014)
            try:
                band_smr = surround_analysis(pcm, self.channels,
                                             self.fs, self._sa_mem,
                                             self._sa_preemph)
            except ValueError:
                band_smr = None    # unsupported frame size for 48k mode
        out = b""
        for s in range(self.streams):
            enc = self.encoders[s]
            enc.set_bitrate(max(500, rates[s]))
            chans = self._stream_channels(s)
            if band_smr is not None:
                mask = []
                for ch in chans:
                    mask.append(band_smr[ch] if ch is not None
                                else np.zeros(21))
                enc.set_energy_mask(np.concatenate(mask))
            else:
                enc.set_energy_mask(None)
            if len(chans) == 2:
                left = (pcm[chans[0]::self.channels] if chans[0] is not None
                        else np.zeros(frame_size))
                right = (pcm[chans[1]::self.channels] if chans[1] is not None
                         else np.zeros(frame_size))
                x = np.stack([left, right], 1).reshape(-1)
            else:
                x = (pcm[chans[0]::self.channels] if chans[0] is not None
                     else np.zeros(frame_size))
            p = enc.encode(x, frame_size)
            if s != self.streams - 1:
                rp = Repacketizer()
                if rp.cat(p) != 0:
                    raise RuntimeError("repacketize failed")
                sd = rp.out_range(0, rp.nb_frames, len(p) + 2,
                                  self_delimited=True)
                if not isinstance(sd, bytes):
                    raise RuntimeError("self-delimit failed")
                out += sd
            else:
                out += p
        return out


class OpusMSDecoder:
    """(reference: opus_multistream_decoder_init
    src/opus_multistream_decoder.c)"""

    def __init__(self, fs, channels, streams, coupled_streams, mapping):
        if streams < 1 or coupled_streams > streams \
                or len(mapping) != channels:
            raise ValueError("bad layout")
        self.fs = fs
        self.channels = channels
        self.streams = streams
        self.coupled_streams = coupled_streams
        self.mapping = list(mapping)
        self.decoders = []
        for s in range(streams):
            ch = 2 if s < coupled_streams else 1
            self.decoders.append(OpusDecoder(fs, ch))

    def decode(self, data: bytes, frame_size: int | None = None):
        """Returns float PCM [frame * channels] interleaved."""
        outputs = []
        pos = 0
        nsamp = None
        for s in range(self.streams):
            self_delimited = s != self.streams - 1
            parsed = pkt.packet_parse(data[pos:],
                                      self_delimited=self_delimited)
            if isinstance(parsed, int):
                raise ValueError(f"invalid stream {s} ({parsed})")
            # rebuild a regular packet for the elementary decoder
            sub = bytes([parsed.toc & 0xFC]) if parsed.count == 1 else None
            if parsed.count == 1:
                sub = bytes([parsed.toc & 0xFC]) + parsed.frames[0]
            else:
                rp = Repacketizer()
                body = bytearray([parsed.toc | 0x03,
                                  0x80 | parsed.count])
                for f in parsed.frames[:-1]:
                    body += pkt.encode_size(len(f))
                for f in parsed.frames:
                    body += f
                sub = bytes(body)
            out = self.decoders[s].decode(sub)
            outputs.append(out)
            if nsamp is None:
                nsamp = len(out) // self.decoders[s].channels
            pos += parsed.packet_offset
        # channel mapping
        res = np.zeros(nsamp * self.channels)
        for c in range(self.channels):
            m = self.mapping[c]
            if m == 255:
                continue
            if m < 2 * self.coupled_streams:
                s, lr = divmod(m, 2)
                res[c::self.channels] = outputs[s][lr::2]
            else:
                s = m - self.coupled_streams
                res[c::self.channels] = outputs[s]
        return res

    def decode_int16(self, data: bytes, frame_size: int | None = None):
        from ..utils.soft_clip import float2int16
        return float2int16(self.decode(data, frame_size))

    def decode24(self, data: bytes, frame_size: int | None = None):
        """24-bit multistream decode (reference:
        opus_multistream_decode24 include/opus_multistream.h:661)."""
        pcm = np.asarray(self.decode(data, frame_size), np.float64)
        return np.clip(np.rint(pcm * 8388608.0), -(1 << 31),
                       (1 << 31) - 1).astype(np.int32)

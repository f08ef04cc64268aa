"""Top-level Opus decoder (reference: src/opus_decoder.c).

Mirrors opus_decode_native / opus_decode_frame flow: packet parse ->
per-frame range decode -> SILK and/or CELT cores -> PLC routing.
Supports SILK-only, CELT-only and hybrid modes (redundancy frames and
mode-transition fades land in a follow-up).
"""

from __future__ import annotations

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.range_coder import (RangeDecoder, ec_tell,
                                      make_range_decoder)

QEXT_EXTENSION_ID = 124   # (reference: celt/celt.h QEXT_EXTENSION_ID)
from ..celt.decoder import CeltDecoder, resampling_factor
from ..silk.api import SilkDecoder
from ..silk.tables import (FLAG_DECODE_NORMAL, FLAG_PACKET_LOST,
                           FLAG_DECODE_LBRR)
from ..utils.soft_clip import pcm_soft_clip, float2int16


class OpusDecoder:
    def __init__(self, fs: int, channels: int):
        if fs not in (8000, 12000, 16000, 24000, 48000, 96000):
            raise ValueError("bad sample rate")
        if channels not in (1, 2):
            raise ValueError("bad channel count")
        self.fs = fs
        self.channels = channels
        if fs == 96000:
            # QEXT 96 kHz decode (reference: celt_decoder_init
            # celt/celt_decoder.c:228; the 96k mode doubles the MDCT
            # resolution; SILK content is not supported at 96 kHz yet)
            self.celt = CeltDecoder.create(fs, channels,
                                           frame_mode_fs=96000,
                                           frame_size=1920)
        else:
            self.celt = CeltDecoder.create(fs, channels)
        self.celt.disable_inv = 1 if channels == 1 else 0
        self.celt.signalling = 0
        self.silk = SilkDecoder()
        self.stream_channels = channels
        self.prev_mode = 0
        self.prev_redundancy = False
        self.last_packet_duration = 0
        self.rangeFinal = 0
        self.frame_size = fs // 400
        self.mode = 0
        self.bandwidth = 0
        self.softclip_mem = np.zeros(channels, dtype=np.float32)
        self.decode_gain = 0        # OPUS_SET_GAIN, Q8 dB
        # deep PLC / DRED recovery (reference: st->lpcnet,
        # src/opus_decoder.c:735-760, :1611)
        self.lpcnet = None
        self._dred_resampler = None

    def set_osce(self, method: int, model) -> None:
        """Enable LACE/NoLACE enhancement of SILK-WB output (reference:
        osce method selection by decoder complexity,
        src/opus_decoder.c:443-455; OSCE_METHOD_* in dnn/osce.h)."""
        from ..dnn.osce import OSCEEnhancer
        for cs in self.silk.channel_state:
            cs.osce = OSCEEnhancer(method, model) if method else None

    def set_osce_bwe(self, model) -> None:
        """Enable neural blind bandwidth extension of SILK-WB content
        decoded at 48 kHz (reference: OPUS_SET_OSCE_BWE
        opus_defines.h:176; hook silk/dec_API.c:267)."""
        from ..dnn.bbwe import BBWE
        for cs in self.silk.channel_state:
            cs.bwe = BBWE(model) if model is not None else None

    def load_deep_plc(self, plc_model, pitch_model, fargan_model):
        """Attach the neural PLC models (reference: OPUS_SET_DNN_BLOB
        path, complexity>=5 deep PLC)."""
        from ..dnn.plc import LPCNetPLC
        self.lpcnet = LPCNetPLC(plc_model, pitch_model, fargan_model)

    def dred_decode(self, dred, dred_offset: int,
                    frame_size: int) -> np.ndarray:
        """Synthesize concealment audio from processed DRED data
        (reference: opus_decoder_dred_decode src/opus_decoder.c:1611).
        dred_offset in samples at self.fs.  Returns int16
        [frame_size*channels]; the neural vocoder is mono -- stereo
        output duplicates the channel, as deep PLC does for SILK mono
        content."""
        from ..dnn.dred_dec import feed_dred_fec
        from ..silk.resampler import Resampler
        if self.lpcnet is None:
            raise RuntimeError("deep PLC models not loaded")
        if frame_size <= 0:
            raise ValueError("bad frame size")
        feed_dred_fec(self.lpcnet, dred, dred_offset, self.fs,
                      frame_size)
        n10 = max(1, frame_size // (self.fs // 100))
        out16 = np.zeros(160, np.int16)
        pieces = []
        if self._dred_resampler is None and self.fs != 16000:
            self._dred_resampler = Resampler(16000, self.fs)
        for _ in range(n10):
            self.lpcnet.conceal(out16)
            if self.fs == 16000:
                pieces.append(out16.copy())
            else:
                pieces.append(np.asarray(
                    self._dred_resampler.process(out16.tolist()),
                    np.int16))
        mono = np.concatenate(pieces)[:frame_size]
        if self.channels == 2:
            return np.repeat(mono, 2)
        return mono

    def decode(self, data: bytes | None, frame_size: int | None = None,
               decode_fec: bool = False) -> np.ndarray:
        """Decode one packet -> float PCM [-1,1], shape [samples*channels]
        interleaved.  data=None runs PLC for frame_size samples."""
        if data is None or len(data) == 0:
            if frame_size is None:
                frame_size = self.last_packet_duration or self.fs // 50
            return self._decode_frames(None, [], frame_size)
        # DTX bookkeeping for OPUS_GET_IN_DTX: a packet whose frames are
        # all empty/1-byte is a DTX update
        self.last_packet_empty = len(data) <= 2
        parsed = pkt.packet_parse(data)
        if isinstance(parsed, int):
            raise ValueError(f"invalid packet ({parsed})")
        packet_mode = pkt.packet_get_mode(data)
        packet_bandwidth = pkt.packet_get_bandwidth(data)
        packet_frame_size = pkt.packet_get_samples_per_frame(data, self.fs)
        packet_stream_channels = pkt.packet_get_nb_channels(data)
        if decode_fec:
            # In-band FEC: conceal all but the last packet_frame_size
            # samples, then decode the LBRR data of this (next) packet
            # in their place (reference: opus_decode_native
            # src/opus_decoder.c:800-834)
            if frame_size is None:
                frame_size = packet_frame_size
            if frame_size % (self.fs // 400):
                raise ValueError("FEC/PLC frame size must be a multiple "
                                 "of 2.5 ms")
            if (frame_size < packet_frame_size
                    or packet_mode == pkt.Mode.CELT_ONLY
                    or self.mode == pkt.Mode.CELT_ONLY):
                return self._decode_frames(None, [], frame_size)
            out = []
            if frame_size != packet_frame_size:
                out.append(self._decode_frames(
                    None, [], frame_size - packet_frame_size))
            self.mode = packet_mode
            self.bandwidth = packet_bandwidth
            self.frame_size = packet_frame_size
            self.stream_channels = packet_stream_channels
            pcm = np.zeros(packet_frame_size * self.channels)
            self._decode_frame(parsed.frames[0], pcm, packet_frame_size,
                               decode_fec=True)
            out.append(pcm)
            self.last_packet_duration = frame_size
            return np.concatenate(out)
        self.mode = packet_mode
        self.bandwidth = packet_bandwidth
        self.frame_size = packet_frame_size
        self.stream_channels = packet_stream_channels
        nb_samples = self.frame_size * parsed.count
        if frame_size is None:
            frame_size = nb_samples
        elif frame_size < nb_samples:
            # the reference rejects output buffers smaller than the packet
            # duration with OPUS_BUFFER_TOO_SMALL (src/opus_decoder.c:836)
            raise ValueError("buffer too small for packet duration")
        if nb_samples * 25 > self.fs * 3:
            raise ValueError("invalid packet duration")
        return self._decode_frames(data, parsed.frames, frame_size)

    def decode_int16(self, data: bytes | None,
                     frame_size: int | None = None,
                     decode_fec: bool = False) -> np.ndarray:
        """int16 decode API (reference: opus_decode src/opus_decoder.c in
        float builds): float decode -> opus_pcm_soft_clip -> FLOAT2INT16."""
        pcm = np.asarray(self.decode(data, frame_size, decode_fec),
                         dtype=np.float32)
        pcm_soft_clip(pcm, self.channels, self.softclip_mem)
        return float2int16(pcm)

    def decode24(self, data: bytes | None,
                 frame_size: int | None = None,
                 decode_fec: bool = False) -> np.ndarray:
        """24-bit decode API: int32 samples in 24-bit scale (reference:
        opus_decode24 src/opus_decoder.c:947; RES2INT24(a) =
        float2int(32768*256*a), celt/arch.h:375 — round-to-nearest, no
        soft clip in the float build)."""
        pcm = np.asarray(self.decode(data, frame_size, decode_fec),
                         dtype=np.float64)
        return np.clip(np.rint(pcm * 8388608.0), -(1 << 31),
                       (1 << 31) - 1).astype(np.int32)

    def _decode_frames(self, data, frames, frame_size) -> np.ndarray:
        if data is None:
            pcm = np.zeros(frame_size * self.channels)
            if self.prev_mode == 0:
                return pcm
            self._decode_frame(None, pcm, frame_size)
            self.last_packet_duration = frame_size
            return pcm
        out = []
        qext_payloads = self._find_qext_payloads(data, len(frames))
        for fi, frame in enumerate(frames):
            pcm = np.zeros(self.frame_size * self.channels)
            self._decode_frame(frame, pcm, self.frame_size,
                               qext_payload=qext_payloads[fi])
            out.append(pcm)
        self.last_packet_duration = self.frame_size * len(frames)
        return np.concatenate(out) if out else np.zeros(0)

    def _find_qext_payloads(self, data: bytes, count: int):
        """Per-frame quality-extension payloads (extension ID 124) from
        the packet padding (reference: opus_decode_native QEXT lookup
        src/opus_decoder.c:849-863)."""
        from ..bitstream.extensions import ExtensionIterator, ExtensionData
        payloads = [None] * count
        parsed = pkt.packet_parse(data)
        if isinstance(parsed, int) or not parsed.padding:
            return payloads
        it = ExtensionIterator(parsed.padding, parsed.count)
        while True:
            ext = it.find(QEXT_EXTENSION_ID)
            if not isinstance(ext, ExtensionData):
                break
            if 0 <= ext.frame < count and payloads[ext.frame] is None:
                payloads[ext.frame] = bytes(ext.data)
        return payloads

    def _smooth_fade(self, in1, in2, out, overlap):
        """(reference: smooth_fade src/opus_decoder.c:220): crossfade with
        the squared CELT window."""
        from ..ops.mdct import _window
        ch = self.channels
        inc = 48000 // self.fs
        w = _window(self.celt.mode.overlap)[::1]
        for c in range(ch):
            for i in range(overlap):
                g = w[i * inc] * w[i * inc]
                out[i * ch + c] = g * in2[i * ch + c] \
                    + (1 - g) * in1[i * ch + c]

    def _conceal_chunk(self, pcm: np.ndarray, frame_size: int,
                       mode: int) -> None:
        """Conceal one <=20 ms piece in the given mode (reference: the
        data==NULL flow of opus_decode_frame, src/opus_decoder.c:404-612)."""
        c = self.celt
        f20 = self.fs // 50
        if mode == pkt.Mode.CELT_ONLY:
            ret = c.decode_with_ec(None, pcm, frame_size, None)
            if ret < 0:
                raise RuntimeError(f"celt PLC failed ({ret})")
        else:
            out = self.silk.decode(
                None, n_channels_api=self.channels,
                n_channels_internal=self.silk.nChannelsInternal or 1,
                api_sample_rate=self.fs,
                internal_sample_rate=1000 * (self.silk.channel_state[0].fs_kHz or 16),
                payload_size_ms=max(10, 1000 * frame_size // self.fs),
                lost_flag=FLAG_PACKET_LOST, new_packet_flag=True)
            n = min(len(out), len(pcm))
            pcm[:n] = out[:n] / 32768.0
            if mode == pkt.Mode.HYBRID:
                # hybrid loss: the CELT concealment (bands >= 8 kHz)
                # accumulates on top of the SILK concealment
                # (reference: opus_decode_frame data==NULL keeps
                # start_band=17 and runs celt PLC with accumulation,
                # src/opus_decoder.c:593-612)
                c.start = 17
                ret = c.decode_with_ec(None, pcm, min(f20, frame_size),
                                       None, accum=True)
                if ret < 0:
                    raise RuntimeError(f"celt PLC failed ({ret})")

    def _decode_frame(self, frame: bytes | None, pcm: np.ndarray,
                      frame_size: int, qext_payload: bytes | None = None,
                      decode_fec: bool = False):
        """(reference: opus_decode_frame src/opus_decoder.c:271;
        decode_fec=True decodes the frame's LBRR data instead of its
        primary SILK payload and conceals the CELT part)"""
        c = self.celt
        f20 = self.fs // 50
        f10 = f20 >> 1
        f5 = f10 >> 1
        f2_5 = f5 >> 1
        ch = self.channels
        if frame is not None and len(frame) <= 1:
            # DTX: payloads of 0 or 1 byte (2 including TOC) trigger the
            # PLC, concealing no more than the TOC duration (reference:
            # src/opus_decoder.c:316-321)
            frame = None
            frame_size = min(frame_size, self.frame_size)
        if frame is None:
            mode = pkt.Mode.CELT_ONLY if self.prev_redundancy else self.prev_mode
            self.rangeFinal = 0
            if mode == 0:
                # no packet decoded yet: all we can do is return zeros
                # (reference: src/opus_decoder.c:334-341)
                return
            # Conceal in pieces the PLC can run on: at most 20 ms each,
            # and only 2.5/5 (CELT) or 10/20 ms sizes (reference:
            # src/opus_decoder.c:343-366)
            done = 0
            while done < frame_size:
                chunk = min(frame_size - done, f20)
                if chunk < f20:
                    if chunk > f10:
                        chunk = f10
                    elif (mode != pkt.Mode.SILK_ONLY
                          and f5 < chunk < f10):
                        chunk = f5
                self._conceal_chunk(pcm[done * ch:(done + chunk) * ch],
                                    chunk, mode)
                done += chunk
            # the reference updates these unconditionally at the end of
            # opus_decode_frame (src/opus_decoder.c:702-703)
            self.prev_mode = mode
            self.prev_redundancy = False
            return
        mode = self.mode
        dec = make_range_decoder(frame)
        length = len(frame)
        audiosize = frame_size

        # mode-transition detection (reference :375-392)
        transition = 0
        pcm_transition = None
        if self.prev_mode > 0 and (
                (mode == pkt.Mode.CELT_ONLY
                 and self.prev_mode != pkt.Mode.CELT_ONLY
                 and not self.prev_redundancy)
                or (mode != pkt.Mode.CELT_ONLY
                    and self.prev_mode == pkt.Mode.CELT_ONLY)):
            transition = 1
            if mode == pkt.Mode.CELT_ONLY:
                pcm_transition = np.zeros(f5 * ch)
                self._decode_frame(None, pcm_transition, min(f5, audiosize))

        # ---- SILK half ----
        if mode != pkt.Mode.CELT_ONLY:
            if self.prev_mode == pkt.Mode.CELT_ONLY:
                self.silk.reset()
            payload_ms = max(10, 1000 * audiosize // self.fs)
            if mode == pkt.Mode.SILK_ONLY:
                isr = {pkt.Bandwidth.NARROWBAND: 8000,
                       pkt.Bandwidth.MEDIUMBAND: 12000}.get(self.bandwidth,
                                                            16000)
            else:
                isr = 16000
            decoded = 0
            first = True
            while decoded < audiosize:
                out = self.silk.decode(
                    dec, n_channels_api=self.channels,
                    n_channels_internal=self.stream_channels,
                    api_sample_rate=self.fs, internal_sample_rate=isr,
                    payload_size_ms=payload_ms,
                    lost_flag=(FLAG_DECODE_LBRR if decode_fec
                               else FLAG_DECODE_NORMAL),
                    new_packet_flag=first)
                first = False
                n = len(out) // self.channels
                pcm[decoded * self.channels:
                    (decoded + n) * self.channels] = out / 32768.0
                decoded += n

        # ---- redundancy signaling (parsed to keep the stream in sync) ----
        redundancy = 0
        redundancy_bytes = 0
        celt_to_silk = 0
        if (not decode_fec and mode != pkt.Mode.CELT_ONLY
                and ec_tell(dec) + 17 + 20 * (mode == pkt.Mode.HYBRID)
                <= 8 * length):
            if mode == pkt.Mode.HYBRID:
                redundancy = dec.dec_bit_logp(12)
            else:
                redundancy = 1
            if redundancy:
                celt_to_silk = dec.dec_bit_logp(1)
                redundancy_bytes = (dec.dec_uint(256) + 2
                                    if mode == pkt.Mode.HYBRID
                                    else length - ((ec_tell(dec) + 7) >> 3))
                length -= redundancy_bytes
                if length * 8 < ec_tell(dec):
                    length = 0
                    redundancy_bytes = 0
                    redundancy = 0
                dec.storage -= redundancy_bytes

        start_band = 0 if mode == pkt.Mode.CELT_ONLY else 17

        if redundancy:
            transition = 0
        if transition and mode != pkt.Mode.CELT_ONLY:
            pcm_transition = np.zeros(f5 * ch)
            self._decode_frame(None, pcm_transition, min(f5, audiosize))

        endband = {pkt.Bandwidth.NARROWBAND: 13,
                   pkt.Bandwidth.MEDIUMBAND: 17,
                   pkt.Bandwidth.WIDEBAND: 17,
                   pkt.Bandwidth.SUPERWIDEBAND: 19,
                   pkt.Bandwidth.FULLBAND: 21}[self.bandwidth]
        c.end = endband
        c.stream_channels = self.stream_channels

        redundant_rng = 0
        red_pcm = None
        red_data = frame[length:length + redundancy_bytes] \
            if redundancy else b""

        # 5 ms redundant frame for CELT->SILK (reference :579-590)
        if redundancy and celt_to_silk:
            c.start = 0
            red_pcm = np.zeros(f5 * ch)
            c.decode_with_ec(red_data, red_pcm, f5,
                             make_range_decoder(red_data))
            redundant_rng = c.rng

        c.start = start_band

        if mode != pkt.Mode.SILK_ONLY:
            celt_frame_size = min(f20, audiosize)
            if mode != self.prev_mode and self.prev_mode > 0 \
                    and not self.prev_redundancy:
                c.reset()
            # in FEC mode the CELT half is concealed (reference :606)
            ret = c.decode_with_ec(None if decode_fec else frame, pcm,
                                   celt_frame_size,
                                   None if decode_fec else dec,
                                   accum=(mode != pkt.Mode.CELT_ONLY),
                                   qext_payload=qext_payload)
            if ret < 0:
                raise RuntimeError(f"celt decode failed ({ret})")
            self.rangeFinal = c.rng
        else:
            # For hybrid -> SILK transitions, let the CELT MDCT fade out by
            # decoding a silence frame (reference :617-627)
            if self.prev_mode == pkt.Mode.HYBRID and not (
                    redundancy and celt_to_silk and self.prev_redundancy):
                c.start = 0
                sil = np.zeros(f2_5 * ch)
                c.decode_with_ec(b"\xff\xff", sil, f2_5, None, accum=False)
                pcm[:f2_5 * ch] += sil
            self.rangeFinal = dec.rng

        # 5 ms redundant frame for SILK->CELT (reference :637-646)
        if redundancy and not celt_to_silk:
            c.reset()
            c.start = 0
            red_pcm = np.zeros(f5 * ch)
            c.decode_with_ec(red_data, red_pcm, f5, make_range_decoder(red_data))
            redundant_rng = c.rng
            base = (audiosize - f2_5) * ch
            self._smooth_fade(pcm[base:].copy(), red_pcm[f2_5 * ch:],
                              pcm[base:], f2_5)
        # CELT->SILK: splice redundant audio at the frame start
        # (reference :650-659)
        if redundancy and celt_to_silk and (
                self.prev_mode != pkt.Mode.SILK_ONLY or self.prev_redundancy):
            pcm[:f2_5 * ch] = red_pcm[:f2_5 * ch]
            self._smooth_fade(red_pcm[f2_5 * ch:f5 * ch],
                              pcm[f2_5 * ch:f5 * ch].copy(),
                              pcm[f2_5 * ch:f5 * ch], f2_5)
        # mode-transition crossfade at frame start (reference :661-678)
        if transition and pcm_transition is not None:
            if audiosize >= f5:
                pcm[:ch * f2_5] = pcm_transition[:ch * f2_5]
                self._smooth_fade(pcm_transition[ch * f2_5:ch * f5],
                                  pcm[ch * f2_5:ch * f5].copy(),
                                  pcm[ch * f2_5:ch * f5], f2_5)
            else:
                self._smooth_fade(pcm_transition[:ch * f2_5],
                                  pcm[:ch * f2_5].copy(),
                                  pcm[:ch * f2_5], f2_5)

        # OPUS_SET_GAIN scaling (reference: src/opus_decoder.c:681-688,
        # Q8 dB: gain = 2^(6.48814081e-4 * decode_gain))
        if self.decode_gain:
            pcm *= 2.0 ** (6.48814081e-4 * self.decode_gain)

        self.rangeFinal ^= redundant_rng
        self.prev_mode = mode
        self.prev_redundancy = bool(redundancy and not celt_to_silk)

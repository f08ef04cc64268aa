"""silk_Decode equivalent: packet-level SILK decoder driver
(reference: silk/dec_API.c:135)."""

from __future__ import annotations

import numpy as np

from ..bitstream.range_coder import RangeDecoder
from . import tables_data as TD
from .tables import (MAX_NB_SUBFR, FLAG_DECODE_NORMAL, FLAG_PACKET_LOST,
                     FLAG_DECODE_LBRR, CODE_INDEPENDENTLY,
                     CODE_INDEPENDENTLY_NO_LTP_SCALING, CODE_CONDITIONALLY,
                     TYPE_NO_VOICE_ACTIVITY, TYPE_VOICED,
                     SHELL_CODEC_FRAME_LENGTH)
from .decoder import ChannelState
from .stereo import StereoDecState, stereo_decode_pred, stereo_decode_mid_only


class SilkDecoder:
    """Two-channel SILK decoder (reference: silk_decoder struct)."""

    def __init__(self):
        self.channel_state = [ChannelState(), ChannelState()]
        self.sStereo = StereoDecState()
        self.nChannelsAPI = 0
        self.nChannelsInternal = 0
        self.prev_decode_only_middle = 0

    def reset(self):
        self.__init__()

    # ------------------------------------------------------------------
    def decode(self, dec: RangeDecoder | None, *, n_channels_api: int,
               n_channels_internal: int, api_sample_rate: int,
               internal_sample_rate: int, payload_size_ms: int,
               lost_flag: int, new_packet_flag: bool):
        """Decode one SILK frame.  Returns int16 numpy array
        [n_samples_out * nChannelsAPI] interleaved at api rate."""
        cs = self.channel_state
        decode_only_middle = 0
        ms_pred_q13 = [0, 0]

        if new_packet_flag:
            for n in range(n_channels_internal):
                cs[n].nFramesDecoded = 0

        if n_channels_internal > self.nChannelsInternal:
            cs[1].reset()

        stereo_to_mono = (n_channels_internal == 1
                          and self.nChannelsInternal == 2
                          and internal_sample_rate == 1000 * cs[0].fs_kHz)

        if cs[0].nFramesDecoded == 0:
            for n in range(n_channels_internal):
                if payload_size_ms in (0, 10):
                    cs[n].nFramesPerPacket = 1
                    cs[n].nb_subfr = 2
                elif payload_size_ms == 20:
                    cs[n].nFramesPerPacket = 1
                    cs[n].nb_subfr = 4
                elif payload_size_ms == 40:
                    cs[n].nFramesPerPacket = 2
                    cs[n].nb_subfr = 4
                elif payload_size_ms == 60:
                    cs[n].nFramesPerPacket = 3
                    cs[n].nb_subfr = 4
                else:
                    raise ValueError("invalid frame size")
                fs_khz_dec = (internal_sample_rate >> 10) + 1
                if fs_khz_dec not in (8, 12, 16):
                    raise ValueError("invalid sampling rate")
                cs[n].set_fs(fs_khz_dec, api_sample_rate)

        if (n_channels_api == 2 and n_channels_internal == 2
                and (self.nChannelsAPI == 1 or self.nChannelsInternal == 1)):
            self.sStereo.pred_prev_Q13 = [0, 0]
            self.sStereo.sSide = [0, 0]
            cs[1].resampler = cs[0].resampler and _copy_resampler(cs[0].resampler)
        self.nChannelsAPI = n_channels_api
        self.nChannelsInternal = n_channels_internal

        if lost_flag != FLAG_PACKET_LOST and cs[0].nFramesDecoded == 0:
            for n in range(n_channels_internal):
                for i in range(cs[n].nFramesPerPacket):
                    cs[n].VAD_flags[i] = dec.dec_bit_logp(1)
                cs[n].LBRR_flag = dec.dec_bit_logp(1)
            for n in range(n_channels_internal):
                cs[n].LBRR_flags = [0, 0, 0]
                if cs[n].LBRR_flag:
                    if cs[n].nFramesPerPacket == 1:
                        cs[n].LBRR_flags[0] = 1
                    else:
                        sym = dec.dec_icdf(
                            (TD.LBRR_FLAGS_2_ICDF, TD.LBRR_FLAGS_3_ICDF)[
                                cs[n].nFramesPerPacket - 2], 8) + 1
                        for i in range(cs[n].nFramesPerPacket):
                            cs[n].LBRR_flags[i] = (sym >> i) & 1
            if lost_flag == FLAG_DECODE_NORMAL:
                # skip LBRR data
                for i in range(cs[0].nFramesPerPacket):
                    for n in range(n_channels_internal):
                        if cs[n].LBRR_flags[i]:
                            if n_channels_internal == 2 and n == 0:
                                stereo_decode_pred(dec)
                                if cs[1].LBRR_flags[i] == 0:
                                    stereo_decode_mid_only(dec)
                            cond = CODE_CONDITIONALLY if (
                                i > 0 and cs[n].LBRR_flags[i - 1]) \
                                else CODE_INDEPENDENTLY
                            cs[n].decode_indices(dec, i, 1, cond)
                            npul = (cs[n].frame_length
                                    + SHELL_CODEC_FRAME_LENGTH - 1) \
                                & ~(SHELL_CODEC_FRAME_LENGTH - 1)
                            pulses = [0] * npul
                            cs[n].decode_pulses(
                                dec, pulses, cs[n].indices.signalType,
                                cs[n].indices.quantOffsetType,
                                cs[n].frame_length)

        if n_channels_internal == 2:
            if lost_flag == FLAG_DECODE_NORMAL or \
                    (lost_flag == FLAG_DECODE_LBRR
                     and cs[0].LBRR_flags[cs[0].nFramesDecoded] == 1):
                ms_pred_q13 = stereo_decode_pred(dec)
                if ((lost_flag == FLAG_DECODE_NORMAL
                     and cs[1].VAD_flags[cs[0].nFramesDecoded] == 0)
                    or (lost_flag == FLAG_DECODE_LBRR
                        and cs[1].LBRR_flags[cs[0].nFramesDecoded] == 0)):
                    decode_only_middle = stereo_decode_mid_only(dec)
                else:
                    decode_only_middle = 0
            else:
                ms_pred_q13 = list(self.sStereo.pred_prev_Q13)

        if (n_channels_internal == 2 and decode_only_middle == 0
                and self.prev_decode_only_middle == 1):
            cs[1].outBuf = [0] * len(cs[1].outBuf)
            cs[1].sLPC_Q14_buf = [0] * len(cs[1].sLPC_Q14_buf)
            cs[1].lagPrev = 100
            cs[1].LastGainIndex = 10
            cs[1].prevSignalType = TYPE_NO_VOICE_ACTIVITY
            cs[1].first_frame_after_reset = 1

        if lost_flag == FLAG_DECODE_NORMAL:
            has_side = not decode_only_middle
        else:
            has_side = (not self.prev_decode_only_middle
                        or (n_channels_internal == 2
                            and lost_flag == FLAG_DECODE_LBRR
                            and cs[1].LBRR_flags[cs[1].nFramesDecoded] == 1))

        samples_out1 = [[0] * (cs[0].frame_length + 2) for _ in range(2)]
        n_samples_out_dec = cs[0].frame_length
        for n in range(n_channels_internal):
            if n == 0 or has_side:
                frame_index = cs[0].nFramesDecoded - n
                if frame_index <= 0:
                    cond = CODE_INDEPENDENTLY
                elif lost_flag == FLAG_DECODE_LBRR:
                    cond = CODE_CONDITIONALLY if \
                        cs[n].LBRR_flags[frame_index - 1] \
                        else CODE_INDEPENDENTLY
                elif n > 0 and self.prev_decode_only_middle:
                    cond = CODE_INDEPENDENTLY_NO_LTP_SCALING
                else:
                    cond = CODE_CONDITIONALLY
                xq = samples_out1[n]
                frame = [0] * cs[n].frame_length
                cs[n].decode_frame(dec, frame,
                                   FLAG_PACKET_LOST if lost_flag == FLAG_PACKET_LOST
                                   else lost_flag, cond)
                xq[2:2 + cs[n].frame_length] = frame
            else:
                samples_out1[n][2:] = [0] * cs[0].frame_length
            cs[n].nFramesDecoded += 1

        if n_channels_api == 2 and n_channels_internal == 2:
            self.sStereo.ms_to_lr(samples_out1[0], samples_out1[1],
                                  ms_pred_q13, cs[0].fs_kHz,
                                  n_samples_out_dec)
        else:
            samples_out1[0][0:2] = self.sStereo.sMid
            self.sStereo.sMid = list(
                samples_out1[0][n_samples_out_dec:n_samples_out_dec + 2])

        n_samples_out = n_samples_out_dec * api_sample_rate \
            // (cs[0].fs_kHz * 1000)
        out = np.zeros(n_samples_out * n_channels_api, dtype=np.int64)

        for n in range(min(n_channels_api, n_channels_internal)):
            bwe = getattr(cs[n], "bwe", None)
            if bwe is not None and cs[0].fs_kHz == 16 \
                    and api_sample_rate == 48000 \
                    and n_samples_out_dec in (160, 320):
                # neural blind BWE replaces the 16k->48k resampler
                # (reference: osce_bwe hook silk/dec_API.c:267)
                resampled = bwe.process(np.asarray(
                    samples_out1[n][1:1 + n_samples_out_dec],
                    np.int16)).tolist()
            else:
                resampled = cs[n].resampler.process(
                    samples_out1[n][1:1 + n_samples_out_dec])
            if n_channels_api == 2:
                out[n::2] = resampled[:n_samples_out]
            else:
                out[:] = resampled[:n_samples_out]

        if n_channels_api == 2 and n_channels_internal == 1:
            if stereo_to_mono:
                resampled = cs[1].resampler.process(
                    samples_out1[0][1:1 + n_samples_out_dec])
                out[1::2] = resampled[:n_samples_out]
            else:
                out[1::2] = out[0::2]

        if lost_flag == FLAG_PACKET_LOST:
            for i in range(self.nChannelsInternal):
                cs[i].LastGainIndex = 10
        else:
            self.prev_decode_only_middle = decode_only_middle
        return out.astype(np.int16)

    @property
    def prev_pitch_lag(self):
        cs0 = self.channel_state[0]
        if cs0.prevSignalType == TYPE_VOICED:
            mult = (6, 4, 3)[(cs0.fs_kHz - 8) >> 2]
            return cs0.lagPrev * mult
        return 0


def _copy_resampler(r):
    import copy
    return copy.deepcopy(r)

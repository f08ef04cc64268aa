"""Systematic ctl surface: the reference's request-code contract
(reference: include/opus_defines.h:130-181, dispatch in
src/opus_encoder.c opus_encoder_ctl / src/opus_decoder.c
opus_decoder_ctl) mapped onto the pythonic OpusEncoder/OpusDecoder
attributes, with the same argument validation.

    from opus_tpu.models.ctl import encoder_ctl, OPUS_SET_BITRATE
    encoder_ctl(enc, OPUS_SET_BITRATE, 64000)
    rng = decoder_ctl(dec, OPUS_GET_FINAL_RANGE)

SET requests take one value argument and return None; GET requests take
no argument and return the value.  Invalid arguments raise ValueError
(the reference's OPUS_BAD_ARG); requests a state doesn't implement raise
NotImplementedError (OPUS_UNIMPLEMENTED).
"""

from __future__ import annotations

from ..bitstream import packet as pkt

# -- request codes (opus_defines.h) ----------------------------------- #
OPUS_SET_APPLICATION = 4000
OPUS_GET_APPLICATION = 4001
OPUS_SET_BITRATE = 4002
OPUS_GET_BITRATE = 4003
OPUS_SET_MAX_BANDWIDTH = 4004
OPUS_GET_MAX_BANDWIDTH = 4005
OPUS_SET_VBR = 4006
OPUS_GET_VBR = 4007
OPUS_SET_BANDWIDTH = 4008
OPUS_GET_BANDWIDTH = 4009
OPUS_SET_COMPLEXITY = 4010
OPUS_GET_COMPLEXITY = 4011
OPUS_SET_INBAND_FEC = 4012
OPUS_GET_INBAND_FEC = 4013
OPUS_SET_PACKET_LOSS_PERC = 4014
OPUS_GET_PACKET_LOSS_PERC = 4015
OPUS_SET_DTX = 4016
OPUS_GET_DTX = 4017
OPUS_SET_VBR_CONSTRAINT = 4020
OPUS_GET_VBR_CONSTRAINT = 4021
OPUS_SET_FORCE_CHANNELS = 4022
OPUS_GET_FORCE_CHANNELS = 4023
OPUS_SET_SIGNAL = 4024
OPUS_GET_SIGNAL = 4025
OPUS_GET_LOOKAHEAD = 4027
OPUS_GET_SAMPLE_RATE = 4029
OPUS_GET_FINAL_RANGE = 4031
OPUS_GET_PITCH = 4033
OPUS_SET_GAIN = 4034
OPUS_GET_GAIN = 4045
OPUS_SET_LSB_DEPTH = 4036
OPUS_GET_LSB_DEPTH = 4037
OPUS_GET_LAST_PACKET_DURATION = 4039
OPUS_SET_PHASE_INVERSION_DISABLED = 4046
OPUS_GET_PHASE_INVERSION_DISABLED = 4047
OPUS_GET_IN_DTX = 4049
OPUS_SET_DRED_DURATION = 4050
OPUS_GET_DRED_DURATION = 4051
OPUS_SET_QEXT = 4056
OPUS_GET_QEXT = 4057
OPUS_RESET_STATE = 4028

# -- value constants --------------------------------------------------- #
OPUS_AUTO = -1000
OPUS_BITRATE_MAX = -1
OPUS_APPLICATION_VOIP = 2048
OPUS_APPLICATION_AUDIO = 2049
OPUS_APPLICATION_RESTRICTED_LOWDELAY = 2051
OPUS_SIGNAL_VOICE = 3001
OPUS_SIGNAL_MUSIC = 3002
OPUS_BANDWIDTH_NARROWBAND = 1101
OPUS_BANDWIDTH_MEDIUMBAND = 1102
OPUS_BANDWIDTH_WIDEBAND = 1103
OPUS_BANDWIDTH_SUPERWIDEBAND = 1104
OPUS_BANDWIDTH_FULLBAND = 1105

_BW_TO_ENUM = {
    OPUS_BANDWIDTH_NARROWBAND: pkt.Bandwidth.NARROWBAND,
    OPUS_BANDWIDTH_MEDIUMBAND: pkt.Bandwidth.MEDIUMBAND,
    OPUS_BANDWIDTH_WIDEBAND: pkt.Bandwidth.WIDEBAND,
    OPUS_BANDWIDTH_SUPERWIDEBAND: pkt.Bandwidth.SUPERWIDEBAND,
    OPUS_BANDWIDTH_FULLBAND: pkt.Bandwidth.FULLBAND,
}
_ENUM_TO_BW = {v: k for k, v in _BW_TO_ENUM.items()}
_APP_TO_NAME = {
    OPUS_APPLICATION_VOIP: "voip",
    OPUS_APPLICATION_AUDIO: "audio",
    OPUS_APPLICATION_RESTRICTED_LOWDELAY: "restricted-lowdelay",
}
_NAME_TO_APP = {v: k for k, v in _APP_TO_NAME.items()}


def _check(cond):
    if not cond:
        raise ValueError("OPUS_BAD_ARG")


def encoder_ctl(enc, request: int, *args):
    """opus_encoder_ctl twin (reference: src/opus_encoder.c:2882)."""
    v = args[0] if args else None
    if request == OPUS_SET_APPLICATION:
        _check(v in _APP_TO_NAME)
        enc.application = _APP_TO_NAME[v]
    elif request == OPUS_GET_APPLICATION:
        return _NAME_TO_APP[enc.application]
    elif request == OPUS_SET_BITRATE:
        if v not in (OPUS_AUTO, OPUS_BITRATE_MAX):
            _check(v > 0)
            v = max(500, min(300000 * enc.channels, v))
        enc.set_bitrate(None if v == OPUS_AUTO else v)
    elif request == OPUS_GET_BITRATE:
        return OPUS_AUTO if enc.bitrate is None else enc.bitrate
    elif request == OPUS_SET_MAX_BANDWIDTH:
        _check(v in _BW_TO_ENUM)
        enc.max_bandwidth = _BW_TO_ENUM[v]
    elif request == OPUS_GET_MAX_BANDWIDTH:
        return _ENUM_TO_BW[enc.max_bandwidth]
    elif request == OPUS_SET_VBR:
        _check(v in (0, 1))
        enc.set_vbr(bool(v), constrained=bool(enc.constrained_vbr))
    elif request == OPUS_GET_VBR:
        return int(enc.vbr)
    elif request == OPUS_SET_BANDWIDTH:
        _check(v == OPUS_AUTO or v in _BW_TO_ENUM)
        enc.user_bandwidth = None if v == OPUS_AUTO else _BW_TO_ENUM[v]
    elif request == OPUS_GET_BANDWIDTH:
        return _ENUM_TO_BW[enc.bandwidth]
    elif request == OPUS_SET_COMPLEXITY:
        _check(0 <= v <= 10)
        enc.complexity = v
    elif request == OPUS_GET_COMPLEXITY:
        return enc.complexity
    elif request == OPUS_SET_INBAND_FEC:
        _check(v in (0, 1, 2))
        enc.set_inband_fec(v != 0)
    elif request == OPUS_GET_INBAND_FEC:
        return int(enc.use_inband_fec)
    elif request == OPUS_SET_PACKET_LOSS_PERC:
        enc.set_packet_loss_perc(v)
    elif request == OPUS_GET_PACKET_LOSS_PERC:
        return enc.packet_loss_perc
    elif request == OPUS_SET_DTX:
        _check(v in (0, 1))
        enc.use_dtx = v
    elif request == OPUS_GET_DTX:
        return int(enc.use_dtx)
    elif request == OPUS_SET_VBR_CONSTRAINT:
        _check(v in (0, 1))
        enc.constrained_vbr = v
    elif request == OPUS_GET_VBR_CONSTRAINT:
        return int(enc.constrained_vbr)
    elif request == OPUS_SET_FORCE_CHANNELS:
        _check(v in (OPUS_AUTO, 1, 2) and (v == OPUS_AUTO
                                           or v <= enc.channels))
        enc.force_channels = 0 if v == OPUS_AUTO else v
    elif request == OPUS_GET_FORCE_CHANNELS:
        return OPUS_AUTO if enc.force_channels == 0 else \
            enc.force_channels
    elif request == OPUS_SET_SIGNAL:
        _check(v in (OPUS_AUTO, OPUS_SIGNAL_VOICE, OPUS_SIGNAL_MUSIC))
        enc.signal_type = {OPUS_AUTO: None, OPUS_SIGNAL_VOICE: "voice",
                           OPUS_SIGNAL_MUSIC: "music"}[v]
    elif request == OPUS_GET_SIGNAL:
        return {None: OPUS_AUTO, "voice": OPUS_SIGNAL_VOICE,
                "music": OPUS_SIGNAL_MUSIC}[enc.signal_type]
    elif request == OPUS_GET_LOOKAHEAD:
        # reference: Fs/400 + delay_compensation (opus_encoder.c:2999)
        return enc.fs // 400 + enc.delay_compensation
    elif request == OPUS_GET_SAMPLE_RATE:
        return enc.fs
    elif request == OPUS_GET_FINAL_RANGE:
        return enc.rangeFinal
    elif request == OPUS_SET_LSB_DEPTH:
        _check(8 <= v <= 24)
        enc.lsb_depth = v
    elif request == OPUS_GET_LSB_DEPTH:
        return enc.lsb_depth
    elif request == OPUS_GET_IN_DTX:
        # reference: in DTX when enough consecutive inactive frames
        # (opus_encoder.c:3194)
        return int(enc.use_dtx != 0
                   and enc.nb_no_activity_ms_Q1
                   > 2 * 20 * 10)   # NB_SPEECH_FRAMES_BEFORE_DTX*20ms
    elif request == OPUS_SET_DRED_DURATION:
        _check(0 <= v <= 100)
        enc.dred_duration = v
    elif request == OPUS_GET_DRED_DURATION:
        return enc.dred_duration
    elif request == OPUS_SET_QEXT:
        _check(v in (0, 1))
        enc.set_qext(v)
    elif request == OPUS_GET_QEXT:
        return int(getattr(enc, "enable_qext", 0))
    elif request == OPUS_RESET_STATE:
        # reference resets from OPUS_ENCODER_RESET_START, preserving all
        # user ctls (src/opus_encoder.c:3162)
        keep = dict(bitrate=enc.bitrate, vbr=enc.vbr,
                    constrained_vbr=enc.constrained_vbr,
                    complexity=enc.complexity,
                    packet_loss_perc=enc.packet_loss_perc,
                    use_inband_fec=enc.use_inband_fec,
                    use_dtx=enc.use_dtx,
                    force_channels=enc.force_channels,
                    user_bandwidth=enc.user_bandwidth,
                    max_bandwidth=enc.max_bandwidth,
                    signal_type=enc.signal_type,
                    lsb_depth=enc.lsb_depth)
        enc.__init__(enc.fs, enc.channels, enc.application)
        for k, val in keep.items():
            setattr(enc, k, val)
    else:
        raise NotImplementedError(f"request {request}")
    return None


OPUS_MULTISTREAM_GET_ENCODER_STATE = 5120
OPUS_MULTISTREAM_GET_DECODER_STATE = 5122


def multistream_encoder_ctl(ms, request: int, *args):
    """opus_multistream_encoder_ctl twin: per-stream requests forward
    to every elementary encoder; OPUS_MULTISTREAM_GET_ENCODER_STATE
    returns the selected sub-encoder (reference:
    src/opus_multistream_encoder.c:1112)."""
    if request == OPUS_MULTISTREAM_GET_ENCODER_STATE:
        _check(0 <= args[0] < len(ms.encoders))
        return ms.encoders[args[0]]
    if request == OPUS_SET_BITRATE:
        ms.bitrate = args[0]
        return None
    if request == OPUS_GET_BITRATE:
        return ms.bitrate
    out = None
    for e in ms.encoders:
        out = encoder_ctl(e, request, *args)
    return out


def multistream_decoder_ctl(ms, request: int, *args):
    """opus_multistream_decoder_ctl twin (reference:
    src/opus_multistream_decoder.c:391)."""
    if request == OPUS_MULTISTREAM_GET_DECODER_STATE:
        _check(0 <= args[0] < len(ms.decoders))
        return ms.decoders[args[0]]
    out = None
    for d in ms.decoders:
        out = decoder_ctl(d, request, *args)
    return out


def decoder_ctl(dec, request: int, *args):
    """opus_decoder_ctl twin (reference: src/opus_decoder.c:1049)."""
    v = args[0] if args else None
    if request == OPUS_GET_BANDWIDTH:
        return 0 if dec.bandwidth == 0 else _ENUM_TO_BW[dec.bandwidth]
    elif request == OPUS_GET_FINAL_RANGE:
        return dec.rangeFinal
    elif request == OPUS_GET_SAMPLE_RATE:
        return dec.fs
    elif request == OPUS_GET_PITCH:
        if dec.prev_mode == pkt.Mode.CELT_ONLY:
            return dec.celt.postfilter_period
        return dec.silk.prev_pitch_lag if dec.prev_mode else 0
    elif request == OPUS_SET_GAIN:
        _check(-32768 <= v <= 32767)
        dec.decode_gain = v
    elif request == OPUS_GET_GAIN:
        return dec.decode_gain
    elif request == OPUS_GET_LAST_PACKET_DURATION:
        return dec.last_packet_duration
    elif request == OPUS_GET_IN_DTX:
        # decoder-side DTX state: last packet was DTX-suppressed/empty
        return int(dec.prev_mode != 0
                   and getattr(dec, "last_packet_empty", False))
    elif request == OPUS_RESET_STATE:
        gain = dec.decode_gain
        dec.__init__(dec.fs, dec.channels)
        dec.decode_gain = gain   # gain survives reset (opus_decoder.c)
    else:
        raise NotImplementedError(f"request {request}")
    return None

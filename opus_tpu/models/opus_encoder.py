"""Top-level Opus encoder (reference: src/opus_encoder.c).

Implements the mode/bandwidth decision machine (opus_encode_native
src/opus_encoder.c:1182), the HP prefilters (hp_cutoff :441 /
dc_reject :509), the SILK/CELT orchestration with hybrid glue and
mode-transition redundancy frames (opus_encode_frame_native :1855),
DTX, and CBR padding.

At complexity>=7 the tonality analyzer (models/analysis.py, trained
weights from the reference tree) drives voice_est, the detected
bandwidth cap, and the CELT-side trim/dynalloc/VBR boosts; below that
voice_est falls back to the application-based heuristic.
"""

from __future__ import annotations

import math

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.range_coder import RangeEncoder, ec_tell
from ..celt.encoder import CeltEncoder, OPUS_BITRATE_MAX
from ..silk.encoder import SilkEncoder
from ..silk import tables as ST
from ..silk.macros import (SMLAWB, SMULWB, SMULBB, lin2log, log2lin,
                           SILK_FIX_CONST)

# (reference: silk/tuning_parameters.h:62-68)
VARIABLE_HP_SMTH_COEF1 = 0.1
VARIABLE_HP_SMTH_COEF2 = 0.015
VARIABLE_HP_MAX_DELTA_FREQ = 0.4
VARIABLE_HP_MIN_CUTOFF_HZ = 60
VARIABLE_HP_MAX_CUTOFF_HZ = 100

MODE_SILK_ONLY = pkt.Mode.SILK_ONLY
MODE_HYBRID = pkt.Mode.HYBRID
MODE_CELT_ONLY = pkt.Mode.CELT_ONLY

BW_NB = pkt.Bandwidth.NARROWBAND
BW_MB = pkt.Bandwidth.MEDIUMBAND
BW_WB = pkt.Bandwidth.WIDEBAND
BW_SWB = pkt.Bandwidth.SUPERWIDEBAND
BW_FB = pkt.Bandwidth.FULLBAND

_ENDBAND = {BW_NB: 13, BW_MB: 17, BW_WB: 17, BW_SWB: 19, BW_FB: 21}

# (reference: src/opus_encoder.c:146-190)
MONO_VOICE_BW_THRESHOLDS = (9000, 700, 9000, 700, 13500, 1000, 14000, 2000)
MONO_MUSIC_BW_THRESHOLDS = (9000, 700, 9000, 700, 11000, 1000, 12000, 2000)
STEREO_VOICE_BW_THRESHOLDS = (9000, 700, 9000, 700, 13500, 1000, 14000, 2000)
STEREO_MUSIC_BW_THRESHOLDS = (9000, 700, 9000, 700, 11000, 1000, 12000, 2000)
STEREO_VOICE_THRESHOLD = 19000
STEREO_MUSIC_THRESHOLD = 17000
MODE_THRESHOLDS = ((64000, 10000), (44000, 10000))  # [mono/stereo][voice/music]

_BW_ORDER = [BW_NB, BW_MB, BW_WB, BW_SWB, BW_FB]


def bitrate_to_bits(bitrate, fs, frame_size):
    return bitrate * frame_size // fs


def bits_to_bitrate(bits, fs, frame_size):
    return bits * fs // frame_size


def compute_equiv_rate(bitrate, channels, frame_rate, vbr, mode, complexity,
                       loss):
    """(reference: compute_equiv_rate src/opus_encoder.c:1027)"""
    equiv = bitrate
    if frame_rate > 50:
        equiv -= (40 * channels + 20) * (frame_rate - 50)
    if not vbr:
        equiv -= equiv // 12
    equiv = equiv * (90 + complexity) // 100
    if mode in (MODE_SILK_ONLY, MODE_HYBRID):
        if complexity < 2:
            equiv = equiv * 4 // 5
        equiv -= equiv * loss // (6 * loss + 10)
    elif mode == MODE_CELT_ONLY:
        if complexity < 5:
            equiv = equiv * 9 // 10
    else:
        equiv -= equiv * loss // (12 * loss + 20)
    return equiv


_FEC_THRESHOLDS = (  # (rate_bps, hysteresis) per bandwidth NB..FB
    (12000, 1000), (14000, 1000), (16000, 1000), (20000, 1000),
    (22000, 1000))


def decide_fec(use_inband_fec, packet_loss_perc, last_fec, mode, bandwidth,
               rate):
    """Whether to code LBRR this packet; may lower the bandwidth to make
    room for it at high loss rates.  Returns (lbrr_coded, bandwidth)
    (reference: decide_fec src/opus_encoder.c:940)."""
    if not use_inband_fec or packet_loss_perc == 0 \
            or mode == MODE_CELT_ONLY:
        return 0, bandwidth
    orig_bandwidth = bandwidth
    while True:
        bw_idx = _BW_ORDER.index(bandwidth)
        thres, hysteresis = _FEC_THRESHOLDS[bw_idx]
        if last_fec == 1:
            thres -= hysteresis
        elif last_fec == 0:
            thres += hysteresis
        thres = (thres * (125 - min(packet_loss_perc, 25))
                 * 655) >> 16  # SMULWB(x, 0.01 in Q16)
        if rate > thres:
            return 1, bandwidth
        if packet_loss_perc <= 5:
            return 0, bandwidth
        if bw_idx > 0:
            bandwidth = _BW_ORDER[bw_idx - 1]
        else:
            return 0, orig_bandwidth


def compute_silk_rate_for_hybrid(rate, bandwidth, frame20ms, vbr, fec,
                                 channels):
    """(reference: compute_silk_rate_for_hybrid src/opus_encoder.c:973)"""
    table = ((0, 0, 0, 0, 0),
             (12000, 10000, 10000, 11000, 11000),
             (16000, 13500, 13500, 15000, 15000),
             (20000, 16000, 16000, 18000, 18000),
             (24000, 18000, 18000, 21000, 21000),
             (32000, 22000, 22000, 28000, 28000),
             (64000, 38000, 38000, 50000, 50000))
    rate //= channels
    entry = 1 + int(frame20ms) + 2 * int(fec)
    n = len(table)
    i = 1
    while i < n and table[i][0] <= rate:
        i += 1
    if i == n:
        silk_rate = table[-1][entry] + (rate - table[-1][0]) // 2
    else:
        lo, hi = table[i - 1][entry], table[i][entry]
        x0, x1 = table[i - 1][0], table[i][0]
        silk_rate = (lo * (x1 - rate) + hi * (rate - x0)) // (x1 - x0)
    if not vbr:
        silk_rate += 100
    if bandwidth == BW_SWB:
        silk_rate += 300
    silk_rate *= channels
    if channels == 2 and rate >= 12000:
        silk_rate -= 1000
    return silk_rate


def compute_redundancy_bytes(max_data_bytes, bitrate_bps, frame_rate,
                             channels):
    """(reference: compute_redundancy_bytes src/opus_encoder.c:1142)"""
    base_bits = 40 * channels + 20
    redundancy_rate = bitrate_bps + base_bits * (200 - frame_rate)
    redundancy_rate = 3 * redundancy_rate // 2
    redundancy_bytes = redundancy_rate // 1600
    available_bits = max_data_bytes * 8 - 2 * base_bits
    cap = (available_bits * 240 // (240 + 48000 // frame_rate)
           + base_bits) // 8
    redundancy_bytes = min(redundancy_bytes, cap)
    if redundancy_bytes > 4 + 8 * channels:
        return min(257, redundancy_bytes)
    return 0


def hp_cutoff(x, cutoff_hz, hp_mem, fs, channels):
    """Variable 2nd-order HP (reference: hp_cutoff src/opus_encoder.c:441).
    x: float [-1,1]-domain interleaved; filter runs in int16-scaled float
    like the reference float build.  Returns filtered array."""
    fc = 1.5 * 3.14159 * cutoff_hz / fs
    r = 1.0 - 0.92 * fc
    b0, b1, b2 = r, -2.0 * r, r
    a1 = r * (fc * fc - 2.0)     # feedback coefs of 1 + a1 z^-1 + a2 z^-2
    a2 = r * r
    out = np.empty_like(x)
    for c in range(channels):
        s0, s1 = hp_mem[2 * c], hp_mem[2 * c + 1]
        xc = x[c::channels]
        yc = out[c::channels]
        for i in range(len(xc)):
            xi = xc[i]
            y = b0 * xi + s0
            s0 = s1 + b1 * xi - a1 * y
            s1 = b2 * xi - a2 * y
            yc[i] = y
        hp_mem[2 * c], hp_mem[2 * c + 1] = s0, s1
    return out


def dc_reject(x, cutoff_hz, hp_mem, fs, channels):
    """1st-order DC reject (reference: dc_reject src/opus_encoder.c:509,
    float build)."""
    coef = 6.3 * cutoff_hz / fs
    coef2 = 1 - coef
    out = np.empty_like(x)
    for c in range(channels):
        m = hp_mem[2 * c]
        xc = x[c::channels]
        # y[i] = x[i] - m[i];  m[i+1] = coef*x[i] + coef2*m[i]
        # the recursion on m is a 1-pole IIR -> compute via lfilter-style scan
        yc = np.empty_like(xc)
        for i in range(len(xc)):
            yc[i] = xc[i] - m
            m = coef * xc[i] + 1e-30 + coef2 * m
        out[c::channels] = yc
        hp_mem[2 * c] = m
    return out


def is_digital_silence(pcm, lsb_depth=16):
    """(reference: is_digital_silence src/opus_encoder.c:1060)"""
    if len(pcm) == 0:
        return True
    return float(np.max(np.abs(pcm))) <= 2 ** (-lsb_depth + 1)


class OpusEncoder:
    """(reference: opus_encoder_init src/opus_encoder.c:204)"""

    APPLICATIONS = ("voip", "audio", "restricted-lowdelay")

    def __init__(self, fs: int, channels: int, application: str = "audio"):
        if fs not in (8000, 12000, 16000, 24000, 48000, 96000):
            raise ValueError("bad sample rate")
        if channels not in (1, 2):
            raise ValueError("bad channel count")
        if application not in self.APPLICATIONS:
            raise ValueError("bad application")
        self.fs = fs
        self.channels = channels
        self.application = application
        self.celt = CeltEncoder.create(fs, channels)
        self.silk = SilkEncoder()
        self.bitrate = None  # auto
        self.vbr = 1
        self.constrained_vbr = 1
        self.complexity = 9
        self.packet_loss_perc = 0
        self.use_inband_fec = False
        self.lbrr_coded = 0
        self.use_dtx = 0
        self.force_channels = 0     # OPUS_AUTO
        self.user_bandwidth = None  # auto
        self.max_bandwidth = BW_FB
        self.user_forced_mode = None
        self.signal_type = None     # None=auto, 'voice', 'music'
        self.lsb_depth = 16

        # state (reference: opus_encoder_init)
        self.delay_compensation = fs // 250
        self.encoder_buffer = fs // 100
        self.delay_buffer = np.zeros(self.encoder_buffer * channels)
        self.hp_mem = np.zeros(4)
        self.variable_HP_smth2_Q15 = lin2log(VARIABLE_HP_MIN_CUTOFF_HZ) << 8
        self.prev_mode = 0
        self.prev_channels = channels
        self.prev_framesize = 0
        self.first = 1
        self.auto_bandwidth = BW_FB
        self.bandwidth = BW_FB
        self.silk_bw_switch = 0
        self.prev_HB_gain = 1.0
        self.hybrid_stereo_width_Q14 = 1 << 14
        self.nb_no_activity_ms_Q1 = 0
        self.rangeFinal = 0
        self.nonfinal_frame = 0
        self.peak_signal_energy = 0.0
        # DRED deep redundancy (reference: ENABLE_DRED regions,
        # src/opus_encoder.c:2028-2041, :2604-2644)
        self.dred = None
        self.dred_duration = 0
        self.activity_mem = None
        # tonality analysis (reference: st->analysis, st->voice_ratio)
        self.analysis = None
        self.voice_ratio = -1
        self.detected_bandwidth = 0
        self.energy_mask = None

    # -- ctl-style setters ------------------------------------------------
    def set_bitrate(self, bitrate):
        self.bitrate = bitrate

    def set_inband_fec(self, enabled):
        """OPUS_SET_INBAND_FEC (reference: src/opus_encoder.c:2966);
        LBRR is actually coded only when decide_fec() agrees."""
        self.use_inband_fec = bool(enabled)

    def set_packet_loss_perc(self, perc):
        """OPUS_SET_PACKET_LOSS_PERC (reference: opus_defines.h:282)."""
        if not 0 <= perc <= 100:
            raise ValueError("packet loss must be in [0, 100]")
        self.packet_loss_perc = perc

    def set_vbr(self, vbr, constrained=True):
        self.vbr = 1 if vbr else 0
        self.constrained_vbr = 1 if constrained else 0

    def set_complexity(self, c):
        self.complexity = max(0, min(10, c))

    def set_bandwidth(self, bw):
        self.user_bandwidth = bw

    def set_force_mode(self, mode):
        self.user_forced_mode = mode

    def set_jax_nsq(self, enabled: bool) -> None:
        """Route SILK's delayed-decision NSQ through the beam-vectorized
        jax core (bit-exact; the TPU production path)."""
        self.silk.set_jax_nsq(enabled)

    def set_qext(self, enabled: int) -> None:
        """Enable the quality extensions for CELT-only frames
        (reference: OPUS_SET_QEXT src/opus_encoder.c:3221)."""
        self.enable_qext = 1 if enabled else 0

    def set_energy_mask(self, mask) -> None:
        """Per-band surround masking from the multistream encoder
        (reference: OPUS_SET_ENERGY_MASK opus_private.h)."""
        self.energy_mask = mask

    def enable_dred(self, enc_model, pitch_model, stats,
                    duration_frames_10ms: int):
        """Attach DRED (reference: OPUS_SET_DRED_DURATION
        opus_defines.h + dred_encoder_init).  duration in 10 ms
        frames, up to 100 (1 second)."""
        from ..dnn.dred_enc import DREDEnc
        from ..dnn import dred as dredmod
        import numpy as _np
        if not 0 <= duration_frames_10ms <= 104:
            raise ValueError("bad DRED duration")
        self.dred = DREDEnc(self.fs, self.channels, enc_model,
                            pitch_model, stats)
        self.dred_duration = duration_frames_10ms
        self.activity_mem = _np.zeros(4 * dredmod.DRED_MAX_FRAMES,
                                      _np.uint8)

    def _attach_dred(self, packet: bytes, max_data_bytes: int) -> bytes:
        """Build and append the DRED extension payload (reference:
        src/opus_encoder.c:2604-2644)."""
        from ..dnn import dred as dredmod
        from ..dnn.dred_dec import DRED_EXPERIMENTAL_BYTES
        from ..bitstream.repacketizer import Repacketizer
        from ..bitstream.extensions import ExtensionData
        dred_chunks = min((self.dred_duration + 5) // 4,
                          dredmod.DRED_NUM_REDUNDANCY_FRAMES // 2)
        dred_bytes_left = min(dredmod.DRED_MAX_DATA_SIZE,
                              max_data_bytes - len(packet) - 3)
        dred_bytes_left -= (dred_bytes_left + 1
                            + DRED_EXPERIMENTAL_BYTES) // 255
        if dred_chunks < 1 or dred_bytes_left < \
                dredmod.DRED_MIN_BYTES + DRED_EXPERIMENTAL_BYTES:
            return packet
        # q0/dQ from rate (reference: compute_dred_bitrate :710-712)
        bitrate = self._resolve_bitrate(
            self.prev_framesize or self.fs // 50, max_data_bytes)
        rate_off = bitrate - 12000
        q0 = min(15, max(4, 51 - 3 * max(1, rate_off).bit_length()))
        dq = 3 if rate_off > 36000 else 5
        payload = self.dred.encode_payload(
            self.activity_mem, dred_chunks,
            dred_bytes_left - DRED_EXPERIMENTAL_BYTES, q0=q0, dq=dq)
        if payload is None:
            return packet
        ext = ExtensionData(
            id=dredmod.DRED_EXTENSION_ID, frame=0,
            data=bytes([ord('D'), dredmod.DRED_EXPERIMENTAL_VERSION])
            + payload)
        rp = Repacketizer()
        if rp.cat(packet) != 0:
            return packet
        out = rp.out_range(0, rp.nb_frames, max_data_bytes,
                           pad=not self.vbr, extensions=[ext])
        return out if isinstance(out, bytes) else packet

    def _default_bitrate(self, frame_size):
        # (reference: user_bitrate_to_bitrate, OPUS_AUTO case)
        return 60 * self.fs // frame_size + self.fs * self.channels

    def _resolve_bitrate(self, frame_size, max_data_bytes):
        """(reference: user_bitrate_to_bitrate src/opus_encoder.c:787):
        None = OPUS_AUTO, -1 = OPUS_BITRATE_MAX (fill the buffer)."""
        if self.bitrate is None:
            return self._default_bitrate(frame_size)
        if self.bitrate == OPUS_BITRATE_MAX:
            return max_data_bytes * 8 * self.fs // frame_size
        return self.bitrate

    # -- main entry -------------------------------------------------------
    def encode24(self, pcm: np.ndarray, frame_size: int,
                 max_data_bytes: int = 1276) -> bytes:
        """24-bit encode API: int32 samples in 24-bit scale (reference:
        opus_encode24 include/opus.h:302; INT24TORES(a) = a/(32768*256),
        celt/arch.h:377)."""
        pcm = np.asarray(pcm, dtype=np.int64)
        return self.encode(pcm.astype(np.float64) / 8388608.0,
                           frame_size, max_data_bytes)

    def encode(self, pcm: np.ndarray, frame_size: int,
               max_data_bytes: int = 1276) -> bytes:
        """pcm: float interleaved [-1,1], frame_size samples per channel.
        Returns the Opus packet (b'' when DTX suppresses the frame)."""
        pcm = np.asarray(pcm, dtype=np.float64).reshape(-1)
        if len(pcm) != frame_size * self.channels:
            raise ValueError("pcm length mismatch")
        ms = 1000 * frame_size // self.fs
        if frame_size * 400 not in (self.fs * 1, self.fs * 2, self.fs * 4,
                                    self.fs * 8, self.fs * 16, self.fs * 24,
                                    self.fs * 32, self.fs * 40,
                                    self.fs * 48):
            raise ValueError(f"unsupported frame size {frame_size}")
        starved = self._starved_early_out(frame_size, max_data_bytes)
        if starved is not None:
            return starved
        if ms <= 20:
            return self._encode_frame(pcm, frame_size, max_data_bytes)
        silk_mode = self._long_frame_mode_is_silk(frame_size,
                                                  max_data_bytes)
        if ms <= 60 and silk_mode:
            # 40/60 ms SILK-only: one code-0 packet, SILK's internal
            # multiframe support carries 2-3 20 ms frames
            return self._encode_frame(pcm, frame_size, max_data_bytes,
                                      force_silk=True)
        return self._encode_split(pcm, frame_size, max_data_bytes,
                                  silk_mode)

    def _starved_early_out(self, frame_size, max_data_bytes):
        """Emit a TOC-only 'PLC' packet when the byte budget is too low
        to code anything useful (reference: src/opus_encoder.c:1341-1406).
        Returns the packet, or None when the budget is workable."""
        fs = self.fs
        frame_rate = fs // frame_size
        bitrate = self._resolve_bitrate(frame_size, max_data_bytes)
        bitrate = max(500, min(300000 * self.channels, bitrate))
        if not self.vbr:
            cbr_bytes = min((bitrate + 4 * frame_rate)
                            // (8 * frame_rate), max_data_bytes)
            bitrate = cbr_bytes * 8 * frame_rate
            max_data_bytes = max(1, cbr_bytes)
        if not (max_data_bytes < 3 or bitrate < 3 * frame_rate * 8
                or (frame_rate < 50
                    and (max_data_bytes * frame_rate < 300
                         or bitrate < 2400))):
            return None
        tocmode = self.prev_mode
        bw = self.bandwidth if self.bandwidth else BW_NB
        packet_code = 0
        num_multiframes = 0
        if tocmode == 0:
            tocmode = MODE_SILK_ONLY
        if frame_rate > 100:
            tocmode = MODE_CELT_ONLY
        if frame_rate == 25 and tocmode != MODE_SILK_ONLY:
            frame_rate = 50
            packet_code = 1
        if frame_rate <= 16:
            if max_data_bytes == 1 \
                    or (tocmode == MODE_SILK_ONLY and frame_rate != 10):
                tocmode = MODE_SILK_ONLY
                packet_code = 1 if frame_rate <= 12 else 0
                frame_rate = 25 if frame_rate == 12 else 16
            else:
                num_multiframes = 50 // frame_rate
                frame_rate = 50
                packet_code = 3
        if tocmode == MODE_SILK_ONLY and bw > BW_WB:
            bw = BW_WB
        elif tocmode == MODE_CELT_ONLY and bw == BW_MB:
            bw = BW_NB
        elif tocmode == MODE_HYBRID and bw <= BW_SWB:
            bw = BW_SWB
        toc = pkt.gen_toc(tocmode, frame_rate, bw,
                          self.prev_channels) | packet_code
        packet = bytes([toc])
        if packet_code == 3:
            packet += bytes([num_multiframes])
        self.rangeFinal = 0
        if not self.vbr:
            packet = pkt.packet_pad(packet, max(max_data_bytes,
                                                len(packet)))
        return packet

    def _long_frame_mode_is_silk(self, frame_size, max_data_bytes) -> bool:
        """Whether a >20 ms frame will be coded as SILK (reference: the
        st->mode decision feeding frame_size_select and the split loop,
        src/opus_encoder.c:1692-1724)."""
        if self.application == "restricted-lowdelay" \
                or self.user_forced_mode == MODE_CELT_ONLY:
            return False
        if self.user_forced_mode == MODE_SILK_ONLY:
            return True
        bitrate = self._resolve_bitrate(frame_size, max_data_bytes)
        # rough equivalent of the threshold machine: long frames are
        # only useful at low rates, where SILK wins for speech apps
        return bitrate <= (36000 if self.application == "voip" else 28000)

    def _encode_split(self, pcm, frame_size, max_data_bytes, silk_mode):
        """Split a long frame into 20-60 ms pieces and merge them into one
        code-2/3 packet via the repacketizer (reference: the split loop
        src/opus_encoder.c:1699-1840)."""
        from ..bitstream.repacketizer import Repacketizer
        fs = self.fs
        ch = self.channels
        if silk_mode:
            if frame_size == 2 * fs // 25:       # 80 ms -> 2x 40 ms
                enc_frame = fs // 25
            elif frame_size == 3 * fs // 25:     # 120 ms -> 2x 60 ms
                enc_frame = 3 * fs // 50
            else:                                # 100 ms -> 5x 20 ms
                enc_frame = fs // 50
        else:
            enc_frame = fs // 50
        nb = frame_size // enc_frame
        max_header = 3 if nb == 2 else 2 + (nb - 1) * 2
        bitrate = self._resolve_bitrate(frame_size, max_data_bytes)
        if self.vbr:
            repacketize_len = max_data_bytes
        else:
            cbr_bytes = bitrate * frame_size // (8 * fs)
            repacketize_len = min(cbr_bytes, max_data_bytes)
        max_len_sum = nb + repacketize_len - max_header
        rp = Repacketizer()
        # DTX inside a multiframe packet needs TOC-only subframes the
        # scalar API does not emit; hold DTX off for the pieces
        dtx_bak = self.use_dtx
        self.use_dtx = False
        # every subframe must share one TOC config: pin mode, bandwidth
        # and channel count to the first subframe's decision (reference:
        # the bak_mode/bak_bandwidth save + user_forced_mode pinning
        # around the split loop, src/opus_encoder.c:1735-1840)
        bak_mode = self.user_forced_mode
        bak_bw = self.user_bandwidth
        bak_fc = self.force_channels
        try:
            tot = 0
            for i in range(nb):
                curr_max = min(bitrate * enc_frame // (8 * fs),
                               max_len_sum // nb, max_len_sum - tot)
                p = self._encode_frame(
                    pcm[i * ch * enc_frame:(i + 1) * ch * enc_frame],
                    enc_frame, max(curr_max, 2),
                    force_silk=silk_mode)
                if i == 0 and len(p) >= 1:
                    self.user_forced_mode = pkt.packet_get_mode(p)
                    self.user_bandwidth = pkt.packet_get_bandwidth(p)
                    self.force_channels = pkt.packet_get_nb_channels(p)
                if rp.cat(p) < 0:
                    raise RuntimeError("repacketizer rejected subframe")
                tot += len(p)
        finally:
            self.use_dtx = dtx_bak
            self.user_forced_mode = bak_mode
            self.user_bandwidth = bak_bw
            self.force_channels = bak_fc
        out = rp.out_range(0, nb, repacketize_len, pad=not self.vbr)
        if isinstance(out, int):
            raise RuntimeError(f"repacketize failed ({out})")
        return bytes(out)

    # -- the frame encoder ------------------------------------------------
    def _encode_frame(self, pcm, frame_size, max_data_bytes,
                      force_silk=False):
        fs = self.fs
        channels = self.channels
        frame_rate = fs // frame_size
        max_data_bytes = min(max_data_bytes, 1276)
        bitrate = self._resolve_bitrate(frame_size, max_data_bytes)
        bitrate = max(500, min(300000 * channels, bitrate))
        if not self.vbr:
            # CBR: the packet size IS the byte budget (reference
            # opus_encode_native src/opus_encoder.c:~1240)
            cbr_bytes = min((bitrate + 4 * frame_rate) // (8 * frame_rate),
                            max_data_bytes)
            bitrate = cbr_bytes * 8 * frame_rate
            max_data_bytes = cbr_bytes
        max_rate = (frame_rate * max_data_bytes * 8 if not self.vbr
                    else bitrate)

        silence = is_digital_silence(pcm, self.lsb_depth)

        # tonality analysis (reference: run_analysis call :1253-1259,
        # consumers :1279-1304; runs at complexity>=7 on >=16 kHz input)
        analysis_info = None
        if self.complexity >= 7 and 16000 <= fs <= 48000 \
                and self.application != "restricted-lowdelay" \
                and not silence:
            from .analysis import TonalityAnalysisState, run_analysis
            if self.analysis is None:
                self.analysis = TonalityAnalysisState(fs)
            analysis_info = run_analysis(
                self.analysis, np.asarray(pcm, np.float64), frame_size,
                frame_size, 0, -2 if channels == 2 else -1, channels,
                self.lsb_depth)
            if analysis_info.valid:
                if self.signal_type is None:
                    if self.prev_mode == 0:
                        prob = analysis_info.music_prob
                    elif self.prev_mode == MODE_CELT_ONLY:
                        prob = analysis_info.music_prob_max
                    else:
                        prob = analysis_info.music_prob_min
                    self.voice_ratio = int(
                        math.floor(0.5 + 100 * (1 - prob)))
                ab = analysis_info.bandwidth
                self.detected_bandwidth = (
                    BW_NB if ab <= 12 else BW_MB if ab <= 14
                    else BW_WB if ab <= 16 else BW_SWB if ab <= 18
                    else BW_FB)
            else:
                analysis_info = None

        # voice estimate (reference :1412-1426)
        if self.signal_type == "voice":
            voice_est = 127
        elif self.signal_type == "music":
            voice_est = 0
        elif self.voice_ratio >= 0:
            voice_est = (self.voice_ratio * 327) >> 8
            if self.application == "audio":
                voice_est = min(voice_est, 115)
        elif self.application == "voip":
            voice_est = 115
        else:
            voice_est = 48

        stream_channels = self.channels
        if channels == 2 and self.force_channels != 2:
            stereo_threshold = STEREO_MUSIC_THRESHOLD + (
                (voice_est * voice_est
                 * (STEREO_VOICE_THRESHOLD - STEREO_MUSIC_THRESHOLD)) >> 14)
            equiv0 = compute_equiv_rate(bitrate, channels, frame_rate,
                                        self.vbr, 0, self.complexity,
                                        self.packet_loss_perc)
            stream_channels = 2 if equiv0 > stereo_threshold else 1
            # SILK stereo coding not wired yet: keep 2ch only for CELT
        equiv_rate = compute_equiv_rate(bitrate, stream_channels, frame_rate,
                                        self.vbr, 0, self.complexity,
                                        self.packet_loss_perc)

        # ---- mode decision (reference :1466-1527) ----
        if force_silk:
            mode = MODE_SILK_ONLY
        elif self.application == "restricted-lowdelay":
            mode = MODE_CELT_ONLY
        elif self.user_forced_mode is not None:
            mode = self.user_forced_mode
        else:
            stereo_width = 0.0 if stream_channels == 1 else 1.0
            mode_voice = int((1 - stereo_width) * MODE_THRESHOLDS[0][0]
                             + stereo_width * MODE_THRESHOLDS[1][0])
            mode_music = int((1 - stereo_width) * MODE_THRESHOLDS[1][1]
                             + stereo_width * MODE_THRESHOLDS[1][1])
            threshold = mode_music + (
                (voice_est * voice_est * (mode_voice - mode_music)) >> 14)
            if self.application == "voip":
                threshold += 8000
            if self.prev_mode == MODE_CELT_ONLY:
                threshold -= 4000
            elif self.prev_mode > 0:
                threshold += 4000
            mode = MODE_CELT_ONLY if equiv_rate >= threshold \
                else MODE_SILK_ONLY
            if max_data_bytes < bitrate_to_bits(
                    9000 if frame_rate > 50 else 6000, fs, frame_size) // 8:
                mode = MODE_CELT_ONLY

        if mode != MODE_CELT_ONLY and frame_size < fs // 100:
            mode = MODE_CELT_ONLY

        # mode-transition redundancy (reference :1542-1559)
        redundancy = 0
        celt_to_silk = 0
        to_celt = 0
        prefill = 0
        if self.prev_mode > 0 and (
                (mode != MODE_CELT_ONLY and self.prev_mode == MODE_CELT_ONLY)
                or (mode == MODE_CELT_ONLY
                    and self.prev_mode != MODE_CELT_ONLY)):
            redundancy = 1
            celt_to_silk = int(mode != MODE_CELT_ONLY)
            if not celt_to_silk:
                if frame_size >= fs // 100:
                    mode = self.prev_mode
                    to_celt = 1
                else:
                    redundancy = 0

        equiv_rate = compute_equiv_rate(bitrate, stream_channels, frame_rate,
                                        self.vbr, mode, self.complexity,
                                        self.packet_loss_perc)
        if mode != MODE_CELT_ONLY and self.prev_mode == MODE_CELT_ONLY:
            # fresh state like silk_InitEncoder, keeping the NSQ routing
            self.silk = SilkEncoder(
                use_jax_nsq=getattr(self.silk.channel, "use_jax_nsq",
                                    False))
            prefill = 1

        # ---- bandwidth decision (reference :1575-1656) ----
        if mode == MODE_CELT_ONLY or self.first or True:
            if channels == 2 and self.force_channels != 1:
                voice_bw = STEREO_VOICE_BW_THRESHOLDS
                music_bw = STEREO_MUSIC_BW_THRESHOLDS
            else:
                voice_bw = MONO_VOICE_BW_THRESHOLDS
                music_bw = MONO_MUSIC_BW_THRESHOLDS
            thr = [music_bw[i] + ((voice_est * voice_est
                                   * (voice_bw[i] - music_bw[i])) >> 14)
                   for i in range(8)]
            bw_idx = 4  # FB
            while bw_idx > 0:
                threshold = thr[2 * (bw_idx - 1)]
                hysteresis = thr[2 * (bw_idx - 1) + 1]
                if not self.first:
                    if _BW_ORDER.index(self.auto_bandwidth) >= bw_idx:
                        threshold -= hysteresis
                    else:
                        threshold += hysteresis
                if equiv_rate >= threshold:
                    break
                bw_idx -= 1
            bandwidth = _BW_ORDER[bw_idx]
            if bandwidth == BW_MB:
                bandwidth = BW_WB
            self.bandwidth = self.auto_bandwidth = bandwidth

        if self.bandwidth > self.max_bandwidth:
            self.bandwidth = self.max_bandwidth
        if self.user_bandwidth is not None:
            self.bandwidth = self.user_bandwidth
        if mode != MODE_CELT_ONLY and max_rate < 15000:
            self.bandwidth = min(self.bandwidth, BW_WB)
        if fs <= 24000 and self.bandwidth > BW_SWB:
            self.bandwidth = BW_SWB
        if fs <= 16000 and self.bandwidth > BW_WB:
            self.bandwidth = BW_WB
        if fs <= 12000 and self.bandwidth > BW_MB:
            self.bandwidth = BW_MB
        if fs <= 8000 and self.bandwidth > BW_NB:
            self.bandwidth = BW_NB
        if mode == MODE_CELT_ONLY and self.bandwidth == BW_MB:
            self.bandwidth = BW_WB

        # detected-bandwidth cap (reference :1653-1673)
        if self.detected_bandwidth and self.user_bandwidth is None:
            if equiv_rate <= 18000 * stream_channels \
                    and mode == MODE_CELT_ONLY:
                min_bw = BW_NB
            elif equiv_rate <= 24000 * stream_channels \
                    and mode == MODE_CELT_ONLY:
                min_bw = BW_MB
            elif equiv_rate <= 30000 * stream_channels:
                min_bw = BW_WB
            elif equiv_rate <= 44000 * stream_channels:
                min_bw = BW_SWB
            else:
                min_bw = BW_FB
            detected = max(self.detected_bandwidth, min_bw)
            self.bandwidth = min(self.bandwidth, detected)

        # in-band FEC decision (reference: src/opus_encoder.c:1675)
        self.lbrr_coded, self.bandwidth = decide_fec(
            self.use_inband_fec, self.packet_loss_perc, self.lbrr_coded,
            mode, self.bandwidth, equiv_rate)

        curr_bandwidth = self.bandwidth
        if mode == MODE_SILK_ONLY and curr_bandwidth > BW_WB:
            mode = MODE_HYBRID
        if mode == MODE_HYBRID and curr_bandwidth <= BW_WB:
            mode = MODE_SILK_ONLY
        if force_silk:
            mode = MODE_SILK_ONLY
            curr_bandwidth = self.bandwidth = min(curr_bandwidth, BW_WB)

        # hybrid/celt can't exceed 20 ms (handled by _encode_long)
        assert not (frame_size > fs // 50 and mode != MODE_SILK_ONLY)

        # feed the analyzer output to CELT (reference: CELT_SET_ANALYSIS
        # ctl at :2418-2425)
        self.celt.analysis = analysis_info
        self.celt.energy_mask = self.energy_mask
        ret = self._encode_frame_native(
            pcm, frame_size, max_data_bytes, bitrate, mode, curr_bandwidth,
            stream_channels, redundancy, celt_to_silk, prefill, equiv_rate,
            to_celt, silence, voice_est)
        return ret

    def _encode_frame_native(self, pcm, frame_size, max_data_bytes, bitrate,
                             mode, curr_bandwidth, stream_channels,
                             redundancy, celt_to_silk, prefill, equiv_rate,
                             to_celt, is_silence, voice_est):
        """(reference: opus_encode_frame_native src/opus_encoder.c:1855)"""
        fs = self.fs
        channels = self.channels
        frame_rate = fs // frame_size
        celt = self.celt
        delay_compensation = (0 if self.application == "restricted-lowdelay"
                              else self.delay_compensation)
        total_buffer = delay_compensation

        redundancy_bytes = 0
        if mode == MODE_CELT_ONLY:
            redundancy = 0
        if redundancy:
            redundancy_bytes = compute_redundancy_bytes(
                max_data_bytes, bitrate, frame_rate, stream_channels)
            if redundancy_bytes == 0:
                redundancy = 0

        bits_target = min(8 * (max_data_bytes - redundancy_bytes),
                          bitrate_to_bits(bitrate, fs, frame_size)) - 8

        enc = RangeEncoder(max_data_bytes - 1)

        pcm_buf = np.zeros((total_buffer + frame_size) * channels)
        pcm_buf[:total_buffer * channels] = self.delay_buffer[
            (self.encoder_buffer - total_buffer) * channels:]

        # variable HP cutoff smoothing (reference :1966-1986)
        if mode == MODE_CELT_ONLY:
            hp_freq_smth1 = lin2log(VARIABLE_HP_MIN_CUTOFF_HZ) << 8
        else:
            hp_freq_smth1 = self.silk.channel.variable_HP_smth1_Q15
        self.variable_HP_smth2_Q15 = SMLAWB(
            self.variable_HP_smth2_Q15,
            hp_freq_smth1 - self.variable_HP_smth2_Q15,
            SILK_FIX_CONST(VARIABLE_HP_SMTH_COEF2, 16))
        cutoff_hz = log2lin(self.variable_HP_smth2_Q15 >> 8) >> 16

        if self.application == "voip":
            filtered = hp_cutoff(pcm, cutoff_hz, self.hp_mem, fs, channels)
        else:
            filtered = dc_reject(pcm, 3, self.hp_mem, fs, channels)
        # NaN/absurd-signal guard (reference :2009-2022; float-build PCM is
        # already in the [-1,1] domain, so the 1e9 threshold applies as-is)
        if not np.all(np.isfinite(filtered)) \
                or float(np.dot(filtered, filtered)) >= 1e9:
            filtered = np.zeros_like(filtered)
            self.hp_mem[:] = 0
        pcm_buf[total_buffer * channels:] = filtered

        # ---- SILK processing (reference :2048-2265) ----
        HB_gain = 1.0
        silk_internal_rate = 16000
        silk_bytes = 0
        activity = 1 if not is_silence else 0
        # DRED latents, before SILK because of DTX (reference :2028-2041)
        if self.dred is not None and self.dred_duration > 0:
            f400 = frame_size * 400 // fs
            self.dred.compute_latents(
                pcm_buf[total_buffer * channels:], frame_size,
                extra_delay=total_buffer)
            self.activity_mem[f400:] = self.activity_mem[:-f400].copy()
            self.activity_mem[:f400] = activity
        if mode != MODE_CELT_ONLY:
            total_bitrate = bits_to_bitrate(bits_target, fs, frame_size)
            if mode == MODE_HYBRID:
                silk_rate = compute_silk_rate_for_hybrid(
                    total_bitrate, curr_bandwidth, fs == 50 * frame_size,
                    self.vbr, 0, stream_channels)
                celt_rate = total_bitrate - silk_rate
                HB_gain = 1.0 - math.exp2(-celt_rate * (1.0 / 1024)) / 2.0
            else:
                silk_rate = total_bitrate

            if curr_bandwidth == BW_NB:
                silk_internal_rate = 8000
            elif curr_bandwidth == BW_MB:
                silk_internal_rate = 12000
            else:
                silk_internal_rate = 16000
            if mode == MODE_SILK_ONLY:
                eff_max = bits_to_bitrate(max_data_bytes * 8, fs, frame_size)
                if frame_rate > 50:
                    eff_max = eff_max * 2 // 3
                if eff_max < 8000:
                    silk_internal_rate = min(silk_internal_rate, 12000)
                if eff_max < 7000:
                    silk_internal_rate = min(silk_internal_rate, 8000)

            use_cbr = not self.vbr and mode != MODE_HYBRID
            silk_max_bits = (max_data_bytes - 1) * 8
            if redundancy and redundancy_bytes >= 2:
                silk_max_bits -= redundancy_bytes * 8 + 1
                if mode == MODE_HYBRID:
                    silk_max_bits -= 20
            if not self.vbr and mode == MODE_HYBRID:
                other_bits = max(
                    0, silk_max_bits - silk_rate * frame_size // fs)
                silk_max_bits = max(0, silk_max_bits - other_bits * 3 // 4)
                use_cbr = False
            elif self.vbr and mode == MODE_HYBRID:
                max_rate_for_bits = compute_silk_rate_for_hybrid(
                    silk_max_bits * fs // frame_size, curr_bandwidth,
                    fs == 50 * frame_size, self.vbr, 0, stream_channels)
                silk_max_bits = bitrate_to_bits(max_rate_for_bits, fs,
                                                frame_size)

            pcm_silk = pcm_buf[total_buffer * channels:]
            if channels == 2 and stream_channels == 1:
                # stereo API input coded as mono: downmix at the opus layer
                pcm_silk = 0.5 * (pcm_silk[0::2] + pcm_silk[1::2])
            pcm_silk16 = np.clip(np.round(pcm_silk * 32768.0),
                                 -32768, 32767).astype(np.int64)

            if prefill:
                # prime SILK state with the delay buffer (faded-in), coding
                # to a throwaway encoder (reference :2196-2214)
                pre = self.delay_buffer.copy()
                n400 = fs // 400
                off = channels * (self.encoder_buffer
                                  - delay_compensation - n400)
                ramp = np.linspace(0.0, 1.0, n400 * channels,
                                   endpoint=False)
                pre[off:off + n400 * channels] *= ramp
                pre[:off] = 0
                pre_m = (0.5 * (pre[0::2] + pre[1::2])
                         if channels == 2 else pre)
                pre16 = np.clip(np.round(pre_m * 32768.0),
                                -32768, 32767).astype(np.int64)
                dummy = RangeEncoder(1500)
                try:
                    self.silk.encode(
                        dummy, pre16, api_fs_hz=fs,
                        internal_fs_hz=silk_internal_rate,
                        payload_ms=1000 * len(pre16) * (1 if channels == 1
                                                        else 1) // fs,
                        bitrate_bps=silk_rate, max_bits=1500 * 8,
                        prefill=True)
                except Exception:
                    pass  # prefill is best-effort state priming

            payload_ms = 1000 * frame_size // fs
            silk_bytes = self.silk.encode(
                enc, pcm_silk16, api_fs_hz=fs,
                internal_fs_hz=silk_internal_rate,
                payload_ms=payload_ms, bitrate_bps=silk_rate,
                max_bits=silk_max_bits, use_cbr=use_cbr,
                complexity=self.complexity,
                packet_loss_perc=self.packet_loss_perc,
                n_channels=stream_channels,
                lbrr_coded=bool(self.lbrr_coded))

            if mode == MODE_SILK_ONLY:
                curr_bandwidth = {8000: BW_NB, 12000: BW_MB,
                                  16000: BW_WB}[silk_internal_rate]
            activity = int(self.silk.channel.indices.signalType
                           != ST.TYPE_NO_VOICE_ACTIVITY)

        # ---- CELT setup (reference :2267-2296) ----
        endband = _ENDBAND[curr_bandwidth]
        celt.end = endband
        celt.stream_channels = stream_channels
        celt.bitrate = OPUS_BITRATE_MAX
        celt.complexity = self.complexity

        tmp_prefill = None
        if mode != MODE_SILK_ONLY and mode != self.prev_mode \
                and self.prev_mode > 0:
            n400 = fs // 400
            tmp_prefill = self.delay_buffer[
                (self.encoder_buffer - total_buffer - n400) * channels:
                (self.encoder_buffer - total_buffer) * channels].copy()

        # update delay buffer (reference :2306-2315)
        if self.encoder_buffer > frame_size + total_buffer:
            keep = self.encoder_buffer - frame_size - total_buffer
            self.delay_buffer[:keep * channels] = \
                self.delay_buffer[frame_size * channels:
                                  (frame_size + keep) * channels]
            self.delay_buffer[keep * channels:] = pcm_buf[
                :(frame_size + total_buffer) * channels]
        else:
            self.delay_buffer[:] = pcm_buf[
                (frame_size + total_buffer - self.encoder_buffer)
                * channels:]

        # HB gain fade for hybrid (reference: gain_fade :2318-2323); a
        # linear ramp over the overlap then constant, applied to the CELT
        # input only (SILK already consumed its copy).
        if self.prev_HB_gain < 1.0 or HB_gain < 1.0:
            overlap = min(fs // 400, frame_size)
            g = np.concatenate([
                np.linspace(self.prev_HB_gain, HB_gain, overlap,
                            endpoint=False),
                np.full(total_buffer + frame_size - overlap, HB_gain)])
            for c in range(channels):
                pcm_buf[c::channels] *= g
        self.prev_HB_gain = HB_gain

        # ---- redundancy signaling (reference :2352-2377) ----
        if mode != MODE_CELT_ONLY and ec_tell(enc) + 17 \
                + 20 * (mode == MODE_HYBRID) <= 8 * (max_data_bytes - 1):
            if mode == MODE_HYBRID:
                enc.enc_bit_logp(redundancy, 12)
            if redundancy:
                enc.enc_bit_logp(celt_to_silk, 1)
                if mode == MODE_HYBRID:
                    max_redundancy = (max_data_bytes - 1) \
                        - ((ec_tell(enc) + 8 + 3 + 7) >> 3)
                else:
                    max_redundancy = (max_data_bytes - 1) \
                        - ((ec_tell(enc) + 7) >> 3)
                redundancy_bytes = min(max_redundancy, redundancy_bytes)
                redundancy_bytes = min(257, max(2, redundancy_bytes))
                if mode == MODE_HYBRID:
                    enc.enc_uint(redundancy_bytes - 2, 256)
        else:
            redundancy = 0

        if not redundancy:
            self.silk_bw_switch = 0
            redundancy_bytes = 0
        start_band = 17 if mode != MODE_CELT_ONLY else 0

        if mode == MODE_SILK_ONLY:
            ret = (ec_tell(enc) + 7) >> 3
            enc.done()
            nb_compr_bytes = ret
        else:
            nb_compr_bytes = (max_data_bytes - 1) - redundancy_bytes
            enc.shrink(nb_compr_bytes)

        if mode == MODE_HYBRID:
            ch = self.silk.channel
            celt.silk_info_signal_type = ch.indices.signalType
            celt.silk_info_offset = ST.QUANTIZATION_OFFSETS_Q10[
                ch.indices.signalType >> 1][ch.indices.quantOffsetType]

        # 5 ms redundant CELT frame for CELT->SILK (reference :2425-2441)
        redundant_rng = 0
        red_data = b""
        if redundancy and celt_to_silk:
            celt.start = 0
            celt.vbr = 0
            celt.bitrate = OPUS_BITRATE_MAX
            rbuf = RangeEncoder(redundancy_bytes)
            n = celt.encode_with_ec(pcm_buf[:fs // 200 * channels],
                                    fs // 200, redundancy_bytes, rbuf)
            if n < 0:
                raise RuntimeError("redundancy encode failed")
            red_data = bytes(rbuf.buf[:redundancy_bytes])
            redundant_rng = celt.rng
            celt.reset()

        celt.start = start_band

        data = b""
        ret_celt = None
        if mode != MODE_SILK_ONLY:
            celt.vbr = self.vbr
            if mode == MODE_HYBRID:
                if self.vbr:
                    celt.bitrate = bitrate - silk_rate
                    celt.constrained_vbr = 0
            else:
                if self.vbr:
                    celt.vbr = 1
                    celt.constrained_vbr = self.constrained_vbr
                    celt.bitrate = bitrate

            if mode != self.prev_mode and self.prev_mode > 0:
                celt.reset()
                if tmp_prefill is not None:
                    pre_enc = RangeEncoder(2)
                    celt.encode_with_ec(tmp_prefill, fs // 400, 2, pre_enc)
                celt.disable_pf = 1   # CELT_SET_PREDICTION(0)
                celt.force_intra = 1

            celt.enable_qext = 1 if (getattr(self, 'enable_qext', 0)
                                     and mode == MODE_CELT_ONLY) else 0
            if ec_tell(enc) <= 8 * nb_compr_bytes:
                ret_celt = celt.encode_with_ec(
                    pcm_buf[:frame_size * channels], frame_size,
                    nb_compr_bytes, enc)
                if ret_celt < 0:
                    raise RuntimeError("celt encode failed")
                ret = ret_celt
            else:
                ret = (ec_tell(enc) + 7) >> 3
            self.rangeFinal = celt.rng
            celt.disable_pf = 0
            celt.force_intra = 0
            celt.enable_qext = 0
        else:
            self.rangeFinal = enc.rng

        # 5 ms redundant CELT frame for SILK->CELT (reference :2470-2500)
        if redundancy and not celt_to_silk:
            n2 = fs // 200
            n4 = fs // 400
            celt.reset()
            celt.start = 0
            celt.disable_pf = 1
            celt.force_intra = 1
            celt.vbr = 0
            celt.bitrate = OPUS_BITRATE_MAX
            if mode == MODE_HYBRID and ret_celt is not None:
                nb_compr_bytes = ret
                enc.shrink(nb_compr_bytes)
            dummy = RangeEncoder(2)
            celt.encode_with_ec(
                pcm_buf[channels * (frame_size - n2 - n4):
                        channels * (frame_size - n2)], n4, 2, dummy)
            rbuf = RangeEncoder(redundancy_bytes)
            n = celt.encode_with_ec(
                pcm_buf[channels * (frame_size - n2):
                        channels * frame_size], n2, redundancy_bytes, rbuf)
            if n < 0:
                raise RuntimeError("redundancy encode failed")
            red_data = bytes(rbuf.buf[:redundancy_bytes])
            redundant_rng = celt.rng
            celt.disable_pf = 0
            celt.force_intra = 0

        toc = pkt.gen_toc(mode, frame_rate, curr_bandwidth, stream_channels)
        self.rangeFinal ^= redundant_rng
        self.prev_mode = MODE_CELT_ONLY if to_celt else mode
        self.prev_channels = stream_channels
        self.prev_framesize = frame_size
        self.first = 0

        # DTX (reference :2565-2576)
        if self.use_dtx:
            if self._decide_dtx(activity, 2 * 1000 * frame_size // fs):
                self.rangeFinal = 0
                return bytes([toc])
        else:
            self.nb_no_activity_ms_Q1 = 0

        if ec_tell(enc) > (max_data_bytes - 1) * 8:
            # busted the byte target: emit a PLC frame (reference :2589
            # also zeroes the final range, since the decoder conceals)
            if max_data_bytes < 2:
                raise RuntimeError("buffer too small")
            payload = b"\x00"
            self.rangeFinal = 0
        elif mode == MODE_SILK_ONLY and not redundancy:
            body = bytearray(enc.buf[:ret])
            while len(body) > 2 and body[-1] == 0:
                body.pop()
            payload = bytes(body)
        else:
            if celt_to_silk and redundancy:
                # redundancy comes FIRST for celt->silk?  No: data layout is
                # [main | redundancy]; celt_to_silk only flags decode order.
                pass
            payload = bytes(enc.buf[:ret])
        packet = bytes([toc]) + payload + red_data

        if mode == MODE_CELT_ONLY and celt.qext_payload:
            # attach the quality extension (ID 124) through the standard
            # padding-extension mechanism (reference: celt packaging
            # celt_encoder.c:2565; decoder lookup opus_decoder.c:849)
            from ..bitstream.repacketizer import Repacketizer
            from ..bitstream.extensions import ExtensionData
            ext = ExtensionData(id=124, frame=0,
                                data=celt.qext_payload[1:])
            rp = Repacketizer()
            if rp.cat(packet) == 0:
                out = rp.out_range(0, rp.nb_frames,
                                   max(max_data_bytes, len(packet)
                                       + len(celt.qext_payload) + 8),
                                   pad=False, extensions=[ext])
                if isinstance(out, bytes):
                    packet = out

        if self.dred is not None and self.dred_duration > 0:
            with_dred = self._attach_dred(packet, max_data_bytes)
            if len(with_dred) > len(packet):
                return with_dred
        if not self.vbr:
            packet = pkt.packet_pad(packet, max_data_bytes)
        return packet

    def _decide_dtx(self, activity, frame_ms_q1):
        """(reference: decide_dtx_mode src/opus_encoder.c:1115)"""
        if not activity:
            self.nb_no_activity_ms_Q1 += frame_ms_q1
            if self.nb_no_activity_ms_Q1 > 2 * 20 * 2:  # NB_SPEECH_FRAMES_BEFORE_DTX*20ms
                cap = (2 * 20 + 20 * 400) * 2
                if self.nb_no_activity_ms_Q1 <= cap:
                    return True
                self.nb_no_activity_ms_Q1 = 2 * 20 * 2
        else:
            self.nb_no_activity_ms_Q1 = 0
        return False

"""DRED encoder state: input conversion, feature extraction, RDOVAE
latent buffering and payload generation (reference: dnn/dred_encoder.c).

Feeds on each encoder frame: the input is downmixed/resampled to
16 kHz (elliptic anti-alias filters from dred_encoder.c:180-230), cut
into 10 ms feature frames, and every 20 ms one RDOVAE latent + initial
state is pushed (newest first) into a 1-second ring.  At packet build
time dred_encode() (opus_tpu.dnn.dred) range-codes the ladder into an
extension-126 payload."""

from __future__ import annotations

import numpy as np

from . import dred
from . import features as feat
from . import pitchdnn as pdnn
from . import rdovae

RESAMPLING_ORDER = 8

# ellip(7, .2, 70, ...) anti-alias filters (reference:
# dred_encoder.c:180-230; direct-form II transposed, b0 separate)
_FILTERS = {
    48000: (0.004523418224,
            (0.005873358047, 0.012980854831, 0.014531340042,
             0.014531340042, 0.012980854831, 0.005873358047,
             0.004523418224, 0.0),
            (-3.878718597768, 7.748834257468, -9.653651699533,
             8.007342726666, -4.379450178552, 1.463182111810,
             -0.231720677804, 0.0)),
    12000: (0.002033596776,
            (-0.001017101081, 0.003673127243, 0.001009165267,
             0.001009165267, 0.003673127243, -0.001017101081,
             0.002033596776, 0.0),
            (-4.930414411612, 11.291643096504, -15.322037343815,
             13.216403930898, -7.220409219553, 2.310550142771,
             -0.334338618782, 0.0)),
    8000: (0.020109185709,
           (0.081670120929, 0.180401598565, 0.259391051971,
            0.259391051971, 0.180401598565, 0.081670120929,
            0.020109185709, 0.0),
           (-1.393651933659, 2.609789872676, -2.403541968806,
            2.056814957331, -1.148908574570, 0.473001413788,
            -0.110359852412, 0.0)),
}
_FILTERS[24000] = _FILTERS[48000]


def _filter_df2t(x, b0, b, a, mem):
    """(reference: filter_df2t dred_encoder.c:113)"""
    y = np.empty_like(x)
    for i in range(len(x)):
        xi = float(x[i])
        yi = xi * b0 + mem[0]
        nyi = -yi
        for j in range(RESAMPLING_ORDER):
            mem[j] = mem[j + 1] + b[j] * xi + a[j] * nyi
        y[i] = yi
    return y


def _float2int16(x):
    return np.floor(0.5 + np.clip(x * 32768.0, -32768, 32767))


class DREDEnc:
    """(reference: DREDEnc dnn/dred_encoder.h; logic dred_encoder.c)"""

    def __init__(self, fs: int, channels: int,
                 enc_model: rdovae.RDOVAEEnc,
                 pitch_model: pdnn.PitchDNNModel,
                 stats: dred.DREDStats):
        self.fs = fs
        self.channels = channels
        self.model = enc_model
        self.pitch_model = pitch_model
        self.stats = stats
        self.reset()

    def reset(self):
        self.feat_state = feat.init_state()
        self.rdovae_state = rdovae.enc_init_state()
        self.input_buffer = np.zeros(2 * dred.DRED_MAX_FRAMES * 160,
                                     np.float32)
        self.input_buffer_fill = 0
        self.resample_mem = np.zeros(RESAMPLING_ORDER + 1, np.float64)
        self.latents = np.zeros(
            (dred.DRED_MAX_FRAMES, rdovae.DRED_LATENT_DIM), np.float32)
        self.states = np.zeros(
            (dred.DRED_MAX_FRAMES, rdovae.DRED_STATE_DIM), np.float32)
        self.latents_buffer_fill = 0
        self.dred_offset = 0
        self.latent_offset = 0
        self.last_extra_dred_offset = 0

    def _convert_to_16k(self, pcm: np.ndarray, out_len: int):
        """(reference: dred_convert_to_16k dred_encoder.c:136)"""
        in_len = len(pcm) // self.channels
        up = {8000: 2, 12000: 4, 16000: 1, 24000: 2, 48000: 1}[self.fs]
        if self.channels == 1:
            mono = _float2int16(pcm) * up
        else:
            mono = _float2int16(0.5 * (pcm[0::2] + pcm[1::2])) * up
        mono = mono + 1e-30
        downmix = np.zeros(up * in_len, np.float64)
        downmix[::up] = mono
        if self.fs == 16000:
            return downmix[:out_len].astype(np.float32)
        b0, b, a = _FILTERS[self.fs]
        y = _filter_df2t(downmix, b0, b, a, self.resample_mem)
        if self.fs == 8000:
            return y[:out_len].astype(np.float32)
        return y[::3][:out_len].astype(np.float32)

    def _process_frame(self):
        """(reference: dred_process_frame dred_encoder.c:88): shift the
        latent ring down (newest at index 0) and push one dframe."""
        self.latents[1:] = self.latents[:-1]
        self.states[1:] = self.states[:-1]
        fbuf = []
        for k in range(2):
            self.feat_state, f = feat.compute_frame_features(
                self.feat_state, self.input_buffer[k * 160:(k + 1) * 160],
                self.pitch_model)
            fbuf.append(f[:rdovae.DRED_NUM_FEATURES])
        inp = np.concatenate(fbuf).astype(np.float32)
        self.rdovae_state, lat, ist = rdovae.encode_dframe(
            self.model, self.rdovae_state, inp)
        self.latents[0] = np.asarray(lat)
        self.states[0] = np.asarray(ist)
        self.latents_buffer_fill = min(
            self.latents_buffer_fill + 1, dred.DRED_NUM_REDUNDANCY_FRAMES)

    def compute_latents(self, pcm: np.ndarray, frame_size: int,
                        extra_delay: int = 0):
        """(reference: dred_compute_latents dred_encoder.c:211)"""
        pcm = np.asarray(pcm, np.float64).reshape(-1)
        frame_size16k = frame_size * 16000 // self.fs
        curr_offset16k = 40 + extra_delay * 16000 // self.fs \
            - self.input_buffer_fill
        self.dred_offset = int(np.floor((curr_offset16k + 20.0) / 40.0))
        self.latent_offset = 0
        pos = 0
        while frame_size16k > 0:
            process16k = min(320, frame_size16k)
            process = process16k * self.fs // 16000
            seg = pcm[pos * self.channels:
                      (pos + process) * self.channels]
            self.input_buffer[self.input_buffer_fill:
                              self.input_buffer_fill + process16k] = \
                self._convert_to_16k(seg, process16k)
            self.input_buffer_fill += process16k
            if self.input_buffer_fill >= 320:
                curr_offset16k += 320
                self._process_frame()
                self.input_buffer_fill -= 320
                self.input_buffer[:self.input_buffer_fill] = \
                    self.input_buffer[320:320 + self.input_buffer_fill]
                if self.dred_offset < 6:
                    self.dred_offset += 8
                else:
                    self.latent_offset += 1
            pos += process
            frame_size16k -= process16k

    def encode_payload(self, activity_mem: np.ndarray, max_chunks: int,
                       max_bytes: int, q0=dred.DRED_ENC_Q0, dq=3,
                       qmax=dred.DRED_ENC_Q1) -> bytes | None:
        """Range-code the ladder; returns the raw payload (without the
        experimental version prefix) or None."""
        # mirror the delayed-activity bookkeeping of
        # dred_encode_silk_frame (dred_encoder.c:295-309) via dred.py
        return dred.dred_encode(
            self.stats, self.latents, self.states,
            self.latents_buffer_fill, self.dred_offset, activity_mem,
            q0=q0, dq=dq, qmax=qmax, max_chunks=max_chunks,
            max_bytes=max_bytes)

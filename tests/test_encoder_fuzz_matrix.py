"""Random encoder-settings matrix sweep with dual-decoder and
final-range verification — our analogue of fuzz_encoder_settings
(reference tests/test_opus_encode.c:211) and the dual-decode
verification of run_test1 (:303).

Every iteration randomizes the full ctl surface the reference fuzzes
(bitrate, force-channels, vbr/constraint, complexity, max bandwidth,
signal, inband FEC, packet-loss %, lsb depth, DTX, frame duration),
encodes real audio, and requires: a parseable packet, both a
matched-rate decoder and an always-48k/stereo decoder produce finite
PCM of the right length, and OPUS_GET_FINAL_RANGE agrees between
encoder and matched decoder on every non-DTX packet.

Seeded and time-boxed: the matrix is shuffled deterministically; a
wall-clock budget caps how many cells run in CI (all cells are
reachable by raising OPUS_TPU_FUZZ_BUDGET_S).
"""

import os
import time

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.models import ctl as C
from opus_tpu.bitstream import packet as pkt

BUDGET_S = float(os.environ.get("OPUS_TPU_FUZZ_BUDGET_S", "150"))

SAMPLING_RATES = [8000, 12000, 16000, 24000, 48000]
CHANNELS = [1, 2]
APPLICATIONS = [C.OPUS_APPLICATION_AUDIO, C.OPUS_APPLICATION_VOIP,
                C.OPUS_APPLICATION_RESTRICTED_LOWDELAY]
BITRATES = [6000, 12000, 16000, 24000, 32000, 48000, 64000, 96000,
            510000, C.OPUS_AUTO, C.OPUS_BITRATE_MAX]
FORCE_CHANNELS = [C.OPUS_AUTO, C.OPUS_AUTO, 1, 2]
USE_VBR = [0, 1, 1]
VBR_CONSTRAINTS = [0, 1, 1]
COMPLEXITIES = list(range(11))
MAX_BANDWIDTHS = [C.OPUS_BANDWIDTH_NARROWBAND, C.OPUS_BANDWIDTH_MEDIUMBAND,
                  C.OPUS_BANDWIDTH_WIDEBAND, C.OPUS_BANDWIDTH_SUPERWIDEBAND,
                  C.OPUS_BANDWIDTH_FULLBAND, C.OPUS_BANDWIDTH_FULLBAND]
SIGNALS = [C.OPUS_AUTO, C.OPUS_AUTO, C.OPUS_SIGNAL_VOICE,
           C.OPUS_SIGNAL_MUSIC]
INBAND_FECS = [0, 0, 1]
PACKET_LOSS_PERCS = [0, 1, 2, 5]
LSB_DEPTHS = [8, 24]
USE_DTX = [0, 1]
FRAME_MS_X2 = [10, 20, 40, 80, 120, 240]      # 5..120 ms


def _signal(rng, fs, channels, n):
    """Speech-ish tone + hum + noise, occasionally near-silence (to
    poke DTX), occasionally a transient burst."""
    t = np.arange(n) / fs
    kind = rng.integers(0, 8)
    if kind == 0:
        sig = 1e-4 * rng.standard_normal(n)
    else:
        f0 = float(rng.uniform(120, 900))
        sig = 0.3 * np.sin(2 * np.pi * f0 * t) \
            * (1 + 0.4 * np.sin(2 * np.pi * 4.0 * t)) \
            + 0.03 * rng.standard_normal(n)
        if kind == 1:
            burst = min(n, 200)
            sig[:burst] += 0.5 * rng.standard_normal(burst)
    sig = np.clip(sig, -1, 1)
    if channels == 2:
        sig2 = np.clip(np.roll(sig, 7) + 0.01 * rng.standard_normal(n),
                       -1, 1)
        sig = np.stack([sig, sig2], axis=-1).reshape(-1)
    return sig


def test_encoder_settings_fuzz_matrix():
    rng = np.random.default_rng(20260817)
    t_end = time.monotonic() + BUDGET_S
    cells = 0
    encoders = 0
    while time.monotonic() < t_end:
        fs = int(rng.choice(SAMPLING_RATES))
        channels = int(rng.choice(CHANNELS))
        app = int(rng.choice(APPLICATIONS))
        if app == C.OPUS_APPLICATION_RESTRICTED_LOWDELAY:
            # lowdelay allows only 2.5-20 ms frames
            frame_choices = [5, 10, 20, 40]
        else:
            frame_choices = FRAME_MS_X2
        enc = OpusEncoder(fs, channels,
                          application=C._APP_TO_NAME[app])
        dec = OpusDecoder(fs, channels)
        dec48 = OpusDecoder(48000, 2)
        encoders += 1
        for _ in range(6):
            if time.monotonic() >= t_end:
                break
            force_ch = min(int(rng.choice(FORCE_CHANNELS)), channels)
            C.encoder_ctl(enc, C.OPUS_SET_BITRATE,
                          int(rng.choice(BITRATES)))
            C.encoder_ctl(enc, C.OPUS_SET_FORCE_CHANNELS, force_ch)
            C.encoder_ctl(enc, C.OPUS_SET_VBR, int(rng.choice(USE_VBR)))
            C.encoder_ctl(enc, C.OPUS_SET_VBR_CONSTRAINT,
                          int(rng.choice(VBR_CONSTRAINTS)))
            C.encoder_ctl(enc, C.OPUS_SET_COMPLEXITY,
                          int(rng.choice(COMPLEXITIES)))
            C.encoder_ctl(enc, C.OPUS_SET_MAX_BANDWIDTH,
                          int(rng.choice(MAX_BANDWIDTHS)))
            C.encoder_ctl(enc, C.OPUS_SET_SIGNAL,
                          int(rng.choice(SIGNALS)))
            C.encoder_ctl(enc, C.OPUS_SET_INBAND_FEC,
                          int(rng.choice(INBAND_FECS)))
            C.encoder_ctl(enc, C.OPUS_SET_PACKET_LOSS_PERC,
                          int(rng.choice(PACKET_LOSS_PERCS)))
            C.encoder_ctl(enc, C.OPUS_SET_LSB_DEPTH,
                          int(rng.choice(LSB_DEPTHS)))
            C.encoder_ctl(enc, C.OPUS_SET_DTX,
                          int(rng.choice(USE_DTX)))
            frame_ms_x2 = int(rng.choice(frame_choices))
            frame = frame_ms_x2 * fs // 2000
            sig = _signal(rng, fs, channels, frame)
            desc = (f"fs={fs} ch={channels} app={app} "
                    f"frame={frame_ms_x2 / 2}ms cell={cells}")
            p = enc.encode(sig, frame)
            cells += 1
            assert isinstance(p, (bytes, bytearray)) and len(p) >= 1, \
                desc
            nsamp = pkt.packet_get_nb_samples(p, fs)
            out = dec.decode(p)
            assert np.all(np.isfinite(out)), desc
            assert len(out) == nsamp * channels, desc
            out48 = dec48.decode(p)
            assert np.all(np.isfinite(out48)), desc
            assert len(out48) == pkt.packet_get_nb_samples(p, 48000) \
                * 2, desc
            if len(p) > 2:     # DTX / silence packets carry no range
                assert dec.rangeFinal == enc.rangeFinal, desc
    assert cells >= 10, f"budget too small: only {cells} cells ran"
    print(f"fuzz matrix: {encoders} encoders / {cells} cells")

"""Music/speech tonality analysis (reference: src/analysis.c, src/mlp.c,
weights src/mlp_data.c trained by training/rnn_train.py).

Runs on 20 ms hops of a 24 kHz downmix: per-bin phase-modulation
tonality, 18-band energies/stationarity, BFCC features, leakage boosts,
bandwidth detection, and a dense-GRU-dense classifier producing
music_prob and activity_probability.  tonality_get_info() then turns
the per-frame ring buffer into switching thresholds (music_prob_min/
max) with hysteresis-optimal transition logic."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import mlp_data as MD

NB_FRAMES = 8
NB_TBANDS = 18
ANALYSIS_BUF_SIZE = 720          # 30 ms at 24 kHz
DETECT_SIZE = 100
NB_TONAL_SKIP_BANDS = 9
ANALYSIS_COUNT_MAX = 10000
TRANSITION_PENALTY = 10.0
LEAKAGE_OFFSET = 2.5
LEAKAGE_SLOPE = 2.0
LEAK_BANDS = 19
WEIGHTS_SCALE = 1.0 / 128

# (reference: tbands src/analysis.c:109)
TBANDS = np.array([4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64, 80,
                   96, 112, 136, 160, 192, 240])

# (reference: dct_table src/analysis.c:57 -- 8x16 DCT-II, row 0 scaled)
_i, _b = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
DCT_TABLE = 0.353553 * np.cos(np.pi * _i * (_b + 0.5) / 16)
DCT_TABLE[0, :] = 0.25
del _i, _b

# (reference: analysis_window src/analysis.c:76: sin^2 ramp)
ANALYSIS_WINDOW = np.sin(np.pi * (np.arange(240) + 1) / 480.0) ** 2

STD_FEATURE_BIAS = np.array([5.684947, 3.475288, 1.770634, 1.599784,
                             3.773215, 2.163313, 1.260756, 1.116868,
                             1.918795])


def fast_atan2f(y, x):
    """(reference: fast_atan2f celt/mathops.h:60)"""
    cA, cB, cC, cE = 0.43157974, 0.67848403, 0.08595542, np.pi / 2
    x2, y2 = x * x, y * y
    if x2 + y2 < 1e-18:
        return 0.0
    if x2 < y2:
        den = (y2 + cB * x2) * (y2 + cC * x2)
        return -x * y * (y2 + cA * x2) / den + (cE if y >= 0 else -cE)
    den = (x2 + cB * y2) * (x2 + cC * y2)
    return x * y * (x2 + cA * y2) / den + (cE if y >= 0 else -cE) \
        - (cE if x * y >= 0 else -cE)


def _tansig(x):
    n0, n1, n2 = 952.52801514, 96.39235687, 0.60863042
    d0, d1, d2 = 952.72399902, 413.36801147, 11.88600922
    x2 = x * x
    num = ((n2 * x2 + n1) * x2 + n0) * x
    den = (d2 * x2 + d1) * x2 + d0
    return np.clip(num / den, -1.0, 1.0)


def _sigmoid(x):
    return 0.5 + 0.5 * _tansig(0.5 * x)


# classifier layers (reference: mlp_data.c:654-671; dims 25->32->GRU24->2)
_L0_W = MD.LAYER0_WEIGHTS.astype(np.float64).reshape(25, 32)
_L0_B = MD.LAYER0_BIAS.astype(np.float64)
_L1_W = MD.LAYER1_WEIGHTS.astype(np.float64).reshape(32, 72)
_L1_R = MD.LAYER1_RECUR_WEIGHTS.astype(np.float64).reshape(24, 72)
_L1_B = MD.LAYER1_BIAS.astype(np.float64)
_L2_W = MD.LAYER2_WEIGHTS.astype(np.float64).reshape(24, 2)
_L2_B = MD.LAYER2_BIAS.astype(np.float64)


def _compute_dense(w, b, x, sigmoid):
    out = WEIGHTS_SCALE * (b + x @ w)
    return _sigmoid(out) if sigmoid else _tansig(out)


def _compute_gru(state, x):
    """(reference: analysis_compute_gru src/mlp.c:92; gate layout
    z|r|h interleaved with stride 3N)"""
    N = 24
    z = _sigmoid(WEIGHTS_SCALE * (_L1_B[:N] + x @ _L1_W[:, 0:N]
                                  + state @ _L1_R[:, 0:N]))
    r = _sigmoid(WEIGHTS_SCALE * (_L1_B[N:2 * N] + x @ _L1_W[:, N:2 * N]
                                  + state @ _L1_R[:, N:2 * N]))
    h = _tansig(WEIGHTS_SCALE * (_L1_B[2 * N:] + x @ _L1_W[:, 2 * N:]
                                 + (state * r) @ _L1_R[:, 2 * N:]))
    return z * state + (1 - z) * h


@dataclass
class AnalysisInfo:
    valid: int = 0
    tonality: float = 0.0
    tonality_slope: float = 0.0
    noisiness: float = 0.0
    activity: float = 0.0
    music_prob: float = 0.0
    music_prob_min: float = 0.0
    music_prob_max: float = 0.0
    bandwidth: int = 0
    activity_probability: float = 0.0
    max_pitch_ratio: float = 1.0
    leak_boost: np.ndarray = field(
        default_factory=lambda: np.zeros(LEAK_BANDS, np.int32))


class TonalityAnalysisState:
    """(reference: TonalityAnalysisState src/analysis.h:44)"""

    def __init__(self, fs: int):
        self.Fs = fs
        self.reset()

    def reset(self):
        self.angle = np.zeros(240)
        self.d_angle = np.zeros(240)
        self.d2_angle = np.zeros(240)
        self.inmem = np.zeros(ANALYSIS_BUF_SIZE)
        self.downmix_state = np.zeros(3)
        self.mem_fill = 0
        self.initialized = False
        self.prev_band_tonality = np.zeros(NB_TBANDS)
        self.prev_tonality = 0.0
        self.prev_bandwidth = 0
        self.E = np.zeros((NB_FRAMES, NB_TBANDS))
        self.logE = np.zeros((NB_FRAMES, NB_TBANDS))
        self.lowE = np.zeros(NB_TBANDS)
        self.highE = np.zeros(NB_TBANDS)
        self.meanE = np.zeros(NB_TBANDS + 1)
        self.mem = np.zeros(32)
        self.cmean = np.zeros(8)
        self.std = np.zeros(9)
        self.Etracker = 0.0
        self.lowECount = 0.0
        self.E_count = 0
        self.count = 0
        self.analysis_offset = 0
        self.write_pos = 0
        self.read_pos = 0
        self.read_subframe = 0
        self.hp_ener_accum = 0.0
        self.rnn_state = np.zeros(24)
        self.info = [AnalysisInfo() for _ in range(DETECT_SIZE)]


def _down2_hp(S, x):
    """(reference: silk_resampler_down2_hp src/analysis.c:115).
    Returns (out, hp energy)."""
    n2 = len(x) // 2
    out = np.empty(n2)
    hp_ener = 0.0
    for k in range(n2):
        in32 = x[2 * k]
        Y = in32 - S[0]
        X = 0.6074371 * Y
        o = S[0] + X
        S[0] = in32 + X
        ohp = o
        in32 = x[2 * k + 1]
        Y = in32 - S[1]
        X = 0.15063 * Y
        o = o + S[1] + X
        S[1] = in32 + X
        Y = -in32 - S[2]
        X = 0.15063 * Y
        ohp = ohp + S[2] + X
        S[2] = -in32 + X
        hp_ener += ohp * ohp   # SHR64 is a no-op in float builds
        out[k] = 0.5 * o
    return out, hp_ener


def _downmix_resample(st, pcm, y_off, subframe, offset, c1, c2, C):
    """(reference: downmix_and_resample src/analysis.c:165).  pcm is a
    float array in the +-32768 domain (downmix_float multiplies by
    CELT_SIG_SCALE)."""
    if subframe == 0:
        return 0.0
    Fs = st.Fs
    if Fs == 48000:
        subframe *= 2
        offset *= 2
    elif Fs == 16000:
        subframe = subframe * 2 // 3
        offset = offset * 2 // 3
    # downmix_float: sum selected channels, scale by 32768
    x = pcm.reshape(-1, C)
    if c2 == -2:
        seg = x[offset:offset + subframe].sum(axis=1)
    elif c2 > -1:
        seg = x[offset:offset + subframe, c1] \
            + x[offset:offset + subframe, c2]
    else:
        seg = x[offset:offset + subframe, c1]
    seg = seg * 32768.0
    if (c2 == -2 and C == 2) or c2 > -1:
        seg = 0.5 * seg
    ret = 0.0
    if Fs == 48000:
        out, ret = _down2_hp(st.downmix_state, seg)
    elif Fs == 24000:
        out = seg.copy()
    elif Fs == 16000:
        tmp3 = np.repeat(seg, 3)
        out, ret = _down2_hp(st.downmix_state, tmp3)
    else:
        raise ValueError("unsupported analysis rate")
    st.inmem[y_off:y_off + len(out)] = out
    return ret / 32768.0 / 32768.0


def tonality_analysis(st: TonalityAnalysisState, pcm: np.ndarray,
                      length: int, offset: int, c1: int, c2: int,
                      C: int, lsb_depth: int):
    """One 20 ms hop (reference: tonality_analysis src/analysis.c:445).
    pcm: float interleaved in [-1,1]."""
    N, N2 = 480, 240
    if not st.initialized:
        st.mem_fill = 240
        st.initialized = True
    alpha = 1.0 / min(10, 1 + st.count)
    alphaE = 1.0 / min(25, 1 + st.count)
    alphaE2 = 1.0 / min(100, 1 + st.count)
    if st.count <= 1:
        alphaE2 = 1.0
    if st.Fs == 48000:
        length //= 2
        offset //= 2
    elif st.Fs == 16000:
        length = 3 * length // 2
        offset = 3 * offset // 2
    st.hp_ener_accum += _downmix_resample(
        st, pcm, st.mem_fill, min(length, ANALYSIS_BUF_SIZE
                                  - st.mem_fill), offset, c1, c2, C)
    if st.mem_fill + length < ANALYSIS_BUF_SIZE:
        st.mem_fill += length
        return
    hp_ener = st.hp_ener_accum
    info = st.info[st.write_pos]
    st.write_pos = (st.write_pos + 1) % DETECT_SIZE

    is_silence = bool(np.max(np.abs(st.inmem)) <= 0.5)

    w = ANALYSIS_WINDOW
    inr = np.empty(N)
    ini = np.empty(N)
    inr[:N2] = w * st.inmem[:N2]
    ini[:N2] = w * st.inmem[N2:N]
    inr[N2:] = (w * st.inmem[N - 1 - np.arange(N2)])[::-1]
    ini[N2:] = (w * st.inmem[N + N2 - 1 - np.arange(N2)])[::-1]
    st.inmem[:240] = st.inmem[ANALYSIS_BUF_SIZE - 240:]
    remaining = length - (ANALYSIS_BUF_SIZE - st.mem_fill)
    st.hp_ener_accum = _downmix_resample(
        st, pcm, 240, remaining,
        offset + ANALYSIS_BUF_SIZE - st.mem_fill, c1, c2, C)
    st.mem_fill = 240 + remaining
    if is_silence:
        prev = (st.write_pos - 2) % DETECT_SIZE
        st.info[st.write_pos - 1] = _copy_info(st.info[prev])
        return

    out = np.fft.fft(inr + 1j * ini) / N   # kiss float forward scale

    tonality = np.zeros(N2)
    noisiness = np.zeros(N2)
    tonality2 = np.zeros(N2)
    A, dA, d2A = st.angle, st.d_angle, st.d2_angle
    pi4 = np.pi ** 4
    for i in range(1, N2):
        X1r = out[i].real + out[N - i].real
        X1i = out[i].imag - out[N - i].imag
        X2r = out[i].imag + out[N - i].imag
        X2i = out[N - i].real - out[i].real
        angle = (0.5 / np.pi) * fast_atan2f(X1i, X1r)
        d_angle = angle - A[i]
        d2_angle = d_angle - dA[i]
        angle2 = (0.5 / np.pi) * fast_atan2f(X2i, X2r)
        d_angle2 = angle2 - angle
        d2_angle2 = d_angle2 - d_angle
        mod1 = d2_angle - np.rint(d2_angle)
        noisiness[i] = abs(mod1)
        mod1 = mod1 ** 4
        mod2 = d2_angle2 - np.rint(d2_angle2)
        noisiness[i] += abs(mod2)
        mod2 = mod2 ** 4
        avg_mod = 0.25 * (d2A[i] + mod1 + 2 * mod2)
        tonality[i] = 1.0 / (1.0 + 40.0 * 16.0 * pi4 * avg_mod) - 0.015
        tonality2[i] = 1.0 / (1.0 + 40.0 * 16.0 * pi4 * mod2) - 0.015
        A[i] = angle2
        dA[i] = d_angle2
        d2A[i] = mod2
    tt = np.minimum(tonality2[2:N2 - 1],
                    np.maximum(tonality2[1:N2 - 2], tonality2[3:N2]))
    tonality[2:N2 - 1] = 0.9 * np.maximum(tonality[2:N2 - 1], tt - 0.1)

    if st.count == 0:
        st.lowE[:] = 1e10
        st.highE[:] = -1e10

    # per-bin energy over the two interleaved real signals
    idx = np.arange(1, 241)
    binE = np.zeros(241)
    binE[idx] = (out[idx].real ** 2 + out[(N - idx) % N].real ** 2
                 + out[idx].imag ** 2 + out[(N - idx) % N].imag ** 2)

    band_log2 = np.zeros(NB_TBANDS + 1)
    X1r = 2 * out[0].real
    X2r = 2 * out[0].imag
    # float builds scale energies by 1/32768^2 (SCALE_ENER analysis.c:424)
    E0 = (X1r * X1r + X2r * X2r + np.sum(binE[1:4])) / 32768.0 ** 2
    band_log2[0] = 0.5 * 1.442695 * np.log(E0 + 1e-10)

    logE = np.zeros(NB_TBANDS)
    frame_noisiness = 0.0
    frame_loudness = 0.0
    frame_stationarity = 0.0
    relativeE = 0.0
    frame_tonality = 0.0
    max_frame_tonality = 0.0
    slope = 0.0
    band_tonality = np.zeros(NB_TBANDS)
    for b in range(NB_TBANDS):
        sl = slice(TBANDS[b], TBANDS[b + 1])
        scaled = binE[sl] / 32768.0 ** 2       # SCALE_ENER per bin
        E = float(np.sum(scaled))
        tE = float(np.sum(scaled * np.maximum(0, tonality[sl])))
        nE = float(np.sum(scaled * 2.0 * (0.5 - noisiness[sl])))
        if not (E < 1e9) or np.isnan(E):
            info.valid = 0
            return
        st.E[st.E_count][b] = E
        frame_noisiness += nE / (1e-15 + E)
        frame_loudness += np.sqrt(E + 1e-10)
        logE[b] = np.log(E + 1e-10)
        band_log2[b + 1] = 0.5 * 1.442695 * logE[b]
        st.logE[st.E_count][b] = logE[b]
        if st.count == 0:
            st.highE[b] = st.lowE[b] = logE[b]
        if st.highE[b] > st.lowE[b] + 7.5:
            if st.highE[b] - logE[b] > logE[b] - st.lowE[b]:
                st.highE[b] -= 0.01
            else:
                st.lowE[b] += 0.01
        if logE[b] > st.highE[b]:
            st.highE[b] = logE[b]
            st.lowE[b] = max(st.highE[b] - 15, st.lowE[b])
        elif logE[b] < st.lowE[b]:
            st.lowE[b] = logE[b]
            st.highE[b] = min(st.lowE[b] + 15, st.highE[b])
        relativeE += (logE[b] - st.lowE[b]) / (1e-5 + st.highE[b]
                                               - st.lowE[b])
        L1 = float(np.sum(np.sqrt(st.E[:, b])))
        L2 = float(np.sum(st.E[:, b]))
        stationarity = min(0.99, L1 / np.sqrt(1e-15 + NB_FRAMES * L2))
        stationarity = stationarity ** 4
        frame_stationarity += stationarity
        band_tonality[b] = max(tE / (1e-15 + E),
                               stationarity * st.prev_band_tonality[b])
        frame_tonality += band_tonality[b]
        if b >= NB_TBANDS - NB_TONAL_SKIP_BANDS:
            frame_tonality -= band_tonality[b - NB_TBANDS
                                            + NB_TONAL_SKIP_BANDS]
        max_frame_tonality = max(max_frame_tonality,
                                 (1.0 + 0.03 * (b - NB_TBANDS))
                                 * frame_tonality)
        slope += band_tonality[b] * (b - 8)
        st.prev_band_tonality[b] = band_tonality[b]

    # leakage boosts (analysis.c:728-755)
    leakage_from = np.zeros(NB_TBANDS + 1)
    leakage_to = np.zeros(NB_TBANDS + 1)
    leakage_from[0] = band_log2[0]
    leakage_to[0] = band_log2[0] - LEAKAGE_OFFSET
    for b in range(1, NB_TBANDS + 1):
        leak_slope = LEAKAGE_SLOPE * (TBANDS[b] - TBANDS[b - 1]) / 4
        leakage_from[b] = min(leakage_from[b - 1] + leak_slope,
                              band_log2[b])
        leakage_to[b] = max(leakage_to[b - 1] - leak_slope,
                            band_log2[b] - LEAKAGE_OFFSET)
    for b in range(NB_TBANDS - 2, -1, -1):
        leak_slope = LEAKAGE_SLOPE * (TBANDS[b + 1] - TBANDS[b]) / 4
        leakage_from[b] = min(leakage_from[b + 1] + leak_slope,
                              leakage_from[b])
        leakage_to[b] = max(leakage_to[b + 1] - leak_slope,
                            leakage_to[b])
    info.leak_boost = np.zeros(LEAK_BANDS, np.int32)
    for b in range(NB_TBANDS + 1):
        boost = max(0.0, leakage_to[b] - band_log2[b]) + \
            max(0.0, band_log2[b] - (leakage_from[b] + LEAKAGE_OFFSET))
        info.leak_boost[b] = min(255, int(np.floor(0.5 + 64.0 * boost)))

    spec_variability = 0.0
    for i in range(NB_FRAMES):
        d = st.logE - st.logE[i]
        dist = np.sum(d * d, axis=1)
        dist[i] = 1e15
        spec_variability += float(np.min(dist))
    spec_variability = np.sqrt(spec_variability / NB_FRAMES / NB_TBANDS)

    # bandwidth detection (analysis.c:776-855)
    bandwidth_mask = 0.0
    bandwidth = 0
    maxE = 0.0
    noise_floor = (5.7e-4 / (1 << max(0, lsb_depth - 8))) ** 2
    below_max_pitch = above_max_pitch = 0.0
    is_masked = np.zeros(NB_TBANDS + 1, bool)
    for b in range(NB_TBANDS):
        E = float(np.sum(binE[TBANDS[b]:TBANDS[b + 1]])) / 32768.0 ** 2
        maxE = max(maxE, E)
        if TBANDS[b] < 64:
            below_max_pitch += E
        else:
            above_max_pitch += E
        st.meanE[b] = max((1 - alphaE2) * st.meanE[b], E)
        Em = max(E, st.meanE[b])
        width = TBANDS[b + 1] - TBANDS[b]
        if E * 1e9 > maxE and (Em > 3 * noise_floor * width
                               or E > noise_floor * width):
            bandwidth = b + 1
        is_masked[b] = E < (0.01 if st.prev_bandwidth >= b + 1
                            else 0.05) * bandwidth_mask
        bandwidth_mask = max(0.05 * bandwidth_mask, E)
    if st.Fs == 48000:
        E = hp_ener * (1.0 / (60 * 60))
        noise_ratio = 10.0 if st.prev_bandwidth == 20 else 30.0
        above_max_pitch += E
        st.meanE[NB_TBANDS] = max((1 - alphaE2) * st.meanE[NB_TBANDS],
                                  E)
        Em = max(E, st.meanE[NB_TBANDS])
        if Em > 3 * noise_ratio * noise_floor * 160 \
                or E > noise_ratio * noise_floor * 160:
            bandwidth = 20
        is_masked[NB_TBANDS] = E < (0.01 if st.prev_bandwidth == 20
                                    else 0.05) * bandwidth_mask
    info.max_pitch_ratio = (below_max_pitch / above_max_pitch
                            if above_max_pitch > below_max_pitch
                            else 1.0)
    if bandwidth == 20 and is_masked[NB_TBANDS]:
        bandwidth -= 2
    elif 0 < bandwidth <= NB_TBANDS and is_masked[bandwidth - 1]:
        bandwidth -= 1
    if st.count <= 2:
        bandwidth = 20

    frame_loudness = 20 * np.log10(frame_loudness)
    st.Etracker = max(st.Etracker - 0.003, frame_loudness)
    st.lowECount *= 1 - alphaE
    if frame_loudness < st.Etracker - 30:
        st.lowECount += alphaE

    BFCC = DCT_TABLE @ logE[:16]
    midE = DCT_TABLE @ (0.5 * (st.highE[:16] + st.lowE[:16]))

    frame_stationarity /= NB_TBANDS
    relativeE /= NB_TBANDS
    if st.count < 10:
        relativeE = 0.5
    frame_noisiness /= NB_TBANDS
    info.activity = frame_noisiness + (1 - frame_noisiness) * relativeE
    frame_tonality = max_frame_tonality / (NB_TBANDS
                                           - NB_TONAL_SKIP_BANDS)
    frame_tonality = max(frame_tonality, st.prev_tonality * 0.8)
    st.prev_tonality = frame_tonality
    slope /= 64.0
    info.tonality_slope = slope
    st.E_count = (st.E_count + 1) % NB_FRAMES
    st.count = min(st.count + 1, ANALYSIS_COUNT_MAX)
    info.tonality = frame_tonality

    features = np.zeros(25)
    m = st.mem
    features[:4] = -0.12299 * (BFCC[:4] + m[24:28]) \
        + 0.49195 * (m[0:4] + m[16:20]) + 0.69693 * m[8:12] \
        - 1.4349 * st.cmean[:4]
    st.cmean[:8] = (1 - alpha) * st.cmean[:8] + alpha * BFCC
    features[4:8] = 0.63246 * (BFCC[:4] - m[24:28]) \
        + 0.31623 * (m[0:4] - m[16:20])
    features[8:11] = 0.53452 * (BFCC[:3] + m[24:27]) \
        - 0.26726 * (m[0:3] + m[16:19]) - 0.53452 * m[8:11]
    if st.count > 5:
        st.std = (1 - alpha) * st.std + alpha * features[:9] ** 2
    features[:4] = BFCC[:4] - midE[:4]
    m[24:32] = m[16:24]
    m[16:24] = m[8:16]
    m[8:16] = m[0:8]
    m[0:8] = BFCC
    features[11:20] = np.sqrt(st.std) - STD_FEATURE_BIAS
    features[18] = spec_variability - 0.78
    features[20] = info.tonality - 0.154723
    features[21] = info.activity - 0.724643
    features[22] = frame_stationarity - 0.743717
    features[23] = info.tonality_slope + 0.069216
    features[24] = st.lowECount - 0.067930

    layer_out = _compute_dense(_L0_W, _L0_B, features, sigmoid=False)
    st.rnn_state = _compute_gru(st.rnn_state, layer_out)
    frame_probs = _compute_dense(_L2_W, _L2_B, st.rnn_state,
                                 sigmoid=True)
    info.activity_probability = float(frame_probs[1])
    info.music_prob = float(frame_probs[0])
    info.bandwidth = bandwidth
    st.prev_bandwidth = bandwidth
    info.noisiness = frame_noisiness
    info.valid = 1


def _copy_info(src: AnalysisInfo) -> AnalysisInfo:
    out = AnalysisInfo(**{k: (v.copy() if isinstance(v, np.ndarray)
                              else v) for k, v in src.__dict__.items()})
    return out


def tonality_get_info(st: TonalityAnalysisState,
                      length: int) -> AnalysisInfo:
    """(reference: tonality_get_info src/analysis.c:232)"""
    pos = st.read_pos
    curr_lookahead = st.write_pos - st.read_pos
    if curr_lookahead < 0:
        curr_lookahead += DETECT_SIZE
    st.read_subframe += length // (st.Fs // 400)
    while st.read_subframe >= 8:
        st.read_subframe -= 8
        st.read_pos += 1
    if st.read_pos >= DETECT_SIZE:
        st.read_pos -= DETECT_SIZE
    if length > st.Fs // 50 and pos != st.write_pos:
        pos = (pos + 1) % DETECT_SIZE
    if pos == st.write_pos:
        pos -= 1
    if pos < 0:
        pos = DETECT_SIZE - 1
    pos0 = pos
    info = _copy_info(st.info[pos])
    if not info.valid:
        return info
    tonality_max = tonality_avg = info.tonality
    tonality_count = 1
    bandwidth_span = 6
    for _ in range(3):
        pos = (pos + 1) % DETECT_SIZE
        if pos == st.write_pos:
            break
        tonality_max = max(tonality_max, st.info[pos].tonality)
        tonality_avg += st.info[pos].tonality
        tonality_count += 1
        info.bandwidth = max(info.bandwidth, st.info[pos].bandwidth)
        bandwidth_span -= 1
    pos = pos0
    for _ in range(bandwidth_span):
        pos -= 1
        if pos < 0:
            pos = DETECT_SIZE - 1
        if pos == st.write_pos:
            break
        info.bandwidth = max(info.bandwidth, st.info[pos].bandwidth)
    info.tonality = max(tonality_avg / tonality_count,
                        tonality_max - 0.2)

    mpos = vpos = pos0
    if curr_lookahead > 15:
        mpos = (mpos + 5) % DETECT_SIZE
        vpos = (vpos + 1) % DETECT_SIZE
    prob_min, prob_max = 1.0, 0.0
    vad_prob = st.info[vpos].activity_probability
    prob_count = max(0.1, vad_prob)
    prob_avg = max(0.1, vad_prob) * st.info[mpos].music_prob
    while True:
        mpos = (mpos + 1) % DETECT_SIZE
        if mpos == st.write_pos:
            break
        vpos = (vpos + 1) % DETECT_SIZE
        if vpos == st.write_pos:
            break
        pos_vad = st.info[vpos].activity_probability
        prob_min = min((prob_avg - TRANSITION_PENALTY
                        * (vad_prob - pos_vad)) / prob_count, prob_min)
        prob_max = max((prob_avg + TRANSITION_PENALTY
                        * (vad_prob - pos_vad)) / prob_count, prob_max)
        prob_count += max(0.1, pos_vad)
        prob_avg += max(0.1, pos_vad) * st.info[mpos].music_prob
    info.music_prob = prob_avg / prob_count
    prob_min = max(min(prob_avg / prob_count, prob_min), 0.0)
    prob_max = min(max(prob_avg / prob_count, prob_max), 1.0)
    if curr_lookahead < 10:
        pmin, pmax = prob_min, prob_max
        pos = pos0
        for _ in range(min(st.count - 1, 15)):
            pos -= 1
            if pos < 0:
                pos = DETECT_SIZE - 1
            pmin = min(pmin, st.info[pos].music_prob)
            pmax = max(pmax, st.info[pos].music_prob)
        pmin = max(0.0, pmin - 0.1 * vad_prob)
        pmax = min(1.0, pmax + 0.1 * vad_prob)
        prob_min += (1.0 - 0.1 * curr_lookahead) * (pmin - prob_min)
        prob_max += (1.0 - 0.1 * curr_lookahead) * (pmax - prob_max)
    info.music_prob_min = prob_min
    info.music_prob_max = prob_max
    return info


def run_analysis(st: TonalityAnalysisState, pcm: np.ndarray,
                 analysis_frame_size: int, frame_size: int, c1: int,
                 c2: int, C: int, lsb_depth: int) -> AnalysisInfo:
    """(reference: run_analysis src/analysis.c:954)"""
    analysis_frame_size -= analysis_frame_size & 1
    if pcm is not None:
        analysis_frame_size = min((DETECT_SIZE - 5) * st.Fs // 50,
                                  analysis_frame_size)
        pcm_len = analysis_frame_size - st.analysis_offset
        offset = st.analysis_offset
        while pcm_len > 0:
            tonality_analysis(st, pcm, min(st.Fs // 50, pcm_len),
                              offset, c1, c2, C, lsb_depth)
            offset += st.Fs // 50
            pcm_len -= st.Fs // 50
        st.analysis_offset = analysis_frame_size
        st.analysis_offset -= frame_size
    return tonality_get_info(st, frame_size)

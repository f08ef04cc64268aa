"""Blind bandwidth extension 16 kHz -> 48 kHz (reference: dnn/osce.c
ENABLE_OSCE_BWE sections, dnn/osce_features.c
osce_bwe_calculate_features; architecture from
dnn/torch/osce/models/bbwe_net.py with the deployed template
dnn/torch/osce/utils/templates.py bbwenet_setup).

Per 10 ms frame: 114 features (32-band log magnitude + 2x41
instantaneous-frequency terms) feed a conv+GRU feature net (cond 128);
the signal net lifts 80 16-kHz samples to 240 48-kHz samples through
adaptive-conv channel expansion (1->3), polyphase 2x and 3/2
upsampling, TDShaper + sin(log|x|) nonlinear extension channels, and
adaptive-conv mixdowns.  Output is delayed 21 samples at 48 kHz."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import nndsp
from . import nnet as nn

FEATURE_DIM = 114
COND_DIM = 128
NUM_BANDS = 32
MAX_INSTAFREQ_BIN = 40
HALF_WINDOW = 160
WINDOW = 320
OUTPUT_DELAY = 21
FRAME16 = 80
FRAME32 = 160
FRAME48 = 240
KSIZE = 16                  # 15 padded to 16 by the quantized export
_DB = 0.11512925464970229
GAIN_A = 12 * _DB           # conv gain limits +-12 dB
GAIN_B = 0.0
TDSHAPE1_AVG_POOL = 8
TDSHAPE2_AVG_POOL = 12
TDSHAPE_INTERPOLATE = 2

# (reference: center_bins_bwe/band_weights_bwe osce_features.c:54-97)
CENTER_BINS_BWE = np.array([0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50,
                            55, 60, 65, 70, 75, 80, 85, 90, 95, 100,
                            105, 110, 115, 120, 125, 130, 135, 140,
                            145, 150, 160])


def _band_weights(center_bins):
    n = len(center_bins)
    w = np.zeros(n)
    for b in range(n):
        lo = center_bins[b - 1] if b > 0 else center_bins[0]
        hi = center_bins[b + 1] if b < n - 1 else center_bins[-1]
        edge = 1 if b in (0, n - 1) else 0
        w[b] = 2.0 / (hi - lo + edge)
    return w


BAND_WEIGHTS_BWE = _band_weights(CENTER_BINS_BWE)

# polyphase coefficients (reference: dnn/osce.c:956-972)
HQ_2X_EVEN = np.array([0.026641845703125, 0.228668212890625,
                       -0.4036407470703125])
HQ_2X_ODD = np.array([0.104583740234375, 0.3932037353515625,
                      -0.152496337890625])
FRAC_01_24 = np.array([0.00576782, -0.01831055, 0.01882935, 0.9328308,
                       0.09143066, -0.04196167, 0.01296997,
                       -0.00140381])
FRAC_17_24 = np.array([-3.14331055e-03, 2.73437500e-02,
                       -1.06414795e-01, 3.64685059e-01,
                       8.03863525e-01, -1.02233887e-01,
                       1.61437988e-02, -1.22070312e-04])
FRAC_09_24 = np.array([-0.00146484, 0.02313232, -0.12072754, 0.7315979,
                       0.4621277, -0.12075806, 0.0295105, -0.00326538])
_DELAY_SAMPLES = 8


class ResampState(NamedTuple):
    upsamp: np.ndarray         # [2, 3] allpass states
    interpol: np.ndarray       # [8]


def resamp_init() -> ResampState:
    return ResampState(np.zeros((2, 3)), np.zeros(8))


def upsamp_2x(state: ResampState, x: np.ndarray):
    """SILK-style HQ 2x upsampler, three cascaded allpass sections per
    phase (reference: upsamp_2x dnn/osce.c:1042)."""
    s = state.upsamp.copy()
    out = np.empty(2 * len(x))
    coef = (HQ_2X_EVEN, HQ_2X_ODD)
    for k, xv in enumerate(np.asarray(x, np.float64)):
        for ph in range(2):
            c = coef[ph]
            tmp = xv
            for j in range(3):
                y = tmp - s[ph, j]
                Xv = y * (c[j] if j < 2 else 1 + c[j])
                nxt = s[ph, j] + Xv
                s[ph, j] = tmp + Xv
                tmp = nxt
            out[2 * k + ph] = tmp
    return state._replace(upsamp=s), out


def interpol_3_2(state: ResampState, x: np.ndarray):
    """3/2 fractional interpolation, 8-tap FIR (reference: interpol_3_2
    dnn/osce.c:995)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    buf = np.concatenate([state.interpol, x])
    out = np.empty(3 * n // 2)
    io = 0
    for i in range(0, n, 2):
        out[io] = np.dot(buf[i:i + 8], FRAC_01_24)
        out[io + 1] = np.dot(buf[i:i + 8], FRAC_17_24)
        out[io + 2] = np.dot(buf[i + 1:i + 9], FRAC_09_24)
        io += 3
    return state._replace(interpol=buf[n:n + 8].copy()), out


def valin_activation(x: np.ndarray) -> np.ndarray:
    """x * sin(log(|x| + 1e-6)) ("ImPowI"; reference:
    apply_valin_activation dnn/osce.c:974)."""
    x = np.asarray(x, np.float64)
    return (x * np.sin(np.log(np.abs(x) + 1e-6))).astype(np.float32)


class BBWEFeatureState(NamedTuple):
    signal_history: np.ndarray     # [160]
    last_spec: np.ndarray          # [82]


def bwe_feature_init() -> BBWEFeatureState:
    return BBWEFeatureState(np.zeros(HALF_WINDOW, np.float32),
                            np.zeros(2 * MAX_INSTAFREQ_BIN + 2))


# half-sine analysis window, shared with OSCE (osce_features.c:116)
_OSCE_WINDOW = np.sin((np.arange(WINDOW) + 0.5) * np.pi / WINDOW)


def bwe_calculate_features(st: BBWEFeatureState, xq: np.ndarray):
    """(reference: osce_bwe_calculate_features osce_features.c:462).
    xq: int16 [k*160].  Returns (state, features [k, 114])."""
    num_frames = len(xq) // HALF_WINDOW
    feats = np.zeros((num_frames, FEATURE_DIM), np.float32)
    hist = st.signal_history.copy()
    last_spec = st.last_spec.copy()
    for f in range(num_frames):
        x = np.asarray(xq[f * HALF_WINDOW:(f + 1) * HALF_WINDOW],
                       np.float32) / 32768.0
        buf = np.concatenate([hist, x]).astype(np.float64)
        hist = x
        X = np.fft.fft(buf * _OSCE_WINDOW)[:WINDOW // 2 + 1]
        spec = np.empty(2 * MAX_INSTAFREQ_BIN + 2)
        spec[0::2] = X.real[:MAX_INSTAFREQ_BIN + 1] + 1e-9
        spec[1::2] = X.imag[:MAX_INSTAFREQ_BIN + 1]
        re1, im1 = spec[0::2], spec[1::2]
        re2, im2 = last_spec[0::2], last_spec[1::2]
        aux_r = re1 * re2 + im1 * im2
        aux_i = im1 * re2 - re1 * im2
        aux_abs = np.sqrt(aux_r ** 2 + aux_i ** 2)
        feats[f, NUM_BANDS:NUM_BANDS + MAX_INSTAFREQ_BIN + 1] = \
            aux_r / (aux_abs + 1e-9)
        feats[f, NUM_BANDS + MAX_INSTAFREQ_BIN + 1:] = \
            aux_i / (aux_abs + 1e-9)
        mag = np.abs(X[:161])
        bands = np.zeros(NUM_BANDS)
        for b in range(NUM_BANDS - 1):
            i = np.arange(CENTER_BINS_BWE[b], CENTER_BINS_BWE[b + 1])
            frac = (CENTER_BINS_BWE[b + 1] - i) \
                / (CENTER_BINS_BWE[b + 1] - CENTER_BINS_BWE[b])
            bands[b] += BAND_WEIGHTS_BWE[b] * np.sum(frac * mag[i])
            bands[b + 1] += BAND_WEIGHTS_BWE[b + 1] \
                * np.sum((1 - frac) * mag[i])
        bands[NUM_BANDS - 1] += BAND_WEIGHTS_BWE[NUM_BANDS - 1] \
            * mag[CENTER_BINS_BWE[NUM_BANDS - 1]]
        feats[f, :NUM_BANDS] = np.log(bands + 1e-9)
        last_spec = spec
    return BBWEFeatureState(hist, last_spec), feats


class BBWEModel(NamedTuple):
    fnet_conv1: nn.Linear          # 342 -> 128 (k=3), tanh
    fnet_conv2: nn.Linear          # 384 -> 128 (k=3), tanh
    fnet_tconv: nn.Linear          # 128 -> 256 (2x upsample), tanh
    fnet_gru_input: nn.Linear      # 128 -> 384
    fnet_gru_recurrent: nn.Linear  # 128 -> 384
    af1: "tuple"                   # (kernel 128->48, gain 128->3)
    af2: "tuple"                   # (kernel 128->144, gain 128->3)
    af3: "tuple"                   # (kernel 128->48, gain 128->1)
    tdshape1: "tuple"              # alpha1f 256->80, alpha1t 42->80,
    tdshape2: "tuple"              # alpha2 160->80 (frame48: ->120)


class BBWEState(NamedTuple):
    fnet_conv1_mem: np.ndarray
    fnet_conv2_mem: np.ndarray
    fnet_gru: np.ndarray
    af1: nndsp.AdaConvState
    af2: nndsp.AdaConvState
    af3: nndsp.AdaConvState
    tdshape1: nndsp.AdaShapeState
    tdshape2: nndsp.AdaShapeState
    resamp: tuple                  # 3x ResampState
    out_buffer: np.ndarray         # [21] int16 delay line


def init_state() -> BBWEState:
    return BBWEState(
        np.zeros(2 * FEATURE_DIM, np.float32),
        np.zeros(2 * COND_DIM, np.float32),
        np.zeros(COND_DIM, np.float32),
        nndsp.adaconv_init(1, 3, KSIZE),
        nndsp.adaconv_init(3, 3, KSIZE),
        nndsp.adaconv_init(3, 1, KSIZE),
        nndsp.adashape_init(COND_DIM, FRAME32, TDSHAPE1_AVG_POOL,
                            TDSHAPE_INTERPOLATE),
        nndsp.adashape_init(COND_DIM, FRAME48, TDSHAPE2_AVG_POOL,
                            TDSHAPE_INTERPOLATE),
        (resamp_init(), resamp_init(), resamp_init()),
        np.zeros(OUTPUT_DELAY, np.int16))


_WIN16 = nndsp.compute_overlap_window(FRAME16 // 2)
_WIN32 = nndsp.compute_overlap_window(FRAME32 // 2)
_WIN48 = nndsp.compute_overlap_window(FRAME48 // 2)


def feature_net(model: BBWEModel, state: BBWEState,
                features: np.ndarray):
    """(reference: bbwe_feature_net dnn/osce.c:855).  features:
    [num_frames, 114].  Returns (state, cond [2*num_frames, 128])."""
    c1_mem, c2_mem, gru = state.fnet_conv1_mem, state.fnet_conv2_mem, \
        state.fnet_gru
    num_frames = features.shape[0]
    c1_out = []
    for f in range(num_frames):
        o, c1_mem = nn.conv1d(model.fnet_conv1,
                              c1_mem, np.asarray(features[f],
                                                 np.float32),
                              nn.ACTIVATION_TANH)
        c1_out.append(np.asarray(o, np.float32))
    c2_out = []
    for f in range(num_frames):
        o, c2_mem = nn.conv1d(model.fnet_conv2, c2_mem, c1_out[f],
                              nn.ACTIVATION_TANH)
        c2_out.append(np.asarray(o, np.float32))
    cond = np.empty((2 * num_frames, COND_DIM), np.float32)
    for f in range(num_frames):
        up = np.asarray(nn.dense(model.fnet_tconv, c2_out[f],
                                 nn.ACTIVATION_TANH), np.float32)
        for sf in range(2):
            gru = np.asarray(
                nn.gru(model.fnet_gru_input, model.fnet_gru_recurrent,
                       gru, up[sf * COND_DIM:(sf + 1) * COND_DIM]),
                np.float32)
            cond[2 * f + sf] = gru
    return state._replace(fnet_conv1_mem=c1_mem, fnet_conv2_mem=c2_mem,
                          fnet_gru=gru), cond


class BBWE:
    """Stateful per-stream wrapper: features + nets + output delay."""

    def __init__(self, model: BBWEModel):
        self.model = model
        self.state = init_state()
        self.feat_state = bwe_feature_init()

    def process(self, xq16: np.ndarray) -> np.ndarray:
        n16 = len(xq16)
        assert n16 in (160, 320)
        num_sub = 2 * (n16 // 160)
        self.feat_state, feats = bwe_calculate_features(self.feat_state,
                                                        xq16)
        self.state, cond = feature_net(self.model, self.state, feats)
        m, s = self.model, self.state
        x_in = np.asarray(xq16, np.float32) / 32768.0
        out48 = np.empty(3 * n16, np.float32)
        af1, af2, af3 = s.af1, s.af2, s.af3
        td1, td2 = s.tdshape1, s.tdshape2
        rs = list(s.resamp)
        for sf in range(num_sub):
            c = cond[sf]
            # stage 1: 1 -> 3 channels at 16 kHz
            af1, y3 = nndsp.adaconv_process_frame(
                af1, x_in[sf * FRAME16:(sf + 1) * FRAME16], c,
                m.af1[0], m.af1[1], FRAME16, FRAME16 // 2, 1, 3,
                KSIZE, KSIZE - 1, GAIN_A, GAIN_B, _WIN16)
            y3 = y3.reshape(3, FRAME16)
            # 2x upsample each channel
            up = np.empty((3, FRAME32), np.float32)
            for ch in range(3):
                rs[ch], u = upsamp_2x(rs[ch], y3[ch])
                up[ch] = u
            # shape channel 2, nonlinear channel 3
            td1, shaped = nndsp.adashape_process_frame(
                td1, up[1], c, m.tdshape1[0], m.tdshape1[1],
                m.tdshape1[2], FRAME32, TDSHAPE1_AVG_POOL,
                TDSHAPE_INTERPOLATE)
            up[1] = shaped
            up[2] = valin_activation(up[2])
            # stage 2 mixing: 3 -> 3 at 32 kHz
            af2, y32 = nndsp.adaconv_process_frame(
                af2, up.reshape(-1), c, m.af2[0], m.af2[1], FRAME32,
                FRAME32 // 2, 3, 3, KSIZE, KSIZE - 1, GAIN_A, GAIN_B,
                _WIN32)
            y32 = y32.reshape(3, FRAME32)
            # 3/2 interpolation each channel
            up48 = np.empty((3, FRAME48), np.float32)
            for ch in range(3):
                rs[ch], u = interpol_3_2(rs[ch], y32[ch])
                up48[ch] = u
            td2, shaped = nndsp.adashape_process_frame(
                td2, up48[1], c, m.tdshape2[0], m.tdshape2[1],
                m.tdshape2[2], FRAME48, TDSHAPE2_AVG_POOL,
                TDSHAPE_INTERPOLATE)
            up48[1] = shaped
            up48[2] = valin_activation(up48[2])
            # final mixdown 3 -> 1 at 48 kHz
            af3, y48 = nndsp.adaconv_process_frame(
                af3, up48.reshape(-1), c, m.af3[0], m.af3[1], FRAME48,
                FRAME48 // 2, 3, 1, KSIZE, KSIZE - 1, GAIN_A, GAIN_B,
                _WIN48)
            out48[sf * FRAME48:(sf + 1) * FRAME48] = y48
        self.state = s._replace(af1=af1, af2=af2, af3=af3,
                                tdshape1=td1, tdshape2=td2,
                                resamp=tuple(rs))
        # scale + 21-sample output delay (osce.c:1523-1539)
        q = np.floor(0.5 + np.clip(32768.0 * out48, -32767, 32767)) \
            .astype(np.int16)
        out = np.concatenate([self.state.out_buffer,
                              q[:-OUTPUT_DELAY]])
        self.state = self.state._replace(out_buffer=q[-OUTPUT_DELAY:])
        return out


def random_model(seed=0) -> BBWEModel:
    rng = np.random.default_rng(seed)

    def rl(m, n, bias=True):
        w = (rng.standard_normal((m, n)) / np.sqrt(m)) \
            .astype(np.float32)
        b = (rng.standard_normal(n) * 0.1).astype(np.float32) if bias \
            else None
        return nn.np_linear(w, b)

    def shape(frame, pool):
        hidden = frame // TDSHAPE_INTERPOLATE
        tenv = frame // pool
        return (rl(2 * COND_DIM, hidden, bias=False),
                rl(2 * (tenv + 1), hidden, bias=False),
                rl(2 * hidden, hidden, bias=False))

    return BBWEModel(
        fnet_conv1=rl(3 * FEATURE_DIM, COND_DIM),
        fnet_conv2=rl(3 * COND_DIM, COND_DIM),
        fnet_tconv=rl(COND_DIM, 2 * COND_DIM),
        fnet_gru_input=rl(COND_DIM, 3 * COND_DIM),
        fnet_gru_recurrent=rl(COND_DIM, 3 * COND_DIM),
        af1=(rl(COND_DIM, 3 * KSIZE), rl(COND_DIM, 3)),
        af2=(rl(COND_DIM, 9 * KSIZE), rl(COND_DIM, 3)),
        af3=(rl(COND_DIM, 3 * KSIZE), rl(COND_DIM, 1)),
        tdshape1=shape(FRAME32, TDSHAPE1_AVG_POOL),
        tdshape2=shape(FRAME48, TDSHAPE2_AVG_POOL))

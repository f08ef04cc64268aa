"""Deep packet-loss concealment (reference: dnn/lpcnet_plc.c).

A small feature-prediction GRU (the PLC model, dnn/torch/plc/plc.py:
57 -> 128 -> 2x GRU128 -> 20) runs on [burg cepstra | features | lost
flag] and predicts the next feature frame; FARGAN synthesizes the
concealed waveform.  FEC features (from DRED or LBRR-style sources)
enter through a queue and take precedence over prediction.  This is a
per-stream control state machine with heavy scalar bookkeeping; the
tensor math inside (features, PLC net, FARGAN) is the batched JAX
code from the sibling modules."""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from . import fargan as fg
from . import features as feat
from . import nnet as nn
from . import pitchdnn as pdnn
from .weights import linear_params

NB_FEATURES = 20
NB_BANDS = 18
FRAME_SIZE = 160
CONT_VECTORS = 5
PLC_MAX_FEC = 104
PLC_BUF_SIZE = (CONT_VECTORS + 10) * FRAME_SIZE
# (reference: att_table dnn/lpcnet_plc.c:134)
_ATT_TABLE = (0, 0, -.2, -.2, -.4, -.4, -.8, -.8, -1.6, -1.6)


class PLCModel(NamedTuple):
    dense_in: nn.Linear            # 57 -> 128, tanh
    gru1_input: nn.Linear          # 128 -> 384
    gru1_recurrent: nn.Linear      # 128 -> 384
    gru2_input: nn.Linear          # 128 -> 384
    gru2_recurrent: nn.Linear      # 128 -> 384
    dense_out: nn.Linear           # 128 -> 20, linear


def compute_plc_pred(model: PLCModel, net, features):
    """(reference: compute_plc_pred dnn/lpcnet_plc.c:106).  net is
    (gru1_state, gru2_state); returns (new_net, 20-dim prediction)."""
    g1, g2 = net
    tmp = nn.dense(model.dense_in, features, nn.ACTIVATION_TANH)
    g1 = nn.gru(model.gru1_input, model.gru1_recurrent, g1, tmp)
    g2 = nn.gru(model.gru2_input, model.gru2_recurrent, g2, g1)
    out = nn.dense(model.dense_out, g2, nn.ACTIVATION_LINEAR)
    return (g1, g2), np.asarray(out, np.float32)


def random_model(seed=0) -> PLCModel:
    r = np.random.default_rng(seed)

    def rl(m, n):
        w = (r.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
        b = (r.standard_normal(n) * 0.1).astype(np.float32)
        return nn.np_linear(w, b)

    return PLCModel(rl(57, 128), rl(128, 384), rl(128, 384),
                    rl(128, 384), rl(128, 384), rl(128, 20))


def model_from_arrays(arrays) -> PLCModel:
    def lin(name, m, n):
        return linear_params(arrays,
                             float_weights=f"{name}_weights_float",
                             bias=f"{name}_bias", nb_inputs=m,
                             nb_outputs=n)
    return PLCModel(lin("plc_dense_in", 57, 128),
                    lin("plc_gru1_input", 128, 384),
                    lin("plc_gru1_recurrent", 128, 384),
                    lin("plc_gru2_input", 128, 384),
                    lin("plc_gru2_recurrent", 128, 384),
                    lin("plc_dense_out", 128, 20))


def model_to_arrays(model: PLCModel):
    from .weights import WeightArray, WEIGHT_TYPE_FLOAT
    names = ("plc_dense_in", "plc_gru1_input", "plc_gru1_recurrent",
             "plc_gru2_input", "plc_gru2_recurrent", "plc_dense_out")
    out = []
    for name, lin in zip(names, model):
        out.append(WeightArray(f"{name}_weights_float",
                               WEIGHT_TYPE_FLOAT,
                               np.asarray(lin.w, np.float32)
                               .reshape(-1)))
        out.append(WeightArray(f"{name}_bias", WEIGHT_TYPE_FLOAT,
                               np.asarray(lin.bias, np.float32)))
    return out


def _zero_net():
    return (np.zeros(128, np.float32), np.zeros(128, np.float32))


class LPCNetPLC:
    """Per-stream deep-PLC state (reference: LPCNetPLCState
    dnn/lpcnet_private.h:50, logic dnn/lpcnet_plc.c:72-210)."""

    def __init__(self, plc_model: PLCModel,
                 pitch_model: pdnn.PitchDNNModel,
                 fargan_model: fg.FARGANModel):
        self.model = plc_model
        self.pitch_model = pitch_model
        self.fargan_model = fargan_model
        self.reset()

    def reset(self):
        self.enc = feat.init_state()
        self.fargan = fg.init_state()
        self.fec = np.zeros((PLC_MAX_FEC, NB_FEATURES), np.float32)
        self.fec_read_pos = self.fec_fill_pos = self.fec_skip = 0
        self.analysis_gap = 1
        self.analysis_pos = PLC_BUF_SIZE
        self.predict_pos = PLC_BUF_SIZE
        self.pcm = np.zeros(PLC_BUF_SIZE, np.float32)
        self.blend = 0
        self.features = np.zeros(feat.NB_TOTAL_FEATURES, np.float32)
        self.cont_features = np.zeros(CONT_VECTORS * NB_FEATURES,
                                      np.float32)
        self.loss_count = 0
        self.plc_net = _zero_net()
        self.plc_bak = [_zero_net(), _zero_net()]

    # --- FEC queue (lpcnet_plc.c:92-104) ---
    def fec_add(self, features: Optional[np.ndarray]):
        if features is None:
            self.fec_skip += 1
            return
        assert self.fec_fill_pos < PLC_MAX_FEC
        self.fec[self.fec_fill_pos] = features[:NB_FEATURES]
        self.fec_fill_pos += 1

    def fec_clear(self):
        self.fec_read_pos = self.fec_fill_pos = self.fec_skip = 0

    def _queue_features(self, features):
        self.cont_features[:-NB_FEATURES] = \
            self.cont_features[NB_FEATURES:]
        self.cont_features[-NB_FEATURES:] = features[:NB_FEATURES]

    def _get_fec_or_pred(self, out: np.ndarray) -> int:
        # (reference: get_fec_or_pred lpcnet_plc.c:119)
        if self.fec_read_pos != self.fec_fill_pos and self.fec_skip == 0:
            out[:NB_FEATURES] = self.fec[self.fec_read_pos]
            self.fec_read_pos += 1
            plc_in = np.zeros(57, np.float32)
            plc_in[2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES] = \
                out[:NB_FEATURES]
            plc_in[2 * NB_BANDS + NB_FEATURES] = -1
            self.plc_net, _ = compute_plc_pred(self.model, self.plc_net,
                                               plc_in)
            return 1
        self.plc_net, pred = compute_plc_pred(
            self.model, self.plc_net, np.zeros(57, np.float32))
        out[:NB_FEATURES] = pred
        if self.fec_skip > 0:
            self.fec_skip -= 1
        return 0

    def update(self, pcm: np.ndarray):
        """Good frame received (reference: lpcnet_plc_update
        lpcnet_plc.c:144).  pcm: int16 [160]."""
        if self.analysis_pos - FRAME_SIZE >= 0:
            self.analysis_pos -= FRAME_SIZE
        else:
            self.analysis_gap = 1
        if self.predict_pos - FRAME_SIZE >= 0:
            self.predict_pos -= FRAME_SIZE
        self.pcm[:-FRAME_SIZE] = self.pcm[FRAME_SIZE:]
        self.pcm[-FRAME_SIZE:] = np.asarray(pcm, np.float32) / 32768.0
        self.loss_count = 0
        self.blend = 0

    def conceal(self, pcm_out: np.ndarray):
        """Lost frame: synthesize 160 samples into pcm_out (int16)
        (reference: lpcnet_plc_conceal lpcnet_plc.c:157)."""
        if self.blend == 0:
            count = 0
            self.plc_net = self.plc_bak[0]
            while self.analysis_pos + FRAME_SIZE <= PLC_BUF_SIZE:
                x = 32768.0 * self.pcm[self.analysis_pos:
                                       self.analysis_pos + FRAME_SIZE]
                burg = feat.burg_cepstral_analysis(x)
                self.enc, self.features = feat.compute_frame_features(
                    self.enc, x, self.pitch_model)
                if (not self.analysis_gap or count > 0) \
                        and self.analysis_pos >= self.predict_pos:
                    self._queue_features(self.features)
                    plc_in = np.concatenate(
                        [burg, self.features[:NB_FEATURES],
                         [1.0]]).astype(np.float32)
                    self.plc_bak[0] = self.plc_bak[1]
                    self.plc_bak[1] = self.plc_net
                    self.plc_net, pred = compute_plc_pred(
                        self.model, self.plc_net, plc_in)
                    self.features[:NB_FEATURES] = pred
                self.analysis_pos += FRAME_SIZE
                count += 1
            for _ in range(2):
                self.plc_bak[0] = self.plc_bak[1]
                self.plc_bak[1] = self.plc_net
                self._get_fec_or_pred(self.features)
                self._queue_features(self.features)
            self.fargan = fg.cont(
                self.fargan_model, self.fargan,
                self.pcm[PLC_BUF_SIZE - fg.FARGAN_CONT_SAMPLES:],
                self.cont_features.reshape(CONT_VECTORS, NB_FEATURES))
            self.analysis_gap = 0
        self.plc_bak[0] = self.plc_bak[1]
        self.plc_bak[1] = self.plc_net
        if self._get_fec_or_pred(self.features):
            self.loss_count = 0
        else:
            self.loss_count += 1
        if self.loss_count >= 10:
            self.features[0] = max(-15.0, self.features[0]
                                   + _ATT_TABLE[9]
                                   - 2 * (self.loss_count - 9))
        else:
            self.features[0] = max(-15.0, self.features[0]
                                   + _ATT_TABLE[self.loss_count])
        self.fargan, out = fg.synthesize_frame(
            self.fargan_model, self.fargan,
            self.features[:NB_FEATURES])
        out = np.asarray(out, np.float64)
        pcm_out[:] = np.floor(
            0.5 + np.clip(32768.0 * out, -32767, 32767)).astype(np.int16)
        self._queue_features(self.features)
        if self.analysis_pos - FRAME_SIZE >= 0:
            self.analysis_pos -= FRAME_SIZE
        else:
            self.analysis_gap = 1
        self.predict_pos = PLC_BUF_SIZE
        self.pcm[:-FRAME_SIZE] = self.pcm[FRAME_SIZE:]
        self.pcm[-FRAME_SIZE:] = pcm_out.astype(np.float32) / 32768.0
        self.blend = 1

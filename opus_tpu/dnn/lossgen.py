"""Generative packet-loss simulator (reference: dnn/lossgen.c;
architecture from dnn/torch/lossgen/lossgen.py: 2 -> 8 -> GRU16 ->
GRU16 -> 1).

A tiny GRU models bursty network loss: input is (last_loss,
percent_loss), output is the probability the next packet is lost.
Drives the `-sim_loss` option of the demo tool."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import nnet as nn
from .weights import linear_params

_BURN_IN = 1000        # (reference: sample_loss dnn/lossgen.c:148)


class LossGenModel(NamedTuple):
    dense_in: nn.Linear        # 2 -> 8, tanh
    gru1_input: nn.Linear      # 8 -> 48
    gru1_recurrent: nn.Linear  # 16 -> 48
    gru2_input: nn.Linear      # 16 -> 48
    gru2_recurrent: nn.Linear  # 16 -> 48
    dense_out: nn.Linear       # 16 -> 1, sigmoid


def random_model(seed=0) -> LossGenModel:
    r = np.random.default_rng(seed)

    def rl(m, n):
        w = (r.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32)
        b = (r.standard_normal(n) * 0.1).astype(np.float32)
        return nn.np_linear(w, b)

    return LossGenModel(rl(2, 8), rl(8, 48), rl(16, 48), rl(16, 48),
                        rl(16, 48), rl(16, 1))


def model_from_arrays(arrays) -> LossGenModel:
    def lin(name, m, n):
        return linear_params(arrays,
                             float_weights=f"{name}_weights_float",
                             bias=f"{name}_bias", nb_inputs=m,
                             nb_outputs=n)
    return LossGenModel(lin("lossgen_dense_in", 2, 8),
                        lin("lossgen_gru1_input", 8, 48),
                        lin("lossgen_gru1_recurrent", 16, 48),
                        lin("lossgen_gru2_input", 16, 48),
                        lin("lossgen_gru2_recurrent", 16, 48),
                        lin("lossgen_dense_out", 16, 1))


class LossGen:
    """(reference: LossGenState dnn/lossgen.h; sampling
    dnn/lossgen.c:116-154).  rng is injectable for reproducibility
    (the C uses rand())."""

    def __init__(self, model: LossGenModel, seed: int = 0):
        self.model = model
        self.g1 = np.zeros(16, np.float32)
        self.g2 = np.zeros(16, np.float32)
        self.last_loss = 0.0
        self.used = False
        self.rng = np.random.default_rng(seed)

    def _impl(self, percent_loss: float) -> int:
        m = self.model
        x = np.array([self.last_loss, percent_loss], np.float32)
        tmp = nn.dense(m.dense_in, x, nn.ACTIVATION_TANH)
        self.g1 = np.asarray(nn.gru(m.gru1_input, m.gru1_recurrent,
                                    self.g1, tmp))
        self.g2 = np.asarray(nn.gru(m.gru2_input, m.gru2_recurrent,
                                    self.g2, self.g1))
        out = float(np.asarray(nn.dense(m.dense_out, self.g2,
                                        nn.ACTIVATION_SIGMOID))[0])
        loss = int(self.rng.random() < out)
        self.last_loss = loss
        return loss

    def sample(self, percent_loss: float) -> int:
        if not self.used:
            for _ in range(_BURN_IN):
                self._impl(percent_loss)
            self.used = True
        return self._impl(percent_loss)

"""Adaptive NN-DSP primitives for OSCE (reference: dnn/nndsp.c).

Three streaming ops driven by per-frame feature vectors:
- adaconv: data-dependent FIR whose kernel+gain come from dense layers,
  cross-faded with last frame's kernel over an overlap window;
- adacomb: data-dependent pitch comb filter with per-frame lag;
- adashape: temporal-envelope-conditioned gain shaping.

All math is float32 numpy mirroring the C exactly (these run per
20 ms frame at 16 kHz; the batched TPU path vmaps one level up)."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import nnet as nn

ADACONV_MAX_KERNEL_SIZE = 32
ADACOMB_MAX_LAG = 300


def compute_overlap_window(overlap_size: int) -> np.ndarray:
    """(reference: compute_overlap_window dnn/nndsp.c:63)"""
    i = np.arange(overlap_size)
    return (0.5 + 0.5 * np.cos(np.pi * (i + 0.5) / overlap_size)) \
        .astype(np.float32)


def _scale_kernel(kernel, in_ch, out_ch, ksize, gain):
    """p-norm normalize over (in_ch, kernel) (reference: scale_kernel
    dnn/nndsp.c:81)."""
    k = kernel.reshape(out_ch, in_ch, ksize)
    norm = 1.0 / (1e-6 + np.sqrt(np.sum(k.astype(np.float64) ** 2,
                                        axis=(1, 2))))
    return (k * (norm * gain)[:, None, None]).astype(np.float32)


def _xcorr(kernel: np.ndarray, x: np.ndarray, n: int) -> np.ndarray:
    """out[i] = sum_j kernel[j] * x[i+j] (reference: celt_pitch_xcorr
    celt/pitch.c:185 semantics as used by nndsp)."""
    klen = len(kernel)
    out = np.empty(n, np.float64)
    for i in range(n):
        out[i] = np.dot(kernel, x[i:i + klen])
    return out.astype(np.float32)


class AdaConvState(NamedTuple):
    history: np.ndarray        # [in_ch, kernel_size]
    last_kernel: np.ndarray    # [out_ch, in_ch, kernel_size]


def adaconv_init(in_ch, out_ch, ksize) -> AdaConvState:
    return AdaConvState(np.zeros((in_ch, ksize), np.float32),
                        np.zeros((out_ch, in_ch, ksize), np.float32))


def adaconv_process_frame(state: AdaConvState, x_in: np.ndarray,
                          features: np.ndarray,
                          kernel_layer: nn.Linear,
                          gain_layer: nn.Linear, frame_size: int,
                          overlap_size: int, in_ch: int, out_ch: int,
                          ksize: int, left_padding: int,
                          gain_a: float, gain_b: float,
                          window: np.ndarray):
    """(reference: adaconv_process_frame dnn/nndsp.c:133).  x_in:
    [in_ch*frame_size].  Returns (new_state, x_out [out_ch*frame])."""
    assert left_padding == ksize - 1, "causal only"
    x_in = np.asarray(x_in, np.float32).reshape(in_ch, frame_size)
    kernel = np.asarray(nn.dense(kernel_layer, features,
                                 nn.ACTIVATION_LINEAR), np.float32)
    gain = np.asarray(nn.dense(gain_layer, features,
                               nn.ACTIVATION_TANH), np.float32)
    gain = np.exp(gain_a * gain + gain_b)
    kernel = _scale_kernel(kernel, in_ch, out_ch, ksize, gain)

    # padded per-channel input: [history | frame], kernels are applied
    # via correlation starting at -left_padding
    buf = np.concatenate([state.history, x_in], axis=1)  # [in, ks+fr]
    out = np.zeros((out_ch, frame_size), np.float32)
    for oc in range(out_ch):
        for ic in range(in_ch):
            # start index of x for lag 0: ksize - left_padding = 1
            seg = buf[ic, ksize - left_padding:]
            c0 = _xcorr(state.last_kernel[oc, ic], seg, overlap_size)
            c1 = _xcorr(kernel[oc, ic], seg, frame_size)
            out[oc, :overlap_size] += window * c0 \
                + (1.0 - window) * c1[:overlap_size]
            out[oc, overlap_size:] += c1[overlap_size:]
    new_state = AdaConvState(buf[:, frame_size:].copy(), kernel)
    return new_state, out.reshape(-1)


class AdaCombState(NamedTuple):
    history: np.ndarray        # [kernel_size + MAX_LAG]
    last_kernel: np.ndarray    # [kernel_size]
    last_pitch_lag: int
    last_global_gain: float


def adacomb_init(ksize) -> AdaCombState:
    return AdaCombState(np.zeros(ksize + ADACOMB_MAX_LAG, np.float32),
                        np.zeros(ksize, np.float32), 0, 0.0)


def adacomb_process_frame(state: AdaCombState, x_in: np.ndarray,
                          features: np.ndarray,
                          kernel_layer: nn.Linear,
                          gain_layer: nn.Linear,
                          global_gain_layer: nn.Linear, pitch_lag: int,
                          frame_size: int, overlap_size: int,
                          ksize: int, left_padding: int, gain_a: float,
                          gain_b: float, log_gain_limit: float,
                          window: np.ndarray):
    """(reference: adacomb_process_frame dnn/nndsp.c:245)"""
    x_in = np.asarray(x_in, np.float32)
    kernel = np.asarray(nn.dense(kernel_layer, features,
                                 nn.ACTIVATION_LINEAR), np.float32)
    gain = float(np.asarray(nn.dense(gain_layer, features,
                                     nn.ACTIVATION_RELU))[0])
    ggain = float(np.asarray(nn.dense(global_gain_layer, features,
                                      nn.ACTIVATION_TANH))[0])
    gain = np.exp(log_gain_limit - gain)
    ggain = np.exp(gain_a * ggain + gain_b)
    kernel = _scale_kernel(kernel, 1, 1, ksize,
                           np.array([gain], np.float32))[0, 0]

    buf = np.concatenate([state.history, x_in])
    p = ksize + ADACOMB_MAX_LAG        # index of frame start in buf
    last = _xcorr(state.last_kernel,
                  buf[p - left_padding - state.last_pitch_lag:],
                  overlap_size)
    cur = _xcorr(kernel, buf[p - left_padding - pitch_lag:], frame_size)
    out = np.empty(frame_size, np.float32)
    w = window
    out[:overlap_size] = state.last_global_gain * w * last \
        + ggain * (1.0 - w) * cur[:overlap_size]
    out[:overlap_size] += (w * state.last_global_gain
                           + (1.0 - w) * ggain) * x_in[:overlap_size]
    out[overlap_size:] = ggain * (cur[overlap_size:]
                                  + x_in[overlap_size:frame_size])
    new_state = AdaCombState(
        buf[frame_size:frame_size + ksize + ADACOMB_MAX_LAG].copy(),
        kernel.copy(), pitch_lag, float(ggain))
    return new_state, out


class AdaShapeState(NamedTuple):
    alpha1f_mem: np.ndarray
    alpha1t_mem: np.ndarray
    alpha2_mem: np.ndarray
    interpolate_state: float


def adashape_init(feature_dim, frame_size, avg_pool_k,
                  interpolate_k=1) -> AdaShapeState:
    hidden = frame_size // interpolate_k
    tenv = frame_size // avg_pool_k
    return AdaShapeState(np.zeros(feature_dim, np.float32),
                         np.zeros(tenv + 1, np.float32),
                         np.zeros(hidden, np.float32), 0.0)


def adashape_process_frame(state: AdaShapeState, x_in: np.ndarray,
                           features: np.ndarray, alpha1f: nn.Linear,
                           alpha1t: nn.Linear, alpha2: nn.Linear,
                           frame_size: int, avg_pool_k: int,
                           interpolate_k: int = 1):
    """(reference: adashape_process_frame dnn/nndsp.c:338)"""
    x_in = np.asarray(x_in, np.float32)
    hidden = frame_size // interpolate_k
    tenv_size = frame_size // avg_pool_k
    # temporal envelope, log-domain, mean-removed
    tenv = np.abs(x_in.reshape(tenv_size, avg_pool_k)) \
        .sum(axis=1).astype(np.float32) / avg_pool_k
    tenv = np.log(tenv + np.float32(1.52587890625e-05))
    mean = float(tenv.mean())
    tenv = np.concatenate([tenv - mean, [mean]]).astype(np.float32)

    f_out, a1f_mem = nn.conv1d(alpha1f, state.alpha1f_mem, features,
                               nn.ACTIVATION_LINEAR)
    t_out, a1t_mem = nn.conv1d(alpha1t, state.alpha1t_mem, tenv,
                               nn.ACTIVATION_LINEAR)
    tmp = np.asarray(f_out, np.float32)[:hidden] \
        + np.asarray(t_out, np.float32)[:hidden]
    tmp = np.where(tmp >= 0, tmp, 0.2 * tmp).astype(np.float32)
    a2_out, a2_mem = nn.conv1d(alpha2, state.alpha2_mem, tmp,
                               nn.ACTIVATION_LINEAR)
    a2_out = np.asarray(a2_out, np.float32)
    # linear-interp upsampling (identity at interpolate_k == 1 except
    # for the one-sample state delay semantics)
    out = np.empty(frame_size, np.float32)
    prev = state.interpolate_state
    for i in range(hidden):
        for k in range(interpolate_k):
            alpha = (k + 1) / interpolate_k
            out[i * interpolate_k + k] = alpha * a2_out[i] \
                + (1.0 - alpha) * prev
        prev = float(a2_out[i])
    shaped = np.asarray(nn.compute_activation(out, nn.ACTIVATION_EXP),
                        np.float32) * x_in
    new_state = AdaShapeState(np.asarray(a1f_mem, np.float32),
                              np.asarray(a1t_mem, np.float32),
                              np.asarray(a2_mem, np.float32), prev)
    return new_state, shaped

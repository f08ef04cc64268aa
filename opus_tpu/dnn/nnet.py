"""Neural layer runtime (reference: dnn/nnet.c, dnn/nnet_arch.h,
dnn/vec.h).

TPU-first design: every layer is a pure function over a pytree of dense
float32 weights.  The reference's int8/sparse CPU formats
(cgemv8x4/sparse_sgemv8x4, dnn/vec.h:110-282) are dequantized to dense
matrices at load time (opus_tpu.dnn.weights) -- on the MXU a dense
bf16/f32 matmul beats any sparse gather, and XLA fuses the activation.
All ops broadcast over leading batch dims and are jit/scan safe.

Activations reproduce the reference's polynomial approximations
(tanh_approx dnn/vec.h:338, lpcnet_exp2 dnn/vec.h:317) in float32 so
that outputs track the C implementation closely enough for the
conformance metrics, while remaining cheap vectorized TPU code.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

ACTIVATION_LINEAR = 0
ACTIVATION_SIGMOID = 1
ACTIVATION_TANH = 2
ACTIVATION_RELU = 3
ACTIVATION_SOFTMAX = 4
ACTIVATION_SWISH = 5
ACTIVATION_EXP = 6


class Linear(NamedTuple):
    """Dense affine layer.  `w` is [nb_inputs, nb_outputs] so application
    is `x @ w` (the reference stores column-major [j*stride+i], which is
    exactly this layout flattened; dnn/nnet_arch.h:123 sgemv)."""
    w: jax.Array                       # [M, N]
    bias: Optional[jax.Array] = None   # [N]
    diag: Optional[jax.Array] = None   # [3*M], GRU recurrent only


class Conv2d(NamedTuple):
    """Non-padded 2-D conv over [time, height] with per-frame streaming
    (reference: Conv2dLayer dnn/nnet.h:79, conv2d_float
    dnn/nnet_arch.h:162)."""
    w: jax.Array                       # [out_ch, in_ch, ktime, kheight]
    bias: Optional[jax.Array] = None   # [out_ch]


def tanh_approx(x: jax.Array) -> jax.Array:
    """Rational tanh approximation (reference: dnn/vec.h:338)."""
    x = jnp.asarray(x, jnp.float32)
    n0, n1, n2 = jnp.float32(952.52801514), jnp.float32(96.39235687), \
        jnp.float32(0.60863042)
    d0, d1, d2 = jnp.float32(952.72399902), jnp.float32(413.36801147), \
        jnp.float32(11.88600922)
    x2 = x * x
    num = (n2 * x2 + n1) * x2 + n0
    den = (d2 * x2 + d1) * x2 + d0
    return jnp.clip(num * x / den, -1.0, 1.0)


def sigmoid_approx(x: jax.Array) -> jax.Array:
    """(reference: dnn/vec.h:354)"""
    return jnp.float32(0.5) + jnp.float32(0.5) * tanh_approx(
        jnp.float32(0.5) * jnp.asarray(x, jnp.float32))


def lpcnet_exp2(x: jax.Array) -> jax.Array:
    """Bit-twiddled 2**x approximation (reference: dnn/vec.h:317)."""
    x = jnp.asarray(x, jnp.float32)
    integer = jnp.floor(x)
    frac = x - integer
    f = jnp.float32(0.99992522) + frac * (
        jnp.float32(0.69583354) + frac * (
            jnp.float32(0.22606716) + jnp.float32(0.078024523) * frac))
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    bits = (bits + (integer.astype(jnp.int32) << 23)) & 0x7FFFFFFF
    res = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(integer < -50, jnp.float32(0.0), res)


def lpcnet_exp(x: jax.Array) -> jax.Array:
    """(reference: dnn/vec.h:335)"""
    return lpcnet_exp2(jnp.asarray(x, jnp.float32)
                       * jnp.float32(1.44269504))


def compute_activation(x: jax.Array, activation: int) -> jax.Array:
    """(reference: compute_activation_c dnn/nnet_arch.h:69).
    ACTIVATION_SOFTMAX is a normalized softmax built on the approx exp
    (the SOFTMAX_HACK in dnn/nnet.c:57 is not visible to the compiled
    nnet_arch.h translation unit); ACTIVATION_EXP is elementwise."""
    if activation == ACTIVATION_SIGMOID:
        return sigmoid_approx(x)
    if activation == ACTIVATION_TANH:
        return tanh_approx(x)
    if activation == ACTIVATION_SWISH:
        return x * sigmoid_approx(x)
    if activation == ACTIVATION_RELU:
        return jnp.maximum(x, 0.0)
    if activation == ACTIVATION_SOFTMAX:
        e = lpcnet_exp(x)
        return e / (jnp.sum(e, axis=-1, keepdims=True)
                    + jnp.float32(1e-30))
    if activation == ACTIVATION_EXP:
        return lpcnet_exp(x)
    assert activation == ACTIVATION_LINEAR
    return x


def linear(layer: Linear, x: jax.Array) -> jax.Array:
    """out = x @ w + bias (+ GRU diag term) (reference: compute_linear_c
    dnn/nnet_arch.h:123-154).  x: [..., M] -> [..., N]."""
    out = jnp.asarray(x, jnp.float32) @ layer.w
    if layer.bias is not None:
        out = out + layer.bias
    if layer.diag is not None:
        # diag is only used for GRU recurrent weights: N == 3*M and
        # out[k*M + i] += diag[k*M + i] * x[i]  (nnet_arch.h:145-153)
        assert 3 * x.shape[-1] == out.shape[-1]
        x3 = jnp.concatenate([x, x, x], axis=-1)
        out = out + layer.diag * jnp.asarray(x3, jnp.float32)
    return out


def dense(layer: Linear, x: jax.Array, activation: int) -> jax.Array:
    """(reference: compute_generic_dense dnn/nnet.c:59)"""
    return compute_activation(linear(layer, x), activation)


def gru(input_w: Linear, recurrent_w: Linear, state: jax.Array,
        x: jax.Array) -> jax.Array:
    """One GRU step; returns the new state (reference:
    compute_generic_gru dnn/nnet.c:76, gate order z|r|h)."""
    n = state.shape[-1]
    zrh = linear(input_w, x)
    recur = linear(recurrent_w, state)
    zr = sigmoid_approx(zrh[..., :2 * n] + recur[..., :2 * n])
    z, r = zr[..., :n], zr[..., n:]
    h = tanh_approx(zrh[..., 2 * n:] + recur[..., 2 * n:] * r)
    return z * state + (1.0 - z) * h


def glu(layer: Linear, x: jax.Array) -> jax.Array:
    """Gated linear unit: x * sigmoid(Wx) (reference: compute_glu
    dnn/nnet.c:107)."""
    return x * sigmoid_approx(linear(layer, x))


def conv1d(layer: Linear, mem: jax.Array, x: jax.Array,
           activation: int) -> tuple[jax.Array, jax.Array]:
    """Streaming 1-D conv step: the layer is a dense matmul over the
    concatenated [mem | x] window (reference: compute_generic_conv1d
    dnn/nnet.c:127).  mem: [..., nb_inputs - input_size].  Returns
    (out, new_mem)."""
    input_size = x.shape[-1]
    tmp = jnp.concatenate([mem, jnp.asarray(x, jnp.float32)], axis=-1)
    out = compute_activation(linear(layer, tmp), activation)
    return out, tmp[..., input_size:]


def conv1d_dilated(layer: Linear, mem: jax.Array, x: jax.Array,
                   dilation: int, activation: int
                   ) -> tuple[jax.Array, jax.Array]:
    """Dilated streaming conv (reference: compute_generic_conv1d_dilation
    dnn/nnet.c:138).  mem: [..., input_size*dilation*(ksize-1)] holding
    the raw input history; taps are every `dilation` frames."""
    input_size = x.shape[-1]
    nb_inputs = layer.w.shape[0]
    ksize = nb_inputs // input_size
    if dilation == 1:
        return conv1d(layer, mem, x, activation)
    taps = [mem[..., i * input_size * dilation:
                i * input_size * dilation + input_size]
            for i in range(ksize - 1)]
    tmp = jnp.concatenate(taps + [jnp.asarray(x, jnp.float32)], axis=-1)
    out = compute_activation(linear(layer, tmp), activation)
    new_mem = jnp.concatenate([mem[..., input_size:],
                               jnp.asarray(x, jnp.float32)], axis=-1)
    return out, new_mem


def conv2d(layer: Conv2d, mem: jax.Array, x: jax.Array, height: int,
           activation: int) -> tuple[jax.Array, jax.Array]:
    """One time-frame of a non-padded 2-D conv (reference:
    compute_conv2d_c dnn/nnet_arch.h:217).  x: [..., in_ch,
    height+kheight-1] (caller pads the height axis); mem: [..., ktime-1,
    in_ch, height+kheight-1].  Returns (out [..., out_ch, height],
    new_mem)."""
    _, _, ktime, kheight = layer.w.shape
    x = jnp.asarray(x, jnp.float32)
    buf = jnp.concatenate([mem, x[..., None, :, :]], axis=-3) \
        if ktime > 1 else x[..., None, :, :]        # [..., ktime, in, W]
    # windows over the height axis: [..., ktime, in_ch, kheight, height]
    win = jnp.stack([buf[..., h:h + height] for h in range(kheight)],
                    axis=-2)
    out = jnp.einsum("oith,...tihj->...oj", layer.w, win)
    if layer.bias is not None:
        out = out + layer.bias[..., :, None]
    new_mem = buf[..., 1:, :, :] if ktime > 1 else mem
    return compute_activation(out, activation), new_mem


def embedding(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row lookup (reference embedding layers in dnn/nnet.h zoo)."""
    return jnp.take(table, idx, axis=0)


def np_linear(w: np.ndarray, bias=None, diag=None) -> Linear:
    """Convenience constructor from numpy (used by the blob loader)."""
    return Linear(jnp.asarray(w, jnp.float32),
                  None if bias is None else jnp.asarray(bias, jnp.float32),
                  None if diag is None else jnp.asarray(diag, jnp.float32))

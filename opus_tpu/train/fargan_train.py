"""FARGAN vocoder training in JAX, reusing the runtime forward pass.

TPU-first redesign of the reference trainer
(/root/reference/dnn/torch/fargan/train_fargan.py): the training step
jit-compiles ONE lax.scan over feature frames whose body is the same
`opus_tpu.dnn.fargan.synthesize_frame` the production decoder runs — no
separate training graph to drift out of sync.  The model is primed with
`fargan.cont` on ground-truth history exactly like the deep-PLC runtime
path, then synthesizes autoregressively (gradients flow through the
pitch-buffer recursion: full BPTT over the scanned frames).

Loss: the reference's multi-resolution spectral distortion stack
(train_fargan.py -> fargan_multi_spec_loss: |S|^.5 L1 + log-magnitude
L1 over several FFT sizes) plus a small time-domain L2 anchor for the
first epochs.  Data comes from the dump_data twin
(opus_tpu/train/dump_data.py), i.e. the reference's own feature/PCM
pairing (dump_data.c), so the trainer consumes real LPCNet features —
not synthetic stand-ins.

Export: `export_blob` writes the runtime TLV weight blob under the
exact names `fargan.model_from_arrays` loads
(dnn/torch/fargan/export_fargan_weights.py's naming) — the trained
model round-trips into the production decoder with no conversion step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..dnn import fargan
from ..dnn.weights import write_blob
from .dump_data import dump_data

FRAME = fargan.FARGAN_FRAME_SIZE            # 160 samples @ 16 kHz
CONT_FRAMES = 5                             # fargan_cont priming window
SPEC_SIZES = (128, 256, 512)                # multi-resolution stack


def _stft_mag(x, size: int):
    """Magnitude STFT with a Hann window, hop size/4 ([..., T] f32)."""
    hop = size // 4
    n = x.shape[-1]
    nfr = max((n - size) // hop + 1, 1)
    idx = (jnp.arange(nfr)[:, None] * hop + jnp.arange(size)[None, :])
    frames = x[..., idx] * jnp.hanning(size)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def spec_loss(y, t):
    """Multi-resolution spectral loss (train_fargan.py's
    fargan_multi_spec_loss redesigned in jnp): sqrt-magnitude L1 +
    log-magnitude L1 per FFT size."""
    total = 0.0
    for size in SPEC_SIZES:
        sy = _stft_mag(y, size)
        st = _stft_mag(t, size)
        total = total + jnp.mean(jnp.abs(jnp.sqrt(sy + 1e-7)
                                         - jnp.sqrt(st + 1e-7)))
        total = total + 0.1 * jnp.mean(jnp.abs(
            jnp.log(sy + 1e-5) - jnp.log(st + 1e-5)))
    return total / len(SPEC_SIZES)


def synth_sequence(model: fargan.FARGANModel, features, pcm0):
    """Prime with cont() on ground truth, then synthesize the remaining
    frames with one lax.scan over the runtime synthesize_frame.

    features: [B, T, 36] (only [:20] used); pcm0: [B, 320] ground-truth
    history covering the 2 frames before synthesis starts.
    Returns pcm [B, (T - CONT_FRAMES) * 160]."""
    state = fargan.init_state(features.shape[:1])
    state = fargan.cont(model, state, pcm0,
                        features[:, :CONT_FRAMES, :])

    def step(st, f):
        st, pcm = fargan.synthesize_frame(model, st, f)
        return st, pcm

    fseq = jnp.moveaxis(features[:, CONT_FRAMES:, :], 1, 0)
    _, pcm = jax.lax.scan(step, state, fseq)
    return jnp.moveaxis(pcm, 0, 1).reshape(features.shape[0], -1)


def sequences_from_speech(speech: np.ndarray, seq_frames: int = 24,
                          seed: int = 0):
    """dump_data pipeline -> aligned (features [N, T, 36],
    pcm [N, T*160] float in [-1, 1]) training arrays."""
    feats, pcms = [], []
    for f36, pcm in dump_data(speech, seed=seed, train=False,
                              sequence_length=seq_frames):
        t = min(len(f36), len(pcm) // FRAME)
        if t < seq_frames:
            continue
        feats.append(f36[:seq_frames])
        pcms.append(pcm[:seq_frames * FRAME].astype(np.float32)
                    / 32768.0)
    if not feats:
        raise ValueError("speech too short for one sequence")
    return np.stack(feats), np.stack(pcms)


def loss_fn(model, features, pcm_true, time_w):
    start = CONT_FRAMES * FRAME
    y = synth_sequence(model, features, pcm_true[:, start - 320:start])
    t = pcm_true[:, start:start + y.shape[-1]]
    return spec_loss(y, t) + time_w * jnp.mean((y - t) ** 2)


def train(speech: np.ndarray, steps: int = 60, batch: int = 8,
          seq_frames: int = 16, lr: float = 2e-4, seed: int = 0,
          time_w: float = 10.0, log_every: int = 0):
    """Returns (model, history).  speech: 16 kHz float/int16 1-D."""
    feats, pcm = sequences_from_speech(speech, seq_frames, seed)
    rng = np.random.default_rng(seed)
    model = fargan.random_model(seed)
    opt = optax.adam(lr, b1=0.8, b2=0.99)
    opt_state = opt.init(model)

    @jax.jit
    def update(model, opt_state, f, p):
        val, grads = jax.value_and_grad(loss_fn)(model, f, p,
                                                 jnp.float32(time_w))
        updates, opt_state = opt.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, val

    history = []
    n = feats.shape[0]
    for i in range(steps):
        sel = rng.integers(0, n, size=min(batch, n))
        model, opt_state, val = update(model, opt_state,
                                       jnp.asarray(feats[sel]),
                                       jnp.asarray(pcm[sel]))
        history.append(float(val))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}: loss {history[-1]:.5f}")
    return model, history


def export_blob(model: fargan.FARGANModel) -> bytes:
    """Runtime TLV blob (names per model_from_arrays /
    export_fargan_weights.py)."""
    return write_blob(fargan.model_to_arrays(model))

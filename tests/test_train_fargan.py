"""FARGAN trainer (opus_tpu/train/fargan_train.py): the jitted training
step reuses the runtime forward (fargan.synthesize_frame + cont), the
loss decreases on real dump_data-paired features, and the exported TLV
blob loads back through the production weight reader
(fargan.model_from_arrays) bit-identically.
Reference: dnn/torch/fargan/train_fargan.py, export_fargan_weights.py.
"""

import numpy as np
import jax.numpy as jnp

from opus_tpu.train import fargan_train as FT
from opus_tpu.dnn import fargan
from opus_tpu.dnn.weights import parse_blob


def _speech(seconds=14.0, fs=16000, seed=5):
    """Synthetic voiced/unvoiced speech-like program."""
    rng = np.random.default_rng(seed)
    n = int(seconds * fs)
    t = np.arange(n) / fs
    f0 = 110 * (1 + 0.3 * np.sin(2 * np.pi * 0.7 * t))
    phase = np.cumsum(2 * np.pi * f0 / fs)
    sig = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase + 0.4)
           + 0.1 * np.sin(3 * phase + 0.9))
    env = 0.5 * (1 + np.sin(2 * np.pi * 1.3 * t))
    sig = sig * env + 0.03 * rng.standard_normal(n)
    return np.clip(sig, -1, 1) * 12000.0


def test_fargan_training_loss_decreases_and_blob_roundtrips():
    speech = _speech()
    model, hist = FT.train(speech, steps=12, batch=2, seq_frames=12,
                           lr=3e-4, seed=1)
    assert len(hist) == 12
    head = np.mean(hist[:3])
    tail = np.mean(hist[-3:])
    assert tail < head, (head, tail)

    # TLV export -> production loader round-trip
    blob = FT.export_blob(model)
    loaded = fargan.model_from_arrays(parse_blob(blob))

    feats, pcm = FT.sequences_from_speech(speech, seq_frames=8, seed=2)
    f = jnp.asarray(feats[:1])
    p = jnp.asarray(pcm[:1])
    start = FT.CONT_FRAMES * FT.FRAME
    y0 = np.asarray(FT.synth_sequence(model, f, p[:, start - 320:start]))
    y1 = np.asarray(FT.synth_sequence(loaded, f,
                                      p[:, start - 320:start]))
    assert np.allclose(y0, y1, atol=1e-6)
    assert np.all(np.isfinite(y1))

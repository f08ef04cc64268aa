"""Training layer (opus_tpu/train): the JAX lossgen trainer learns a
bursty-loss model on synthetic Gilbert-Elliott traces, exports a
runtime weight blob, and the runtime LossGen sampler reproduces the
trained statistics — closing the reference's L7 loop
(dnn/torch/lossgen/train_lossgen.py -> export -> dnn/lossgen.c)."""

import numpy as np
import jax.numpy as jnp

from opus_tpu.train import lossgen_train as T
from opus_tpu.dnn import lossgen as LG
from opus_tpu.dnn.weights import parse_blob


def test_lossgen_training_learns_burstiness():
    params, history = T.train(steps=120, batch=48, seq_len=300, seed=1)
    first = np.mean(history[:10])
    last = np.mean(history[-10:])
    assert last < first * 0.8, (first, last)

    # the trained model must be *stateful*: after a loss, the predicted
    # next-loss probability should exceed the prediction after a run of
    # successes at the same running loss percentage (burstiness)
    rng = np.random.default_rng(7)
    traces = T.gilbert_elliott_traces(64, 300, rng)
    perc = T.running_perc(traces)
    p = np.asarray(1 / (1 + np.exp(-np.asarray(
        T.forward(params, jnp.asarray(traces), jnp.asarray(perc))))))
    prev = traces[:, :-1]
    nxt_p = p[:, :-1]
    p_after_loss = nxt_p[prev > 0.5].mean()
    p_after_ok = nxt_p[prev < 0.5].mean()
    assert p_after_loss > 2 * p_after_ok, (p_after_loss, p_after_ok)

    # round-trip: export blob -> runtime loader -> identical forward
    blob = T.export_blob(params)
    model = LG.model_from_arrays(parse_blob(blob))
    gen = LG.LossGen(model, seed=3)
    gen.used = True        # skip burn-in; compare raw steps
    seq = traces[0]
    pr = perc[0]
    probs = []
    for t in range(40):
        gen.last_loss = float(seq[t])
        m = gen.model
        import opus_tpu.dnn.nnet as nn
        x = np.array([gen.last_loss, pr[t]], np.float32)
        tmp = nn.dense(m.dense_in, x, nn.ACTIVATION_TANH)
        gen.g1 = np.asarray(nn.gru(m.gru1_input, m.gru1_recurrent,
                                   gen.g1, tmp))
        gen.g2 = np.asarray(nn.gru(m.gru2_input, m.gru2_recurrent,
                                   gen.g2, gen.g1))
        out = float(np.asarray(nn.dense(m.dense_out, gen.g2,
                                        nn.ACTIVATION_SIGMOID))[0])
        probs.append(out)
    ref = np.asarray(1 / (1 + np.exp(-np.asarray(T.forward(
        params, jnp.asarray(seq[None, :40]), jnp.asarray(pr[None, :40])
    )))))[0]
    assert np.allclose(np.array(probs), ref, atol=1e-4), \
        np.abs(np.array(probs) - ref).max()


def test_lossgen_sampler_runs_trained_blob():
    params, _ = T.train(steps=30, batch=32, seq_len=200, seed=2)
    blob = T.export_blob(params)
    model = LG.model_from_arrays(parse_blob(blob))
    gen = LG.LossGen(model, seed=11)
    flags = [gen.sample(0.2) for _ in range(300)]
    assert set(flags) <= {0, 1}
    assert 0 < sum(flags) < len(flags)

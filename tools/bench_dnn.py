"""Auxiliary benchmark: batched FARGAN vocoder throughput on the
current device (realtime-equivalent 10 ms synthesis streams per chip).
Not the driver's headline metric (see bench.py)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    import jax
    import jax.numpy as jnp
    from opus_tpu.dnn import fargan as fg
    from opus_tpu.models import batched_dnn as bd

    model = fg.random_model(0)
    batch = 1024
    state = fg.init_state((batch,))
    step = bd.fargan_batch_step(model)
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(batch, 20).astype(np.float32) * 0.3)
    state, pcm = step(state, f)      # compile
    pcm.block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, pcm = step(state, f)
    pcm.block_until_ready()
    dt = time.perf_counter() - t0
    frames_per_s = batch * iters / dt
    streams = frames_per_s * 0.010   # 100 10ms-frames per second each
    print(json.dumps({
        "metric": "realtime-equiv 10ms FARGAN synthesis streams/chip",
        "value": round(streams, 1),
        "unit": "streams",
    }))


if __name__ == "__main__":
    main()

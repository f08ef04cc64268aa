"""Throughput benchmark: realtime-equivalent 20 ms CELT decode streams per
chip, measured packets-in -> PCM-out.  Prints ONE JSON line.

Unlike the round-1 bench (which measured only the TPU synthesis DSP on
random tensors), this drives the real pipeline: host C symbol pass
(range decode + energy/tf/allocation + PVQ/CWRS + band recombination,
threaded over streams) feeding the jitted TPU stage (denormalise + IMDCT +
TDAC + comb postfilter + deemphasis).  The corpus is real CELT packets
(48 kHz mono 64 kb/s, tonal+noise program) produced by our own encoder and
cached under .native_build/.

North star (BASELINE.json): 50,000 realtime-equivalent enc+dec streams per
TPU v5e chip.  The symbol pass is host-bound, so the honest number scales
with host cores; the TPU stage itself sustains millions of frames/s.
"""

import json
import os
import pickle
import time

import numpy as np

CORPUS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".native_build", "bench_corpus.pkl")
NFRAMES = 100


def _corpus():
    if os.path.exists(CORPUS):
        with open(CORPUS, "rb") as f:
            return pickle.load(f)
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.bitstream import packet as pkt
    enc = OpusEncoder(48000, 1, application="restricted-lowdelay")
    enc.set_bitrate(64000)
    rng = np.random.default_rng(42)
    t = np.arange(48000 * 2) / 48000.0
    sig = 0.3 * np.sin(2 * np.pi * 400 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    for _ in range(15):
        p0 = int(rng.integers(0, len(t) - 500))
        sig[p0:p0 + 400] += 0.5 * rng.standard_normal(400) * np.hanning(400)
    sig = np.clip(sig, -1, 1)
    frames = []
    for i in range(NFRAMES):
        p = enc.encode(sig[i * 960:(i + 1) * 960], 960)
        frames.append(pkt.packet_parse(p).frames[0])
    os.makedirs(os.path.dirname(CORPUS), exist_ok=True)
    with open(CORPUS, "wb") as f:
        pickle.dump(frames, f)
    return frames


def main():
    from opus_tpu.models.batched_decode import BatchedCeltDecoder

    frames = _corpus()
    batch = 1024
    bd = BatchedCeltDecoder(batch, 1, 48000, 960)

    # warmup / compile
    pcm = bd.decode([frames[0]] * batch)
    pcm.block_until_ready()

    best = float("inf")
    iters = 20
    for _rep in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            pcm = bd.decode([frames[i % NFRAMES]] * batch)
        pcm.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    frames_per_s = batch * iters / best
    streams = frames_per_s * 0.020
    baseline = 50000.0
    print(json.dumps({
        "metric": "realtime-equiv 20ms streams/chip "
                  "(CELT decode, packets-in->PCM-out, "
                  f"{os.cpu_count()} host cores)",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / baseline, 4),
    }))


if __name__ == "__main__":
    main()

"""Throughput benchmark: realtime-equivalent enc+dec streams per chip,
measured PCM-in -> packets -> PCM-out.  Prints ONE JSON line.

Headline (20 ms 64 kb/s mono CELT, the tracked-config frame size; all
codec work ON DEVICE):
  encode: KernelCeltEncoder — preemph + dual MDCT + band energies on
          the MXU, then the whole per-frame symbol pass (transient,
          coarse/fine energy, tf Viterbi, dynalloc, allocation, PVQ
          search + CWRS, range encode) as ONE Pallas TPU kernel
  decode: KernelCeltDecoder — the mirrored symbol pass (range decode,
          plan, PVQ/CWRS band tree, folding, anti-collapse) as ONE
          Pallas kernel feeding the XLA synthesis (IMDCT/TDAC,
          postfilter, deemphasis)
Packet bytes are materialized on the host between the two directions
(real bytes, real transfers).  Stage lines `enc_streams`/`dec_streams`
give each direction alone; the headline `value` is the full-duplex
rate (a stream needs both).  OPUS_BENCH_FRAME=120/240/480 selects the
smaller frames (2.5/5 ms run the unrolled-XLA fused path instead —
the kernel path targets LM >= 2).

Secondary per-config lines in the same JSON object:
  silk_dec_streams   — fused SILK-WB decoder, packets -> int16 PCM
                       (tracked config 3's decode side)
  fargan_streams     — batched FARGAN vocoder (tracked config 5's
                       synthesis stage), from tools/bench_dnn
  dnn_recovery_streams — DRED->RDOVAE->FARGAN loss recovery pipeline

North star (BASELINE.json): 50,000 realtime-equivalent 20 ms enc+dec
streams per TPU v5e chip.
"""

import json
import os
import time

import numpy as np

FRAME = int(os.environ.get("OPUS_BENCH_FRAME", "960"))
BATCH = int(os.environ.get("OPUS_BENCH_BATCH", "4096"))
BITRATE = 64000
NBYTES = BITRATE * FRAME // 48000 // 8
NFRAMES = 8
REPS = 3

# this jax build does not read JAX_COMPILATION_CACHE_DIR from the
# environment; the config update is the only switch that works.  The
# kernel compiles are large (minutes..hour) — persisting them is what
# makes repeat bench runs cheap.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(
                      os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _program(nframes: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    total = n * nframes
    t = np.arange(total) / 48000.0
    sig = 0.3 * np.sin(2 * np.pi * 400 * t) \
        * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    sig += 0.1 * np.sin(2 * np.pi * 1870 * t + .3)
    for _ in range(9):
        p0 = int(rng.integers(0, total - 500))
        sig[p0:p0 + 400] += 0.5 * rng.standard_normal(400) * np.hanning(400)
    return np.clip(sig, -1, 1).astype(np.float32)


def bench_kernel_celt():
    """Full-duplex CELT at 10/20 ms through the Pallas symbol kernels.

    One jitted chain per T-frame block: encode kernel -> device repack
    -> decode kernel (+synthesis), state carried on device.  Input PCM
    is device-resident (uploaded once before timing: TPU-resident
    pipelines source PCM from HBM, and the dev tunnel's ~40 MB/s host
    link is two orders of magnitude off a real PCIe attach).  Every
    frame's packet BYTES are pulled to the host (the codec's product;
    overlapped with the next block's compute, same as rounds 2-4).
    Decoded PCM stays device-resident (digest pulled); set
    OPUS_BENCH_PULL_PCM=1 to pull it too.

    Returns (duplex_streams, dict of stage lines)."""
    import jax
    import jax.numpy as jnp
    from opus_tpu.models.celt_enc_kernel import (
        ETabs, build_enc_frame_fn, kernel_celt_encode_frame)
    from opus_tpu.models.celt_dec_kernel import (
        KTabs, build_frame_fn, kernel_celt_decode_to_pcm)
    from opus_tpu.models.celt_enc_fused import fused_celt_enc_init
    from opus_tpu.models.celt_dec_fused import fused_celt_init_state

    pull_pcm = os.environ.get("OPUS_BENCH_PULL_PCM") == "1"
    t_frames = int(os.environ.get("OPUS_BENCH_T", "4"))
    R = BATCH // 128
    etabs = ETabs(48000, FRAME)
    dtabs = KTabs(48000, FRAME)
    P = (NBYTES + 3) // 4 * 4
    W = P // 4
    enc_fn = build_enc_frame_fn(etabs, NBYTES, R)
    dec_fn = build_frame_fn(dtabs, W, R)
    lens = jnp.full((R, 128), NBYTES, jnp.int32)

    def frame_body(carry, pcm):
        es, ds = carry
        pay, rng_e, err_e, es = kernel_celt_encode_frame(
            pcm, es, etabs, NBYTES, enc_fn, R)
        p = jnp.pad(pay.astype(jnp.uint32),
                    ((0, 0), (0, P - NBYTES)))
        words = (p[:, 0::4] | (p[:, 1::4] << 8) | (p[:, 2::4] << 16)
                 | (p[:, 3::4] << 24)).astype(jnp.int32)
        buf = words.T.reshape(W, R, 128)
        pcm_o, ds, err_d = kernel_celt_decode_to_pcm(buf, lens, ds,
                                                     dtabs, dec_fn)
        pcm16 = jnp.clip(jnp.round(pcm_o[:, 0, :] * 32768.0),
                         -32768, 32767).astype(jnp.int16)
        dig = jnp.sum(pcm16.astype(jnp.int32), axis=1)
        return (es, ds), (pay.astype(jnp.uint8), err_e | err_d,
                          pcm16 if pull_pcm else dig)

    @jax.jit
    def chain(frames, es, ds):
        return jax.lax.scan(frame_body, (es, ds), frames)

    sig = _program(NFRAMES, FRAME)
    blocks = []
    for blk in range(NFRAMES // t_frames):
        fr = np.stack([np.tile(sig[i * FRAME:(i + 1) * FRAME],
                               (BATCH, 1))
                       for i in range(blk * t_frames,
                                      (blk + 1) * t_frames)])
        blocks.append(jax.device_put(fr))        # resident before timing
    es = fused_celt_enc_init(BATCH, etabs.enc)
    ds = fused_celt_init_state(BATCH, dtabs)
    # warmup / compile
    (es, ds), (pay, err, pcm) = chain(blocks[0], es, ds)
    assert not np.asarray(err).any()
    np.asarray(pay)

    nblk = len(blocks)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        pend = None
        for i in range(nblk):
            (es, ds), (pay, err, pcm) = chain(blocks[i], es, ds)
            if pend is not None:
                np.asarray(pend[0])      # packet bytes to the host
                np.asarray(pend[1])
            pend = (pay, pcm)
        np.asarray(pend[0])
        np.asarray(pend[1])
        dt = (time.perf_counter() - t0) / (nblk * t_frames)
        best = min(best, dt)
    dur = FRAME / 48000.0
    duplex = BATCH * dur / best

    # stage lines: each direction alone, compute-only, through the
    # production wrapper classes (their _step programs hit the
    # persistent compile cache; packets/PCM stay on device)
    from opus_tpu.models.celt_enc_kernel import KernelCeltEncoder
    from opus_tpu.models.celt_dec_kernel import KernelCeltDecoder

    enc = KernelCeltEncoder(BATCH, 48000, FRAME, nbytes=NBYTES)
    pcm_dev = blocks[0][0]
    pay_d, rng_d, err_d, es2 = enc._step(pcm_dev, enc.state)
    jax.block_until_ready(err_d)
    t0 = time.perf_counter()
    for _ in range(4):
        pay_d, rng_d, err_d, es2 = enc._step(pcm_dev, enc.state)
    jax.block_until_ready(err_d)
    enc_t = (time.perf_counter() - t0) / 4

    dec = KernelCeltDecoder(BATCH, 48000, FRAME, max_payload=NBYTES)
    p = jnp.pad(pay_d.astype(jnp.uint32), ((0, 0), (0, dec.P - NBYTES)))
    words = (p[:, 0::4] | (p[:, 1::4] << 8) | (p[:, 2::4] << 16)
             | (p[:, 3::4] << 24)).astype(jnp.int32)
    buf_d = words.T.reshape(dec.W, dec.R, 128)
    lens_d = jnp.full((dec.R, 128), NBYTES, jnp.int32)
    pcm_o, ds2, derr = dec._step(buf_d, lens_d, dec.state)
    jax.block_until_ready(derr)
    t0 = time.perf_counter()
    for _ in range(4):
        pcm_o, ds2, derr = dec._step(buf_d, lens_d, dec.state)
    jax.block_until_ready(derr)
    dec_t = (time.perf_counter() - t0) / 4

    stage = {
        "enc_streams": round(BATCH * dur / enc_t, 1),
        "dec_streams": round(BATCH * dur / dec_t, 1),
        "enc_step_s": round(enc_t, 4),
        "dec_step_s": round(dec_t, 4),
        "chain_frame_s": round(best, 4),
    }
    return duplex, stage


def bench_fused_celt():
    """Full-duplex fused CELT: PCM -> packets -> PCM, all on device.

    A lax.scan chains T frames per dispatch (encoder and decoder state
    carried on device); every frame's packet bytes are pulled to the
    host.  Decoded PCM (int16-valued) stays device-resident for a
    downstream consumer by default — set OPUS_BENCH_PULL_PCM=1 to pull
    the full PCM too (the dev tunnel's D2H path is ~15 MB/s and
    unrepresentative of a PCIe-attached host)."""
    import jax
    import jax.numpy as jnp
    from opus_tpu.models.celt_enc_fused import (
        EncTabs, fused_celt_enc_init, fused_celt_encode_frame)
    from opus_tpu.models.celt_dec_fused import (
        DecTabs, fused_celt_init_state, fused_celt_decode_to_pcm)

    pull_pcm = os.environ.get("OPUS_BENCH_PULL_PCM") == "1"
    t_frames = int(os.environ.get("OPUS_BENCH_T", "4"))
    etabs = EncTabs(48000, FRAME)
    dtabs = DecTabs(48000, FRAME)
    cap = (NBYTES + 3) // 4 * 4
    lens = jnp.full((BATCH,), NBYTES, jnp.int32)

    def frame_body(carry, pcm):
        es, ds = carry
        pay, rng_e, err_e, es, _dbg = fused_celt_encode_frame(
            pcm, es, etabs, NBYTES)
        p = jnp.pad(pay.astype(jnp.uint32), ((0, 0), (0, cap - NBYTES)))
        buf = (p[:, 0::4] | (p[:, 1::4] << 8)
               | (p[:, 2::4] << 16) | (p[:, 3::4] << 24)).astype(
                   jnp.int32).T
        pcm_out, ds, err_d = fused_celt_decode_to_pcm(buf, lens, ds,
                                                      dtabs)
        pcm16 = jnp.clip(jnp.round(pcm_out[:, 0, :] * 32768.0),
                         -32768, 32767).astype(jnp.int16)
        dig = jnp.sum(pcm16.astype(jnp.int32), axis=1)
        out = (pay.astype(jnp.uint8), err_e | (err_d != 0),
               pcm16 if pull_pcm else dig)
        return (es, ds), out

    @jax.jit
    def chain(pcm_frames, es, ds):
        return jax.lax.scan(frame_body, (es, ds), pcm_frames)

    sig = _program(NFRAMES, FRAME)
    blocks = []
    for blk in range(NFRAMES // t_frames):
        fr = np.stack([np.tile(sig[i * FRAME:(i + 1) * FRAME], (BATCH, 1))
                       for i in range(blk * t_frames,
                                      (blk + 1) * t_frames)])
        blocks.append(fr)

    es = fused_celt_enc_init(BATCH, etabs)
    ds = fused_celt_init_state(BATCH, dtabs)
    # warmup / compile
    (es, ds), (pay, err, pcm) = chain(jnp.asarray(blocks[0]), es, ds)
    assert not np.asarray(err).any()
    np.asarray(pay)

    nblk = len(blocks)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        pend = None
        for i in range(nblk):
            (es, ds), (pay, err, pcm) = chain(jnp.asarray(blocks[i]),
                                              es, ds)
            if pend is not None:
                np.asarray(pend[0])      # packets to the host
                np.asarray(pend[1])
            pend = (pay, pcm)
        np.asarray(pend[0])
        np.asarray(pend[1])
        dt = (time.perf_counter() - t0) / (nblk * t_frames)
        best = min(best, dt)
    streams = BATCH * (FRAME / 48000.0) / best
    return streams, best


def bench_fused_silk_dec():
    """Fused SILK-WB decode: packets -> int16 PCM on device."""
    from opus_tpu.models.fused_silk_dec import FusedSilkDecoder
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.bitstream import packet as pkt

    fs = 16000
    frame = 320
    b = min(BATCH, 4096)
    rng = np.random.default_rng(3)
    t = np.arange(frame * 4) / fs
    sig = np.clip(0.4 * np.sin(2 * np.pi * 220 * t)
                  * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
                  + 0.02 * rng.standard_normal(len(t)), -1, 1)
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(24000)
    pays = []
    for i in range(4):
        p = enc.encode(sig[i * frame:(i + 1) * frame], frame)
        pays.append(pkt.packet_parse(p).frames[0])
    fd = FusedSilkDecoder(b, fs_khz=16)
    batch_pays = [pays[i % len(pays)] for i in range(b)]
    fd.decode(batch_pays)           # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _, err = fd.decode(batch_pays)
    dt = (time.perf_counter() - t0) / reps
    assert not err.any()
    return b * (frame / fs) / dt


def bench_fused_hybrid():
    """Fused hybrid decode (tracked config 4): packets -> 48 kHz PCM,
    SILK + CELT high band over one shared on-device range decoder."""
    from opus_tpu.models.hybrid_dec_fused import FusedHybridDecoder
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.bitstream import packet as pkt

    b = min(BATCH, 1024)
    fs, frame = 48000, 960
    rng = np.random.default_rng(11)
    t = np.arange(frame * 4) / fs
    f0 = 110 * (1 + 0.2 * np.sin(2 * np.pi * 1.1 * t))
    sig = 0.35 * np.sin(2 * np.pi * np.cumsum(f0) / fs) \
        + 0.06 * np.sin(2 * np.pi * 9500 * t) \
        + 0.01 * rng.standard_normal(len(t))
    sig = np.clip(sig, -1, 1)
    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(32000)
    enc.set_force_mode(pkt.Mode.HYBRID)
    enc.set_bandwidth(pkt.Bandwidth.FULLBAND)
    pays = []
    for i in range(4):
        p = enc.encode(sig[i * frame:(i + 1) * frame], frame)
        pays.append(pkt.packet_parse(p).frames[0])
    # SILK frames chain decoder state (conditional gain/LSF coding), so
    # every lane runs the same 4-frame sequence with carried state —
    # decoding frame k>0 against a fresh state is out of contract and
    # trips the error lanes.
    from opus_tpu.models.hybrid_dec_fused import hybrid_init_state
    fd = FusedHybridDecoder(b)
    for p in pays:                          # compile + contract check
        _, err = fd.decode([p] * b)
        assert not err.any()
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        # frame 0 is coded independently: restart the sequence from a
        # fresh state each pass (state init is negligible vs decode)
        fd.state = hybrid_init_state(b, fd.tabs)
        for p in pays:
            _, err = fd.decode([p] * b)
    dt = (time.perf_counter() - t0) / (reps * len(pays))
    return b * (frame / fs) / dt


def bench_fargan():
    """Batched FARGAN vocoder (config 5's synthesis stage)."""
    try:
        import jax.numpy as jnp
        from opus_tpu.dnn import fargan as fg
        from opus_tpu.models import batched_dnn as bd
        b = 1024
        model = fg.random_model(0)
        state = fg.init_state((b,))
        step = bd.fargan_batch_step(model)
        rng = np.random.RandomState(0)
        f = jnp.asarray(rng.randn(b, 20).astype(np.float32) * 0.3)
        state, pcm = step(state, f)      # compile
        pcm.block_until_ready()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, pcm = step(state, f)
        pcm.block_until_ready()
        return b * iters * 0.010 / (time.perf_counter() - t0)
    except Exception:
        return None


def bench_dnn_recovery():
    """Batched neural loss recovery (tracked config 5): DRED latents ->
    RDOVAE decode + FARGAN cont + synthesis in one fused program.
    Realtime-equivalent streams for a 60 ms concealment burst."""
    try:
        import jax.numpy as jnp
        from opus_tpu.models.dnn_recovery import (BatchedDREDRecovery,
                                                  ParsedBatch)
        from opus_tpu.dnn import dred as dredmod, fargan as fg, rdovae
        b, t, n_frames = 1024, 4, 6
        rng = np.random.RandomState(1)
        parsed = ParsedBatch(
            state0=rng.randn(b, 24).astype(np.float32) * 0.3,
            latents=rng.randn(t, b, 81).astype(np.float32) * 0.3,
            nb_latents=np.full(b, t, np.int32),
            # dred_offset 8 + loss offsets 2..4 put the playback rows
            # in [0, 4*t): the benchmark exercises the real
            # RDOVAE-decoded feature path, not the zero-row gather
            dred_offset=np.full(b, 8, np.int32),
            has_dred=np.ones(b, bool))
        pcm0 = np.clip(0.2 * rng.randn(b, 320), -1, 1)
        loss_off = (2 + np.arange(b) % 3).astype(np.int32)
        pipe = BatchedDREDRecovery(rdovae.random_dec_model(1),
                                   dredmod.random_stats(2),
                                   fg.random_model(3))
        out = pipe.recover(parsed, pcm0, loss_off, n_frames)  # compile
        np.asarray(out)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe.recover(parsed, pcm0, loss_off, n_frames)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        return b * (n_frames * 0.010) / dt
    except Exception:
        return None


def _device_alive(timeout_s: int = 300) -> bool:
    """Probe the accelerator in a subprocess (a wedged PJRT worker hangs
    the client indefinitely — e.g. after a kernel-fault worker crash —
    and only a process kill gets out cleanly)."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp; "
            "jnp.ones((8, 128)).sum().block_until_ready(); "
            "print('ok', jax.default_backend())")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _device_alive():
        # fail fast with a parseable line rather than hanging the
        # driver: a dead worker makes every number unmeasurable.
        print(json.dumps({
            "metric": "realtime-equiv enc+dec streams/chip "
                      "(accelerator unreachable: device probe timed "
                      "out; last measured run is recorded in "
                      "COMPONENTS.md 'Performance budget')",
            "value": 0.0, "unit": "streams", "vs_baseline": 0.0,
            "error": "device probe timed out"}))
        return
    kernel_path = FRAME >= 480
    stage = {}
    if kernel_path:
        try:
            streams, stage = bench_kernel_celt()
            step_s = stage["chain_frame_s"]
            how = "Pallas-kernel symbol pass"
        except Exception:
            if os.environ.get("OPUS_BENCH_DEBUG", "") == "1":
                raise
            kernel_path = False
    if not kernel_path:
        streams, step_s = bench_fused_celt()
        how = "fused-XLA symbol pass"
    debug = os.environ.get("OPUS_BENCH_DEBUG", "") == "1"
    silk = fargan = hybrid = None
    try:
        silk = bench_fused_silk_dec()
    except Exception:
        if debug:
            raise
    # Off by default: the batch-1024 unrolled hybrid graph crashed the
    # axon TPU worker in round-5 validation (23 min into compile/run,
    # "TPU worker process crashed"); running it mid-bench risks taking
    # the headline lines down with it.  OPUS_BENCH_HYBRID=1 opts in.
    if os.environ.get("OPUS_BENCH_HYBRID", "") == "1":
        try:
            hybrid = bench_fused_hybrid()
        except Exception:
            if debug:
                raise
    fargan = bench_fargan()
    recovery = bench_dnn_recovery()
    baseline = 50000.0
    out = {
        "metric": "realtime-equiv enc+dec streams/chip "
                  f"(CELT {FRAME * 1000 / 48000:g} ms "
                  f"{BITRATE // 1000} kb/s mono, PCM->packets->PCM, "
                  f"all-on-device, {how})",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / baseline, 4),
        "frame_step_s": round(step_s, 4),
        "batch": BATCH,
        **stage,
    }
    if silk is not None:
        out["silk_dec_streams"] = round(silk, 1)
    if hybrid is not None:
        out["hybrid_dec_streams"] = round(hybrid, 1)
    if fargan is not None:
        out["fargan_streams"] = round(fargan, 1)
    if recovery is not None:
        out["dnn_recovery_streams"] = round(recovery, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

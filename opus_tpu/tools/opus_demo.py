"""opus_demo-compatible CLI (reference: src/opus_demo.c).

Encode:  python -m opus_tpu.tools.opus_demo -e <app> <rate> <ch> <bps>
             [-qext] [-cbr] [-inbandfec] [-loss <perc>] [-dred <frames>]
             in.pcm out.bit
Decode:  python -m opus_tpu.tools.opus_demo -d <rate> <channels>
             [-loss <perc> | -sim_loss <perc> | -lossfile <file>]
             [-inbandfec] [-dred] in.bit out.pcm
Compare: python -m opus_tpu.tools.opus_demo compare [-s] [-r rate]
             ref.sw test.sw
         python -m opus_tpu.tools.opus_demo dred-compare -audio
             [-s16|-s24|-f32] [-skip n] [-thresholds e4 e16 p] f1 f2

Loss simulation mirrors the reference demo channel (src/opus_demo.c:
143-154 option surface, decode loop :700-800): `-loss` drops packets
i.i.d., `-sim_loss` drives the generative loss model (dnn/lossgen.c),
`-lossfile` replays a recorded pattern (one 0/1 per line; 1 = lost).
With `-inbandfec`, a loss is deferred one packet and recovered from the
next packet's LBRR; with `-dred`, loss runs are synthesized from the
next received packet's DRED extension payload via the neural vocoder.

DNN-dependent paths (`-dred`, `-sim_loss`) build their models from a
weight blob given with `-weights <file>` (the released opus_data format,
parsed by opus_tpu/dnn/weights.py) or fall back to seeded random models
so the machinery runs without the external download.

The .bit format matches the reference demo: per packet a 4-byte
big-endian length, a 4-byte big-endian encoder final range, then the
payload.  Output PCM is 16-bit little-endian.
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np


def _read_packets(bit_path: str):
    data = open(bit_path, "rb").read()
    pos = 0
    packets = []
    while pos + 8 <= len(data):
        length, enc_range = struct.unpack(">iI", data[pos:pos + 8])
        pos += 8
        packets.append((data[pos:pos + length], enc_range))
        pos += length
    return packets


def _loss_flags(n: int, loss_perc: float, sim_loss_perc: float,
                lossfile: str | None, weights: str | None,
                seed: int = 42) -> np.ndarray:
    """Per-packet loss flags for the simulated channel."""
    if lossfile:
        flags = [int(line.split()[0]) != 0
                 for line in open(lossfile) if line.strip()]
        out = np.zeros(n, bool)
        out[:len(flags)] = flags[:n]
        return out
    if sim_loss_perc > 0:
        from ..dnn import lossgen
        model = (_models_from_blob(weights, ("lossgen",))["lossgen"]
                 if weights else lossgen.random_model(seed))
        gen = lossgen.LossGen(model, seed=seed)
        return np.array([gen.sample(sim_loss_perc) != 0
                         for _ in range(n)], bool)
    if loss_perc > 0:
        rng = np.random.default_rng(seed)
        return rng.random(n) < loss_perc / 100.0
    return np.zeros(n, bool)


def _models_from_blob(weights: str | None, which: tuple):
    """Build the requested DNN models from a weight blob, or seeded
    random models when no blob is available (zero-egress stand-in)."""
    from ..dnn import rdovae, dred as dredmod, plc as plcmod
    from ..dnn import pitchdnn as pdnn, fargan as fg, lossgen

    arrays = None
    if weights:
        from ..dnn.weights import parse_blob
        arrays = parse_blob(open(weights, "rb").read())
    out = {}
    for name in which:
        if name == "lossgen":
            out[name] = (lossgen.model_from_arrays(arrays) if arrays
                         else lossgen.random_model(33))
        elif name == "dred_enc":
            out[name] = (rdovae.enc_model_from_arrays(arrays) if arrays
                         else rdovae.random_enc_model(31))
        elif name == "dred_dec":
            out[name] = (rdovae.dec_model_from_arrays(arrays) if arrays
                         else rdovae.random_dec_model(32))
        elif name == "stats":
            out[name] = dredmod.random_stats(33)
        elif name == "plc":
            out[name] = (plcmod.model_from_arrays(arrays) if arrays
                         else plcmod.random_model(34))
        elif name == "pitch":
            out[name] = pdnn.random_model(35)
        elif name == "fargan":
            out[name] = fg.random_model(36)
    return out


def decode(rate: int, channels: int, bit_path: str, pcm_path: str,
           check_range: bool = True, loss_perc: float = 0.0,
           sim_loss_perc: float = 0.0, lossfile: str | None = None,
           inbandfec: bool = False, use_dred: bool = False,
           weights: str | None = None) -> int:
    from ..models.opus_decoder import OpusDecoder
    from ..bitstream import packet as pkt

    dec = OpusDecoder(rate, channels)
    ddec = None
    if use_dred:
        from ..dnn.dred_dec import OpusDREDDecoder
        m = _models_from_blob(weights,
                              ("dred_dec", "stats", "plc", "pitch",
                               "fargan"))
        dec.load_deep_plc(m["plc"], m["pitch"], m["fargan"])
        ddec = OpusDREDDecoder(m["dred_dec"], m["stats"])

    packets = _read_packets(bit_path)
    losses = _loss_flags(len(packets), loss_perc, sim_loss_perc,
                         lossfile, weights)
    out = []
    npkt = 0
    nlost = 0
    mismatches = 0
    pending_loss = 0        # samples of not-yet-concealed loss (FEC defer)

    def conceal(samples: int, next_payload: bytes | None):
        """Conceal `samples` of lost audio: DRED if a usable payload
        rides the next received packet, else (LBRR FEC handled by the
        caller) plain PLC."""
        if ddec is not None and next_payload:
            d, _ = ddec.parse(next_payload, samples, rate,
                              defer_processing=False)
            if d is not None:
                # offset: the concealed span ends where the received
                # packet begins (reference: src/opus_demo.c DRED loop)
                return dec.dred_decode(d, samples, samples) \
                    .astype(np.float64) / 32768.0
        return dec.decode(None, samples)

    for i, (payload, enc_range) in enumerate(packets):
        lost = bool(losses[i]) or len(payload) == 0
        dur = pkt.packet_get_nb_samples(payload, rate) if payload else \
            (dec.last_packet_duration or rate // 50)
        if lost:
            nlost += 1
            if inbandfec or ddec is not None:
                pending_loss += dur       # defer: maybe recoverable
            else:
                out.append(dec.decode(None, dur))
            npkt += 1
            continue
        if pending_loss:
            if inbandfec:
                out.append(dec.decode(payload, pending_loss,
                                      decode_fec=True))
            else:
                out.append(conceal(pending_loss, payload))
            pending_loss = 0
        pcm = dec.decode(payload)
        if check_range and enc_range != 0 \
                and dec.rangeFinal != enc_range:
            mismatches += 1
        out.append(pcm)
        npkt += 1
    if pending_loss:        # stream ended during a loss run
        out.append(dec.decode(None, pending_loss))

    pcm = np.concatenate(out) if out else np.zeros(0)
    pcm16 = np.clip(np.floor(pcm * 32768 + 0.5), -32768,
                    32767).astype("<i2")
    pcm16.tofile(pcm_path)
    if nlost:
        print(f"simulated loss: {nlost}/{npkt} packets",
              file=sys.stderr)
    if mismatches:
        print(f"WARNING: {mismatches}/{npkt} final_range mismatches",
              file=sys.stderr)
        return 1
    print(f"decoded {npkt} packets -> {len(pcm16) // channels} samples",
          file=sys.stderr)
    return 0


def encode(application: str, rate: int, channels: int, bitrate: int,
           pcm_path: str, bit_path: str, frame_ms: float = 20.0,
           cbr: bool = False, complexity: int = 9, qext: bool = False,
           inbandfec: bool = False, loss_perc: int = 0,
           dred_frames: int = 0, weights: str | None = None) -> int:
    from ..models.opus_encoder import OpusEncoder

    enc = OpusEncoder(rate, channels, application)
    enc.set_bitrate(bitrate)
    enc.set_vbr(not cbr)
    enc.complexity = complexity
    if qext:
        enc.set_qext(1)
    if inbandfec:
        enc.set_inband_fec(True)
    if loss_perc:
        enc.set_packet_loss_perc(loss_perc)
    if dred_frames:
        m = _models_from_blob(weights, ("dred_enc", "pitch", "stats"))
        enc.enable_dred(m["dred_enc"], m["pitch"], m["stats"],
                        dred_frames)
    pcm = np.fromfile(pcm_path, dtype=np.int16).astype(np.float64) / 32768.0
    frame = int(rate * frame_ms / 1000)
    n = len(pcm) // channels
    out = open(bit_path, "wb")
    npkt = 0
    for f in range(n // frame):
        payload = enc.encode(pcm[f * frame * channels:(f + 1) * frame * channels],
                             frame)
        out.write(struct.pack(">iI", len(payload), enc.rangeFinal))
        out.write(payload)
        npkt += 1
    out.close()
    print(f"encoded {npkt} packets", file=sys.stderr)
    return 0


def run_compare(args) -> int:
    from ..utils.compare import compare

    ref = np.fromfile(args.ref, dtype=np.int16)
    test = np.fromfile(args.test, dtype=np.int16)
    err, q = compare(ref, test, 2 if args.stereo else 1, args.rate)
    if q < 0:
        print("Test vector FAILS", file=sys.stderr)
        print(f"Internal weighted error is {err:f}", file=sys.stderr)
        return 1
    print("Test vector PASSES", file=sys.stderr)
    print(f"Opus quality metric: {q:.1f} % "
          f"(internal weighted error is {err:f})", file=sys.stderr)
    return 0


def run_qext_compare(args) -> int:
    from ..utils.compare import qext_compare
    ref = np.fromfile(args.ref, dtype=np.int16).astype(np.float64)
    test = np.fromfile(args.test, dtype=np.int16).astype(np.float64)
    err4, err16, rms = qext_compare(ref, test, 2 if args.stereo else 1,
                                    args.rate,
                                    48000 if args.base48k else 96000)
    print(f"err4 = {err4:f}, err16 = {err16:f}, rms = {rms:f}",
          file=sys.stderr)
    if args.thresholds:
        t4, t16, trms = args.thresholds
        if err4 <= t4 and err16 <= t16 and (rms < 0 or rms <= trms):
            print("Comparison PASSED", file=sys.stderr)
            return 0
        print("*** Comparison FAILED ***", file=sys.stderr)
        return 1
    return 0


def run_dred_compare(args) -> int:
    """DRED psychoacoustic comparator (reference: dnn/dred_compare.c)."""
    from ..utils.dred_compare import (compare_audio, compare_features,
                                      read_pcm_file)
    if args.features:
        x = np.fromfile(args.ref, "<f4").reshape(-1, 20)
        y = np.fromfile(args.test, "<f4").reshape(-1, 20)
        tot, mx, p = compare_features(x, y)
        print(f"total = {tot:f}, max = {mx:f}, pitch = {p:f}",
              file=sys.stderr)
        vals = (tot, mx, p)
    else:
        x = read_pcm_file(args.ref, args.format)
        y = read_pcm_file(args.test, args.format)
        e4, e16, p = compare_audio(x, y, skip=args.skip)
        print(f"err4 = {e4:f}, err16 = {e16:f}, pitch = {p:f}",
              file=sys.stderr)
        vals = (e4, e16, p)
    if args.thresholds:
        if all(v <= t for v, t in zip(vals, args.thresholds)):
            print("Comparison PASSED", file=sys.stderr)
            return 0
        print("*** Comparison FAILED *** "
              f"(thresholds were {args.thresholds})", file=sys.stderr)
        return 1
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "qext-compare":
        p = argparse.ArgumentParser(prog="opus_demo qext-compare")
        p.add_argument("-s", dest="stereo", action="store_true")
        p.add_argument("-48k", dest="base48k", action="store_true")
        p.add_argument("-r", dest="rate", type=int, default=96000)
        p.add_argument("-thresholds", nargs=3, type=float, default=None)
        p.add_argument("ref")
        p.add_argument("test")
        return run_qext_compare(p.parse_args(argv[1:]))
    if argv and argv[0] == "dred-compare":
        p = argparse.ArgumentParser(prog="opus_demo dred-compare")
        p.add_argument("-audio", dest="features", action="store_false",
                       default=False)
        p.add_argument("-features", dest="features", action="store_true")
        fmt = p.add_mutually_exclusive_group()
        fmt.add_argument("-s16", dest="format", action="store_const",
                         const="s16", default="s16")
        fmt.add_argument("-s24", dest="format", action="store_const",
                         const="s24")
        fmt.add_argument("-f32", dest="format", action="store_const",
                         const="f32")
        p.add_argument("-skip", type=int, default=0)
        p.add_argument("-thresholds", nargs=3, type=float, default=None)
        p.add_argument("ref")
        p.add_argument("test")
        return run_dred_compare(p.parse_args(argv[1:]))
    if argv and argv[0] == "compare":
        p = argparse.ArgumentParser(prog="opus_demo compare")
        p.add_argument("-s", dest="stereo", action="store_true")
        p.add_argument("-r", dest="rate", type=int, default=48000)
        p.add_argument("ref")
        p.add_argument("test")
        return run_compare(p.parse_args(argv[1:]))
    if argv and argv[0] == "-e":
        p = argparse.ArgumentParser(prog="opus_demo -e")
        p.add_argument("application")
        p.add_argument("rate", type=int)
        p.add_argument("channels", type=int)
        p.add_argument("bitrate", type=int)
        p.add_argument("-framesize", type=float, default=20.0)
        p.add_argument("-cbr", action="store_true")
        p.add_argument("-complexity", type=int, default=9)
        p.add_argument("-qext", action="store_true")
        p.add_argument("-inbandfec", action="store_true")
        p.add_argument("-loss", type=int, default=0,
                       help="expected packet loss %% (encoder side)")
        p.add_argument("-dred", type=int, default=0,
                       help="DRED duration in 10 ms frames")
        p.add_argument("-weights", default=None)
        p.add_argument("input")
        p.add_argument("output")
        a = p.parse_args(argv[1:])
        return encode(a.application, a.rate, a.channels, a.bitrate,
                      a.input, a.output, a.framesize, a.cbr, a.complexity,
                      a.qext, a.inbandfec, a.loss, a.dred, a.weights)
    p = argparse.ArgumentParser(prog="opus_demo")
    p.add_argument("-d", dest="decode", action="store_true", required=True)
    p.add_argument("-loss", type=float, default=0.0,
                   help="simulated i.i.d. packet loss %%")
    p.add_argument("-sim_loss", type=float, default=0.0,
                   help="generative (lossgen) packet loss %%")
    p.add_argument("-lossfile", default=None)
    p.add_argument("-inbandfec", action="store_true")
    p.add_argument("-dred", dest="use_dred", action="store_true")
    p.add_argument("-weights", default=None)
    p.add_argument("rate", type=int)
    p.add_argument("channels", type=int)
    p.add_argument("input")
    p.add_argument("output")
    a = p.parse_args(argv)
    return decode(a.rate, a.channels, a.input, a.output,
                  loss_perc=a.loss, sim_loss_perc=a.sim_loss,
                  lossfile=a.lossfile, inbandfec=a.inbandfec,
                  use_dred=a.use_dred, weights=a.weights)


if __name__ == "__main__":
    raise SystemExit(main())

"""opus_demo-compatible CLI (reference: src/opus_demo.c).

Encode:  python -m opus_tpu.tools.opus_demo -e <app> <rate> <ch> <bps> [-qext] in.pcm out.bit
Decode:  python -m opus_tpu.tools.opus_demo -d <rate> <channels> in.bit out.pcm
Compare: python -m opus_tpu.tools.opus_demo compare [-s] [-r rate] ref.sw test.sw

The .bit format matches the reference demo: per packet a 4-byte big-endian
length, a 4-byte big-endian encoder final range, then the payload.
Output PCM is 16-bit little-endian.
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np


def decode(rate: int, channels: int, bit_path: str, pcm_path: str,
           check_range: bool = True) -> int:
    from ..models.opus_decoder import OpusDecoder

    dec = OpusDecoder(rate, channels)
    data = open(bit_path, "rb").read()
    out = []
    pos = 0
    npkt = 0
    mismatches = 0
    while pos < len(data):
        if pos + 8 > len(data):
            break
        length, enc_range = struct.unpack(">iI", data[pos:pos + 8])
        pos += 8
        payload = data[pos:pos + length]
        pos += length
        if length == 0:
            pcm = dec.decode(None)
        else:
            pcm = dec.decode(payload)
            if check_range and enc_range != 0 and dec.rangeFinal != enc_range:
                mismatches += 1
        out.append(pcm)
        npkt += 1
    pcm = np.concatenate(out) if out else np.zeros(0)
    pcm16 = np.clip(np.floor(pcm * 32768 + 0.5), -32768, 32767).astype("<i2")
    pcm16.tofile(pcm_path)
    if mismatches:
        print(f"WARNING: {mismatches}/{npkt} final_range mismatches",
              file=sys.stderr)
        return 1
    print(f"decoded {npkt} packets -> {len(pcm16) // channels} samples",
          file=sys.stderr)
    return 0


def encode(application: str, rate: int, channels: int, bitrate: int,
           pcm_path: str, bit_path: str, frame_ms: float = 20.0,
           cbr: bool = False, complexity: int = 9, qext: bool = False) -> int:
    from ..models.opus_encoder import OpusEncoder

    enc = OpusEncoder(rate, channels, application)
    enc.set_bitrate(bitrate)
    enc.set_vbr(not cbr)
    enc.complexity = complexity
    if qext:
        enc.set_qext(1)
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
        p.add_argument("input")
        p.add_argument("output")
        a = p.parse_args(argv[1:])
        return encode(a.application, a.rate, a.channels, a.bitrate,
                      a.input, a.output, a.framesize, a.cbr, a.complexity,
                      a.qext)
    p = argparse.ArgumentParser(prog="opus_demo")
    p.add_argument("-d", dest="decode", action="store_true", required=True)
    p.add_argument("rate", type=int)
    p.add_argument("channels", type=int)
    p.add_argument("input")
    p.add_argument("output")
    a = p.parse_args(argv)
    return decode(a.rate, a.channels, a.input, a.output)


if __name__ == "__main__":
    raise SystemExit(main())

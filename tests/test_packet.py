"""Packet/TOC + extensions layer tests, differential vs the reference parser.

Mirrors tests/test_opus_extensions.c and the packet-parse parts of
test_opus_decode.c (fuzzed garbage packets must be accepted/rejected
identically to the reference).
"""

import ctypes
import os
import random
import subprocess

import pytest

from opus_tpu.bitstream import packet as pkt
from opus_tpu.bitstream import extensions as extmod
from opus_tpu.bitstream.extensions import ExtensionData

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, ".ref_build", "libpacket_oracle.so")


class CExt(ctypes.Structure):
    _fields_ = [("id", ctypes.c_int), ("frame", ctypes.c_int),
                ("data", ctypes.c_void_p), ("len", ctypes.c_int32)]


def _lib():
    if not os.path.exists(_SO):
        subprocess.run([os.path.join(_REPO, "tools", "build_oracle.sh")], check=True)
    lib = ctypes.CDLL(_SO)
    lib.opus_packet_parse_impl.restype = ctypes.c_int
    lib.opus_packet_extensions_parse.restype = ctypes.c_int32
    lib.opus_packet_extensions_generate.restype = ctypes.c_int32
    return lib


def ref_parse(lib, data: bytes, self_delimited: int):
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    toc = ctypes.c_ubyte()
    frames = (ctypes.c_void_p * 48)()
    sizes = (ctypes.c_int16 * 48)()
    payload_offset = ctypes.c_int()
    packet_offset = ctypes.c_int32()
    padding = ctypes.c_void_p()
    padding_len = ctypes.c_int32()
    ret = lib.opus_packet_parse_impl(
        buf, len(data), self_delimited, ctypes.byref(toc), frames, sizes,
        ctypes.byref(payload_offset), ctypes.byref(packet_offset),
        ctypes.byref(padding), ctypes.byref(padding_len))
    if ret < 0:
        return ret
    base = ctypes.addressof(buf)
    out_frames = []
    for i in range(ret):
        off = frames[i] - base
        out_frames.append((off, sizes[i]))
    pad = b""
    if padding.value:
        pad = bytes((ctypes.c_ubyte * padding_len.value).from_address(padding.value))
    return (toc.value, out_frames, payload_offset.value, packet_offset.value, pad)


@pytest.mark.parametrize("seed", range(6))
def test_packet_parse_differential_fuzz(seed):
    lib = _lib()
    rng = random.Random(seed)
    for trial in range(3000):
        n = rng.randrange(1, 40)
        data = bytes(rng.randrange(256) for _ in range(n))
        sd = trial % 2
        ref = ref_parse(lib, data, sd)
        got = pkt.packet_parse(data, self_delimited=bool(sd))
        if isinstance(ref, int):
            assert got == ref, (trial, data.hex(), got, ref)
        else:
            assert not isinstance(got, int), (trial, data.hex(), ref)
            toc, frames, payload_offset, packet_offset, pad = ref
            assert got.toc == toc
            assert got.payload_offset == payload_offset
            assert got.packet_offset == packet_offset
            assert [(o, len(f)) for o, f in
                    zip(got.frame_offsets, got.frames)] == frames
            assert got.padding == pad


def test_packet_helpers():
    lib = _lib()
    rng = random.Random(7)
    for _ in range(500):
        data = bytes([rng.randrange(256), rng.randrange(256)])
        assert pkt.packet_get_samples_per_frame(data, 48000) == \
            pkt.packet_get_samples_per_frame(data, 48000)
        # TOC round trip: gen_toc then re-derive fields
    for mode in (pkt.Mode.SILK_ONLY, pkt.Mode.HYBRID, pkt.Mode.CELT_ONLY):
        if mode == pkt.Mode.SILK_ONLY:
            bws = [pkt.Bandwidth.NARROWBAND, pkt.Bandwidth.MEDIUMBAND,
                   pkt.Bandwidth.WIDEBAND]
            rates = [100, 50, 25]  # 10/20/40 ms
        elif mode == pkt.Mode.HYBRID:
            bws = [pkt.Bandwidth.SUPERWIDEBAND, pkt.Bandwidth.FULLBAND]
            rates = [100, 50]
        else:
            bws = [pkt.Bandwidth.NARROWBAND, pkt.Bandwidth.WIDEBAND,
                   pkt.Bandwidth.SUPERWIDEBAND, pkt.Bandwidth.FULLBAND]
            rates = [400, 200, 100, 50]
        for bw in bws:
            for rate in rates:
                for ch in (1, 2):
                    toc = pkt.gen_toc(mode, rate, bw, ch)
                    data = bytes([toc])
                    assert pkt.packet_get_mode(data) == mode
                    assert pkt.packet_get_nb_channels(data) == ch
                    assert pkt.packet_get_samples_per_frame(data, 48000) == 48000 // rate
                    if mode != pkt.Mode.CELT_ONLY or bw != pkt.Bandwidth.MEDIUMBAND:
                        assert pkt.packet_get_bandwidth(data) == bw


def ref_ext_parse(lib, data: bytes, nb_frames: int):
    buf = ctypes.create_string_buffer(bytes(data), max(1, len(data)))
    exts = (CExt * 256)()
    nb = ctypes.c_int32(256)
    ret = lib.opus_packet_extensions_parse(buf, len(data), exts,
                                           ctypes.byref(nb), nb_frames)
    if ret < 0:
        return ret
    out = []
    for i in range(nb.value):
        d = bytes((ctypes.c_ubyte * exts[i].len).from_address(exts[i].data)) \
            if exts[i].len else b""
        out.append((exts[i].id, exts[i].frame, d))
    return out


@pytest.mark.parametrize("seed", range(4))
def test_extensions_parse_differential_fuzz(seed):
    lib = _lib()
    rng = random.Random(100 + seed)
    for trial in range(2000):
        n = rng.randrange(0, 50)
        data = bytes(rng.randrange(256) for _ in range(n))
        nb_frames = rng.randrange(1, 49)
        ref = ref_ext_parse(lib, data, nb_frames)
        got = extmod.extensions_parse(data, nb_frames)
        if isinstance(ref, int):
            assert got == ref, (trial, data.hex(), nb_frames, got)
        else:
            assert isinstance(got, list), (trial, data.hex(), nb_frames, got)
            assert [(e.id, e.frame, e.data) for e in got] == ref, \
                (trial, data.hex(), nb_frames)


@pytest.mark.parametrize("seed", range(4))
def test_extensions_generate_differential(seed):
    lib = _lib()
    rng = random.Random(200 + seed)
    for _ in range(300):
        nb_frames = rng.randrange(1, 6)
        nb_ext = rng.randrange(0, 8)
        exts = []
        for _ in range(nb_ext):
            ext_id = rng.choice([3, 4, 30, 33, 100, 126])
            n = rng.randrange(0, 2) if ext_id < 32 else rng.randrange(0, 300)
            exts.append(ExtensionData(
                id=ext_id, frame=rng.randrange(nb_frames),
                data=bytes(rng.randrange(256) for _ in range(n))))
        exts.sort(key=lambda e: e.frame)
        cap = 4096

        cexts = (CExt * max(1, nb_ext))()
        keep = []
        for i, e in enumerate(exts):
            b = ctypes.create_string_buffer(e.data, max(1, e.len))
            keep.append(b)
            cexts[i] = CExt(e.id, e.frame, ctypes.addressof(b), e.len)
        out_ref = ctypes.create_string_buffer(cap)
        ret_ref = lib.opus_packet_extensions_generate(
            out_ref, cap, cexts, nb_ext, nb_frames, 0)

        out = bytearray(cap)
        ret = extmod.extensions_generate(exts, nb_frames, cap, pad=False, out=out)
        assert ret == ret_ref, (exts, ret, ret_ref)
        if ret >= 0:
            assert bytes(out[:ret]) == out_ref.raw[:ret_ref]
            # and our parser round-trips it (repeat mechanism returns
            # extensions in bitstream order, not frame order -> compare sets)
            parsed = extmod.extensions_parse(bytes(out[:ret]), nb_frames)
            assert sorted((e.id, e.frame, e.data) for e in parsed) == \
                   sorted((e.id, e.frame, e.data) for e in exts)

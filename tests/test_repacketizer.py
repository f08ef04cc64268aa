"""Repacketizer differential tests vs the reference implementation
(reference: src/repacketizer.c via libopus ctypes)."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.bitstream.repacketizer import Repacketizer, packet_unpad
from opus_tpu.bitstream import packet as pkt
from opus_tpu.bitstream.extensions import ExtensionData

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libopus_full.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="reference libopus not built")


def _lib():
    lib = ctypes.CDLL(_LIB)
    lib.opus_repacketizer_create.restype = ctypes.c_void_p
    lib.opus_repacketizer_cat.restype = ctypes.c_int
    lib.opus_repacketizer_cat.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_int]
    lib.opus_repacketizer_out_range.restype = ctypes.c_int
    lib.opus_repacketizer_out_range.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int]
    return lib


def _mk_packet(rng, toc_base, nframes, sizes=None):
    """Build a valid code-0..3 packet with random frame payloads."""
    if sizes is None:
        sizes = [int(rng.integers(1, 60)) for _ in range(nframes)]
    frames = [bytes(rng.integers(0, 256, s, dtype=np.uint8).tolist())
              for s in sizes]
    if nframes == 1:
        return bytes([toc_base]) + frames[0]
    if nframes == 2 and sizes[0] == sizes[1]:
        return bytes([toc_base | 1]) + frames[0] + frames[1]
    if nframes == 2:
        return bytes([toc_base | 2]) + pkt.encode_size(sizes[0]) \
            + frames[0] + frames[1]
    vbr = len(set(sizes)) > 1
    out = bytearray([toc_base | 3, nframes | (0x80 if vbr else 0)])
    if vbr:
        for s in sizes[:-1]:
            out += pkt.encode_size(s)
    for f in frames:
        out += f
    return bytes(out)


@pytest.mark.parametrize("seed", range(8))
def test_repacketizer_matches_reference(seed):
    rng = np.random.default_rng(seed)
    lib = _lib()
    toc = 0x78  # SILK WB 20ms mono, code bits cleared
    pkts = [_mk_packet(rng, toc, int(rng.integers(1, 3)))
            for _ in range(3)]

    rp_ref = lib.opus_repacketizer_create()
    rp = Repacketizer()
    for p in pkts:
        assert lib.opus_repacketizer_cat(rp_ref, p, len(p)) == 0
        assert rp.cat(p) == 0
    n = rp.nb_frames
    for begin in range(n):
        for end in range(begin + 1, n + 1):
            buf = ctypes.create_string_buffer(4000)
            m = lib.opus_repacketizer_out_range(rp_ref, begin, end, buf,
                                                4000)
            ours = rp.out_range(begin, end, 4000)
            assert m > 0
            assert isinstance(ours, bytes)
            assert ours == buf.raw[:m], (begin, end)


def test_pad_unpad_roundtrip_reference():
    rng = np.random.default_rng(3)
    lib = _lib()
    lib.opus_packet_pad.restype = ctypes.c_int
    lib.opus_packet_unpad.restype = ctypes.c_int
    for _ in range(20):
        p = _mk_packet(rng, 0x78, int(rng.integers(1, 4)))
        target = len(p) + int(rng.integers(1, 300))
        ours = pkt.packet_pad(p, target)
        # reference unpad of our padded packet must give back a packet
        # with identical frames
        buf = ctypes.create_string_buffer(bytes(ours), len(ours))
        m = lib.opus_packet_unpad(buf, len(ours))
        assert m > 0
        ref_unpadded = buf.raw[:m]
        a = pkt.packet_parse(ref_unpadded)
        b = pkt.packet_parse(p)
        assert a.frames == b.frames
        # our unpad agrees
        mine = packet_unpad(bytes(ours))
        assert isinstance(mine, bytes)
        c = pkt.packet_parse(mine)
        assert c.frames == b.frames


def test_repacketizer_carries_extensions():
    rng = np.random.default_rng(9)
    p = _mk_packet(rng, 0x78, 1)
    rp = Repacketizer()
    assert rp.cat(p) == 0
    ext = [ExtensionData(32, 0, b"\x11\x22\x33")]
    out = rp.out_range(0, 1, 200, extensions=ext)
    assert isinstance(out, bytes)
    parsed = pkt.packet_parse(out)
    assert parsed.frames == pkt.packet_parse(p).frames
    from opus_tpu.bitstream.extensions import extensions_parse
    got = extensions_parse(parsed.padding, 1)
    assert not isinstance(got, int)
    assert any(e.id == 32 and e.data == b"\x11\x22\x33" for e in got)

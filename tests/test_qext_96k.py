"""96 kHz QEXT-mode decode tests (reference: ENABLE_QEXT paths,
celt/celt_decoder.c:196-269 qext_scale, celt/celt.c:198 comb_filter_qext,
celt/static_modes_float.h:2482 mode96000_1920_240).

Phase A coverage: decoding a 96 kHz stream that carries no extension
payload must be bit-exact vs the QEXT-enabled reference build.  The
oracle build lives in .ref_build_qext (tools/build_oracle.sh); tests
skip when it is absent.
"""

import ctypes
import os
import struct
import subprocess

import numpy as np
import pytest

from opus_tpu.celt.decoder import comb_filter, COMBFILTER_MAXPERIOD
from opus_tpu.models.opus_custom import (OpusCustomMode,
                                         OpusCustomEncoder,
                                         OpusCustomDecoder)
from opus_tpu.ops.mdct import _window
from opus_tpu.utils.soft_clip import float2int16

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QEXT_LIB = os.path.join(REPO, ".ref_build_qext", "libopus.so")
QEXT_DEMO = os.path.join(REPO, ".ref_build_qext", "opus_demo")

needs_qext_lib = pytest.mark.skipif(not os.path.exists(QEXT_LIB),
                                    reason="QEXT oracle not built")
needs_qext_demo = pytest.mark.skipif(not os.path.exists(QEXT_DEMO),
                                     reason="QEXT opus_demo not built")


def _mode96_mono():
    mode = OpusCustomMode(96000, 1920)
    return mode


def test_mode96_matches_static_tables():
    """Our computed 96 kHz mode must equal the reference static mode
    (static_modes_float.h:2482): same bands, window, preemph."""
    m = _mode96_mono().mode
    assert m.overlap == 240 and m.shortMdctSize == 240
    assert m.nbShortMdcts == 8 and m.maxLM == 3
    assert m.effEBands == 21
    # 2nd-order preemphasis specific to the 96k mode
    np.testing.assert_allclose(
        m.preemph, (0.9230041504, 0.2200012207, 1.5128347184, 0.6610107422),
        rtol=1e-9)
    assert list(m.eBands[:4]) == [0, 1, 2, 3] and m.eBands[-1] == 100


def test_comb_filter_polyphase_independence():
    """At overlap==240 the comb filter must treat even/odd sample streams
    independently at the coded 48 kHz-scale period
    (comb_filter_qext celt/celt.c:198-235)."""
    rng = np.random.default_rng(3)
    n = 960
    hist = 2 * COMBFILTER_MAXPERIOD
    window = _window(240)
    base = hist
    buf = rng.standard_normal(hist + n)
    ref = buf.copy()
    comb_filter(buf, base, 100, 120, n, 0.3, 0.5, 0, 2, window, 240)
    # reproduce via two independent half-rate comb filters
    for s in range(2):
        seg = ref[s::2].copy()
        comb_filter(seg, COMBFILTER_MAXPERIOD, 100, 120, n // 2, 0.3, 0.5,
                    0, 2, window[s::2][:120], 120)
        ref[base + s::2] = seg[COMBFILTER_MAXPERIOD:]
    np.testing.assert_allclose(buf, ref, atol=1e-12)
    # perturbing only odd history must leave even outputs unchanged
    buf2 = rng.standard_normal(hist + n)
    buf3 = buf2.copy()
    buf3[1:hist:2] += 1.0
    comb_filter(buf2, base, 100, 120, n, 0.3, 0.5, 0, 2, window, 240)
    comb_filter(buf3, base, 100, 120, n, 0.3, 0.5, 0, 2, window, 240)
    np.testing.assert_allclose(buf2[base::2], buf3[base::2], atol=1e-12)


@needs_qext_lib
def test_custom_96k_decode_parity():
    """Our 96 kHz decode must match the QEXT reference decoder to within
    1 LSB on packets from our own encoder (celt_decoder.c QEXT paths:
    doubled decode buffer, polyphase postfilter)."""
    lib = ctypes.CDLL(QEXT_LIB)
    lib.opus_custom_mode_create.restype = ctypes.c_void_p
    lib.opus_custom_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    rmode = lib.opus_custom_mode_create(96000, 1920, ctypes.byref(err))
    rdec = lib.opus_custom_decoder_create(ctypes.c_void_p(rmode), 1,
                                          ctypes.byref(err))
    mode = _mode96_mono()
    enc = OpusCustomEncoder(mode, 1)
    enc.set_bitrate(128000)
    dec = OpusCustomDecoder(mode, 1)
    rng = np.random.default_rng(7)
    t = np.arange(1920 * 10) / 96000.0
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.05 * np.sin(2 * np.pi * 30000 * t)
           + 0.02 * rng.standard_normal(len(t)))
    for i in range(10):
        p = enc.encode(pcm[i * 1920:(i + 1) * 1920], 1920)
        ours = float2int16(dec.decode(p, 1920)).astype(np.int64)
        buf = (ctypes.c_int16 * 1920)()
        n = lib.opus_custom_decode(ctypes.c_void_p(rdec), p, len(p),
                                   buf, 1920)
        assert n == 1920
        ref = np.asarray(buf[:], np.int64)
        assert np.abs(ours - ref).max() <= 1, f"frame {i}"


@needs_qext_demo
def test_opus_96k_stream_decode_parity(tmp_path):
    """End-to-end: reference encodes at 96 kHz (no extension payload),
    we decode the .bit stream bit-exactly (final ranges equal, PCM
    within 1 LSB of the reference's own decode)."""
    from opus_tpu.models.opus_decoder import OpusDecoder
    rng = np.random.default_rng(11)
    t = np.arange(96000) / 96000.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 31000 * t)
           + 0.05 * rng.standard_normal(len(t)))
    pcm16 = float2int16(sig)
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "out.bit"
    refp = tmp_path / "ref.pcm"
    pcm16.astype('<i2').tofile(inp)
    subprocess.run([QEXT_DEMO, "-e", "restricted-lowdelay", "96000", "1",
                    "256000", str(inp), str(bit)], check=True,
                   capture_output=True)
    subprocess.run([QEXT_DEMO, "-d", "96000", "1", str(bit), str(refp)],
                   check=True, capture_output=True)
    ref = np.fromfile(refp, np.int16).astype(np.int64)
    data = bit.read_bytes()
    dec = OpusDecoder(96000, 1)
    out = []
    off = 0
    while off < len(data):
        ln, rng_ref = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkt = data[off:off + ln]
        off += ln
        out.append(float2int16(dec.decode(pkt, 1920)))
        assert dec.rangeFinal == rng_ref
    ours = np.concatenate(out).astype(np.int64)
    n = min(len(ours), len(ref))
    # float64 vs the reference's float32 accumulates ~2 LSB over seconds
    assert np.abs(ours[:n] - ref[:n]).max() <= 2


@needs_qext_demo
@pytest.mark.parametrize("fs,ch,rate,ms", [
    (96000, 1, 256000, 20),   # full QEXT, all 14 extension bands
    (96000, 2, 128000, 20),   # stereo qext params + mid/side extra bits
    (48000, 1, 192000, 20),   # 48 kHz refinement (qext_end=2)
    (96000, 1, 64000, 10),    # low rate: cube-VQ fallback paths
])
def test_qext_stream_decode_parity(tmp_path, fs, ch, rate, ms):
    """Full quality-extension decode: streams encoded with -qext must be
    range-exact (main range XOR extension range, celt_decoder.c:1599)
    and PCM-exact within 2 LSB vs the reference decoder.  Covers
    compute_qext_mode, clt_compute_extra_allocation, theta/PVQ
    refinement, and the cube-VQ extension bands."""
    from opus_tpu.models.opus_decoder import OpusDecoder
    rng = np.random.default_rng(fs + ch + rate)
    t = np.arange(fs) / fs
    sig = (0.35 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * (0.3 * fs) * t)
           + 0.05 * rng.standard_normal(len(t)))
    if ch == 2:
        sig = np.stack([sig, np.roll(sig, 13)], 1).reshape(-1)
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    refp = tmp_path / "ref.pcm"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([QEXT_DEMO, "-e", "restricted-lowdelay", str(fs),
                    str(ch), str(rate), "-qext", "-framesize", str(ms),
                    str(inp), str(bit)], check=True, capture_output=True)
    subprocess.run([QEXT_DEMO, "-d", str(fs), str(ch), str(bit),
                    str(refp)], check=True, capture_output=True)
    ref = np.fromfile(refp, np.int16).astype(np.int64)
    data = bit.read_bytes()
    dec = OpusDecoder(fs, ch)
    out = []
    off = 0
    while off < len(data):
        ln, rng_ref = struct.unpack('>II', data[off:off + 8])
        off += 8
        out.append(float2int16(dec.decode(data[off:off + ln])))
        off += ln
        assert dec.rangeFinal == rng_ref
    ours = np.concatenate(out).astype(np.int64)
    n = min(len(ours), len(ref))
    assert np.abs(ours[:n] - ref[:n]).max() <= 2


def test_qext_encode_preserves_ultrasonic():
    """A 30 kHz tone survives a 96 kHz encode only when the quality
    extension is on: the extension bands carry 20-48 kHz
    (celt_encoder.c:2535 split, 2680 extension-band coding)."""
    mode = _mode96_mono()
    rng = np.random.default_rng(4)
    t = np.arange(1920 * 8) / 96000.0
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.25 * np.sin(2 * np.pi * 30000 * t)
           + 0.01 * rng.standard_normal(len(t)))
    ratios = {}
    for q in (0, 1):
        enc = OpusCustomEncoder(mode, 1)
        enc.set_bitrate(256000)
        enc.set_qext(q)
        dec = OpusCustomDecoder(mode, 1)
        out = np.concatenate([
            dec.decode(enc.encode(sig[i * 1920:(i + 1) * 1920], 1920,
                                  max_bytes=700), 1920)
            for i in range(8)])
        seg = out[1920 * 3:]
        spec = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), 1 / 96000)
        rspec = np.abs(np.fft.rfft(sig[1920 * 3:1920 * 3 + len(seg)]))
        ratios[q] = (float(np.sum(spec[freqs > 24000] ** 2))
                     / float(np.sum(rspec[freqs > 24000] ** 2)))
    assert ratios[0] < 0.01          # no extension: HF is gone
    assert 0.8 < ratios[1] < 1.2     # extension carries it


@needs_qext_lib
def test_qext_encode_reference_decode_parity():
    """Packets from our QEXT encoder must decode identically in the
    reference decoder and ours (interop both directions)."""
    lib = ctypes.CDLL(QEXT_LIB)
    lib.opus_custom_mode_create.restype = ctypes.c_void_p
    lib.opus_custom_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    rmode = lib.opus_custom_mode_create(96000, 1920, ctypes.byref(err))
    rdec = lib.opus_custom_decoder_create(ctypes.c_void_p(rmode), 1,
                                          ctypes.byref(err))
    mode = _mode96_mono()
    enc = OpusCustomEncoder(mode, 1)
    enc.set_bitrate(256000)
    enc.set_qext(1)
    dec = OpusCustomDecoder(mode, 1)
    rng = np.random.default_rng(9)
    t = np.arange(1920 * 8) / 96000.0
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 30000 * t)
           + 0.02 * rng.standard_normal(len(t)))
    for i in range(8):
        p = enc.encode(pcm[i * 1920:(i + 1) * 1920], 1920, max_bytes=700)
        assert len(p) > 300   # extension bytes actually present
        ours = float2int16(dec.decode(p, 1920)).astype(np.int64)
        buf = (ctypes.c_int16 * 1920)()
        n = lib.opus_custom_decode(ctypes.c_void_p(rdec), p, len(p),
                                   buf, 1920)
        assert n == 1920
        ref = np.asarray(buf[:], np.int64)
        assert np.abs(ours - ref).max() <= 1, f"frame {i}"


@needs_qext_demo
def test_opus_api_96k_qext_roundtrip(tmp_path):
    """The standard Opus API at 96 kHz: our OpusEncoder(96000) with QEXT
    produces packets the reference opus_demo decodes range-exact, our
    decoder matches, and ultrasonic content survives (reference:
    opus_encoder_init Fs==96000 under ENABLE_QEXT, OPUS_SET_QEXT)."""
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    fs = 96000
    rng = np.random.default_rng(6)
    t = np.arange(fs) / fs
    sig = (0.35 * np.sin(2 * np.pi * 440 * t)
           + 0.15 * np.sin(2 * np.pi * 30000 * t)
           + 0.03 * rng.standard_normal(fs))
    enc = OpusEncoder(fs, 1, "restricted-lowdelay")
    enc.set_bitrate(256000)
    enc.set_qext(1)
    dec = OpusDecoder(fs, 1)
    fsz = fs // 50
    blob = bytearray()
    outs = []
    for i in range(25):
        p = enc.encode(sig[i * fsz:(i + 1) * fsz], fsz)
        blob += struct.pack('>II', len(p), enc.rangeFinal) + p
        outs.append(float2int16(dec.decode(p, fsz)))
    bit = tmp_path / "o.bit"
    refp = tmp_path / "r.pcm"
    bit.write_bytes(bytes(blob))
    subprocess.run([QEXT_DEMO, "-d", "96000", "1", str(bit), str(refp)],
                   check=True, capture_output=True)
    ref = np.fromfile(refp, np.int16).astype(np.int64)
    ours = np.concatenate(outs).astype(np.int64)
    n = min(len(ours), len(ref))
    assert np.abs(ours[:n] - ref[:n]).max() <= 1
    spec = np.abs(np.fft.rfft(ours[fsz * 3:n] / 32768.0))
    freqs = np.fft.rfftfreq(n - fsz * 3, 1 / fs)
    rs = np.abs(np.fft.rfft(sig[fsz * 3:n]))
    hf = float(np.sum(spec[freqs > 24000] ** 2)) \
        / float(np.sum(rs[freqs > 24000] ** 2))
    assert 0.8 < hf < 1.2


@needs_qext_demo
def test_opus_api_48k_qext(tmp_path):
    """QEXT through the standard API at 48 kHz: extension ID 124 rides
    the padding and the reference decoder consumes it."""
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.bitstream import packet as pkt2
    from opus_tpu.bitstream.extensions import (ExtensionIterator,
                                               ExtensionData)
    fs = 48000
    rng = np.random.default_rng(2)
    t = np.arange(fs) / fs
    sig = (0.35 * np.sin(2 * np.pi * 440 * t)
           + 0.12 * np.sin(2 * np.pi * 21000 * t)
           + 0.04 * rng.standard_normal(fs))
    enc = OpusEncoder(fs, 1, "audio")
    enc.set_bitrate(192000)
    enc.set_qext(1)
    dec = OpusDecoder(fs, 1)
    fsz = fs // 50
    blob = bytearray()
    outs = []
    packets = []
    for i in range(25):
        p = enc.encode(sig[i * fsz:(i + 1) * fsz], fsz)
        packets.append(p)
        blob += struct.pack('>II', len(p), enc.rangeFinal) + p
        outs.append(float2int16(dec.decode(p, fsz)))
    parsed = pkt2.packet_parse(packets[5])
    it = ExtensionIterator(parsed.padding, parsed.count)
    assert isinstance(it.find(124), ExtensionData)
    bit = tmp_path / "o.bit"
    refp = tmp_path / "r.pcm"
    bit.write_bytes(bytes(blob))
    subprocess.run([QEXT_DEMO, "-d", "48000", "1", str(bit), str(refp)],
                   check=True, capture_output=True)
    ref = np.fromfile(refp, np.int16).astype(np.int64)
    ours = np.concatenate(outs).astype(np.int64)
    n = min(len(ours), len(ref))
    assert np.abs(ours[:n] - ref[:n]).max() <= 1


QEXT_CMP = os.path.join(REPO, ".ref_build_qext", "qext_compare")


@pytest.mark.skipif(not os.path.exists(QEXT_CMP),
                    reason="reference qext_compare not built")
def test_qext_compare_matches_reference(tmp_path):
    """Our qext_compare port must agree with the reference tool
    (src/qext_compare.c) on err4/err16 to float precision."""
    import re
    from opus_tpu.utils.compare import qext_compare
    rng = np.random.default_rng(12)
    t = np.arange(96000) / 96000.0
    ref = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 28000 * t))
    test = ref + 0.003 * rng.standard_normal(len(ref))
    ref16 = float2int16(ref)
    test16 = float2int16(test)
    rf = tmp_path / "r.sw"
    tf = tmp_path / "t.sw"
    np.stack([ref16, ref16], 1).reshape(-1).astype('<i2').tofile(rf)
    test16.astype('<i2').tofile(tf)
    r = subprocess.run([QEXT_CMP, str(rf), str(tf)], capture_output=True,
                       text=True)
    m = re.search(r"err4 = ([\d.]+), err16 = ([\d.]+)", r.stderr)
    ref_e4, ref_e16 = float(m.group(1)), float(m.group(2))
    e4, e16, _ = qext_compare(
        np.stack([ref16, ref16], 1).reshape(-1).astype(np.float64),
        test16.astype(np.float64), 1, 96000)
    assert abs(e4 - ref_e4) < 1e-3 * max(1.0, ref_e4)
    assert abs(e16 - ref_e16) < 1e-3 * max(1.0, ref_e16)


def test_qext_compare_gate_on_codec_output():
    """The 96 kHz codec roundtrip passes a sane qext_compare gate while
    a broken (HF-stripped) output fails it."""
    from opus_tpu.utils.compare import qext_compare
    mode = _mode96_mono()
    enc = OpusCustomEncoder(mode, 1)
    enc.set_bitrate(256000)
    enc.set_qext(1)
    dec = OpusCustomDecoder(mode, 1)
    rng = np.random.default_rng(3)
    t = np.arange(1920 * 10) / 96000.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 30000 * t)
           + 0.01 * rng.standard_normal(len(t)))
    out = np.concatenate([
        dec.decode(enc.encode(sig[i * 1920:(i + 1) * 1920], 1920,
                              max_bytes=700), 1920) for i in range(10)])
    ref16 = float2int16(sig)
    st = np.stack([ref16, ref16], 1).reshape(-1).astype(np.float64)
    e4, e16, _ = qext_compare(st, float2int16(out).astype(np.float64),
                              1, 96000)
    assert e4 < 2.0 and e16 < 4.0
    # silence scores clearly worse on the err4 axis (err16's higher
    # noise floor is deliberately insensitive to missing quiet content)
    e4b, _, _ = qext_compare(st, np.zeros_like(out), 1, 96000)
    assert e4b > 1.5 * e4


def test_qext_and_dred_extensions_coexist():
    """Both padding extensions (QEXT 124 and DRED 126) can ride one
    packet and the decoder still applies the QEXT payload (reference:
    the extension iterator model of src/extensions.c)."""
    from opus_tpu.bitstream.repacketizer import Repacketizer
    from opus_tpu.bitstream.extensions import (ExtensionData,
                                               ExtensionIterator)
    from opus_tpu.bitstream import packet as pkt2
    from opus_tpu.models.opus_encoder import OpusEncoder
    from opus_tpu.models.opus_decoder import OpusDecoder
    fs = 48000
    enc = OpusEncoder(fs, 1, "audio")
    enc.set_bitrate(192000)
    enc.set_qext(1)
    t = np.arange(960) / fs
    p = enc.encode(0.3 * np.sin(2 * np.pi * 440 * t), 960)
    parsed = pkt2.packet_parse(p)
    it = ExtensionIterator(parsed.padding, parsed.count)
    e124 = it.find(124)
    assert isinstance(e124, ExtensionData)
    rp = Repacketizer()
    assert rp.cat(p) == 0
    both = rp.out_range(
        0, rp.nb_frames, 4000, pad=False,
        extensions=[ExtensionData(id=124, frame=0, data=bytes(e124.data)),
                    ExtensionData(id=126, frame=0,
                                  data=b'D\x0c' + bytes(50))])
    assert isinstance(both, bytes)
    dec = OpusDecoder(fs, 1)
    ref_dec = OpusDecoder(fs, 1)
    out_both = dec.decode(both, 960)
    out_orig = ref_dec.decode(p, 960)
    assert np.isfinite(out_both).all()
    np.testing.assert_array_equal(out_both, out_orig)

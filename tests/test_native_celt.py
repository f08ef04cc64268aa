"""Differential tests: native C CELT symbol pass (opus_tpu/native/celt_dec.c)
vs the scalar Python decoder (the bit-exact oracle) on reference-encoded
streams.  The integer/decision domain (final range, energies) must match
exactly; X only within float-summation tolerance (numpy's pairwise dot vs
the C sequential sums differ in the last ulp)."""

import struct
import subprocess
import os

import numpy as np
import pytest

from opus_tpu.utils.soft_clip import float2int16

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _celt_stream(tmp_path, ch, rate, framesize_ms):
    demo = os.path.join(REPO, ".ref_build", "opus_demo")
    if not os.path.exists(demo):
        pytest.skip("reference build missing")
    fs = 48000
    rng = np.random.default_rng(7)
    t = np.arange(fs * 2) / fs
    sig = 0.3 * np.sin(2 * np.pi * 400 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    for _ in range(12):
        p0 = int(rng.integers(0, len(t) - 500))
        sig[p0:p0 + 400] += 0.5 * rng.standard_normal(400) * np.hanning(400)
    sig = np.clip(sig, -1, 1)
    if ch == 2:
        st = np.empty(len(sig) * 2)
        st[0::2] = sig
        st[1::2] = np.roll(sig, 7) * 0.8
        sig = st
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e", "restricted-lowdelay", "48000", str(ch),
                    str(rate), "-framesize", str(framesize_ms), str(inp),
                    str(bit)], check=True, capture_output=True)
    data = bit.read_bytes()
    pkts = []
    off = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkts.append(data[off:off + ln])
        off += ln
    from opus_tpu.bitstream import packet as pkt
    return [pkt.packet_parse(p).frames[0] for p in pkts]


def _compare(frames, ch, N, n=40):
    from opus_tpu.native.celt_symbols import CeltSymbolBatch, available
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.bitstream.range_coder import make_range_decoder
    if not available():
        pytest.skip("no C compiler")
    c = CeltDecoder.create(48000, ch)
    c.signalling = 0
    c.disable_inv = 1 if ch == 1 else 0
    nb = CeltSymbolBatch(1, ch, 48000, N)
    for i, f in enumerate(frames[:n]):
        capt = {}
        orig = c._synthesis

        def syn(X, oldBandE, *a, **kw):
            capt['X'] = X.copy()
            capt['E'] = oldBandE.copy()
            return orig(X, oldBandE, *a, **kw)

        c._synthesis = syn
        pcm = np.zeros(N * ch)
        c.decode_with_ec(f, pcm, N, make_range_decoder(f))
        c._synthesis = orig
        X, E, pf, flags, rets = nb.decode([f])
        assert rets[0] == 0, (i, rets[0])
        assert nb.states[0].rng == c.rng, f"rng mismatch frame {i}"
        assert np.abs(X[0] - capt['X'][:ch * N].astype(np.float32)).max() \
            < 1e-6, i
        assert np.array_equal(
            E[0], capt['E'][:ch * nb.nb].astype(np.float32)), i
        # postfilter params must mirror the scalar decoder state
        assert nb.states[0].postfilter_period == c.postfilter_period
        assert nb.states[0].postfilter_gain == c.postfilter_gain
        assert nb.states[0].postfilter_tapset == c.postfilter_tapset


@pytest.mark.parametrize("ch,rate", [(1, 16000), (1, 64000), (1, 256000),
                                     (2, 48000), (2, 128000)])
def test_native_symbols_20ms(tmp_path, ch, rate):
    frames = _celt_stream(tmp_path, ch, rate, 20)
    _compare(frames, ch, 960)


@pytest.mark.parametrize("ms,N", [(10, 480), (5, 240), (2.5, 120)])
def test_native_symbols_short_frames(tmp_path, ms, N):
    frames = _celt_stream(tmp_path, 1, 64000, ms)
    _compare(frames, 1, N)


def test_native_symbols_batch_threads(tmp_path):
    """The threaded batch driver must produce the same outputs as
    stream-by-stream decode (states are independent)."""
    from opus_tpu.native.celt_symbols import CeltSymbolBatch, available
    if not available():
        pytest.skip("no C compiler")
    frames = _celt_stream(tmp_path, 1, 64000, 20)[:8]
    b1 = CeltSymbolBatch(8, 1, 48000, 960, nthreads=1)
    b4 = CeltSymbolBatch(8, 1, 48000, 960, nthreads=4)
    for _ in range(3):  # several frames so state carries
        X1, E1, p1, f1, r1 = b1.decode(frames)
        X4, E4, p4, f4, r4 = b4.decode(frames)
        assert np.array_equal(X1, X4)
        assert np.array_equal(E1, E4)
        assert np.array_equal(p1, p4) and np.array_equal(f1, f4)
        assert all(a.rng == b.rng
                   for a, b in zip(b1.states, b4.states))


def test_native_symbols_garbage_robust(tmp_path):
    """Random garbage frames must not crash or hang the native pass."""
    from opus_tpu.native.celt_symbols import CeltSymbolBatch, available
    if not available():
        pytest.skip("no C compiler")
    rng = np.random.default_rng(3)
    nb = CeltSymbolBatch(4, 1, 48000, 960)
    for _ in range(25):
        frames = [bytes(rng.integers(0, 256, int(rng.integers(2, 200)),
                                     dtype=np.uint8)) for _ in range(4)]
        X, E, pf, flags, rets = nb.decode(frames)
        assert np.all(np.isfinite(X))

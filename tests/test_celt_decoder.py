"""End-to-end CELT decoder tests against the reference implementation.

Strategy (SURVEY.md §4 tier 2/3): encode PCM with the reference opus_demo
(restricted-lowdelay = CELT-only), decode with our decoder, and require
 (a) the final_range oracle to match the encoder's per packet (bit-exact
     entropy path), and
 (b) PCM to match the reference decoder's output to >90 dB SNR.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from opus_tpu.models.opus_decoder import OpusDecoder

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMO = os.path.join(_REPO, ".ref_build", "opus_demo")


def _require_demo():
    if not os.path.exists(_DEMO):
        subprocess.run([os.path.join(_REPO, "tools", "build_oracle.sh")],
                       check=True)


def gen_pcm(ch, n=24000, seed=42):
    rs = np.random.RandomState(seed)
    t = np.arange(n)
    sig = 6000 * np.sin(2 * np.pi * 440 * t / 48000) + 700 * rs.randn(n)
    for p in range(2000, n, 7000):  # transients for short-block coverage
        sig[p:p + 200] += 15000 * np.exp(-np.arange(200) / 30.0) * \
            np.sign(rs.randn(200))
    if ch == 2:
        sig2 = 5000 * np.sin(2 * np.pi * 880 * t / 48000 + .5) + 600 * rs.randn(n)
        sig = np.stack([sig, sig2], 1).reshape(-1)
    return np.clip(sig, -32767, 32767).astype(np.int16)


def run_config(tmp_path, ch, framesize, rate, extra=()):
    _require_demo()
    pcm = gen_pcm(ch)
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "out.bit"
    refp = tmp_path / "ref.pcm"
    pcm.tofile(inp)
    subprocess.run([_DEMO, "-e", "restricted-lowdelay", "48000", str(ch),
                    str(rate), "-framesize", framesize, "-complexity", "10",
                    *extra, str(inp), str(bit)],
                   check=True, capture_output=True)
    subprocess.run([_DEMO, "-d", "48000", str(ch), str(bit), str(refp)],
                   check=True, capture_output=True)
    ref = np.fromfile(refp, dtype=np.int16)

    dec = OpusDecoder(48000, ch)
    data = bit.read_bytes()
    pos = 0
    outs = []
    n = bad = 0
    while pos < len(data):
        ln, rng = struct.unpack(">iI", data[pos:pos + 8])
        pos += 8
        out = dec.decode(data[pos:pos + ln])
        pos += ln
        outs.append(out)
        bad += dec.rangeFinal != rng
        n += 1
    mine = np.concatenate(outs)
    m16 = np.clip(np.floor(mine * 32768 + 0.5), -32768, 32767).astype(np.int16)
    L = min(len(m16), len(ref))
    err = (m16[:L].astype(np.float64) - ref[:L]) ** 2
    snr = 10 * np.log10(np.mean(ref[:L].astype(np.float64) ** 2)
                        / (np.mean(err) + 1e-9))
    return n, bad, snr, np.abs(m16[:L] - ref[:L]).max()


@pytest.mark.parametrize("ch,framesize,rate,extra", [
    (1, "20", 64000, ()),
    (1, "10", 96000, ("-cbr",)),
    (2, "2.5", 128000, ()),
    (2, "5", 48000, ("-cvbr",)),
    (2, "20", 256000, ()),
    (1, "2.5", 24000, ()),
])
def test_celt_decode_matches_reference(tmp_path, ch, framesize, rate, extra):
    n, bad, snr, maxdiff = run_config(tmp_path, ch, framesize, rate, extra)
    assert n > 0
    assert bad == 0, f"{bad}/{n} final_range mismatches"
    assert snr > 90, snr
    assert maxdiff <= 2


def test_garbage_packets_dont_crash():
    rs = np.random.RandomState(5)
    dec = OpusDecoder(48000, 2)
    ok = 0
    for trial in range(200):
        nbytes = rs.randint(1, 60)
        data = bytes(rs.randint(0, 256, nbytes, dtype=np.uint8))
        data = bytes([0x80 | (data[0] & 0x7F)]) + data[1:]  # force CELT mode
        try:
            out = dec.decode(data)
            assert np.all(np.isfinite(out))
            ok += 1
        except (ValueError, RuntimeError):
            pass
    assert ok > 0


def test_plc_produces_output():
    dec = OpusDecoder(48000, 1)
    # prime with one real packet
    import subprocess as sp
    _require_demo()
    pcm = gen_pcm(1, 4800)
    pcm.tofile("/tmp/plc_in.pcm")
    sp.run([_DEMO, "-e", "restricted-lowdelay", "48000", "1", "64000",
            "/tmp/plc_in.pcm", "/tmp/plc.bit"], check=True, capture_output=True)
    data = open("/tmp/plc.bit", "rb").read()
    ln, _ = struct.unpack(">iI", data[:8])
    dec.decode(data[8:8 + ln])
    out = dec.decode(None, 960)
    assert out.shape == (960,)
    assert np.all(np.isfinite(out))


def test_plc_parity_with_losses(tmp_path):
    """Pitch-based + noise PLC vs the reference decoder: streams with
    isolated, paired, and 60 ms losses must conceal identically within
    float rounding (reference: celt_decode_lost celt_decoder.c:679,
    celt_plc_pitch_search :555, prefilter_and_fold :580)."""
    import struct
    import subprocess
    import os
    import numpy as np
    from opus_tpu.models.opus_decoder import OpusDecoder
    from opus_tpu.utils.soft_clip import float2int16
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".ref_build", "opus_demo")
    if not os.path.exists(demo):
        import pytest
        pytest.skip("reference opus_demo not built")
    rng = np.random.default_rng(77)
    fs = 48000
    t = np.arange(fs * 2) / fs
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)
           * (1 + 0.2 * np.sin(2 * np.pi * 2 * t))
           + 0.02 * rng.standard_normal(fs * 2))
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    float2int16(sig).astype('<i2').tofile(inp)
    subprocess.run([demo, "-e", "audio", "48000", "1", "64000",
                    str(inp), str(bit)], check=True, capture_output=True)
    data = bit.read_bytes()
    lost = {30, 31, 55, 80, 81, 82}
    out = bytearray()
    off = 0
    k = 0
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkt = data[off:off + ln]
        off += ln
        out += struct.pack('>II', 0, 0) if k in lost \
            else struct.pack('>II', ln, rg) + pkt
        k += 1
    loss_bit = tmp_path / "loss.bit"
    refp = tmp_path / "ref.pcm"
    loss_bit.write_bytes(bytes(out))
    subprocess.run([demo, "-d", "48000", "1", str(loss_bit), str(refp)],
                   check=True, capture_output=True)
    dec = OpusDecoder(48000, 1)
    outs = []
    off = 0
    data = loss_bit.read_bytes()
    while off < len(data):
        ln, rg = struct.unpack('>II', data[off:off + 8])
        off += 8
        pkt = data[off:off + ln]
        off += ln
        outs.append(float2int16(dec.decode(pkt if ln else None, 960)))
    ours = np.concatenate(outs).astype(np.int64)
    ref = np.fromfile(refp, np.int16).astype(np.int64)
    n = min(len(ours), len(ref))
    assert np.abs(ours[:n] - ref[:n]).max() <= 4

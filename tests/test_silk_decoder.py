"""SILK decoder tests: component differentials vs the reference oracle and
end-to-end bit-exactness (SILK fixed-point decode must match the reference
exactly; hybrid adds float CELT noise)."""

import ctypes
import os
import random
import struct
import subprocess

import numpy as np
import pytest

from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.silk.decoder import gains_dequant, nlsf_decode, nlsf2a
from opus_tpu.silk import tables as T

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, ".ref_build", "libsilk_oracle.so")
_DEMO = os.path.join(_REPO, ".ref_build", "opus_demo")


def _lib():
    if not os.path.exists(_SO):
        subprocess.run([os.path.join(_REPO, "tools", "build_oracle.sh")],
                       check=True)
    return ctypes.CDLL(_SO)


def test_gains_dequant_differential():
    lib = _lib()
    rng = random.Random(0)
    for _ in range(300):
        nb = rng.choice([2, 4])
        cond = rng.randrange(2)
        ind = [rng.randrange(64) if (k == 0 and not cond) else
               rng.randrange(41) for k in range(nb)]
        prev = rng.randrange(64)
        g = (ctypes.c_int32 * 4)()
        po = ctypes.c_int8()
        lib.oracle_gains_dequant(g, (ctypes.c_int8 * nb)(*ind), prev, cond,
                                 nb, ctypes.byref(po))
        mine, mp = gains_dequant(ind, prev, cond, nb)
        assert list(g)[:nb] == mine and po.value == mp


def test_nlsf_chain_differential():
    lib = _lib()
    rng = random.Random(1)
    for _ in range(300):
        wb = rng.randrange(2)
        order = 16 if wb else 10
        indices = [rng.randrange(32)] + [rng.randrange(-4, 5)
                                         for _ in range(order)]
        nlsf = (ctypes.c_int16 * 16)()
        a = (ctypes.c_int16 * 16)()
        buf = (ctypes.c_int8 * 17)(*indices, *([0] * (17 - len(indices))))
        lib.oracle_nlsf_decode(nlsf, a, buf, wb)
        cb = T.NLSF_CB_WB if wb else T.NLSF_CB_NB_MB
        mine_nlsf = nlsf_decode(indices, cb)
        mine_a = nlsf2a(mine_nlsf, order)
        assert list(nlsf)[:order] == mine_nlsf
        assert list(a)[:order] == mine_a


def gen_pcm(ch, fs, n, seed=1):
    t = np.arange(n)
    f0 = 120 + 30 * np.sin(2 * np.pi * t / (fs // 2))
    phase = np.cumsum(2 * np.pi * f0 / fs)
    sig = 8000 * np.sin(phase) + 2000 * np.sin(2 * phase + .3) \
        + 300 * np.random.RandomState(seed).randn(n)
    if ch == 2:
        s2 = 6000 * np.sin(phase * 1.01 + .5) \
            + 250 * np.random.RandomState(seed + 1).randn(n)
        sig = np.stack([sig, s2], 1).reshape(-1)
    return np.clip(sig, -32767, 32767).astype(np.int16)


def run_config(tmp_path, ch, fs, rate, extra=()):
    pcm = gen_pcm(ch, fs, fs)
    inp = tmp_path / "in.pcm"
    bit = tmp_path / "o.bit"
    refp = tmp_path / "ref.pcm"
    pcm.tofile(inp)
    subprocess.run([_DEMO, "-e", "voip", str(fs), str(ch), str(rate),
                    "-complexity", "10", *extra, str(inp), str(bit)],
                   check=True, capture_output=True)
    subprocess.run([_DEMO, "-d", str(fs), str(ch), str(bit), str(refp)],
                   check=True, capture_output=True)
    ref = np.fromfile(refp, dtype=np.int16)
    dec = OpusDecoder(fs, ch)
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
    m16 = np.clip(np.floor(mine * 32768 + .5), -32768, 32767).astype(np.int16)
    L = min(len(m16), len(ref))
    err = (m16[:L].astype(np.float64) - ref[:L]) ** 2
    snr = 10 * np.log10(np.mean(ref[:L].astype(np.float64) ** 2)
                        / (np.mean(err) + 1e-9))
    return n, bad, snr, int(np.abs(m16[:L] - ref[:L]).max())


@pytest.mark.parametrize("ch,fs,rate,extra,exact", [
    (1, 48000, 12000, ("-bandwidth", "NB"), True),
    (1, 48000, 16000, ("-bandwidth", "MB"), True),
    (1, 48000, 20000, ("-bandwidth", "WB"), True),
    (2, 48000, 32000, ("-bandwidth", "WB"), True),
    (1, 8000, 12000, (), True),
    (1, 16000, 20000, (), True),
    (1, 48000, 20000, ("-framesize", "60", "-bandwidth", "WB"), True),
    (1, 48000, 20000, ("-framesize", "10", "-bandwidth", "WB"), True),
    (1, 48000, 24000, (), False),    # hybrid
    (2, 48000, 40000, ("-framesize", "10"), False),
])
def test_silk_decode_matches_reference(tmp_path, ch, fs, rate, extra, exact):
    n, bad, snr, maxdiff = run_config(tmp_path, ch, fs, rate, extra)
    assert n > 0
    assert bad == 0, f"{bad}/{n} final_range mismatches"
    if exact:
        assert maxdiff == 0, (snr, maxdiff)
    else:
        assert snr > 90 and maxdiff <= 2, (snr, maxdiff)

"""dred_compare port (opus_tpu/utils/dred_compare.py): differential
parity with a compiled reference dnn/dred_compare.c on synthetic audio,
plus feature-mode self-consistency."""

import os
import re
import subprocess

import numpy as np
import pytest

from opus_tpu.utils.dred_compare import (compare_audio, compare_features,
                                         read_pcm_file)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, ".ref_build", "dred_compare")


def _build_tool():
    if os.path.exists(_TOOL):
        return True
    src = "/root/reference/dnn/dred_compare.c"
    if not os.path.exists(src):
        return False
    r = subprocess.run(["gcc", "-O2", "-I/root/reference/celt", src,
                        "-lm", "-o", _TOOL], capture_output=True)
    return r.returncode == 0


def _signals(tmp_path, seed=5):
    rng = np.random.default_rng(seed)
    fs = 16000
    t = np.arange(fs * 2) / fs
    x = 8000 * np.sin(2 * np.pi * 220 * t) \
        * (1 + 0.3 * np.sin(2 * np.pi * 2 * t)) \
        + 300 * rng.standard_normal(len(t))
    y = x + 400 * rng.standard_normal(len(t))
    xp = tmp_path / "x.s16"
    yp = tmp_path / "y.s16"
    np.clip(x, -32768, 32767).astype("<i2").tofile(xp)
    np.clip(y, -32768, 32767).astype("<i2").tofile(yp)
    return str(xp), str(yp)


def test_compare_audio_matches_reference(tmp_path):
    if not _build_tool():
        pytest.skip("reference dred_compare not buildable")
    xp, yp = _signals(tmp_path)
    r = subprocess.run([_TOOL, "-audio", xp, yp], capture_output=True,
                       text=True)
    m = re.search(r"err4 = ([\d.]+), err16 = ([\d.]+), pitch = ([\d.]+)",
                  r.stderr)
    assert m, r.stderr
    ref = tuple(float(g) for g in m.groups())
    ours = compare_audio(read_pcm_file(xp), read_pcm_file(yp))
    # the C tool runs float32; our float64 port agrees to ~1e-4
    for o, rr in zip(ours, ref):
        assert abs(o - rr) < 1e-3, (ours, ref)


def test_compare_audio_identical_is_zero(tmp_path):
    xp, _ = _signals(tmp_path)
    x = read_pcm_file(xp)
    e4, e16, p = compare_audio(x, x)
    assert e4 < 1e-9 and e16 < 1e-9 and p == 0.0


def test_compare_features():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 20)).astype(np.float32)
    x[:, 19] = 0.5          # voiced
    y = x + 0.1 * rng.standard_normal((50, 20)).astype(np.float32)
    tot, mx, p = compare_features(x, y)
    assert 0 < mx <= tot and p > 0
    t0, m0, p0 = compare_features(x, x)
    assert t0 == 0 and m0 == 0 and p0 == 0

"""Differential test of opus_tpu.utils.soft_clip vs the reference's public
opus_pcm_soft_clip (reference: src/opus.c:163)."""

import ctypes
import os

import numpy as np
import pytest

from opus_tpu.utils.soft_clip import pcm_soft_clip

_LIB = os.path.join(os.path.dirname(__file__), os.pardir,
                    ".ref_build", "libopus_full.so")

pytestmark = pytest.mark.skipif(not os.path.exists(_LIB),
                                reason="reference libopus not built")


def _ref_soft_clip(lib, x, channels, mem):
    xc = np.array(x, dtype=np.float32)  # real copy: the ref clips in place
    memc = np.array(mem, dtype=np.float32)
    lib.opus_pcm_soft_clip(
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(xc) // channels, channels,
        memc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return xc, memc


@pytest.mark.parametrize("channels", [1, 2])
def test_soft_clip_differential(channels):
    lib = ctypes.CDLL(_LIB)
    rng = np.random.default_rng(11)
    mem_ref = np.zeros(channels, np.float32)
    mem_mine = np.zeros(channels, np.float32)
    for trial in range(50):
        n = int(rng.integers(8, 480))
        # mix of gentle, overshooting, and wild signals; keep frames
        # correlated so the carried-over `a` state matters
        scale = rng.choice([0.5, 0.9, 1.2, 1.8, 3.0])
        t = np.arange(n * channels)
        x = (scale * np.sin(0.05 * t + trial)
             + 0.3 * rng.standard_normal(n * channels)).astype(np.float32)
        ref, mem_ref = _ref_soft_clip(lib, x, channels, mem_ref)
        mine = pcm_soft_clip(x.copy(), channels, mem_mine)
        np.testing.assert_array_equal(mine, ref, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(mem_mine, mem_ref,
                                      err_msg=f"mem trial {trial}")


def test_soft_clip_bounds():
    rng = np.random.default_rng(5)
    mem = np.zeros(1, np.float32)
    x = (5 * rng.standard_normal(2000)).astype(np.float32)
    y = pcm_soft_clip(x, 1, mem)
    assert np.all(np.abs(y) <= 1.0)

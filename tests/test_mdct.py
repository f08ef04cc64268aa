"""MDCT tests: differential vs the reference clt_mdct_forward/backward and a
multi-block synthesis chain matching the decoder's in-buffer TDAC usage."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from opus_tpu.ops import mdct as jmdct

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, ".ref_build", "libmdct_oracle.so")


def _lib():
    if not os.path.exists(_SO):
        subprocess.run([os.path.join(_REPO, "tools", "build_oracle.sh")], check=True)
    lib = ctypes.CDLL(_SO)
    fp = ctypes.POINTER(ctypes.c_float)
    for f in (lib.oracle_mdct_forward, lib.oracle_mdct_backward):
        f.argtypes = [ctypes.c_int] * 4 + [fp, fp, fp]
        f.restype = ctypes.c_int
    return lib


def _cfloat(arr):
    a = np.ascontiguousarray(arr, dtype=np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


@pytest.mark.parametrize("n2,overlap", [(120, 120), (240, 120), (480, 120),
                                        (960, 120), (960, 960), (64, 32)])
def test_mdct_forward_matches_reference(n2, overlap):
    lib = _lib()
    n = 2 * n2
    rng = np.random.RandomState(42)
    x = rng.randn(n2 + overlap).astype(np.float32)
    window = jmdct._window(overlap).astype(np.float32)

    inbuf, inp = _cfloat(x.copy())
    out, outp = _cfloat(np.zeros(n2, np.float32))
    _, wp = _cfloat(window)
    assert lib.oracle_mdct_forward(n, overlap, 0, 1, wp, inp, outp) == 0

    got = np.asarray(jmdct.mdct_forward(x, n2, overlap))
    np.testing.assert_allclose(got, out, rtol=2e-4, atol=2e-4 * np.abs(out).max())


@pytest.mark.parametrize("n2,overlap", [(120, 120), (960, 120), (64, 32)])
def test_imdct_chain_matches_reference(n2, overlap):
    """Drive the reference backward MDCT exactly the way celt_synthesis does
    (B blocks, stride B, shared output buffer) and compare with our
    imdct_with_overlap."""
    lib = _lib()
    nblocks = 4
    n = 2 * n2
    ov2 = overlap // 2
    rng = np.random.RandomState(7)
    # interleaved freq layout: freq[b + B*k] = S[b, k] -> the reference wants
    # stride=B starting at &freq[b]
    spec = rng.randn(nblocks, n2).astype(np.float32) * 100
    freq = np.zeros(nblocks * n2, np.float32)
    for b in range(nblocks):
        freq[b::nblocks] = spec[b]
    window = jmdct._window(overlap).astype(np.float32)
    _, wp = _cfloat(window)

    prev_tail = (rng.randn(ov2) * 10).astype(np.float32)
    outbuf = np.zeros(nblocks * n2 + ov2 + 8, np.float32)
    outbuf[:ov2] = prev_tail

    for b in range(nblocks):
        inbuf = freq.copy()
        _, ip = _cfloat(inbuf)
        seg = np.ascontiguousarray(outbuf[b * n2: b * n2 + n2 + ov2])
        segp = seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ipb = ctypes.cast(ctypes.addressof(ip.contents) + 4 * b,
                          ctypes.POINTER(ctypes.c_float))
        assert lib.oracle_mdct_backward(n, overlap, 0, nblocks, wp, ipb, segp) == 0
        outbuf[b * n2: b * n2 + n2 + ov2] = seg

    ref_out = outbuf[:nblocks * n2].copy()
    ref_tail = outbuf[nblocks * n2: nblocks * n2 + ov2].copy()

    got_out, got_tail = jmdct.imdct_with_overlap(
        spec, prev_tail, n2, overlap)
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(np.asarray(got_out), ref_out,
                               rtol=1e-4, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(got_tail), ref_tail,
                               rtol=1e-4, atol=2e-4 * scale)


def test_forward_backward_roundtrip_snr():
    """Perfect reconstruction through analysis/synthesis with 50% frame
    advance (the MDCT TDAC property), as in test_unit_mdct."""
    n2, overlap = 120, 120
    rng = np.random.RandomState(3)
    nframes = 20
    sig = rng.randn(n2 * (nframes + 2)).astype(np.float32)

    # analysis: frames advance by N2, each consumes N2+overlap samples
    specs = []
    for f in range(nframes):
        seg = sig[f * n2: f * n2 + n2 + overlap]
        specs.append(np.asarray(jmdct.mdct_forward(seg, n2, overlap)))
    spec = np.stack(specs)  # [F, N2]

    out, tail = jmdct.imdct_with_overlap(spec[None], np.zeros(overlap // 2,
                                         np.float32)[None], n2, overlap)
    out = np.asarray(out)[0]
    # compare the interior (skip first frame: missing history); synthesis
    # output aligns 1:1 with the analysis input index in this convention
    ref = sig[n2: n2 * (nframes - 1)]
    got = out[n2: n2 * (nframes - 1)]
    err = np.mean((ref - got) ** 2)
    sig_pow = np.mean(ref ** 2)
    snr = 10 * np.log10(sig_pow / err)
    assert snr > 50, snr

"""Native C CELT symbol-encode pass (opus_tpu/native/celt_enc.c) parity:
fed the same spectra, it must produce byte-identical packets and final
ranges to the scalar Python encoder (prefilter off, tone detect off,
complexity 5, CBR)."""

import numpy as np
import pytest

from opus_tpu.celt import encoder as E
from opus_tpu.celt.encoder import CeltEncoder, celt_preemphasis
from opus_tpu.celt.energy import (compute_band_energies, amp2log2,
                                  normalise_bands)
from opus_tpu.native import celt_enc_symbols
from opus_tpu.native.celt_enc_symbols import CeltEncSymbolBatch

pytestmark = pytest.mark.skipif(not celt_enc_symbols.available(),
                                reason="no C compiler")


def _sig(kind, n, rs):
    t = np.arange(n)
    if kind == "speech":
        s = 0.25 * np.sin(2 * np.pi * 440 * t / 48000) + 0.02 * rs.randn(n)
        for p in range(5000, n, 9000):
            s[p:p + 300] += 0.4 * np.exp(-np.arange(300) / 30.) \
                * np.sign(rs.randn(300))
    elif kind == "noise":
        s = 0.3 * rs.randn(n)
    else:  # silence-then-quiet
        s = np.zeros(n)
        s[n // 2:] = 1e-4 * rs.randn(n // 2)
    return np.clip(s, -0.99, 0.99)


@pytest.mark.parametrize("frame_size,lm,nbytes,kind", [
    (960, 3, 160, "speech"),
    (960, 3, 23, "speech"),
    (960, 3, 4, "speech"),
    (480, 2, 80, "speech"),
    (240, 1, 40, "speech"),
    (120, 0, 20, "speech"),
    (960, 3, 160, "noise"),
    (960, 3, 160, "quiet"),
])
def test_celt_enc_symbols_byte_exact(frame_size, lm, nbytes, kind,
                                     monkeypatch):
    monkeypatch.setattr(E, "tone_detect",
                        lambda inp, cc, n, fs: (-1.0, 0.0))
    rs = np.random.RandomState(3)
    enc_py = CeltEncoder.create(48000, 1)
    enc_py.complexity = 5
    enc_py.disable_pf = 1
    mode = enc_py.mode
    N, overlap, nbE = frame_size, mode.overlap, mode.nbEBands
    M = 1 << lm
    dsp = CeltEncoder.create(48000, 1)
    hist = np.zeros(overlap)
    enc_c = CeltEncSymbolBatch(1, 48000, N, nbytes, complexity=5,
                               nthreads=1)
    sig = _sig(kind, 48000, rs)
    for f in range(len(sig) // N):
        pcm = sig[f * N:(f + 1) * N]
        inp = np.zeros((1, N + overlap))
        celt_preemphasis(pcm, inp[0, overlap:], N, 1, 1, mode.preemph,
                         dsp.preemph_memE[0], False)
        inp[0, :overlap] = hist
        hist = inp[0, N:N + overlap].copy()
        freq_l = np.zeros(N)
        freq_s = np.zeros(N)
        dsp._compute_mdcts(0, inp, freq_l, 1, 1, lm)
        if lm > 0:
            dsp._compute_mdcts(M, inp, freq_s, 1, 1, lm)
        else:
            freq_s = freq_l.copy()
        be_l = np.zeros(nbE)
        be_s = np.zeros(nbE)
        ble_l = np.zeros(nbE)
        ble_s = np.zeros(nbE)
        compute_band_energies(mode, freq_l, be_l, nbE, 1, lm)
        compute_band_energies(mode, freq_s, be_s, nbE, 1, lm)
        amp2log2(mode, nbE, nbE, be_l, ble_l, 1)
        amp2log2(mode, nbE, nbE, be_s, ble_s, 1)
        x_l = np.zeros(N)
        x_s = np.zeros(N)
        normalise_bands(mode, freq_l, x_l, be_l, nbE, 1, M)
        normalise_bands(mode, freq_s, x_s, be_s, nbE, 1, M)
        pays, rngs, rets = enc_c.encode(pcm[None], x_l[None], x_s[None],
                                        ble_l[None], ble_s[None])
        ret = enc_py.encode_with_ec(pcm, N, nbytes)
        pkt_py = bytes(enc_py._own_enc.buf[:nbytes])
        assert ret == nbytes and rets[0] == nbytes
        assert pays[0] == pkt_py, f"frame {f}: payload differs"
        assert rngs[0] == enc_py.rng, f"frame {f}: final range differs"

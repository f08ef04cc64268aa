"""Mode-table tests: our generated CELT mode must match the reference's
checked-in static tables (celt/static_modes_float.h), which were produced by
the same offline generator we re-implement (celt/dump_modes/)."""

import re

import numpy as np
import pytest

from opus_tpu.celt import modes, cwrs

_HDR = "/root/reference/celt/static_modes_float.h"


def _parse_array(name):
    """Extract the FIRST array with this name from the static modes header."""
    text = open(_HDR).read()
    m = re.search(rf"static const [\w ]+ {name}\[\d+\] = \{{(.*?)\}};",
                  text, re.S)
    assert m, name
    vals = re.findall(r"-?\d+\.?\d*(?:e[+-]?\d+)?f?", m.group(1))
    return [float(v.rstrip('f')) for v in vals]


@pytest.fixture(scope="module")
def mode48k():
    return modes.mode_create(48000, 960)


def test_mode_scalars(mode48k):
    m = mode48k
    assert m.Fs == 48000
    assert m.overlap == 120
    assert m.nbEBands == 21
    assert m.effEBands == 21
    assert m.maxLM == 3
    assert m.nbShortMdcts == 8
    assert m.shortMdctSize == 120
    assert m.eBands == modes.EBAND5MS


def test_logN_matches_reference(mode48k):
    ref = [int(v) for v in _parse_array("logN400")]
    assert list(mode48k.logN) == ref


def test_window_matches_reference(mode48k):
    ref = np.array(_parse_array("window120"), dtype=np.float32)
    np.testing.assert_allclose(mode48k.window, ref, rtol=0, atol=2e-7)


def test_pulse_cache_matches_reference(mode48k):
    c = mode48k.cache
    assert c.size == 392
    ref_index = [int(v) for v in _parse_array("cache_index50")]
    ref_bits = [int(v) for v in _parse_array("cache_bits50")]
    ref_caps = [int(v) for v in _parse_array("cache_caps50")]
    assert list(c.index) == ref_index
    assert list(c.bits) == ref_bits
    assert list(c.caps) == ref_caps


def test_custom_mode_sanity():
    # A 44.1 kHz custom mode must build and satisfy the band invariants
    m = modes.mode_create(44100, 960)
    eb = m.eBands
    for i in range(1, m.nbEBands):
        assert eb[i] - eb[i - 1] <= eb[m.nbEBands] - eb[m.nbEBands - 1]
        assert eb[i + 1] - eb[i] <= 2 * (eb[i] - eb[i - 1])


def test_cwrs_bijection():
    # exhaustive V(N,K) bijection for the sizes PVQ uses (test_unit_cwrs32)
    for n in (2, 3, 4, 6, 8, 11, 16, 22):
        for k in (1, 2, 3, 5, 8):
            v = cwrs.pvq_v(n, k)
            if v > 4000:
                idxs = range(0, v, max(1, v // 997))
            else:
                idxs = range(v)
            for i in idxs:
                y = cwrsi_check(n, k, i)
                assert sum(abs(p) for p in y) == k
                assert cwrs.icwrs(y) == i


def cwrsi_check(n, k, i):
    y = cwrs.cwrsi(n, k, i)
    assert len(y) == n
    return y


def test_get_pulses_and_bits_roundtrip():
    m = modes.mode_create(48000, 960)
    for band in range(m.nbEBands):
        for lm in range(4):
            n = (m.eBands[band + 1] - m.eBands[band]) << lm
            if n == 1:
                continue
            off = int(m.cache.index[(lm + 1) * m.nbEBands + band])
            maxk = int(m.cache.bits[off])
            for pulses_idx in range(1, maxk + 1):
                bits = modes.pulses2bits(m, band, lm, pulses_idx)
                back = modes.bits2pulses(m, band, lm, bits)
                # the bit table can plateau (V(N,K) log saturating), in which
                # case the inverse picks the cheapest index with equal cost
                assert modes.pulses2bits(m, band, lm, back) == bits, \
                    (band, lm, pulses_idx, back)

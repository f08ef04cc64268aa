"""opus_compare port: must match the reference tool's internal weighted error."""

import os
import re
import subprocess

import numpy as np
import pytest

from opus_tpu.utils.compare import compare

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CMP = os.path.join(_REPO, ".ref_build", "opus_compare")


def _ref_compare(args):
    r = subprocess.run([_CMP] + args, capture_output=True, text=True)
    m = re.search(r"error is ([0-9.]+)", r.stderr)
    assert m, r.stderr
    return float(m.group(1))


@pytest.mark.parametrize("channels,rate", [(1, 48000), (1, 16000),
                                           (2, 48000), (1, 8000)])
def test_compare_matches_reference(tmp_path, channels, rate):
    if not os.path.exists(_CMP):
        subprocess.run([os.path.join(_REPO, "tools", "build_oracle.sh")],
                       check=True)
    rs = np.random.RandomState(channels * 7 + rate % 97)
    n = 48000
    ref_st = (3000 * rs.randn(n, 2)).clip(-32000, 32000).astype(np.int16)
    ds = 48000 // rate
    if channels == 1:
        base = 0.5 * (ref_st[:, 0] + ref_st[:, 1])
        test = (base[::ds] + 200 * rs.randn(n // ds)).clip(
            -32768, 32767).astype(np.int16)
    else:
        test = (ref_st + 150 * rs.randn(n, 2)).clip(-32768, 32767).astype(np.int16)
    refp = tmp_path / "ref.sw"
    tstp = tmp_path / "tst.sw"
    ref_st.tofile(refp)
    test.tofile(tstp)
    args = []
    if channels == 2:
        args.append("-s")
    if rate != 48000:
        args += ["-r", str(rate)]
    ref_err = _ref_compare(args + [str(refp), str(tstp)])
    err, q = compare(ref_st.reshape(-1), test.reshape(-1), channels, rate)
    assert abs(err - ref_err) < 2e-5 * max(1.0, ref_err), (err, ref_err)

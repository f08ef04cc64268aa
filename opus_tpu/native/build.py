"""Build-at-first-use helper for the native entropy kernel.

Compiles opus_tpu/native/entropy.c into a shared library under
.native_build/ (gitignored) using the system C compiler.  Returns None
when no compiler is available so callers fall back to pure Python."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_CACHE = {}


def load_entropy():
    if "entropy" in _CACHE:
        return _CACHE["entropy"]
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    src = os.path.join(here, "entropy.c")
    out_dir = os.path.join(repo, ".native_build")
    so = os.path.join(out_dir, "libentropy_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(out_dir, exist_ok=True)
            cc = sysconfig.get_config_var("CC") or "cc"
            subprocess.run(cc.split() + ["-O2", "-fPIC", "-shared", src,
                                         "-o", so],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError):
        _CACHE["entropy"] = None
        return None
    lib.ecd_decode.restype = ctypes.c_uint32
    lib.ecd_decode_bin.restype = ctypes.c_uint32
    lib.ecd_dec_bit_logp.restype = ctypes.c_int32
    lib.ecd_dec_icdf.restype = ctypes.c_int32
    lib.ecd_dec_bits.restype = ctypes.c_uint32
    lib.ecd_dec_uint.restype = ctypes.c_uint32
    _CACHE["entropy"] = lib
    return lib

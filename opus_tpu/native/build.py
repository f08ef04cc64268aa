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


def load_silk_sym():
    """Build/load the native SILK symbol-pass library (entropy.c +
    silk_dec.c).  Returns None when no compiler is available."""
    if "silk_sym" in _CACHE:
        return _CACHE["silk_sym"]
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    srcs = [os.path.join(here, "entropy.c"), os.path.join(here, "silk_dec.c")]
    hdrs = [os.path.join(here, "entropy.h"),
            os.path.join(here, "silk_tables.h")]
    out_dir = os.path.join(repo, ".native_build")
    so = os.path.join(out_dir, "libsilksym.so")
    try:
        newest = max(os.path.getmtime(p) for p in srcs + hdrs)
        if not os.path.exists(so) or os.path.getmtime(so) < newest:
            os.makedirs(out_dir, exist_ok=True)
            cc = sysconfig.get_config_var("CC") or "cc"
            base = cc.split() + ["-O3", "-fPIC", "-shared", "-I", here] \
                + srcs + ["-o", so, "-lm", "-lpthread"]
            try:
                subprocess.run(base + ["-march=native"], check=True,
                               capture_output=True)
            except subprocess.SubprocessError:
                subprocess.run(base, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError):
        _CACHE["silk_sym"] = None
        return None
    lib.silk_sym_state_size.restype = ctypes.c_int32
    lib.silk_sym_out_size.restype = ctypes.c_int32
    lib.silk_decode_symbols.restype = ctypes.c_int32
    _CACHE["silk_sym"] = lib
    return lib


def load_celt_sym():
    """Build/load the native CELT symbol-pass library (entropy.c +
    celt_dec.c).  Returns None when no compiler is available."""
    if "celt_sym" in _CACHE:
        return _CACHE["celt_sym"]
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    # celt_enc.c #includes celt_dec.c: one TU provides both directions
    srcs = [os.path.join(here, "entropy.c"), os.path.join(here, "celt_enc.c")]
    deps = [os.path.join(here, "entropy.h"),
            os.path.join(here, "celt_dec.c")]
    out_dir = os.path.join(repo, ".native_build")
    so = os.path.join(out_dir, "libceltsym.so")
    try:
        newest = max(os.path.getmtime(p) for p in srcs + deps)
        if not os.path.exists(so) or os.path.getmtime(so) < newest:
            os.makedirs(out_dir, exist_ok=True)
            cc = sysconfig.get_config_var("CC") or "cc"
            base = cc.split() + ["-O3", "-fPIC", "-shared", "-I", here] \
                + srcs + ["-o", so, "-lm", "-lpthread"]
            # built at first use on the running host, so -march=native is
            # safe; fall back for compilers that lack it
            try:
                subprocess.run(base + ["-march=native"], check=True,
                               capture_output=True)
            except subprocess.SubprocessError:
                subprocess.run(base, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError):
        _CACHE["celt_sym"] = None
        return None
    lib.celt_mode_new.restype = ctypes.c_void_p
    lib.celt_sym_state_size.restype = ctypes.c_int32
    lib.celt_sym_out_size.restype = ctypes.c_int32
    lib.celt_work_size.restype = ctypes.c_int32
    lib.celt_decode_symbols.restype = ctypes.c_int32
    lib.celt_enc_state_size.restype = ctypes.c_int32
    lib.celt_encode_symbols.restype = ctypes.c_int32
    _CACHE["celt_sym"] = lib
    return lib

"""ctypes binding for the native range decoder (opus_tpu/native/entropy.c).

NativeRangeDecoder is a drop-in for bitstream.range_coder.RangeDecoder:
it exposes the same mutable fields (rng, val, nbits_total, storage, ...)
as ctypes Structure members so existing code (ec_tell, the silence path's
nbits_total adjustment) works unchanged.  Falls back is handled by the
caller: use `make_range_decoder` from range_coder."""

from __future__ import annotations

import ctypes

from ..native.build import load_entropy

_LIB = load_entropy()


class NativeRangeDecoder(ctypes.Structure):
    # field order must match struct ecdec in native/entropy.c
    _fields_ = [
        ("buf", ctypes.c_void_p),
        ("storage", ctypes.c_int32),
        ("end_offs", ctypes.c_int32),
        ("end_window", ctypes.c_uint32),
        ("nend_bits", ctypes.c_int32),
        ("nbits_total", ctypes.c_int32),
        ("offs", ctypes.c_int32),
        ("rng", ctypes.c_uint32),
        ("val", ctypes.c_uint32),
        ("ext", ctypes.c_uint32),
        ("rem", ctypes.c_int32),
        ("error", ctypes.c_int32),
    ]

    def __init__(self, data, storage=None):
        super().__init__()
        self._data = bytes(data)   # keep alive; C reads from it
        n = len(self._data) if storage is None else storage
        _LIB.ecd_init(ctypes.byref(self), self._data, n)

    # -- symbol decoding ---------------------------------------------------
    def decode(self, ft: int) -> int:
        return _LIB.ecd_decode(ctypes.byref(self), ft)

    def decode_bin(self, bits: int) -> int:
        return _LIB.ecd_decode_bin(ctypes.byref(self), bits)

    def update(self, fl: int, fh: int, ft: int) -> None:
        _LIB.ecd_update(ctypes.byref(self), fl, fh, ft)

    def dec_bit_logp(self, logp: int) -> int:
        return _LIB.ecd_dec_bit_logp(ctypes.byref(self), logp)

    def dec_icdf(self, icdf, ftb: int) -> int:
        b = icdf if isinstance(icdf, bytes) else bytes(icdf)
        return _LIB.ecd_dec_icdf(ctypes.byref(self), b, ftb)

    dec_icdf16 = dec_icdf

    def dec_uint(self, ft: int) -> int:
        assert ft > 1
        return _LIB.ecd_dec_uint(ctypes.byref(self), ft)

    def dec_bits(self, bits: int) -> int:
        return _LIB.ecd_dec_bits(ctypes.byref(self), bits)

    # -- introspection -----------------------------------------------------
    def tell(self) -> int:
        from .range_coder import ec_tell
        return ec_tell(self)

    def tell_frac(self) -> int:
        from .range_coder import ec_tell_frac
        return ec_tell_frac(self)

"""ctypes bindings to reference implementation pieces built as test oracles.

The reference tree (read-only, /root/reference) is compiled out-of-tree into
.ref_build/ by tools/build_oracle.sh; these bindings are used ONLY in tests to
differential-check our from-scratch implementation.  Nothing here ships.
"""

import ctypes
import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BUILD = os.path.join(_REPO, ".ref_build")


def _ensure_entropy_oracle():
    path = os.path.join(_BUILD, "libentropy_oracle.so")
    if not os.path.exists(path):
        subprocess.run([os.path.join(_REPO, "tools", "build_oracle.sh")], check=True)
    return path


class EcCtx(ctypes.Structure):
    _fields_ = [
        ("buf", ctypes.c_void_p),
        ("storage", ctypes.c_uint32),
        ("end_offs", ctypes.c_uint32),
        ("end_window", ctypes.c_uint32),
        ("nend_bits", ctypes.c_int),
        ("nbits_total", ctypes.c_int),
        ("offs", ctypes.c_uint32),
        ("rng", ctypes.c_uint32),
        ("val", ctypes.c_uint32),
        ("ext", ctypes.c_uint32),
        ("rem", ctypes.c_int),
        ("error", ctypes.c_int),
    ]


def load_entropy_oracle():
    lib = ctypes.CDLL(_ensure_entropy_oracle())
    u32, i32, u16, uc = (ctypes.c_uint32, ctypes.c_int, ctypes.c_uint16,
                         ctypes.c_ubyte)
    P = ctypes.POINTER
    lib.ec_enc_init.argtypes = [P(EcCtx), ctypes.c_char_p, u32]
    lib.ec_encode.argtypes = [P(EcCtx), ctypes.c_uint, ctypes.c_uint, ctypes.c_uint]
    lib.ec_encode_bin.argtypes = [P(EcCtx), ctypes.c_uint, ctypes.c_uint, ctypes.c_uint]
    lib.ec_enc_bit_logp.argtypes = [P(EcCtx), i32, ctypes.c_uint]
    lib.ec_enc_icdf.argtypes = [P(EcCtx), i32, ctypes.c_char_p, ctypes.c_uint]
    lib.ec_enc_icdf16.argtypes = [P(EcCtx), i32, P(u16), ctypes.c_uint]
    lib.ec_enc_uint.argtypes = [P(EcCtx), u32, u32]
    lib.ec_enc_bits.argtypes = [P(EcCtx), u32, ctypes.c_uint]
    lib.ec_enc_patch_initial_bits.argtypes = [P(EcCtx), ctypes.c_uint, ctypes.c_uint]
    lib.ec_enc_shrink.argtypes = [P(EcCtx), u32]
    lib.ec_enc_done.argtypes = [P(EcCtx)]
    lib.ec_dec_init.argtypes = [P(EcCtx), ctypes.c_char_p, u32]
    lib.ec_decode.argtypes = [P(EcCtx), ctypes.c_uint]
    lib.ec_decode.restype = ctypes.c_uint
    lib.ec_decode_bin.argtypes = [P(EcCtx), ctypes.c_uint]
    lib.ec_decode_bin.restype = ctypes.c_uint
    lib.ec_dec_update.argtypes = [P(EcCtx), ctypes.c_uint, ctypes.c_uint, ctypes.c_uint]
    lib.ec_dec_bit_logp.argtypes = [P(EcCtx), ctypes.c_uint]
    lib.ec_dec_bit_logp.restype = i32
    lib.ec_dec_icdf.argtypes = [P(EcCtx), ctypes.c_char_p, ctypes.c_uint]
    lib.ec_dec_icdf.restype = i32
    lib.ec_dec_icdf16.argtypes = [P(EcCtx), P(u16), ctypes.c_uint]
    lib.ec_dec_icdf16.restype = i32
    lib.ec_dec_uint.argtypes = [P(EcCtx), u32]
    lib.ec_dec_uint.restype = u32
    lib.ec_dec_bits.argtypes = [P(EcCtx), ctypes.c_uint]
    lib.ec_dec_bits.restype = u32
    lib.ec_tell_frac.argtypes = [P(EcCtx)]
    lib.ec_tell_frac.restype = u32
    lib.ec_laplace_encode.argtypes = [P(EcCtx), P(i32), ctypes.c_uint, i32]
    lib.ec_laplace_decode.argtypes = [P(EcCtx), ctypes.c_uint, i32]
    lib.ec_laplace_decode.restype = i32
    lib.ec_laplace_encode_p0.argtypes = [P(EcCtx), i32, u16, u16]
    lib.ec_laplace_decode_p0.argtypes = [P(EcCtx), u16, u16]
    lib.ec_laplace_decode_p0.restype = i32
    return lib


class OracleEncoder:
    """Reference ec_enc wrapped for differential tests."""

    def __init__(self, size):
        self.lib = load_entropy_oracle()
        self.size = size
        self.cbuf = ctypes.create_string_buffer(size)
        self.ctx = EcCtx()
        self.lib.ec_enc_init(ctypes.byref(self.ctx), self.cbuf, size)

    def tell(self):
        from opus_tpu.bitstream.range_coder import ilog
        return self.ctx.nbits_total - ilog(self.ctx.rng)

    def tell_frac(self):
        return self.lib.ec_tell_frac(ctypes.byref(self.ctx))

    def data(self):
        return self.cbuf.raw[:self.ctx.storage]


class OracleDecoder:
    def __init__(self, data):
        self.lib = load_entropy_oracle()
        self.cbuf = ctypes.create_string_buffer(bytes(data), len(data))
        self.ctx = EcCtx()
        self.lib.ec_dec_init(ctypes.byref(self.ctx), self.cbuf, len(data))

    def tell(self):
        from opus_tpu.bitstream.range_coder import ilog
        return self.ctx.nbits_total - ilog(self.ctx.rng)

    def tell_frac(self):
        return self.lib.ec_tell_frac(ctypes.byref(self.ctx))

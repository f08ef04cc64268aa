"""Native range-decoder kernel vs the pure-Python oracle
(opus_tpu/native/entropy.c vs bitstream/range_coder.py).

The native kernel must be STATE-identical after every operation; the
Python implementation (itself bit-exact vs the reference entropy coder)
is the oracle.  Skips when no C toolchain is available."""

import random

import pytest

from opus_tpu.bitstream.range_coder import (RangeDecoder, ec_tell,
                                            ec_tell_frac)


def _native():
    from opus_tpu.bitstream.native_rc import NativeRangeDecoder, _LIB
    if _LIB is None:
        pytest.skip("no C toolchain for the native kernel")
    return NativeRangeDecoder


def test_native_rc_state_exact_fuzz():
    NativeRangeDecoder = _native()
    random.seed(1234)
    for _ in range(200):
        data = bytes(random.randrange(256)
                     for _ in range(random.randrange(1, 80)))
        a = RangeDecoder(data)
        b = NativeRangeDecoder(data)
        for _ in range(random.randrange(1, 50)):
            op = random.randrange(6)
            if op == 0:
                ft = random.randrange(2, 400)
                ra, rb = a.decode(ft), b.decode(ft)
                assert ra == rb
                fl = random.randrange(0, ra + 1)
                fh = random.randrange(ra + 1, ft + 1)
                a.update(fl, fh, ft)
                b.update(fl, fh, ft)
            elif op == 1:
                lp = random.randrange(1, 15)
                assert a.dec_bit_logp(lp) == b.dec_bit_logp(lp)
            elif op == 2:
                icdf = (120, 60, 20, 5, 0)
                assert a.dec_icdf(icdf, 7) == b.dec_icdf(icdf, 7)
            elif op == 3:
                ft = random.randrange(2, 1 << 24)
                assert a.dec_uint(ft) == b.dec_uint(ft)
            elif op == 4:
                nb = random.randrange(1, 25)
                assert a.dec_bits(nb) == b.dec_bits(nb)
            else:
                assert ec_tell(a) == ec_tell(b)
                assert ec_tell_frac(a) == ec_tell_frac(b)
            assert (a.rng, a.val, a.nbits_total, a.offs, a.end_offs,
                    a.error) == (b.rng, b.val, b.nbits_total, b.offs,
                                 b.end_offs, b.error)


def test_native_rc_decodes_real_packet():
    NativeRangeDecoder = _native()
    import numpy as np
    from opus_tpu.models.opus_custom import (OpusCustomMode,
                                             OpusCustomEncoder)
    from opus_tpu.celt.decoder import CeltDecoder
    mode = OpusCustomMode(48000, 960)
    enc = OpusCustomEncoder(mode, 1)
    enc.set_bitrate(64000)
    t = np.arange(960 * 3) / 48000.0
    sig = 0.3 * np.sin(2 * np.pi * 440 * t)
    pkts = [enc.encode(sig[i * 960:(i + 1) * 960], 960) for i in range(3)]
    outs = []
    for use_native in (False, True):
        dec = CeltDecoder(mode=mode.mode, channels=1, stream_channels=1)
        dec.signalling = 0
        dec.end = mode.mode.effEBands
        dec.reset()
        got = []
        for p in pkts:
            from opus_tpu.models.opus_custom import _from_opus
            d0 = _from_opus(p[0])
            dec.end = max(1, mode.mode.effEBands - 2 * (d0 >> 5))
            pcm = np.zeros(960)
            rc = NativeRangeDecoder(p[1:]) if use_native \
                else RangeDecoder(p[1:])
            dec.decode_with_ec(p[1:], pcm, 960, rc)
            got.append(pcm.copy())
        outs.append(np.concatenate(got))
    assert np.array_equal(outs[0], outs[1])

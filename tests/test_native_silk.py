"""Native C SILK symbol pass (opus_tpu/native/silk_dec.c) parity vs the
scalar Python decoder: side info, coefficients, excitation, final state."""

import numpy as np
import pytest

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.bitstream import packet as pkt
from opus_tpu.bitstream.range_coder import RangeDecoder
from opus_tpu.silk.api import SilkDecoder
from opus_tpu.silk import decoder as sdec
from opus_tpu.native import silk_symbols
from opus_tpu.native.silk_symbols import SilkSymbolBatch

pytestmark = pytest.mark.skipif(not silk_symbols.available(),
                                reason="no C compiler")


@pytest.mark.parametrize("fs_khz,bitrate", [(16, 24000), (8, 12000)])
def test_silk_symbol_pass_parity(fs_khz, bitrate):
    fs = fs_khz * 1000
    rng = np.random.default_rng(11)
    t = np.arange(fs * 3 // 2) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    sig *= (0.3 + 0.7 * (np.sin(2 * np.pi * 1.5 * t) > 0))
    sig += 0.02 * rng.standard_normal(len(t))
    sig = np.clip(sig, -1, 1)

    enc = OpusEncoder(fs, 1, application="voip")
    enc.set_bitrate(bitrate)
    payloads = []
    n = fs // 50
    for i in range(len(sig) // n):
        p = enc.encode(sig[i * n:(i + 1) * n], n)
        payloads.append(pkt.packet_parse(p).frames[0])

    caps = []
    orig = sdec.ChannelState.decode_core

    def capture(self, ctrl, xq, pulses):
        orig(self, ctrl, xq, pulses)
        caps.append(dict(
            gains=list(ctrl.Gains_Q16), a0=list(ctrl.PredCoef_Q12[0]),
            a1=list(ctrl.PredCoef_Q12[1]), b=list(ctrl.LTPCoef_Q14),
            pitch=list(ctrl.pitchL), lscale=ctrl.LTP_scale_Q14,
            st=self.indices.signalType,
            exc=list(self.exc_Q14[:self.frame_length])))

    sdec.ChannelState.decode_core = capture
    try:
        sd = SilkDecoder()
        for p in payloads:
            sd.decode(RangeDecoder(p), n_channels_api=1,
                      n_channels_internal=1, api_sample_rate=fs,
                      internal_sample_rate=fs, payload_size_ms=20,
                      lost_flag=0, new_packet_flag=True)
    finally:
        sdec.ChannelState.decode_core = orig

    sb = SilkSymbolBatch(1, fs_khz=fs_khz, nthreads=1)
    order = 16 if fs_khz == 16 else 10
    for i, p in enumerate(payloads):
        exc, outs, rets = sb.decode([p])
        o, c = outs[0], caps[i]
        assert rets[0] == 0
        assert list(o.gains_q16) == c["gains"], f"frame {i} gains"
        assert list(o.a_q12[0])[:order] == c["a0"], f"frame {i} a0"
        assert list(o.a_q12[1])[:order] == c["a1"], f"frame {i} a1"
        assert [o.b_q14[k][j] for k in range(4) for j in range(5)] \
            == c["b"], f"frame {i} b"
        if o.signal_type == 2:
            assert list(o.pitchL) == c["pitch"], f"frame {i} pitch"
        assert o.ltp_scale_q14 == c["lscale"], f"frame {i} ltp_scale"
        assert o.signal_type == c["st"], f"frame {i} signal type"
        assert exc[0, 0].tolist() == c["exc"], f"frame {i} exc"

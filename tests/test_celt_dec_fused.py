"""Kernel-form fused CELT decode (opus_tpu/models/celt_dec_fused.py):
symbol-exact vs the scalar CELT decoder on real CELT-only packets —
the full pass below packet parse: plan (header/energy/tf/dynalloc/
allocation), the PVQ band recursion with folding and noise fill,
anti-collapse, energy finalise, and the final range-coder state (the
final_range oracle, reference include/opus_defines.h:157).

Each frame is decoded with the scalar decoder's captured pre-frame
state, so all frames batch into one jitted call of
fused_celt_decode_frame.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.models.opus_decoder import OpusDecoder
from opus_tpu.bitstream import packet as pkt
import opus_tpu.celt.bands as B
import opus_tpu.celt.decoder as cdec
from opus_tpu.ops import rc_kernel as K
from opus_tpu.models.celt_dec_fused import (DecTabs,
                                            fused_celt_decode_frame)


def _encode_frames(frame_size=960, nframes=24, bitrate=64000, seed=3):
    fs = 48000
    rng = np.random.default_rng(seed)
    t = np.arange(frame_size * nframes) / fs
    sig = 0.3 * np.sin(2 * np.pi * 400 * t) \
        * (1 + 0.3 * np.sin(2 * np.pi * 3 * t)) \
        + 0.1 * np.sin(2 * np.pi * 1870 * t)
    for _ in range(6):
        p0 = int(rng.integers(0, len(t) - 500))
        sig[p0:p0 + 400] += 0.5 * rng.standard_normal(400) \
            * np.hanning(400)
    sig = np.clip(sig, -1, 1)
    enc = OpusEncoder(fs, 1, application="restricted-lowdelay")
    enc.set_bitrate(bitrate)
    frames = []
    for i in range(nframes):
        p = enc.encode(sig[i * frame_size:(i + 1) * frame_size],
                       frame_size)
        assert pkt.packet_get_mode(p) == pkt.Mode.CELT_ONLY
        frames.append(pkt.packet_parse(p).frames[0])
    return frames


def _scalar_decode(frames, frame_size=960):
    """Scalar decode capturing per-frame pre-state and post symbols."""
    import math
    toc = (28 + int(math.log2(frame_size // 120))) << 3  # CELT FB
    taps = []
    orig_qab = B.quant_all_bands
    orig_syn = cdec.CeltDecoder._synthesis
    cur = {}

    def qab_spy(encode, mode, start, end, x_, y_, collapse_masks, *args,
                **kw):
        r = orig_qab(encode, mode, start, end, x_, y_, collapse_masks,
                     *args, **kw)
        cur["collapse"] = np.array(collapse_masks)
        return r

    def syn_spy(self, X, oldBandE, *args, **kw):
        cur["X"] = np.array(X)
        cur["energies"] = np.array(oldBandE[:self.mode.nbEBands])
        return orig_syn(self, X, oldBandE, *args, **kw)

    B.quant_all_bands = qab_spy
    cdec.CeltDecoder._synthesis = syn_spy
    try:
        dec = OpusDecoder(48000, 1)
        nb = dec.celt.mode.nbEBands
        for f in frames:
            cur.clear()
            c = dec.celt
            pre_e = np.maximum(c.oldEBands[:nb], c.oldEBands[nb:2 * nb])
            prev1 = np.maximum(c.oldLogE[:nb], c.oldLogE[nb:2 * nb])
            prev2 = np.maximum(c.oldLogE2[:nb], c.oldLogE2[nb:2 * nb])
            seed = c.rng
            dec.decode(bytes([toc]) + f)    # CELT-only FB TOC
            taps.append(dict(cur, pre_e=pre_e, prev1=prev1, prev2=prev2,
                             seed=seed, final_range=c.rng))
    finally:
        B.quant_all_bands = orig_qab
        cdec.CeltDecoder._synthesis = orig_syn
    return taps


_FULL = pytest.mark.skipif(
    not os.environ.get("OPUS_TPU_RUN_FUSED_CELT_FULL"),
    reason="larger fused-graph compiles are slow on XLA CPU; "
           "set OPUS_TPU_RUN_FUSED_CELT_FULL=1 (or run on TPU)")


@pytest.mark.parametrize("frame_size", [
    120,
    pytest.param(240, marks=_FULL),
    pytest.param(960, marks=_FULL),
])
def test_fused_celt_decode_symbol_exact(frame_size):
    frames = _encode_frames(frame_size,
                            bitrate=64000 if frame_size >= 960 else
                            128000)
    taps = _scalar_decode(frames, frame_size)
    tabs = DecTabs(48000, frame_size)
    nb = tabs.nb
    bsz = len(frames)
    smax = max(len(f) for f in frames)
    bufb = np.zeros((bsz, smax), np.uint8)
    lens = np.zeros(bsz, np.int32)
    for i, f in enumerate(frames):
        a = np.frombuffer(f, np.uint8)
        bufb[i, :len(a)] = a
        lens[i] = len(a)
    buf = jnp.asarray(K.pack_words(bufb.astype(np.uint32), smax))
    lens = jnp.asarray(lens)
    old_e = [jnp.asarray(np.array([t["pre_e"][i] for t in taps]),
                         jnp.float32) for i in range(nb)]
    prev1 = [jnp.asarray(np.array([t["prev1"][i] for t in taps]),
                         jnp.float32) for i in range(nb)]
    prev2 = [jnp.asarray(np.array([t["prev2"][i] for t in taps]),
                         jnp.float32) for i in range(nb)]
    seed = jnp.asarray(np.array([t["seed"] for t in taps], np.uint32))
    active = jnp.ones(bsz, bool)

    fn = jax.jit(lambda b, l, oe, p1, p2, s: fused_celt_decode_frame(
        b, l, oe, p1, p2, s, None, tabs, jnp.ones(l.shape, bool)))
    out, state = fn(buf, lens, old_e, prev1, prev2, seed)

    err = np.asarray(state["d"]["error"])
    X = np.asarray(out["X"])   # [B, N]
    energies = np.stack([np.asarray(e) for e in out["energies"]], axis=1)
    collapse = np.stack([np.asarray(c) for c in out["collapse"]], axis=1)
    final_rng = np.asarray(state["d"]["rng"])

    for i, t in enumerate(taps):
        assert err[i] == 0, f"frame {i}: error lane set"
        assert final_rng[i] == t["final_range"], \
            f"frame {i}: final range {final_rng[i]:#x} != " \
            f"{t['final_range']:#x}"
        got_c = collapse[i].astype(np.int64)
        assert list(got_c) == list(t["collapse"]), \
            f"frame {i}: collapse masks"
        # the fused X covers the coded range M*eBands[nb]; the scalar
        # buffer is frame-sized with an uncoded zero tail
        ref_x = t["X"][:X.shape[1]]
        assert np.allclose(X[i], ref_x, atol=2e-3), \
            f"frame {i}: band shapes, max err " \
            f"{np.abs(X[i] - ref_x).max()}"
        assert np.all(t["X"][X.shape[1]:] == 0.0)
        assert np.allclose(energies[i], t["energies"], atol=1e-4), \
            f"frame {i}: energies"

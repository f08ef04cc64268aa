"""Fused CELT planning pass (opus_tpu/models/celt_dec_fused.fused_plan):
symbol-exact vs the scalar CELT decoder on real CELT-only packets —
silence/postfilter/transient/intra flags, coarse + fine band energies,
tf resolution, dynalloc offsets, trim, and the full bit allocation
(pulses / fine bits / priorities / coded_bands / balance).

Runs eagerly under tests/np_shim (no XLA compile), so it is always-on
in CI; the compiled path is covered by test_celt_dec_fused.py."""

import numpy as np

from opus_tpu.models.opus_encoder import OpusEncoder
from opus_tpu.bitstream import packet as pkt
import opus_tpu.celt.decoder as cdec
import opus_tpu.celt.alloc as A
from tests import np_shim


def _encode_frames(nframes=30, bitrate=64000, seed=3):
    fs = 48000
    rng = np.random.default_rng(seed)
    t = np.arange(960 * nframes) / fs
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
        p = enc.encode(sig[i * 960:(i + 1) * 960], 960)
        assert pkt.packet_get_mode(p) == pkt.Mode.CELT_ONLY
        frames.append(pkt.packet_parse(p).frames[0])
    return frames


def _scalar_plan(frames):
    """Scalar decode with taps capturing the planning symbols."""
    from opus_tpu.models.opus_decoder import OpusDecoder

    taps = []
    orig_alloc = A.compute_allocation
    orig_tf = cdec.tf_decode
    orig_fine = cdec.unquant_fine_energy
    cur = {}

    def alloc_spy(mode, start, end, offsets, cap, trim, *args, **kw):
        out = orig_alloc(mode, start, end, offsets, cap, trim, *args,
                         **kw)
        cur["offsets"] = list(offsets)
        cur["trim"] = trim
        (cur["coded_bands"], cur["balance"], cur["pulses"],
         cur["fine_quant"], cur["fine_priority"], _i, _ds) = out
        return out

    def tf_spy(start, end, is_transient, tf_res, lm, dec):
        r = orig_tf(start, end, is_transient, tf_res, lm, dec)
        cur["tf_res"] = list(tf_res)
        cur["is_transient"] = is_transient
        return r

    def fine_spy(mode, start, end, oldBandE, *args):
        r = orig_fine(mode, start, end, oldBandE, *args)
        cur["energies"] = np.array(oldBandE[:mode.nbEBands])
        return r

    A.compute_allocation = alloc_spy
    cdec.tf_decode = tf_spy
    cdec.unquant_fine_energy = fine_spy
    try:
        dec = OpusDecoder(48000, 1)
        for f in frames:
            cur.clear()
            nb = dec.celt.mode.nbEBands
            pre = np.array([max(dec.celt.oldEBands[i],
                                dec.celt.oldEBands[nb + i])
                            for i in range(nb)])
            dec.decode(bytes([0xF8]) + f)   # CELT-only FB 20 ms TOC
            c = dec.celt
            taps.append(dict(cur, pre_e=pre,
                             pf_pitch=c.postfilter_period,
                             pf_gain=c.postfilter_gain,
                             pf_tapset=c.postfilter_tapset))
    finally:
        A.compute_allocation = orig_alloc
        cdec.tf_decode = orig_tf
        cdec.unquant_fine_energy = orig_fine
    return taps


def test_fused_celt_plan_symbol_exact():
    frames = _encode_frames()
    taps = _scalar_plan(frames)

    saved = np_shim.install()
    try:
        from opus_tpu.models.celt_dec_fused import DecTabs, fused_plan
        from opus_tpu.ops import rc_kernel as K

        tabs = DecTabs(48000, 960)
        nb = tabs.nb
        bsz = len(frames)
        smax = (max(len(f) for f in frames) + 3) // 4 * 4
        bufb = np.zeros((bsz, smax), np.uint8)
        lens = np.zeros(bsz, np.int32)
        for i, f in enumerate(frames):
            a = np.frombuffer(f, np.uint8)
            bufb[i, :len(a)] = a
            lens[i] = len(a)
        buf = K.pack_words(bufb.astype(np.uint32), smax)
        old_e = [np.array([t["pre_e"][i] for t in taps], np.float32)
                 for i in range(nb)]
        d = K.rk_init(buf, lens)
        plan, d = fused_plan(d, buf, lens, tabs, old_e,
                             np.ones(bsz, bool))
    finally:
        np_shim.uninstall(saved)

    err = np.asarray(d["error"])
    for i, t in enumerate(taps):
        assert err[i] == 0, f"frame {i}: error lane"
        assert int(plan["is_transient"][i]) == t["is_transient"], \
            f"frame {i}: transient"
        assert int(plan["pf_pitch"][i]) == t["pf_pitch"], \
            f"frame {i}: postfilter pitch"
        assert abs(float(plan["pf_gain"][i]) - t["pf_gain"]) < 1e-6, \
            f"frame {i}: postfilter gain"
        assert int(plan["pf_tapset"][i]) == t["pf_tapset"], \
            f"frame {i}: tapset"
        assert [int(r[i]) for r in plan["tf_res"]] == t["tf_res"], \
            f"frame {i}: tf_res"
        assert [int(o[i]) for o in plan["offsets"]] == t["offsets"], \
            f"frame {i}: dynalloc offsets"
        assert int(plan["trim"][i]) == t["trim"], f"frame {i}: trim"
        assert [int(p[i]) for p in plan["pulses"]] == t["pulses"], \
            f"frame {i}: pulse allocation"
        assert [int(e[i]) for e in plan["ebits"]] == t["fine_quant"], \
            f"frame {i}: fine bits"
        assert [int(p[i]) for p in plan["fine_priority"]] == \
            t["fine_priority"], f"frame {i}: fine priority"
        assert int(plan["coded_bands"][i]) == t["coded_bands"], \
            f"frame {i}: coded_bands"
        assert int(plan["balance"][i]) == t["balance"], \
            f"frame {i}: balance"
        got_e = np.array([e[i] for e in plan["energies"]])
        assert np.allclose(got_e, t["energies"], atol=1e-4), \
            f"frame {i}: band energies"

"""Beam-vectorized NSQ (opus_tpu/silk/nsq_del_dec_jax.py): bit-exact vs
the scalar delayed-decision quantizer on real encoder-captured calls."""

import copy

import numpy as np
import pytest

import opus_tpu.silk.nsq_del_dec as ndd
from opus_tpu.models.opus_encoder import OpusEncoder


def _capture_calls(fs, bitrate, seconds=0.6, seed=5, max_calls=12):
    """Run a real encode and snapshot every silk_nsq_del_dec call."""
    calls = []
    orig = ndd.silk_nsq_del_dec

    def spy(ch, nsq, indices, x16, pulses, pred_coef_q12, ltp_coef_q14,
            ar_q13, hsg, tilt, lf_shp, gains, pitch_l, lambda_q10,
            ltp_scale):
        if len(calls) < max_calls:
            calls.append(dict(
                ch=ch, nsq=nsq.copy(), indices=copy.deepcopy(indices),
                x16=list(x16), pred=copy.deepcopy(pred_coef_q12),
                ltp=list(ltp_coef_q14), ar=list(ar_q13), hsg=list(hsg),
                tilt=list(tilt), lf=list(lf_shp), gains=list(gains),
                pitch=list(pitch_l), lam=lambda_q10, scale=ltp_scale))
        return orig(ch, nsq, indices, x16, pulses, pred_coef_q12,
                    ltp_coef_q14, ar_q13, hsg, tilt, lf_shp, gains,
                    pitch_l, lambda_q10, ltp_scale)

    ndd.silk_nsq_del_dec = spy
    try:
        import opus_tpu.silk.encoder as se
        se_orig = getattr(se, "silk_nsq_del_dec", None)
        rng = np.random.default_rng(seed)
        t = np.arange(int(fs * seconds)) / fs
        f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
        sig = np.clip(0.4 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
                      * (0.4 + 0.6 * (np.sin(2 * np.pi * 1.3 * t) > 0))
                      + 0.02 * rng.standard_normal(len(t)), -1, 1)
        enc = OpusEncoder(fs, 1, application="voip")
        enc.set_bitrate(bitrate)
        n = fs // 50
        for i in range(len(sig) // n):
            enc.encode(sig[i * n:(i + 1) * n], n)
    finally:
        ndd.silk_nsq_del_dec = orig
    return calls


def _replay(impl, call):
    nsq = call["nsq"].copy()
    indices = copy.deepcopy(call["indices"])
    pulses = [0] * ((call["ch"].frame_length + 15) & ~15)
    impl(call["ch"], nsq, indices, call["x16"], pulses,
         copy.deepcopy(call["pred"]), list(call["ltp"]),
         list(call["ar"]), list(call["hsg"]), list(call["tilt"]),
         list(call["lf"]), list(call["gains"]), list(call["pitch"]),
         call["lam"], call["scale"])
    return pulses, nsq, indices


@pytest.mark.parametrize("fs,bitrate", [(16000, 24000), (8000, 12000)])
def test_nsq_del_dec_jax_bit_exact(fs, bitrate):
    from opus_tpu.silk.nsq_del_dec_jax import silk_nsq_del_dec_jax

    calls = _capture_calls(fs, bitrate)
    assert calls, "no delayed-decision NSQ calls captured"
    for ci, call in enumerate(calls):
        p_ref, nsq_ref, ind_ref = _replay(ndd.silk_nsq_del_dec, call)
        p_jax, nsq_jax, ind_jax = _replay(silk_nsq_del_dec_jax, call)
        L = call["ch"].frame_length
        lm = call["ch"].ltp_mem_length
        assert p_jax[:L] == p_ref[:L], f"call {ci}: pulses"
        assert ind_jax.Seed == ind_ref.Seed, f"call {ci}: Seed"
        assert nsq_jax.xq[:lm + L] == nsq_ref.xq[:lm + L], \
            f"call {ci}: xq"
        assert nsq_jax.sLTP_shp_Q14[:lm + L] == \
            nsq_ref.sLTP_shp_Q14[:lm + L], f"call {ci}: shape buffer"
        assert nsq_jax.sLPC_Q14[:32] == nsq_ref.sLPC_Q14[:32], \
            f"call {ci}: sLPC"
        assert nsq_jax.sAR2_Q14 == nsq_ref.sAR2_Q14, f"call {ci}: sAR2"
        assert nsq_jax.sLF_AR_shp_Q14 == nsq_ref.sLF_AR_shp_Q14
        assert nsq_jax.sDiff_shp_Q14 == nsq_ref.sDiff_shp_Q14
        assert nsq_jax.prev_gain_Q16 == nsq_ref.prev_gain_Q16
        assert nsq_jax.lagPrev == nsq_ref.lagPrev

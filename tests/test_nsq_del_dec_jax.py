"""Beam-vectorized NSQ (opus_tpu/silk/nsq_del_dec_jax.py): bit-exact vs
the scalar delayed-decision quantizer on real encoder-captured calls."""

import copy

import numpy as np
import pytest

import opus_tpu.silk.nsq_del_dec as ndd
from opus_tpu.models.opus_encoder import OpusEncoder


def _capture_calls(fs, bitrate, seconds=1.2, seed=5, max_calls=20):
    """Run a real encode and snapshot every silk_nsq_del_dec call.

    The signal is strongly periodic (harmonic stack at ~110 Hz) so the
    capture reliably includes TYPE_VOICED frames — the voiced paths
    (LTP rewhitening FIR, pitch-lag decision delay, mid-frame winner
    flush) are where bugs have hidden before."""
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
        f0 = 110 * (1 + 0.02 * np.sin(2 * np.pi * 0.8 * t))
        ph = 2 * np.pi * np.cumsum(f0) / fs
        sig = sum((1.0 / h) * np.sin(h * ph) for h in range(1, 9))
        sig = 0.45 * sig / np.max(np.abs(sig))
        sig = np.clip(sig + 0.002 * rng.standard_normal(len(t)), -1, 1)
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
    kinds = {(c["indices"].signalType, c["indices"].NLSFInterpCoef_Q2 == 4)
             for c in calls}
    assert (2, True) in kinds, "no voiced (full-NLSF) calls captured"
    assert (2, False) in kinds, "no voiced NLSF-interpolated calls captured"
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


def test_nsq_del_dec_jax_stream_batch_vmap():
    """The [S]-lane core vmaps over a leading stream axis: a [B]-batch
    of captured calls equals the per-call results (SURVEY §2.6 beam x
    stream mapping)."""
    import jax
    import jax.numpy as jnp
    from opus_tpu.silk import nsq_del_dec_jax as NJ

    calls = _capture_calls(16000, 24000, max_calls=16)
    # pick the largest group of calls with identical static config
    from collections import Counter
    key = lambda c: (c["indices"].signalType,
                     c["indices"].quantOffsetType,
                     c["indices"].NLSFInterpCoef_Q2 == 4)
    best_key, _ = Counter(key(c) for c in calls).most_common(1)[0]
    base = next(c for c in calls if key(c) == best_key)
    ch = base["ch"]
    statics = dict(
        frame_length=ch.frame_length, subfr_length=ch.subfr_length,
        ltp_mem=ch.ltp_mem_length, predict_order=ch.predict_lpc_order,
        shaping_order=ch.shaping_lpc_order,
        n_states=ch.n_states_delayed_decision, nb_subfr=ch.nb_subfr,
        signal_type=base["indices"].signalType,
        offset_q10=NJ.T.QUANTIZATION_OFFSETS_Q10[
            base["indices"].signalType >> 1][
            base["indices"].quantOffsetType],
        lsf_interp_flag=0 if base["indices"].NLSFInterpCoef_Q2 == 4
        else 1, warping_q16=ch.warping_q16)
    group = [c for c in calls
             if (c["indices"].signalType, c["indices"].quantOffsetType,
                 c["indices"].NLSFInterpCoef_Q2 == 4) ==
                (base["indices"].signalType,
                 base["indices"].quantOffsetType,
                 base["indices"].NLSFInterpCoef_Q2 == 4)][:3]
    if len(group) < 2:
        pytest.skip("not enough homogeneous calls captured")
    total = ch.ltp_mem_length + ch.frame_length

    def args_of(c):
        return (jnp.asarray(c["x16"], jnp.int32),
                jnp.asarray(c["pred"], jnp.int32),
                jnp.asarray(c["ltp"], jnp.int32),
                jnp.asarray(c["ar"], jnp.int32),
                jnp.asarray(c["hsg"], jnp.int32),
                jnp.asarray(c["tilt"], jnp.int32),
                jnp.asarray(c["lf"], jnp.int32),
                jnp.asarray(c["gains"], jnp.int32),
                jnp.asarray(list(c["pitch"]) + [0] * (4 - len(c["pitch"])),
                            jnp.int32),
                jnp.int32(c["lam"]), jnp.int32(c["scale"]),
                jnp.int32(c["indices"].Seed),
                jnp.int32(c["nsq"].lagPrev),
                jnp.int32(c["nsq"].prev_gain_Q16),
                jnp.asarray(c["nsq"].xq[:total], jnp.int32),
                jnp.asarray(c["nsq"].sLTP_shp_Q14[:total], jnp.int32),
                jnp.asarray(c["nsq"].sLPC_Q14[:NJ.NSQ_LPC_BUF],
                            jnp.int32),
                jnp.asarray(c["nsq"].sAR2_Q14, jnp.int32),
                jnp.int32(c["nsq"].sLF_AR_shp_Q14),
                jnp.int32(c["nsq"].sDiff_shp_Q14))

    single = [NJ._nsq_del_dec_core(*args_of(c), **statics)
              for c in group]
    stacked = [jnp.stack(xs) for xs in zip(*(args_of(c) for c in group))]
    batched = jax.vmap(lambda *a: NJ._nsq_del_dec_core(*a, **statics))(
        *stacked)
    for oi in range(len(single[0])):
        for bi in range(len(group)):
            assert np.array_equal(np.asarray(batched[oi][bi]),
                                  np.asarray(single[bi][oi])), (oi, bi)

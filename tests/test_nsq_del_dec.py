"""Differential test: the delayed-decision NSQ (opus_tpu/silk/nsq_del_dec.py)
must be bit-exact vs the reference silk_NSQ_del_dec_c on real encoder
inputs: we capture every NSQ invocation from a live encode (including
rate-loop retries, whose state was checkpoint-restored) and replay each
against the reference with identical starting state."""

import ctypes
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(REPO, ".ref_build", "libnsq_oracle.so")

MAX_LPC_ORDER = 16
LTP_ORDER = 5
MAX_SHAPE_LPC_ORDER = 24
# the reference keeps the last 16 (NSQ_LPC_BUF_LENGTH == MAX_LPC_ORDER)
# LPC history samples; our Python buffer keeps 32, of which the last 16
# are the live ones
REF_LPC_BUF = 16
NSQ_LPC_BUF_LENGTH = 32


def _lib():
    if not os.path.exists(SO):
        pytest.skip("NSQ oracle missing (run tools/build_oracle.sh)")
    return ctypes.CDLL(SO)


def _i16(vals, n):
    a = np.zeros(n, np.int16)
    v = np.asarray(vals, np.int64)[:n]
    a[:len(v)] = v
    return a


def _i32(vals, n):
    a = np.zeros(n, np.int32)
    v = np.asarray(vals, np.int64)[:n].astype(np.int64)
    a[:len(v)] = v.astype(np.int32)
    return a


def _capture_nsq_calls(n_sec=1.0, complexity=9, rate=24000):
    """Encode speech-ish audio with our encoder, recording every del-dec
    NSQ call's inputs and the pre-call NSQ state."""
    import copy
    from opus_tpu.silk import encoder as E
    from opus_tpu.silk import nsq_del_dec as ND
    from opus_tpu.models.opus_encoder import OpusEncoder

    calls = []
    real = ND.silk_nsq_del_dec

    def spy(ch, nsq, indices, x16, pulses, pred_coef_q12, ltp_coef_q14,
            ar_q13, hsg_q14, tilt_q14, lf_shp_q14, gains_q16, pitch_l,
            lambda_q10, ltp_scale_q14):
        pre = copy.deepcopy(nsq.__dict__)
        real(ch, nsq, indices, x16, pulses, pred_coef_q12, ltp_coef_q14,
             ar_q13, hsg_q14, tilt_q14, lf_shp_q14, gains_q16, pitch_l,
             lambda_q10, ltp_scale_q14)
        calls.append(dict(
            pre=pre, post=copy.deepcopy(nsq.__dict__),
            n_states=ch.n_states_delayed_decision,
            warping=ch.warping_q16, fs_khz=ch.fs_kHz,
            nb_subfr=ch.nb_subfr, predict_order=ch.predict_lpc_order,
            shaping_order=ch.shaping_lpc_order,
            signal_type=indices.signalType,
            quant_offset_type=indices.quantOffsetType,
            seed_in=pre_seed[0], seed_out=indices.Seed,
            nlsf_interp=indices.NLSFInterpCoef_Q2,
            x16=list(x16), pulses=list(pulses),
            pred=[list(pred_coef_q12[0]), list(pred_coef_q12[1])],
            ltp=list(ltp_coef_q14), ar=list(ar_q13), hsg=list(hsg_q14),
            tilt=list(tilt_q14), lf=list(lf_shp_q14),
            gains=list(gains_q16), pitch=list(pitch_l),
            lam=lambda_q10, ltp_scale=ltp_scale_q14))

    pre_seed = [0]

    def spy_wrap(ch, nsq, indices, *a, **kw):
        pre_seed[0] = indices.Seed
        return spy(ch, nsq, indices, *a, **kw)

    ND_orig = ND.silk_nsq_del_dec
    ND.silk_nsq_del_dec = spy_wrap
    try:
        fs = 16000
        enc = OpusEncoder(fs, 1, "voip")
        enc.set_bitrate(rate)
        enc.complexity = complexity
        rng = np.random.default_rng(21)
        t = np.arange(int(fs * n_sec)) / fs
        # harmonic-rich "vowel" so the pitch analysis locks (voiced frames)
        sig = sum((0.5 / (h + 1)) * np.sin(2 * np.pi * 120 * (h + 1) * t)
                  for h in range(8))
        sig = (0.5 * sig * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
               + 0.01 * rng.standard_normal(len(t)))
        n = fs // 50
        for i in range(int(n_sec * 50) - 1):
            enc.encode(sig[i * n:(i + 1) * n], n)
    finally:
        ND.silk_nsq_del_dec = ND_orig
    return calls


@pytest.mark.parametrize("complexity", [9, 6, 4])
def test_nsq_del_dec_bit_exact_vs_reference(complexity):
    lib = _lib()
    calls = _capture_nsq_calls(n_sec=0.8, complexity=complexity)
    assert len(calls) >= 10
    blob = ctypes.create_string_buffer(lib.oracle_nsq_size())
    voiced = 0
    for ci, c in enumerate(calls):
        fl = c["fs_khz"] * 5 * c["nb_subfr"]
        ltp_mem = 20 * c["fs_khz"]
        pre = c["pre"]
        nbuf = ltp_mem + fl
        scal = _i32([pre["sLF_AR_shp_Q14"], pre["sDiff_shp_Q14"],
                     pre["lagPrev"], pre["sLTP_buf_idx"],
                     pre["sLTP_shp_buf_idx"], pre["rand_seed"],
                     pre["prev_gain_Q16"], pre["rewhite_flag"]], 8)
        xq0 = _i16(pre["xq"], nbuf)
        shp0 = _i32(pre["sLTP_shp_Q14"], nbuf)
        slpc0 = _i32(pre["sLPC_Q14"][NSQ_LPC_BUF_LENGTH - REF_LPC_BUF:
                                     NSQ_LPC_BUF_LENGTH], REF_LPC_BUF)
        sar0 = _i32(pre["sAR2_Q14"], MAX_SHAPE_LPC_ORDER)
        lib.oracle_nsq_set(blob, xq0.ctypes, nbuf, shp0.ctypes, nbuf,
                           slpc0.ctypes, sar0.ctypes, scal.ctypes)
        pred = _i16(c["pred"][0] + [0] * (MAX_LPC_ORDER - len(c["pred"][0]))
                    + c["pred"][1], 2 * MAX_LPC_ORDER)
        ltpc = _i16(c["ltp"], LTP_ORDER * 4)
        ar = _i16(c["ar"], 4 * MAX_SHAPE_LPC_ORDER)
        hsg = _i32(c["hsg"], 4)
        tilt = _i32(c["tilt"], 4)
        lf = _i32(c["lf"], 4)
        gains = _i32(c["gains"], 4)
        pitch = _i32(c["pitch"], 4)
        x16 = _i16(c["x16"], fl)
        pulses = np.zeros(fl, np.int8)
        seed_out = ctypes.c_int(0)
        lib.oracle_nsq_run(
            1, c["n_states"], c["warping"], c["fs_khz"], c["nb_subfr"],
            c["predict_order"], c["shaping_order"], blob,
            c["signal_type"], c["quant_offset_type"], c["seed_in"],
            c["nlsf_interp"], x16.ctypes, pulses.ctypes, pred.ctypes,
            ltpc.ctypes, ar.ctypes, hsg.ctypes, tilt.ctypes, lf.ctypes,
            gains.ctypes, pitch.ctypes, c["lam"], c["ltp_scale"],
            ctypes.byref(seed_out))
        assert np.array_equal(pulses, np.asarray(c["pulses"][:fl], np.int8)), \
            f"pulses mismatch call {ci}"
        assert seed_out.value == c["seed_out"], f"seed mismatch call {ci}"
        # carried state must match exactly
        post = c["post"]
        xq_ref = np.zeros(ltp_mem, np.int16)
        lib.oracle_nsq_get_xq(blob, xq_ref.ctypes, ltp_mem)
        assert np.array_equal(xq_ref, _i16(post["xq"], ltp_mem)), ci
        shp_ref = np.zeros(ltp_mem, np.int32)
        lib.oracle_nsq_get_shp(blob, shp_ref.ctypes, ltp_mem)
        assert np.array_equal(shp_ref, _i32(post["sLTP_shp_Q14"], ltp_mem)), ci
        sc_ref = np.zeros(8, np.int32)
        lib.oracle_nsq_get_scalars(blob, sc_ref.ctypes)
        assert sc_ref[0] == np.int32(post["sLF_AR_shp_Q14"]), ci
        assert sc_ref[1] == np.int32(post["sDiff_shp_Q14"]), ci
        assert sc_ref[2] == post["lagPrev"], ci
        assert sc_ref[6] == np.int32(post["prev_gain_Q16"]), ci
        slpc_ref = np.zeros(REF_LPC_BUF, np.int32)
        lib.oracle_nsq_get_slpc(blob, slpc_ref.ctypes)
        assert np.array_equal(
            slpc_ref,
            _i32(post["sLPC_Q14"][NSQ_LPC_BUF_LENGTH - REF_LPC_BUF:
                                  NSQ_LPC_BUF_LENGTH], REF_LPC_BUF)), ci
        sar_ref = np.zeros(MAX_SHAPE_LPC_ORDER, np.int32)
        lib.oracle_nsq_get_sar2(blob, sar_ref.ctypes)
        assert np.array_equal(
            sar_ref, _i32(post["sAR2_Q14"], MAX_SHAPE_LPC_ORDER)), ci
        voiced += c["signal_type"] == 2
    assert voiced > 0, "no voiced frames captured; weak test signal"

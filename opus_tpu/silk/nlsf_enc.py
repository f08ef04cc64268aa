"""NLSF encoding chain, exact fixed point (reference: silk/NLSF_encode.c,
NLSF_del_dec_quant.c, NLSF_VQ.c, NLSF_VQ_weights_laroia.c, process_NLSFs.c,
A2NLSF.c, interpolate.c)."""

from __future__ import annotations

from . import tables as T
from . import tables_data as TD
from .tables import (NLSF_QUANT_MAX_AMPLITUDE, MAX_LPC_ORDER, TYPE_VOICED)
from .macros import (SMULWB, SMLAWB, SMULBB, SMLABB, SMULWW, SMLAWW, SAT16,
                     RSHIFT_ROUND, DIV32_16, DIV32_varQ, wrap16, wrap32,
                     lin2log, SILK_FIX_CONST, INT32_MAX)
from .decoder import (nlsf_stabilize, nlsf_unpack, nlsf_decode, nlsf2a,
                      silk_bwexpander_32)

NLSF_QUANT_MAX_AMPLITUDE_EXT = 10
NLSF_QUANT_DEL_DEC_STATES = 4
NLSF_QUANT_DEL_DEC_STATES_LOG2 = 2
NLSF_QUANT_LEVEL_ADJ_Q10 = SILK_FIX_CONST(0.1, 10)
NLSF_W_Q = 2
BIN_DIV_STEPS = 3
MAX_ITER_A2NLSF = 16


def interpolate(x0, x1, ifact_q2, d):
    """(reference: silk/interpolate.c)"""
    return [x0[i] + ((ifact_q2 * (x1[i] - x0[i])) >> 2) for i in range(d)]


def nlsf_vq_weights_laroia(nlsf_q15, d):
    w = [0] * d
    t1 = max(nlsf_q15[0], 1)
    t1 = DIV32_16(1 << (15 + NLSF_W_Q), t1)
    t2 = max(nlsf_q15[1] - nlsf_q15[0], 1)
    t2 = DIV32_16(1 << (15 + NLSF_W_Q), t2)
    w[0] = min(t1 + t2, 32767)
    for k in range(1, d - 1, 2):
        t1 = max(nlsf_q15[k + 1] - nlsf_q15[k], 1)
        t1 = DIV32_16(1 << (15 + NLSF_W_Q), t1)
        w[k] = min(t1 + t2, 32767)
        t2 = max(nlsf_q15[k + 2] - nlsf_q15[k + 1], 1)
        t2 = DIV32_16(1 << (15 + NLSF_W_Q), t2)
        w[k + 1] = min(t1 + t2, 32767)
    t1 = max((1 << 15) - nlsf_q15[d - 1], 1)
    t1 = DIV32_16(1 << (15 + NLSF_W_Q), t1)
    w[d - 1] = min(t1 + t2, 32767)
    return w


def nlsf_vq(nlsf_q15, cb: T.NLSFCodebook):
    """Per-vector weighted errors (reference: NLSF_VQ.c)."""
    errs = []
    order = cb.order
    for i in range(cb.nVectors):
        base = i * order
        sum_err = 0
        pred = 0
        for m in range(order - 2, -1, -2):
            diff = nlsf_q15[m + 1] - (cb.CB1_NLSF_Q8[base + m + 1] << 7)
            diffw = SMULBB(diff, cb.CB1_Wght_Q9[base + m + 1])
            sum_err += abs(diffw - (pred >> 1))
            pred = diffw
            diff = nlsf_q15[m] - (cb.CB1_NLSF_Q8[base + m] << 7)
            diffw = SMULBB(diff, cb.CB1_Wght_Q9[base + m])
            sum_err += abs(diffw - (pred >> 1))
            pred = diffw
        errs.append(sum_err)
    return errs


def nlsf_del_dec_quant(x_q10, w_q5, pred_coef_q8, ec_ix, ec_rates_q5,
                       quant_step_size_q16, inv_quant_step_size_q6, mu_q20,
                       order):
    """Trellis NLSF residual quantizer (reference: NLSF_del_dec_quant.c).
    Returns (indices list, RD_Q25)."""
    NS = NLSF_QUANT_DEL_DEC_STATES
    out0_tab = [0] * (2 * NLSF_QUANT_MAX_AMPLITUDE_EXT)
    out1_tab = [0] * (2 * NLSF_QUANT_MAX_AMPLITUDE_EXT)
    for i in range(-NLSF_QUANT_MAX_AMPLITUDE_EXT,
                   NLSF_QUANT_MAX_AMPLITUDE_EXT):
        o0 = i << 10
        o1 = o0 + 1024
        if i > 0:
            o0 -= NLSF_QUANT_LEVEL_ADJ_Q10
            o1 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif i == 0:
            o1 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif i == -1:
            o0 += NLSF_QUANT_LEVEL_ADJ_Q10
        else:
            o0 += NLSF_QUANT_LEVEL_ADJ_Q10
            o1 += NLSF_QUANT_LEVEL_ADJ_Q10
        out0_tab[i + NLSF_QUANT_MAX_AMPLITUDE_EXT] = \
            SMULBB(o0, quant_step_size_q16) >> 16
        out1_tab[i + NLSF_QUANT_MAX_AMPLITUDE_EXT] = \
            SMULBB(o1, quant_step_size_q16) >> 16

    n_states = 1
    rd_q25 = [0] * (2 * NS)
    prev_out_q10 = [0] * (2 * NS)
    ind = [[0] * MAX_LPC_ORDER for _ in range(NS)]
    ind_sort = [0] * NS
    for i in range(order - 1, -1, -1):
        rates = ec_rates_q5[ec_ix[i]:]
        in_q10 = x_q10[i]
        for j in range(n_states):
            pred_q10 = SMULBB(pred_coef_q8[i], prev_out_q10[j]) >> 8
            res_q10 = wrap16(in_q10 - pred_q10)
            ind_tmp = SMULBB(inv_quant_step_size_q6, res_q10) >> 16
            ind_tmp = max(-NLSF_QUANT_MAX_AMPLITUDE_EXT,
                          min(NLSF_QUANT_MAX_AMPLITUDE_EXT - 1, ind_tmp))
            ind[j][i] = ind_tmp
            out0 = out0_tab[ind_tmp + NLSF_QUANT_MAX_AMPLITUDE_EXT]
            out1 = out1_tab[ind_tmp + NLSF_QUANT_MAX_AMPLITUDE_EXT]
            out0 = wrap16(out0 + pred_q10)
            out1 = wrap16(out1 + pred_q10)
            prev_out_q10[j] = out0
            prev_out_q10[j + n_states] = out1
            if ind_tmp + 1 >= NLSF_QUANT_MAX_AMPLITUDE:
                if ind_tmp + 1 == NLSF_QUANT_MAX_AMPLITUDE:
                    rate0 = rates[ind_tmp + NLSF_QUANT_MAX_AMPLITUDE]
                    rate1 = 280
                else:
                    rate0 = SMLABB(280 - 43 * NLSF_QUANT_MAX_AMPLITUDE, 43,
                                   ind_tmp)
                    rate1 = rate0 + 43
            elif ind_tmp <= -NLSF_QUANT_MAX_AMPLITUDE:
                if ind_tmp == -NLSF_QUANT_MAX_AMPLITUDE:
                    rate0 = 280
                    rate1 = rates[ind_tmp + 1 + NLSF_QUANT_MAX_AMPLITUDE]
                else:
                    rate0 = SMLABB(280 - 43 * NLSF_QUANT_MAX_AMPLITUDE, -43,
                                   ind_tmp)
                    rate1 = rate0 - 43
            else:
                rate0 = rates[ind_tmp + NLSF_QUANT_MAX_AMPLITUDE]
                rate1 = rates[ind_tmp + 1 + NLSF_QUANT_MAX_AMPLITUDE]
            rd_tmp = rd_q25[j]
            diff = wrap16(in_q10 - out0)
            rd_q25[j] = SMLABB(rd_tmp + SMULBB(diff, diff) * w_q5[i],
                               mu_q20, rate0)
            diff = wrap16(in_q10 - out1)
            rd_q25[j + n_states] = SMLABB(rd_tmp + SMULBB(diff, diff) * w_q5[i],
                                          mu_q20, rate1)

        if n_states <= NS // 2:
            for j in range(n_states):
                ind[j + n_states][i] = ind[j][i] + 1
            n_states <<= 1
            for j in range(n_states, NS):
                ind[j][i] = ind[j - n_states][i]
        else:
            rd_min = [0] * NS
            rd_max = [0] * NS
            for j in range(NS):
                if rd_q25[j] > rd_q25[j + NS]:
                    rd_max[j] = rd_q25[j]
                    rd_min[j] = rd_q25[j + NS]
                    rd_q25[j], rd_q25[j + NS] = rd_min[j], rd_max[j]
                    prev_out_q10[j], prev_out_q10[j + NS] = \
                        prev_out_q10[j + NS], prev_out_q10[j]
                    ind_sort[j] = j + NS
                else:
                    rd_min[j] = rd_q25[j]
                    rd_max[j] = rd_q25[j + NS]
                    ind_sort[j] = j
            while True:
                min_max = INT32_MAX
                max_min = 0
                ind_min_max = 0
                ind_max_min = 0
                for j in range(NS):
                    if min_max > rd_max[j]:
                        min_max = rd_max[j]
                        ind_min_max = j
                    if max_min < rd_min[j]:
                        max_min = rd_min[j]
                        ind_max_min = j
                if min_max >= max_min:
                    break
                ind_sort[ind_max_min] = ind_sort[ind_min_max] ^ NS
                rd_q25[ind_max_min] = rd_q25[ind_min_max + NS]
                prev_out_q10[ind_max_min] = prev_out_q10[ind_min_max + NS]
                rd_min[ind_max_min] = 0
                rd_max[ind_min_max] = INT32_MAX
                ind[ind_max_min] = list(ind[ind_min_max])
            for j in range(NS):
                ind[j][i] += ind_sort[j] >> NLSF_QUANT_DEL_DEC_STATES_LOG2

    ind_tmp = 0
    min_q25 = INT32_MAX
    for j in range(2 * NS):
        if min_q25 > rd_q25[j]:
            min_q25 = rd_q25[j]
            ind_tmp = j
    indices = [ind[ind_tmp & (NS - 1)][j] for j in range(order)]
    indices[0] += ind_tmp >> NLSF_QUANT_DEL_DEC_STATES_LOG2
    return indices, min_q25


def nlsf_encode(nlsf_q15, cb: T.NLSFCodebook, w_qw, nlsf_mu_q20, n_survivors,
                signal_type):
    """Returns (indices [order+1], quantized nlsf written back into nlsf_q15)
    (reference: NLSF_encode.c)."""
    nlsf_stabilize(nlsf_q15, cb.deltaMin_Q15, cb.order)
    errs = nlsf_vq(nlsf_q15, cb)
    order_idx = sorted(range(cb.nVectors), key=lambda i: errs[i])[:n_survivors]
    best = None
    for s, ind1 in enumerate(order_idx):
        base = ind1 * cb.order
        res_q10 = [0] * cb.order
        w_adj_q5 = [0] * cb.order
        for i in range(cb.order):
            w_tmp_q9 = cb.CB1_Wght_Q9[base + i]
            res_q10[i] = wrap16(SMULBB(
                nlsf_q15[i] - (cb.CB1_NLSF_Q8[base + i] << 7), w_tmp_q9) >> 14)
            w_adj_q5[i] = DIV32_varQ(w_qw[i], SMULBB(w_tmp_q9, w_tmp_q9), 21)
        ec_ix, pred_q8 = nlsf_unpack(cb, ind1)
        indices2, rd = nlsf_del_dec_quant(
            res_q10, w_adj_q5, pred_q8, ec_ix, cb.ec_Rates_Q5,
            cb.quantStepSize_Q16, cb.invQuantStepSize_Q6, nlsf_mu_q20,
            cb.order)
        icdf = cb.CB1_iCDF[(signal_type >> 1) * cb.nVectors:]
        if ind1 == 0:
            prob_q8 = 256 - icdf[ind1]
        else:
            prob_q8 = icdf[ind1 - 1] - icdf[ind1]
        bits_q7 = (8 << 7) - lin2log(prob_q8)
        rd = SMLABB(rd, bits_q7, nlsf_mu_q20 >> 2)
        if best is None or rd < best[0]:
            best = (rd, ind1, indices2)
    _, ind1, indices2 = best
    indices = [ind1] + indices2
    quant = nlsf_decode(indices, cb)
    nlsf_q15[:] = quant
    return indices


def process_nlsfs(ch, nlsf_q15):
    """Returns PredCoef_Q12[2][order] and updates ch.indices
    (reference: process_NLSFs.c).  ch is a SilkEncoderChannel."""
    cb = ch.psNLSF_CB
    order = ch.predict_lpc_order
    nlsf_mu_q20 = SMLAWB(SILK_FIX_CONST(0.003, 20),
                         SILK_FIX_CONST(-0.001, 28), ch.speech_activity_q8)
    if ch.nb_subfr == 2:
        nlsf_mu_q20 += nlsf_mu_q20 >> 1

    w_qw = nlsf_vq_weights_laroia(nlsf_q15, order)
    do_interp = ch.use_interpolated_nlsfs and ch.indices.NLSFInterpCoef_Q2 < 4
    if do_interp:
        nlsf0 = interpolate(ch.prev_nlsf_q15, nlsf_q15,
                            ch.indices.NLSFInterpCoef_Q2, order)
        w0_qw = nlsf_vq_weights_laroia(nlsf0, order)
        i_sqr_q15 = (ch.indices.NLSFInterpCoef_Q2
                     * ch.indices.NLSFInterpCoef_Q2) << 11
        for i in range(order):
            w_qw[i] = (w_qw[i] >> 1) + (SMULBB(w0_qw[i], i_sqr_q15) >> 16)

    ch.indices.NLSFIndices = nlsf_encode(
        nlsf_q15, cb, w_qw, nlsf_mu_q20, ch.nlsf_msvq_survivors,
        ch.indices.signalType)

    pred1 = nlsf2a(nlsf_q15, order)
    if do_interp:
        nlsf0 = interpolate(ch.prev_nlsf_q15, nlsf_q15,
                            ch.indices.NLSFInterpCoef_Q2, order)
        pred0 = nlsf2a(nlsf0, order)
    else:
        pred0 = list(pred1)
    return [pred0, pred1]


def a2nlsf(a_q16_in, d):
    """LPC (Q16) -> NLSF (reference: silk/A2NLSF.c).  a_q16_in modified."""
    a_q16 = list(a_q16_in)
    dd = d >> 1
    nlsf = [0] * d

    def trans_poly(p):
        for k in range(2, dd + 1):
            for n in range(dd, k, -1):
                p[n - 2] -= p[n]
            p[k - 2] -= p[k] << 1

    def init_pq():
        P = [0] * (dd + 1)
        Q = [0] * (dd + 1)
        P[dd] = 1 << 16
        Q[dd] = 1 << 16
        for k in range(dd):
            P[k] = -a_q16[dd - k - 1] - a_q16[dd + k]
            Q[k] = -a_q16[dd - k - 1] + a_q16[dd + k]
        for k in range(dd, 0, -1):
            P[k - 1] -= P[k]
            Q[k - 1] += Q[k]
        trans_poly(P)
        trans_poly(Q)
        return P, Q

    def eval_poly(p, x_q12):
        y32 = p[dd]
        x_q16 = x_q12 << 4
        for n in range(dd - 1, -1, -1):
            y32 = SMLAWW(p[n], y32, x_q16)
        return y32

    P, Q = init_pq()
    p = P
    xlo = TD.LSFCOSTAB_FIX_Q12[0]
    ylo = eval_poly(p, xlo)
    if ylo < 0:
        nlsf[0] = 0
        p = Q
        ylo = eval_poly(p, xlo)
        root_ix = 1
    else:
        root_ix = 0
    k = 1
    i = 0
    thr = 0
    while True:
        xhi = TD.LSFCOSTAB_FIX_Q12[k]
        yhi = eval_poly(p, xhi)
        if (ylo <= 0 and yhi >= thr) or (ylo >= 0 and yhi <= -thr):
            thr = 1 if yhi == 0 else 0
            ffrac = -256
            for m in range(BIN_DIV_STEPS):
                xmid = RSHIFT_ROUND(xlo + xhi, 1)
                ymid = eval_poly(p, xmid)
                if (ylo <= 0 and ymid >= 0) or (ylo >= 0 and ymid <= 0):
                    xhi = xmid
                    yhi = ymid
                else:
                    xlo = xmid
                    ylo = ymid
                    ffrac += 128 >> m
            if abs(ylo) < 65536:
                den = ylo - yhi
                nom = (ylo << (8 - BIN_DIV_STEPS)) + (den >> 1)
                if den != 0:
                    ffrac += DIV32_16(nom, den)
            else:
                ffrac += DIV32_16(ylo, (ylo - yhi) >> (8 - BIN_DIV_STEPS))
            nlsf[root_ix] = min((k << 8) + ffrac, 32767)
            root_ix += 1
            if root_ix >= d:
                break
            p = P if (root_ix & 1) == 0 else Q
            xlo = TD.LSFCOSTAB_FIX_Q12[k - 1]
            ylo = (1 - (root_ix & 2)) << 12
        else:
            k += 1
            xlo = xhi
            ylo = yhi
            thr = 0
            if k > 128:  # LSF_COS_TAB_SZ_FIX
                i += 1
                if i > MAX_ITER_A2NLSF:
                    nlsf[0] = DIV32_16(1 << 15, d + 1)
                    for k2 in range(1, d):
                        nlsf[k2] = nlsf[k2 - 1] + nlsf[0]
                    return nlsf
                silk_bwexpander_32(a_q16, d, 65536 - (1 << i))
                P, Q = init_pq()
                p = P
                xlo = TD.LSFCOSTAB_FIX_Q12[0]
                ylo = eval_poly(p, xlo)
                if ylo < 0:
                    nlsf[0] = 0
                    p = Q
                    ylo = eval_poly(p, xlo)
                    root_ix = 1
                else:
                    root_ix = 0
                k = 1
    return nlsf

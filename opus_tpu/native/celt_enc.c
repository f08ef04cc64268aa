/* Native CELT symbol-ENCODE pass: spectra in, packet bytes out.
 *
 * Mirror of celt_dec.c for the encode direction: the batched TPU DSP
 * stage (opus_tpu/models/batched_celt_enc.py) computes preemphasis ->
 * MDCT (long + short) -> band energies -> normalized band shapes on the
 * MXU; this file owns everything that is sequential symbol work — the
 * encoder decision logic (transient/tf/dynalloc/trim/spread), coarse and
 * fine energy quantization, allocation, PVQ search + CWRS indexing, and
 * the range encoder — threaded over a stream batch.
 *
 * Scope (round 2): mono, full band (start=0, end=nbEBands), CBR,
 * prefilter disabled (the "pitch off" bit is still coded, so streams are
 * fully reference-decodable), no hybrid/LFE/QEXT, tone detection off.
 *
 * The scalar Python encoder (opus_tpu/celt/encoder.py) is the oracle:
 * fed the same spectra, this pass produces byte-identical packets
 * (tests/test_native_celt_enc.py).  Reference behavior:
 * celt/celt_encoder.c:1726 (celt_encode_with_ec), quant_bands.c:260
 * (quant_coarse_energy), rate.c:371 (skip decisions), vq.c:205
 * (op_pvq_search), cwrs.c:444 (icwrs), bands.c:700 (compute_theta),
 * celt_encoder.c:663 (tf_analysis), :1049 (dynalloc_analysis),
 * bands.c:470 (spreading_decision), :907 (alloc_trim_analysis),
 * :267 (transient_analysis).
 */

#include "celt_dec.c"

#include <math.h>

/* ------------------------------------------------------------------ */
/* CWRS encode (opus_tpu/celt/cwrs.py icwrs/encode_pulses)             */

static uint32_t icwrs(int n, const int *y) {
    int j = n - 1;
    uint32_t i = y[j] < 0 ? 1 : 0;
    int k = y[j] < 0 ? -y[j] : y[j];
    while (j > 0) {
        j--;
        i += pvq_u(n - j, k);
        k += y[j] < 0 ? -y[j] : y[j];
        if (y[j] < 0) i += pvq_u(n - j, k + 1);
    }
    return i;
}

static void encode_pulses_c(ecenc *enc, const int *y, int n, int k) {
    ece_enc_uint(enc, icwrs(n, y), pvq_v(n, k));
}

/* ------------------------------------------------------------------ */
/* PVQ search (opus_tpu/celt/bands.py op_pvq_search / alg_quant;       */
/* reference vq.c:205,552)                                             */

static double op_pvq_search_c(double *x, int *iy, int k, int n) {
    double xa[176], y[176];
    int signs[176];
    int j, pulses_left;
    double xy = 0.0, yy = 0.0;
    for (j = 0; j < n; j++) {
        signs[j] = x[j] < 0 ? -1 : 1;
        xa[j] = fabs(x[j]);
        x[j] = xa[j];
        iy[j] = 0;
        y[j] = 0.0;
    }
    pulses_left = k;
    if (k > (n >> 1)) {
        double sum = 0.0, rcp;
        for (j = 0; j < n; j++) sum += xa[j];
        if (!(sum > EPSILON && sum < 64)) {
            xa[0] = 1.0;
            for (j = 1; j < n; j++) xa[j] = 0.0;
            sum = 1.0;
            for (j = 0; j < n; j++) x[j] = xa[j];
        }
        rcp = (k + 0.8) / sum;
        pulses_left = k;
        for (j = 0; j < n; j++) {
            iy[j] = (int)floor(rcp * xa[j]);
            y[j] = (double)iy[j];
            yy += y[j] * y[j];
            xy += xa[j] * y[j];
            y[j] *= 2.0;
            pulses_left -= iy[j];
        }
    }
    if (pulses_left > n + 3) {
        double tmp = (double)pulses_left;
        yy += tmp * tmp + tmp * y[0];
        iy[0] += pulses_left;
        pulses_left = 0;
    }
    for (; pulses_left > 0; pulses_left--) {
        int best = 0;
        double best_num, best_den;
        yy += 1.0;
        best_num = (xy + xa[0]) * (xy + xa[0]);
        best_den = yy + y[0];
        for (j = 1; j < n; j++) {
            double rxy = (xy + xa[j]) * (xy + xa[j]);
            double ryy = yy + y[j];
            if (best_den * rxy > ryy * best_num) {
                best_num = rxy;
                best_den = ryy;
                best = j;
            }
        }
        xy += xa[best];
        yy += y[best];
        y[best] += 2.0;
        iy[best] += 1;
    }
    {
        double e = 0.0;
        for (j = 0; j < n; j++) {
            iy[j] *= signs[j];
            e += (double)iy[j] * iy[j];
        }
        return e;
    }
}

static int alg_quant_c(double *x, int n, int k, int spread, int b,
                       ecenc *enc) {
    int iy[176];
    exp_rotation(x, n, 1, b, k, spread);
    op_pvq_search_c(x, iy, k, n);
    {
        int cm = extract_collapse_mask(iy, n, b);
        encode_pulses_c(enc, iy, n, k);
        return cm;
    }
}

/* ------------------------------------------------------------------ */
/* Laplace encode (opus_tpu/bitstream/laplace.py; celt/laplace.c)      */

static int laplace_encode_c(ecenc *enc, int value, int fs, int decay) {
    int val = value, fl = 0;
    if (val) {
        int s = val < 0 ? -1 : 0;
        int i;
        val = (val + s) ^ s;
        fl = fs;
        fs = laplace_get_freq1(fs, decay);
        for (i = 1; fs > 0 && i < val; i++) {
            fs *= 2;
            fl += fs + 2;
            fs = (fs * decay) >> 15;
        }
        if (!fs) {
            int ndi_max = (32768 - fl + 1 - 1) >> 0;
            int di;
            ndi_max = (ndi_max - s) >> 1;
            di = val - i < ndi_max - 1 ? val - i : ndi_max - 1;
            fl += (2 * di + 1 + s) * 1;
            fs = 1 < 32768 - fl ? 1 : 32768 - fl;
            value = (i + di + s) ^ s;
        } else {
            fs += 1;
            fl += fs & ~s;
        }
    }
    ece_encode_bin(enc, fl, fl + fs, 15);
    return value;
}

/* ------------------------------------------------------------------ */
/* Coarse / fine / finalise energy encode                              */
/* (opus_tpu/celt/energy.py; celt/quant_bands.c)                       */

typedef struct {
    ecenc e;
    unsigned char buf[1300];
} enc_snapshot;

static void enc_save(const ecenc *e, enc_snapshot *s) {
    s->e = *e;
    memcpy(s->buf, e->buf, e->storage);
}

static void enc_restore(ecenc *e, const enc_snapshot *s) {
    unsigned char *buf = e->buf;
    *e = s->e;
    e->buf = buf;
    memcpy(buf, s->buf, s->e.storage);
}

static int quant_coarse_impl(const CeltModeC *m, int start, int end,
                             const double *eb, double *old_eb, int budget,
                             int tell, const uint8_t *prob_model,
                             double *error, ecenc *enc, int C, int LM,
                             int intra, double max_decay, int lfe) {
    int badness = 0;
    double prev[2] = {0.0, 0.0};
    double coef, beta;
    int i, c;
    if (tell + 3 <= budget) ece_enc_bit_logp(enc, intra, 3);
    if (intra) {
        coef = 0.0;
        beta = BETA_INTRA;
    } else {
        beta = BETA_COEF[LM];
        coef = PRED_COEF[LM];
    }
    for (i = start; i < end; i++) {
        for (c = 0; c < C; c++) {
            int nb = m->nbEBands;
            double x = eb[i + c * nb];
            double old_e = old_eb[i + c * nb] > -9.0
                ? old_eb[i + c * nb] : -9.0;
            double f = x - coef * old_e - prev[c];
            int qi = (int)floor(.5 + f);
            double decay_bound = (old_eb[i + c * nb] > -28.0
                                  ? old_eb[i + c * nb] : -28.0) - max_decay;
            int qi0, bits_left;
            double q, tmp;
            if (qi < 0 && x < decay_bound) {
                qi += (int)(decay_bound - x);
                if (qi > 0) qi = 0;
            }
            qi0 = qi;
            tell = ece_tell(enc);
            bits_left = budget - tell - 3 * C * (end - i);
            if (i != start && bits_left < 30) {
                if (bits_left < 24 && qi > 1) qi = 1;
                if (bits_left < 16 && qi < -1) qi = -1;
            }
            if (lfe && i >= 2 && qi > 0) qi = 0;
            if (budget - tell >= 15) {
                int pi = 2 * (i < 20 ? i : 20);
                qi = laplace_encode_c(enc, qi, prob_model[pi] << 7,
                                      prob_model[pi + 1] << 6);
            } else if (budget - tell >= 2) {
                if (qi > 1) qi = 1;
                if (qi < -1) qi = -1;
                ece_enc_icdf(enc, (2 * qi) ^ (qi < 0 ? -1 : 0),
                             SMALL_ENERGY_ICDF, 2);
            } else if (budget - tell >= 1) {
                if (qi > 0) qi = 0;
                ece_enc_bit_logp(enc, -qi, 1);
            } else {
                qi = -1;
            }
            error[i + c * nb] = f - qi;
            badness += qi0 - qi > 0 ? qi0 - qi : qi - qi0;
            q = (double)qi;
            tmp = coef * old_e + prev[c] + q;
            old_eb[i + c * nb] = tmp;
            prev[c] = prev[c] + q - beta * q;
        }
    }
    return lfe ? 0 : badness;
}

static double loss_distortion(const double *eb, const double *old_eb,
                              int start, int end, int nb, int C) {
    double dist = 0.0;
    int c, i;
    for (c = 0; c < C; c++)
        for (i = start; i < end; i++) {
            double d = eb[i + c * nb] - old_eb[i + c * nb];
            dist += d * d;
        }
    return dist < 200.0 ? dist : 200.0;
}

static double quant_coarse_energy_c(const CeltModeC *m, int start, int end,
                                    int eff_end, const double *eb,
                                    double *old_eb, int budget, double *error,
                                    ecenc *enc, int C, int LM,
                                    int nb_available_bytes, int force_intra,
                                    double delayed_intra, int two_pass,
                                    int loss_rate, int lfe) {
    int nb = m->nbEBands;
    int intra = force_intra
        || (!two_pass && delayed_intra > 2 * C * (end - start)
            && nb_available_bytes > (end - start) * C);
    int intra_bias = (int)((double)budget * delayed_intra * loss_rate
                           / (C * 512));
    double new_distortion = loss_distortion(eb, old_eb, start, eff_end, nb,
                                            C);
    int tell = ece_tell(enc);
    double max_decay = 16.0;
    double old_intra[2 * MAXB], error_intra[2 * MAXB];
    enc_snapshot start_state, intra_state;
    int badness1 = 0;
    if (tell + 3 > budget) two_pass = intra = 0;
    if (end - start > 10 && max_decay > .125 * nb_available_bytes)
        max_decay = .125 * nb_available_bytes;
    if (lfe) max_decay = 3.0;

    enc_save(enc, &start_state);
    memcpy(old_intra, old_eb, C * nb * sizeof(double));
    memset(error_intra, 0, sizeof(error_intra));
    if (two_pass || intra)
        badness1 = quant_coarse_impl(m, start, end, eb, old_intra, budget,
                                     tell, m->e_prob[LM][1], error_intra,
                                     enc, C, LM, 1, max_decay, lfe);
    if (!intra) {
        uint32_t tell_intra;
        int badness2;
        enc_save(enc, &intra_state);
        tell_intra = ece_tell_frac(enc);
        enc_restore(enc, &start_state);
        badness2 = quant_coarse_impl(m, start, end, eb, old_eb, budget,
                                     tell, m->e_prob[LM][0], error, enc, C,
                                     LM, 0, max_decay, lfe);
        if (two_pass
            && (badness1 < badness2
                || (badness1 == badness2
                    && (int)ece_tell_frac(enc) + intra_bias
                       > (int)tell_intra))) {
            enc_restore(enc, &intra_state);
            memcpy(old_eb, old_intra, C * nb * sizeof(double));
            memcpy(error, error_intra, C * nb * sizeof(double));
            intra = 1;
        }
    } else {
        memcpy(old_eb, old_intra, C * nb * sizeof(double));
        memcpy(error, error_intra, C * nb * sizeof(double));
    }
    if (intra) return new_distortion;
    return (PRED_COEF[LM] * PRED_COEF[LM]) * delayed_intra + new_distortion;
}

static void quant_fine_energy_c(const CeltModeC *m, int start, int end,
                                double *old_eb, double *error,
                                const int *fine_quant, ecenc *enc, int C) {
    int i, c;
    for (i = start; i < end; i++) {
        int extra;
        if (fine_quant[i] <= 0) continue;
        extra = 1 << fine_quant[i];
        if (ece_tell(enc) + C * fine_quant[i] > enc->storage * 8) continue;
        for (c = 0; c < C; c++) {
            int nb = m->nbEBands;
            int q2 = (int)floor((error[i + c * nb] + .5) * extra);
            double offset;
            if (q2 > extra - 1) q2 = extra - 1;
            if (q2 < 0) q2 = 0;
            ece_enc_bits(enc, q2, fine_quant[i]);
            offset = (q2 + .5) * (1 << (14 - fine_quant[i])) / 16384.0 - .5;
            old_eb[i + c * nb] += offset;
            error[i + c * nb] -= offset;
        }
    }
}

static void quant_energy_finalise_c(const CeltModeC *m, int start, int end,
                                    double *old_eb, double *error,
                                    const int *fine_quant,
                                    const int *fine_priority, int bits_left,
                                    ecenc *enc, int C) {
    int prio, i, c;
    for (prio = 0; prio < 2; prio++) {
        for (i = start; i < end && bits_left >= C; i++) {
            if (fine_quant[i] >= MAX_FINE_BITS || fine_priority[i] != prio)
                continue;
            for (c = 0; c < C; c++) {
                int nb = m->nbEBands;
                int q2 = error[i + c * nb] < 0 ? 0 : 1;
                double offset;
                ece_enc_bits(enc, q2, 1);
                offset = (q2 - .5) * (1 << (14 - fine_quant[i] - 1))
                         / 16384.0;
                old_eb[i + c * nb] += offset;
                error[i + c * nb] -= offset;
                bits_left--;
            }
        }
    }
}

/* ------------------------------------------------------------------ */
/* tf analysis + encode (opus_tpu/celt/encoder.py:304,386)             */

static double l1_metric(const double *tmp, int n, int lm, double bias) {
    double l1 = 0.0;
    int j;
    for (j = 0; j < n; j++) l1 += fabs(tmp[j]);
    return l1 + lm * bias * l1;
}

static int tf_analysis_c(const CeltModeC *m, int len, int is_transient,
                         int *tf_res, int lam, const double *x, int n0,
                         int LM, double tf_estimate, int tf_chan,
                         const int *importance) {
    double bias = .04 * ((.5 - tf_estimate) > -.25 ? (.5 - tf_estimate)
                                                   : -.25);
    int metric[MAXB];
    int i, k;
    int tf_select = 0;
    int selcost[2];
    int path0[MAXB], path1[MAXB];
    double cost0, cost1;
    for (i = 0; i < len; i++) {
        int n = (m->eBands[i + 1] - m->eBands[i]) << LM;
        int narrow = (m->eBands[i + 1] - m->eBands[i]) == 1;
        double tmp[176], tmp1[176];
        double best_l1;
        int best_level = 0;
        memcpy(tmp, x + tf_chan * n0 + (m->eBands[i] << LM),
               n * sizeof(double));
        best_l1 = l1_metric(tmp, n, is_transient ? LM : 0, bias);
        if (is_transient && !narrow) {
            double l1;
            memcpy(tmp1, tmp, n * sizeof(double));
            haar1(tmp1, n >> LM, 1 << LM);
            l1 = l1_metric(tmp1, n, LM + 1, bias);
            if (l1 < best_l1) {
                best_l1 = l1;
                best_level = -1;
            }
        }
        for (k = 0; k < LM + ((is_transient || narrow) ? 0 : 1); k++) {
            int bb = is_transient ? (LM - k - 1) : (k + 1);
            double l1;
            haar1(tmp, n >> k, 1 << k);
            l1 = l1_metric(tmp, n, bb, bias);
            if (l1 < best_l1) {
                best_l1 = l1;
                best_level = k + 1;
            }
        }
        metric[i] = is_transient ? 2 * best_level : -2 * best_level;
        if (narrow && (metric[i] == 0 || metric[i] == -2 * LM))
            metric[i] -= 1;
    }
    {
        int sel;
        for (sel = 0; sel < 2; sel++) {
            cost0 = importance[0]
                * abs(metric[0]
                      - 2 * TF_SELECT_TABLE[LM][4 * is_transient + 2 * sel]);
            cost1 = importance[0]
                * abs(metric[0]
                      - 2 * TF_SELECT_TABLE[LM][4 * is_transient + 2 * sel
                                                + 1])
                + (is_transient ? 0 : lam);
            for (i = 1; i < len; i++) {
                double curr0 = cost0 < cost1 + lam ? cost0 : cost1 + lam;
                double curr1 = cost0 + lam < cost1 ? cost0 + lam : cost1;
                cost0 = curr0 + importance[i]
                    * abs(metric[i]
                          - 2 * TF_SELECT_TABLE[LM][4 * is_transient
                                                    + 2 * sel]);
                cost1 = curr1 + importance[i]
                    * abs(metric[i]
                          - 2 * TF_SELECT_TABLE[LM][4 * is_transient
                                                    + 2 * sel + 1]);
            }
            selcost[sel] = (int)(cost0 < cost1 ? cost0 : cost1);
        }
    }
    if (selcost[1] < selcost[0] && is_transient) tf_select = 1;
    cost0 = importance[0]
        * abs(metric[0]
              - 2 * TF_SELECT_TABLE[LM][4 * is_transient + 2 * tf_select]);
    cost1 = importance[0]
        * abs(metric[0] - 2 * TF_SELECT_TABLE[LM][4 * is_transient
                                                  + 2 * tf_select + 1])
        + (is_transient ? 0 : lam);
    for (i = 1; i < len; i++) {
        double from0 = cost0, from1 = cost1 + lam;
        double curr0, curr1;
        if (from0 < from1) {
            curr0 = from0;
            path0[i] = 0;
        } else {
            curr0 = from1;
            path0[i] = 1;
        }
        from0 = cost0 + lam;
        from1 = cost1;
        if (from0 < from1) {
            curr1 = from0;
            path1[i] = 0;
        } else {
            curr1 = from1;
            path1[i] = 1;
        }
        cost0 = curr0 + importance[i]
            * abs(metric[i] - 2 * TF_SELECT_TABLE[LM][4 * is_transient
                                                      + 2 * tf_select]);
        cost1 = curr1 + importance[i]
            * abs(metric[i] - 2 * TF_SELECT_TABLE[LM][4 * is_transient
                                                      + 2 * tf_select + 1]);
    }
    tf_res[len - 1] = cost0 < cost1 ? 0 : 1;
    for (i = len - 2; i >= 0; i--)
        tf_res[i] = tf_res[i + 1] == 1 ? path1[i + 1] : path0[i + 1];
    return tf_select;
}

static void tf_encode_c(int start, int end, int is_transient, int *tf_res,
                        int LM, int tf_select, ecenc *enc) {
    int budget = enc->storage * 8;
    int tell = ece_tell(enc);
    int logp = is_transient ? 2 : 4;
    int tf_select_rsv = (LM > 0 && tell + logp + 1 <= budget) ? 1 : 0;
    int curr = 0, tf_changed = 0;
    int i;
    budget -= tf_select_rsv;
    for (i = start; i < end; i++) {
        if (tell + logp <= budget) {
            ece_enc_bit_logp(enc, tf_res[i] ^ curr, logp);
            tell = ece_tell(enc);
            curr = tf_res[i];
            tf_changed |= curr;
        } else {
            tf_res[i] = curr;
        }
        logp = is_transient ? 4 : 5;
    }
    if (tf_select_rsv
        && TF_SELECT_TABLE[LM][4 * is_transient + 0 + tf_changed]
           != TF_SELECT_TABLE[LM][4 * is_transient + 2 + tf_changed]) {
        ece_enc_bit_logp(enc, tf_select, 1);
    } else {
        tf_select = 0;
    }
    for (i = start; i < end; i++)
        tf_res[i] = TF_SELECT_TABLE[LM][4 * is_transient + 2 * tf_select
                                        + tf_res[i]];
}

/* ------------------------------------------------------------------ */
/* spreading decision (opus_tpu/celt/encoder.py:413; bands.c:470)      */

static int spreading_decision_c(const CeltModeC *m, const double *x,
                                int *average, int *hf_average,
                                int *tapset_decision, int last_decision,
                                int update_hf, int end, int C, int M,
                                const int *spread_weight) {
    int n0 = M * m->shortMdctSize;
    int sum = 0, nb_bands = 0, hf_sum = 0;
    int c, i, j;
    if (M * (m->eBands[end] - m->eBands[end - 1]) <= 8) return SPREAD_NONE;
    for (c = 0; c < C; c++) {
        for (i = 0; i < end; i++) {
            int n = M * (m->eBands[i + 1] - m->eBands[i]);
            int tcount0 = 0, tcount1 = 0, tcount2 = 0, tmp;
            const double *seg;
            if (n <= 8) continue;
            seg = x + M * m->eBands[i] + c * n0;
            for (j = 0; j < n; j++) {
                double x2n = seg[j] * seg[j] * n;
                if (x2n < .25) tcount0++;
                if (x2n < .0625) tcount1++;
                if (x2n < .015625) tcount2++;
            }
            if (i > m->nbEBands - 4) hf_sum += 32 * (tcount1 + tcount0) / n;
            tmp = (2 * tcount2 >= n) + (2 * tcount1 >= n)
                  + (2 * tcount0 >= n);
            sum += tmp * spread_weight[i];
            nb_bands += spread_weight[i];
        }
    }
    if (update_hf) {
        if (hf_sum) hf_sum /= C * (4 - m->nbEBands + end);
        *hf_average = (*hf_average + hf_sum) >> 1;
        hf_sum = *hf_average;
        if (*tapset_decision == 2) hf_sum += 4;
        else if (*tapset_decision == 0) hf_sum -= 4;
        if (hf_sum > 22) *tapset_decision = 2;
        else if (hf_sum > 18) *tapset_decision = 1;
        else *tapset_decision = 0;
    }
    sum = (sum << 8) / nb_bands;
    sum = (sum + *average) >> 1;
    *average = sum;
    sum = (3 * sum + (((3 - last_decision) << 7) + 64) + 2) >> 2;
    if (sum < 80) return SPREAD_AGGRESSIVE;
    if (sum < 256) return 2;   /* SPREAD_NORMAL */
    if (sum < 384) return 1;   /* SPREAD_LIGHT */
    return SPREAD_NONE;
}

/* ------------------------------------------------------------------ */
/* transient analysis (opus_tpu/celt/encoder.py:86; celt_encoder.c:267)*/

static const int INV_TABLE[128] = {
    255, 255, 156, 110, 86, 70, 59, 51, 45, 40, 37, 33, 31, 28, 26, 25,
    23, 22, 21, 20, 19, 18, 17, 16, 16, 15, 15, 14, 13, 13, 12, 12,
    12, 12, 11, 11, 11, 10, 10, 10, 9, 9, 9, 9, 9, 9, 8, 8,
    8, 8, 8, 7, 7, 7, 7, 7, 7, 6, 6, 6, 6, 6, 6, 6,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 2};

static int transient_analysis_c(const double *inp, int len, int CC,
                                int allow_weak, double tone_freq,
                                double toneishness, double *tf_estimate,
                                int *tf_chan, int *weak_transient) {
    double forward_decay = allow_weak ? .03125 : .0625;
    int len2 = len / 2;
    int mask_metric = 0;
    int c, i;
    int is_transient;
    double tf_max;
    *tf_chan = 0;
    *weak_transient = 0;
    for (c = 0; c < CC; c++) {
        const double *x = inp + c * len;
        double tmp[1920];
        double mem0 = 0.0, mem1 = 0.0, mean = 0.0, max_e = 0.0, norm;
        double t2[960];
        int unmask = 0;
        for (i = 0; i < len; i++) {
            double xi = x[i];
            double y = mem0 + xi;
            double mem00 = mem0;
            mem0 = mem0 - xi + .5 * mem1;
            mem1 = xi - mem00;
            tmp[i] = y;
        }
        for (i = 0; i < 12 && i < len; i++) tmp[i] = 0;
        mem0 = 0.0;
        for (i = 0; i < len2; i++) {
            double x2 = tmp[2 * i] * tmp[2 * i]
                        + tmp[2 * i + 1] * tmp[2 * i + 1];
            mean += x2;
            mem0 = x2 + (1. - forward_decay) * mem0;
            t2[i] = forward_decay * mem0;
        }
        mem0 = 0.0;
        for (i = len2 - 1; i >= 0; i--) {
            mem0 = t2[i] + 0.875 * mem0;
            t2[i] = 0.125 * mem0;
            if (0.125 * mem0 > max_e) max_e = 0.125 * mem0;
        }
        mean = sqrt(mean * max_e * .5 * len2);
        norm = len2 / (1e-15 + .5 * mean) / 2;
        for (i = 12; i < len2 - 5; i += 4) {
            double v = floor(64 * norm * (t2[i] + 1e-15));
            int idx = v < 0 ? 0 : (v > 127 ? 127 : (int)v);
            unmask += INV_TABLE[idx];
        }
        unmask = 64 * unmask * 4 / (6 * (len2 - 17));
        if (unmask > mask_metric) {
            *tf_chan = c;
            mask_metric = unmask;
        }
    }
    is_transient = mask_metric > 200;
    if (toneishness > .98 && tone_freq < 0.026) {
        is_transient = 0;
        mask_metric = 0;
    }
    if (allow_weak && is_transient && mask_metric < 600) {
        is_transient = 0;
        *weak_transient = 1;
    }
    tf_max = sqrt(27 * (double)mask_metric) - 42;
    if (tf_max < 0) tf_max = 0;
    {
        double v = .0069 * (tf_max < 163. ? tf_max : 163.) - .139;
        *tf_estimate = sqrt(v > 0 ? v : 0);
    }
    return is_transient;
}

static int patch_transient_decision_c(const double *new_e,
                                      const double *old_e, int nb, int start,
                                      int end, int C) {
    double spread_old[26];
    double mean_diff = 0.0;
    int i, c;
    if (C == 1) {
        spread_old[start] = old_e[start];
        for (i = start + 1; i < end; i++)
            spread_old[i] = spread_old[i - 1] - 1.0 > old_e[i]
                ? spread_old[i - 1] - 1.0 : old_e[i];
    } else {
        spread_old[start] = old_e[start] > old_e[start + nb]
            ? old_e[start] : old_e[start + nb];
        for (i = start + 1; i < end; i++) {
            double mx = old_e[i] > old_e[i + nb] ? old_e[i] : old_e[i + nb];
            spread_old[i] = spread_old[i - 1] - 1.0 > mx
                ? spread_old[i - 1] - 1.0 : mx;
        }
    }
    for (i = end - 2; i >= start; i--)
        if (spread_old[i + 1] - 1.0 > spread_old[i])
            spread_old[i] = spread_old[i + 1] - 1.0;
    for (c = 0; c < C; c++) {
        int st = start > 2 ? start : 2;
        for (i = st; i < end - 1; i++) {
            double x1 = new_e[i + c * nb] > 0 ? new_e[i + c * nb] : 0.0;
            double x2 = spread_old[i] > 0 ? spread_old[i] : 0.0;
            mean_diff += x1 - x2 > 0 ? x1 - x2 : 0.0;
        }
    }
    mean_diff /= C * (end - 1 - (start > 2 ? start : 2));
    return mean_diff > 1.0;
}

/* ------------------------------------------------------------------ */
/* dynalloc analysis (opus_tpu/celt/encoder.py:1531)                   */

static double median5(const double *x) {
    double v[5];
    int i, j;
    memcpy(v, x, sizeof(v));
    for (i = 1; i < 5; i++)
        for (j = i; j > 0 && v[j] < v[j - 1]; j--) {
            double t = v[j];
            v[j] = v[j - 1];
            v[j - 1] = t;
        }
    return v[2];
}

static double median3(const double *x) {
    double a = x[0], b = x[1], c = x[2];
    if (a > b) { double t = a; a = b; b = t; }
    if (b > c) { b = c; }
    return a > b ? a : b;
}

static double E_MEANS_C[MAXB];

void celt_enc_set_emeans(const double *e, int n) {
    int i;
    for (i = 0; i < n && i < MAXB; i++) E_MEANS_C[i] = e[i];
}

static double dynalloc_analysis_c(
        const CeltModeC *m, const double *band_log_e,
        const double *band_log_e2, const double *old_band_e, int nbE,
        int start, int end, int C, int *offsets, int lsb_depth,
        int is_transient, int vbr, int constrained_vbr, int LM,
        int effective_bytes, int *tot_boost_out, int *importance,
        int *spread_weight, double tone_freq, double toneishness, int lfe) {
    double follower[2 * MAXB];
    double noise_floor[MAXB];
    double max_depth = -31.9;
    int tot_boost = 0;
    int i, c;
    memset(follower, 0, sizeof(follower));
    for (i = 0; i < end; i++)
        noise_floor[i] = 0.0625 * m->logN[i] + .5 + (9 - lsb_depth)
            - E_MEANS_C[i] + .0062 * (i + 5) * (i + 5);
    for (c = 0; c < C; c++)
        for (i = 0; i < end; i++)
            if (band_log_e[c * nbE + i] - noise_floor[i] > max_depth)
                max_depth = band_log_e[c * nbE + i] - noise_floor[i];
    {
        double mask[MAXB], sig[MAXB];
        for (i = 0; i < end; i++)
            mask[i] = band_log_e[i] - noise_floor[i];
        if (C == 2)
            for (i = 0; i < end; i++)
                if (band_log_e[nbE + i] - noise_floor[i] > mask[i])
                    mask[i] = band_log_e[nbE + i] - noise_floor[i];
        memcpy(sig, mask, end * sizeof(double));
        for (i = 1; i < end; i++)
            if (mask[i - 1] - 2.0 > mask[i]) mask[i] = mask[i - 1] - 2.0;
        for (i = end - 2; i >= 0; i--)
            if (mask[i + 1] - 3.0 > mask[i]) mask[i] = mask[i + 1] - 3.0;
        for (i = 0; i < end; i++) {
            double floor12 = max_depth - 12.0 > 0 ? max_depth - 12.0 : 0.0;
            double smr = sig[i] - (floor12 > mask[i] ? floor12 : mask[i]);
            int ismr = -(int)floor(.5 + smr);
            int shift = ismr < 0 ? 0 : (ismr > 5 ? 5 : ismr);
            spread_weight[i] = 32 >> shift;
        }
    }
    if (effective_bytes >= 30 + 5 * LM && !lfe) {
        int last = 0;
        for (c = 0; c < C; c++) {
            double band_log_e3[MAXB];
            double *f = follower + c * nbE;
            double tmp, offset;
            memcpy(band_log_e3, band_log_e2 + c * nbE,
                   end * sizeof(double));
            if (LM == 0)
                for (i = 0; i < (end < 8 ? end : 8); i++)
                    if (old_band_e[c * nbE + i] > band_log_e3[i])
                        band_log_e3[i] = old_band_e[c * nbE + i];
            f[0] = band_log_e3[0];
            for (i = 1; i < end; i++) {
                if (band_log_e3[i] > band_log_e3[i - 1] + .5) last = i;
                f[i] = f[i - 1] + 1.5 < band_log_e3[i]
                    ? f[i - 1] + 1.5 : band_log_e3[i];
            }
            for (i = last - 1; i >= 0; i--) {
                double v = f[i + 1] + 2.0 < band_log_e3[i]
                    ? f[i + 1] + 2.0 : band_log_e3[i];
                if (v < f[i]) f[i] = v;
            }
            offset = 1.0;
            for (i = 2; i < end - 2; i++) {
                double v = median5(band_log_e3 + i - 2) - offset;
                if (v > f[i]) f[i] = v;
            }
            tmp = median3(band_log_e3) - offset;
            if (tmp > f[0]) f[0] = tmp;
            if (tmp > f[1]) f[1] = tmp;
            tmp = median3(band_log_e3 + end - 3) - offset;
            if (tmp > f[end - 2]) f[end - 2] = tmp;
            if (tmp > f[end - 1]) f[end - 1] = tmp;
            for (i = 0; i < end; i++)
                if (noise_floor[i] > f[i]) f[i] = noise_floor[i];
        }
        if (C == 2) {
            for (i = start; i < end; i++) {
                if (follower[i] - 4.0 > follower[nbE + i])
                    follower[nbE + i] = follower[i] - 4.0;
                if (follower[nbE + i] - 4.0 > follower[i])
                    follower[i] = follower[nbE + i] - 4.0;
                {
                    double a = band_log_e[i] - follower[i];
                    double b = band_log_e[nbE + i] - follower[nbE + i];
                    follower[i] = .5 * ((a > 0 ? a : 0) + (b > 0 ? b : 0));
                }
            }
        } else {
            for (i = start; i < end; i++) {
                double a = band_log_e[i] - follower[i];
                follower[i] = a > 0 ? a : 0;
            }
        }
        /* surround_dynalloc is all-zero in the mono batched path */
        for (i = start; i < end; i++)
            importance[i] = (int)floor(
                .5 + 13 * exp2(follower[i] < 4.0 ? follower[i] : 4.0));
        if ((!vbr || constrained_vbr) && !is_transient)
            for (i = start; i < end; i++)
                follower[i] = .5 * follower[i];
        for (i = start; i < end; i++) {
            if (i < 8) follower[i] *= 2;
            if (i >= 12) follower[i] = .5 * follower[i];
        }
        if (toneishness > .98 && tone_freq >= 0) {
            int freq_bin = (int)floor(.5 + tone_freq * 120 / M_PI);
            for (i = start; i < end; i++) {
                if (m->eBands[i] <= freq_bin
                    && freq_bin <= m->eBands[i + 1]) follower[i] += 2.0;
                if (m->eBands[i] - 1 <= freq_bin
                    && freq_bin <= m->eBands[i + 1] + 1) follower[i] += 1.0;
                if (m->eBands[i] - 2 <= freq_bin
                    && freq_bin <= m->eBands[i + 1] + 2) follower[i] += 1.0;
                if (m->eBands[i] - 3 <= freq_bin
                    && freq_bin <= m->eBands[i + 1] + 3) follower[i] += .5;
            }
            if (freq_bin >= m->eBands[end]) {
                follower[end - 1] += 2.0;
                follower[end - 2] += 1.0;
            }
        }
        if (effective_bytes > 320) {
            double v = 1e-3 * (effective_bytes - 320);
            follower[0] += v < 1.5 ? v : 1.5;
        }
        for (i = start; i < end; i++) {
            int width, boost, boost_bits;
            if (follower[i] > 4.0) follower[i] = 4.0;
            width = C * (m->eBands[i + 1] - m->eBands[i]) << LM;
            if (width < 6) {
                boost = (int)follower[i];
                boost_bits = boost * width << BITRES;
            } else if (width > 48) {
                boost = (int)(follower[i] * 8);
                boost_bits = (boost * width << BITRES) / 8;
            } else {
                boost = (int)(follower[i] * width / 6);
                boost_bits = boost * 6 << BITRES;
            }
            if ((!vbr || (constrained_vbr && !is_transient))
                && ((tot_boost + boost_bits) >> BITRES >> 3)
                   > 2 * effective_bytes / 3) {
                int capv = (2 * effective_bytes / 3) << BITRES << 3;
                offsets[i] = capv - tot_boost;
                tot_boost = capv;
                break;
            } else {
                offsets[i] = boost;
                tot_boost += boost_bits;
            }
        }
    } else {
        for (i = start; i < end; i++) importance[i] = 13;
    }
    *tot_boost_out = tot_boost;
    return max_depth;
}

/* ------------------------------------------------------------------ */
/* alloc trim (opus_tpu/celt/encoder.py:489, mono path)                */

static int alloc_trim_analysis_c(const CeltModeC *m, const double *x,
                                 const double *band_log_e, int end, int LM,
                                 int C, int n0, double tf_estimate,
                                 double surround_trim, int equiv_rate) {
    double trim = 5.0;
    double diff = 0.0;
    int c, i, trim_index;
    (void)x;
    (void)n0;
    if (equiv_rate < 64000) {
        trim = 4.0;
    } else if (equiv_rate < 80000) {
        int frac = (equiv_rate - 64000) >> 10;
        trim = 4.0 + (1.0 / 16) * frac;
    }
    /* C == 2 stereo correlation terms omitted: mono batched path */
    for (c = 0; c < C; c++)
        for (i = 0; i < end - 1; i++)
            diff += band_log_e[i + c * m->nbEBands] * (2 + 2 * i - end);
    diff /= C * (end - 1);
    {
        double v = (diff + 1.0) / 6;
        if (v > 2.0) v = 2.0;
        if (v < -2.0) v = -2.0;
        trim -= v;
    }
    trim -= surround_trim;
    trim -= 2 * tf_estimate;
    trim_index = (int)floor(.5 + trim);
    if (trim_index < 0) trim_index = 0;
    if (trim_index > 10) trim_index = 10;
    return trim_index;
}

/* ------------------------------------------------------------------ */
/* band quantization, encode direction (opus_tpu/celt/bands.py;        */
/* bands.c:700,973,1245,1589)                                          */

typedef struct {
    const CeltModeC *m;
    int i;
    int intensity;
    int spread;
    int tf_change;
    ecenc *ec;
    int remaining_bits;
    uint32_t seed;
    int avoid_split_noise;
} encbandctx;

typedef struct {
    int imid, iside, delta, itheta, qalloc;
} encsplitctx;

static int stereo_itheta_mono(const double *x, const double *y, int n) {
    double emid = EPSILON, eside = EPSILON;
    int j;
    for (j = 0; j < n; j++) {
        emid += x[j] * x[j];
        eside += y[j] * y[j];
    }
    return (int)floor(0.5 + 16384 * 0.63662 * atan2(sqrt(eside),
                                                    sqrt(emid)));
}

static int compute_theta_enc(encbandctx *ctx, encsplitctx *sctx, double *x,
                             double *y, int n, int *b, int bb, int b0,
                             int lm, int fill_unused) {
    int itheta;
    const CeltModeC *m = ctx->m;
    int i = ctx->i;
    ecenc *ec = ctx->ec;
    int pulse_cap = m->logN[i] + lm * (1 << BITRES);
    int offset = (pulse_cap >> 1) - QTHETA_OFFSET;
    int qn = compute_qn(n, *b, offset, pulse_cap, 0);
    uint32_t tell;
    int qalloc, imid, iside, delta;
    (void)fill_unused;
    itheta = stereo_itheta_mono(x, y, n);
    tell = ece_tell_frac(ec);
    if (qn != 1) {
        itheta = (itheta * qn + 8192) >> 14;
        if (ctx->avoid_split_noise && itheta > 0 && itheta < qn) {
            int unquantized = (itheta * 16384) / qn;
            int im = bitexact_cos(unquantized);
            int is = bitexact_cos(16384 - unquantized);
            int dlt = frac_mul16((n - 1) << 7, bitexact_log2tan(is, im));
            if (dlt > *b) itheta = qn;
            else if (dlt < -*b) itheta = 0;
        }
        if (b0 > 1) {
            ece_enc_uint(ec, itheta, qn + 1);
        } else {
            /* triangular pdf */
            uint32_t ft = ((qn >> 1) + 1) * ((qn >> 1) + 1);
            uint32_t fs, fl;
            if (itheta <= (qn >> 1)) {
                fs = itheta + 1;
                fl = itheta * (itheta + 1) >> 1;
            } else {
                fs = qn + 1 - itheta;
                fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1);
            }
            ece_encode(ec, fl, fl + fs, ft);
        }
        itheta = itheta * 16384 / qn;
    } else {
        itheta = 0;
    }
    qalloc = (int)(ece_tell_frac(ec) - tell);
    *b -= qalloc;
    if (itheta == 0) {
        imid = 32767;
        iside = 0;
        delta = -16384;
    } else if (itheta == 16384) {
        imid = 0;
        iside = 32767;
        delta = 16384;
    } else {
        imid = bitexact_cos(itheta);
        iside = bitexact_cos(16384 - itheta);
        delta = frac_mul16((n - 1) << 7, bitexact_log2tan(iside, imid));
    }
    sctx->imid = imid;
    sctx->iside = iside;
    sctx->delta = delta;
    sctx->itheta = itheta;
    sctx->qalloc = qalloc;
    return 0;
}

static int quant_band_n1_enc(encbandctx *ctx, double *x) {
    if (ctx->remaining_bits >= 1 << BITRES) {
        int sign = x[0] < 0 ? 1 : 0;
        ece_enc_bits(ctx->ec, sign, 1);
        ctx->remaining_bits -= 1 << BITRES;
    }
    return 1;
}

static int quant_partition_enc(encbandctx *ctx, double *x, int n, int b,
                               int bb, int lm) {
    const CeltModeC *m = ctx->m;
    int i = ctx->i;
    int b0 = bb;
    int cm = 0;
    int cache_off = m->cache_index[(lm + 1) * m->nbEBands + i];
    const uint8_t *cache = m->cache_bits + cache_off;
    if (lm != -1 && b > (int)cache[cache[0]] + 12 && n > 2) {
        double *y;
        encsplitctx sctx;
        int mbits, sbits, rebalance, itheta, delta;
        n >>= 1;
        y = x + n;
        lm -= 1;
        bb = (bb + 1) >> 1;
        compute_theta_enc(ctx, &sctx, x, y, n, &b, bb, b0, lm, 0);
        itheta = sctx.itheta;
        delta = sctx.delta;
        if (b0 > 1 && (itheta & 0x3fff)) {
            if (itheta > 8192)
                delta -= delta >> (4 - lm);
            else {
                int v = delta + (n << BITRES >> (5 - lm));
                delta = v < 0 ? v : 0;
            }
        }
        mbits = (b - delta) / 2;
        if (mbits > b) mbits = b;
        if (mbits < 0) mbits = 0;
        sbits = b - mbits;
        ctx->remaining_bits -= sctx.qalloc;
        rebalance = ctx->remaining_bits;
        if (mbits >= sbits) {
            cm = quant_partition_enc(ctx, x, n, mbits, bb, lm);
            rebalance = mbits - (rebalance - ctx->remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 0)
                sbits += rebalance - (3 << BITRES);
            cm |= quant_partition_enc(ctx, y, n, sbits, bb, lm)
                  << (b0 >> 1);
        } else {
            cm = quant_partition_enc(ctx, y, n, sbits, bb, lm)
                 << (b0 >> 1);
            rebalance = sbits - (rebalance - ctx->remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 16384)
                mbits += rebalance - (3 << BITRES);
            cm |= quant_partition_enc(ctx, x, n, mbits, bb, lm);
        }
    } else {
        int q = bits2pulses(m, i, lm, b);
        int curr_bits = pulses2bits(m, i, lm, q);
        ctx->remaining_bits -= curr_bits;
        while (ctx->remaining_bits < 0 && q > 0) {
            ctx->remaining_bits += curr_bits;
            q--;
            curr_bits = pulses2bits(m, i, lm, q);
            ctx->remaining_bits -= curr_bits;
        }
        if (q != 0) {
            int k = get_pulses(q);
            cm = alg_quant_c(x, n, k, ctx->spread, bb, ctx->ec);
        }
        /* q == 0: encoder codes nothing (noise fill is decoder-side) */
    }
    return cm;
}

static int quant_band_enc(encbandctx *ctx, double *x, int n, int b, int bb,
                          int lm) {
    int n0 = n;
    int n_b = n;
    int b0 = bb;
    int time_divide = 0;
    int recombine = 0;
    int longblocks = b0 == 1;
    int k, cm;
    int tf_change = ctx->tf_change;
    n_b /= bb;
    if (n == 1) return quant_band_n1_enc(ctx, x);
    if (tf_change > 0) recombine = tf_change;
    for (k = 0; k < recombine; k++)
        haar1(x, n >> k, 1 << k);
    bb >>= recombine;
    n_b <<= recombine;
    while ((n_b & 1) == 0 && tf_change < 0) {
        haar1(x, n_b, bb);
        bb <<= 1;
        n_b >>= 1;
        time_divide++;
        tf_change++;
    }
    b0 = bb;
    if (b0 > 1) {
        double scratch[176];
        deinterleave_hadamard(x, n_b >> recombine, b0 << recombine,
                              longblocks, scratch);
    }
    cm = quant_partition_enc(ctx, x, n, b, bb, lm);
    (void)n0;
    (void)time_divide;
    return cm;
}

static uint32_t quant_all_bands_enc(const CeltModeC *m, int start, int end,
                                    double *x_, const int *pulses,
                                    int shortBlocks, int spread,
                                    int intensity, const int *tf_res,
                                    int total_bits, int balance, ecenc *ec,
                                    int LM, int coded_bands, uint32_t seed) {
    const int16_t *eBands = m->eBands;
    int M = 1 << LM;
    int B = shortBlocks ? M : 1;
    int i;
    encbandctx ctx;
    ctx.m = m;
    ctx.intensity = intensity;
    ctx.spread = spread;
    ctx.ec = ec;
    ctx.seed = seed;
    ctx.avoid_split_noise = B > 1;
    for (i = start; i < end; i++) {
        int32_t tell;
        int b, n;
        int curr_balance;
        ctx.i = i;
        n = M * eBands[i + 1] - M * eBands[i];
        tell = (int32_t)ece_tell_frac(ec);
        if (i != start) balance -= tell;
        ctx.remaining_bits = total_bits - tell - 1;
        if (i <= coded_bands - 1) {
            int cb = coded_bands - i;
            curr_balance = balance / (cb < 3 ? cb : 3);
            b = ctx.remaining_bits + 1 < pulses[i] + curr_balance
                ? ctx.remaining_bits + 1 : pulses[i] + curr_balance;
            if (b > 16383) b = 16383;
            if (b < 0) b = 0;
        } else {
            b = 0;
        }
        ctx.tf_change = tf_res[i];
        quant_band_enc(&ctx, x_ + M * eBands[i], n, b, B, LM);
        balance += pulses[i] + tell;
        ctx.avoid_split_noise = 0;
    }
    return ctx.seed;
}

/* ------------------------------------------------------------------ */
/* per-stream encoder state (ctypes mirror in celt_enc_symbols.py)     */

typedef struct {
    double preemph_mem;
    double overlap_max;
    double delayed_intra;
    double spec_avg;
    double oldBandE[MAXB];
    double oldLogE[MAXB];
    double oldLogE2[MAXB];
    double energyError[MAXB];
    int32_t tonal_average;
    int32_t hf_average;
    int32_t tapset_decision;
    int32_t spread_decision;
    int32_t consec_transient;
    int32_t lastCodedBands;
    uint32_t rng;
    int32_t complexity;
    int32_t lsb_depth;
} celt_encstate;

void celt_enc_state_init(celt_encstate *st) {
    int i;
    memset(st, 0, sizeof(*st));
    st->spread_decision = 2;   /* SPREAD_NORMAL */
    st->tonal_average = 256;
    st->complexity = 5;
    st->lsb_depth = 24;
    st->delayed_intra = 1.0;
    for (i = 0; i < MAXB; i++) {
        st->oldBandE[i] = 0.0;
        st->oldLogE[i] = -28.0;
        st->oldLogE2[i] = -28.0;
    }
}

int32_t celt_enc_state_size(void) { return (int32_t)sizeof(celt_encstate); }

/* ------------------------------------------------------------------ */
/* the encoder driver (celt_encode_with_ec, restricted mono/CBR path)  */

int32_t celt_encode_symbols(const void *mode, celt_encstate *st,
                            const double *pcm,        /* [N] in [-1,1] */
                            const double *x_l,        /* [N] long-MDCT X */
                            const double *x_s,        /* [N] short-MDCT X */
                            const double *band_log_e_l,   /* [nbE] */
                            const double *band_log_e_s,   /* [nbE] */
                            int32_t LM, int32_t nbytes,
                            unsigned char *payload, uint32_t *rng_out) {
    const CeltModeC *m = (const CeltModeC *)mode;
    int nbE = m->nbEBands;
    int overlap = m->overlap;
    int start = 0, end = nbE, eff_end = end < m->effEBands ? end
                                                           : m->effEBands;
    int C = 1;
    int N = m->shortMdctSize << LM;
    int M = 1 << LM;
    ecenc enc;
    int tell, total_bits, nb_available_bytes, effective_bytes, equiv_rate;
    int silence = 0, is_transient = 0, short_blocks = 0, weak_transient = 0;
    int transient_got_disabled = 0, tf_chan = 0;
    double tf_estimate = 0.0;
    double tone_freq = -1.0, toneishness = 0.0;
    double inp[2048];
    double band_log_e[MAXB], band_log_e2[MAXB], error[MAXB];
    double sample_max, max_depth, temporal_vbr;
    const double *x_sel;
    int offsets[MAXB], importance[MAXB], spread_weight[MAXB];
    int tf_res[MAXB], cap[MAXB];
    int pulses[MAXB], fine_quant[MAXB], fine_priority[MAXB];
    int tot_boost = 0, alloc_trim = 5, dual_stereo = 0, intensity = 0;
    int anti_collapse_rsv, coded_bands, balance, tf_select = 0;
    int enable_tf_analysis, i;
    double X[1920];

    if (nbytes < 2 || nbytes > 1275) return -1;
    pthread_once(&u_once, build_u_table);
    ece_init(&enc, payload, nbytes);
    tell = 1;
    nb_available_bytes = nbytes;
    effective_bytes = nbytes;
    total_bits = nbytes * 8;
    equiv_rate = (nbytes * 8 * 50 << (3 - LM))
        - (40 * C + 20) * ((400 >> LM) - 50);

    /* --- preemphasis (celt_preemphasis celt_encoder.c:557) --- */
    {
        double mem = st->preemph_mem;
        for (i = 0; i < N; i++) {
            double x = pcm[i] * 32768.0;   /* CELT_SIG_SCALE */
            inp[overlap + i] = x - mem;
            mem = .85 * x;                 /* preemph coef at 48 kHz */
        }
        st->preemph_mem = mem;
    }

    /* --- silence detection (celt_encoder.c:1768) --- */
    {
        double head_max = 0.0, tail_max = 0.0;
        int nhead = N - overlap;
        for (i = 0; i < nhead; i++)
            if (fabs(pcm[i]) > head_max) head_max = fabs(pcm[i]);
        for (i = nhead; i < N; i++)
            if (fabs(pcm[i]) > tail_max) tail_max = fabs(pcm[i]);
        sample_max = st->overlap_max > head_max ? st->overlap_max
                                                : head_max;
        st->overlap_max = tail_max;
        if (tail_max > sample_max) sample_max = tail_max;
        silence = sample_max <= 1.0 / (1 << st->lsb_depth);
    }
    ece_enc_bit_logp(&enc, silence ? 1 : 0, 15);
    if (silence) {
        tell = nbytes * 8;
        enc.nbits_total += tell - ece_tell(&enc);
    }

    /* --- transient analysis (tone detection off in this path) --- */
    if (st->complexity >= 1)
        is_transient = transient_analysis_c(inp + overlap, N, C, 0,
                                            tone_freq, toneishness,
                                            &tf_estimate, &tf_chan,
                                            &weak_transient);
    if (toneishness > 1.0 - tf_estimate) toneishness = 1.0 - tf_estimate;

    /* --- prefilter disabled: code the off bit (celt_encoder.c:1832) --- */
    tell = silence ? nbytes * 8 : 1;
    if (tell + 16 <= total_bits)
        ece_enc_bit_logp(&enc, 0, 1);

    if (LM > 0 && ece_tell(&enc) + 3 <= total_bits) {
        if (is_transient) short_blocks = M;
    } else {
        is_transient = 0;
        transient_got_disabled = 1;
    }

    /* --- select the MDCT variant computed on the TPU
     * (compute_mdcts celt_encoder.c:511; second_mdct :1916) --- */
    {
        int second_mdct = short_blocks && st->complexity >= 8;
        if (second_mdct)
            for (i = 0; i < nbE; i++)
                band_log_e2[i] = band_log_e_l[i] + .5 * LM;
        memcpy(band_log_e, short_blocks ? band_log_e_s : band_log_e_l,
               nbE * sizeof(double));
        if (!second_mdct)
            memcpy(band_log_e2, band_log_e, nbE * sizeof(double));
        x_sel = short_blocks ? x_s : x_l;
    }

    /* --- temporal VBR state (tracked for parity; CBR ignores it) --- */
    {
        double follow = -10.0, frame_avg = 0.0;
        double off = short_blocks ? .5 * LM : 0.0;
        for (i = start; i < end; i++) {
            double v = band_log_e[i] - off;
            follow = follow - 1.0 > v ? follow - 1.0 : v;
            frame_avg += follow;
        }
        frame_avg /= end - start;
        temporal_vbr = frame_avg - st->spec_avg;
        if (temporal_vbr > 3.0) temporal_vbr = 3.0;
        if (temporal_vbr < -1.5) temporal_vbr = -1.5;
        st->spec_avg += .02 * temporal_vbr;
    }

    /* --- patch transient decision (celt_encoder.c:2012) --- */
    if (LM > 0 && ece_tell(&enc) + 3 <= total_bits && !is_transient
        && st->complexity >= 5) {
        if (patch_transient_decision_c(band_log_e, st->oldBandE, nbE,
                                       start, end, C)) {
            /* recompute with short blocks; band_log_e2 keeps the long-MDCT
             * energies shifted by .5*LM (celt_encoder.c:2012-2026) */
            is_transient = 1;
            short_blocks = M;
            memcpy(band_log_e, band_log_e_s, nbE * sizeof(double));
            for (i = 0; i < nbE; i++) band_log_e2[i] += .5 * LM;
            x_sel = x_s;
            tf_estimate = .2;
        }
    }
    if (LM > 0 && ece_tell(&enc) + 3 <= total_bits)
        ece_enc_bit_logp(&enc, is_transient, 3);

    memcpy(X, x_sel, N * sizeof(double));

    enable_tf_analysis = effective_bytes >= 15 * C && st->complexity >= 2
        && toneishness < .98;

    memset(offsets, 0, sizeof(offsets));
    memset(importance, 0, sizeof(importance));
    memset(spread_weight, 0, sizeof(spread_weight));
    max_depth = dynalloc_analysis_c(m, band_log_e, band_log_e2,
                                    st->oldBandE, nbE, start, end, C,
                                    offsets, st->lsb_depth, is_transient,
                                    0, 0, LM, effective_bytes, &tot_boost,
                                    importance, spread_weight, tone_freq,
                                    toneishness, 0);
    (void)max_depth;

    memset(tf_res, 0, sizeof(tf_res));
    if (enable_tf_analysis) {
        int lam = 20480 / effective_bytes + 2;
        if (lam < 80) lam = 80;
        tf_select = tf_analysis_c(m, eff_end, is_transient, tf_res, lam, X,
                                  N, LM, tf_estimate, tf_chan, importance);
        for (i = eff_end; i < end; i++) tf_res[i] = tf_res[eff_end - 1];
    } else {
        for (i = 0; i < end; i++) tf_res[i] = is_transient;
        tf_select = 0;
    }

    /* --- energy-error feedback + coarse quantization --- */
    for (i = start; i < end; i++)
        if (fabs(band_log_e[i] - st->oldBandE[i]) < 2.0)
            band_log_e[i] -= .25 * st->energyError[i];
    memset(error, 0, sizeof(error));
    st->delayed_intra = quant_coarse_energy_c(
        m, start, end, eff_end, band_log_e, st->oldBandE, total_bits,
        error, &enc, C, LM, nb_available_bytes, 0, st->delayed_intra,
        st->complexity >= 4, 0, 0);

    tf_encode_c(start, end, is_transient, tf_res, LM, tf_select, &enc);

    if (ece_tell(&enc) + 4 <= total_bits) {
        if (short_blocks || st->complexity < 3
            || nb_available_bytes < 10 * C) {
            st->spread_decision = st->complexity == 0 ? SPREAD_NONE : 2;
        } else {
            st->spread_decision = spreading_decision_c(
                m, X, &st->tonal_average, &st->hf_average,
                &st->tapset_decision, st->spread_decision,
                0 /* pf_on && !short_blocks */, eff_end, C, M,
                spread_weight);
        }
        ece_enc_icdf(&enc, st->spread_decision, SPREAD_ICDF, 5);
    } else {
        st->spread_decision = 2;   /* SPREAD_NORMAL */
    }

    init_caps(m, cap, LM, C);

    /* --- dynalloc boost encoding (celt_encoder.c:2235) --- */
    {
        int dynalloc_logp = 6;
        int total_bits_q3 = total_bits << BITRES;
        int total_boost = 0;
        uint32_t tell_frac = ece_tell_frac(&enc);
        for (i = start; i < end; i++) {
            int width = C * (m->eBands[i + 1] - m->eBands[i]) << LM;
            int mx = 6 << BITRES > width ? 6 << BITRES : width;
            int quanta = (width << BITRES) < mx ? width << BITRES : mx;
            int dynalloc_loop_logp = dynalloc_logp;
            int boost = 0;
            int j = 0;
            while ((int)tell_frac + (dynalloc_loop_logp << BITRES)
                       < total_bits_q3 - total_boost
                   && boost < cap[i]) {
                int flag = j < offsets[i] ? 1 : 0;
                ece_enc_bit_logp(&enc, flag, dynalloc_loop_logp);
                tell_frac = ece_tell_frac(&enc);
                if (!flag) break;
                boost += quanta;
                total_boost += quanta;
                dynalloc_loop_logp = 1;
                j++;
            }
            if (j) dynalloc_logp = dynalloc_logp - 1 > 2
                ? dynalloc_logp - 1 : 2;
            offsets[i] = boost;
        }

        /* --- trim --- */
        alloc_trim = 5;
        if ((int)tell_frac + (6 << BITRES) <= total_bits_q3 - total_boost) {
            alloc_trim = alloc_trim_analysis_c(m, X, band_log_e, end, LM, C,
                                               N, tf_estimate, 0.0,
                                               equiv_rate);
            ece_enc_icdf(&enc, alloc_trim, TRIM_ICDF, 7);
            tell_frac = ece_tell_frac(&enc);
        }
    }

    /* --- allocation --- */
    {
        int bits = (nbytes * 8 << BITRES) - (int)ece_tell_frac(&enc) - 1;
        int signal_bandwidth = end - 1;
        anti_collapse_rsv = (is_transient && LM >= 2
                             && bits >= ((LM + 2) << BITRES))
            ? 1 << BITRES : 0;
        bits -= anti_collapse_rsv;
        coded_bands = compute_allocation(m, start, end, offsets, cap,
                                         alloc_trim, &intensity,
                                         &dual_stereo, bits, &balance,
                                         pulses, fine_quant, fine_priority,
                                         C, LM, NULL, &enc, 1,
                                         st->lastCodedBands,
                                         signal_bandwidth);
        if (st->lastCodedBands) {
            int lo = st->lastCodedBands - 1, hi = st->lastCodedBands + 1;
            int v = coded_bands < lo ? lo : coded_bands;
            st->lastCodedBands = v > hi ? hi : v;
        } else {
            st->lastCodedBands = coded_bands;
        }
    }

    quant_fine_energy_c(m, start, end, st->oldBandE, error, fine_quant,
                        &enc, C);
    memset(st->energyError, 0, sizeof(st->energyError));

    /* --- band shapes --- */
    st->rng = quant_all_bands_enc(m, start, end, X, pulses, short_blocks,
                                  st->spread_decision, intensity, tf_res,
                                  nbytes * (8 << BITRES)
                                      - anti_collapse_rsv,
                                  balance, &enc, LM, coded_bands, st->rng);

    if (anti_collapse_rsv > 0) {
        int anti_collapse_on = st->consec_transient < 2 ? 1 : 0;
        ece_enc_bits(&enc, anti_collapse_on, 1);
    }
    quant_energy_finalise_c(m, start, end, st->oldBandE, error, fine_quant,
                            fine_priority, nbytes * 8 - ece_tell(&enc),
                            &enc, C);
    for (i = start; i < end; i++) {
        double e = error[i];
        if (e > 0.5) e = 0.5;
        if (e < -0.5) e = -0.5;
        st->energyError[i] = e;
    }

    if (silence)
        for (i = 0; i < nbE; i++) st->oldBandE[i] = -28.0;
    if (!is_transient) {
        memcpy(st->oldLogE2, st->oldLogE, nbE * sizeof(double));
        memcpy(st->oldLogE, st->oldBandE, nbE * sizeof(double));
    } else {
        for (i = 0; i < nbE; i++)
            if (st->oldBandE[i] < st->oldLogE[i])
                st->oldLogE[i] = st->oldBandE[i];
    }
    if (is_transient || transient_got_disabled)
        st->consec_transient++;
    else
        st->consec_transient = 0;
    st->rng = enc.rng;
    ece_done(&enc);
    if (rng_out) *rng_out = st->rng;
    if (enc.error) return -3;
    return nbytes;
}

/* ------------------------------------------------------------------ */
/* batch driver                                                        */

typedef struct {
    const void *mode;
    celt_encstate *states;
    const double *pcm;
    const double *x_l;
    const double *x_s;
    const double *ble_l;
    const double *ble_s;
    int32_t LM;
    int32_t nbytes;
    unsigned char *payloads;
    uint32_t *rngs;
    int32_t *rets;
    int32_t nstreams;
    int32_t N;
    int32_t nbE;
    int begin, step;
} enc_batchjob;

static void *enc_batch_worker(void *arg) {
    enc_batchjob *j = (enc_batchjob *)arg;
    int s;
    for (s = j->begin; s < j->nstreams; s += j->step)
        j->rets[s] = celt_encode_symbols(
            j->mode, &j->states[s], j->pcm + (size_t)s * j->N,
            j->x_l + (size_t)s * j->N, j->x_s + (size_t)s * j->N,
            j->ble_l + (size_t)s * j->nbE, j->ble_s + (size_t)s * j->nbE,
            j->LM, j->nbytes, j->payloads + (size_t)s * j->nbytes,
            &j->rngs[s]);
    return NULL;
}

void celt_encode_symbols_batch(const void *mode, int32_t nstreams,
                               celt_encstate *states, const double *pcm,
                               const double *x_l, const double *x_s,
                               const double *ble_l, const double *ble_s,
                               int32_t LM, int32_t nbytes,
                               unsigned char *payloads, uint32_t *rngs,
                               int32_t *rets, int32_t nthreads) {
    const CeltModeC *m = (const CeltModeC *)mode;
    pthread_t threads[64];
    enc_batchjob jobs[64];
    int t;
    pthread_once(&u_once, build_u_table);
    if (nthreads < 1) nthreads = 1;
    if (nthreads > nstreams) nthreads = nstreams;
    if (nthreads > 64) nthreads = 64;
    for (t = 0; t < nthreads; t++) {
        jobs[t].mode = mode;
        jobs[t].states = states;
        jobs[t].pcm = pcm;
        jobs[t].x_l = x_l;
        jobs[t].x_s = x_s;
        jobs[t].ble_l = ble_l;
        jobs[t].ble_s = ble_s;
        jobs[t].LM = LM;
        jobs[t].nbytes = nbytes;
        jobs[t].payloads = payloads;
        jobs[t].rngs = rngs;
        jobs[t].rets = rets;
        jobs[t].nstreams = nstreams;
        jobs[t].N = (1 << LM) * m->shortMdctSize;
        jobs[t].nbE = m->nbEBands;
        jobs[t].begin = t;
        jobs[t].step = nthreads;
    }
    if (nthreads == 1) {
        enc_batch_worker(&jobs[0]);
    } else {
        for (t = 0; t < nthreads; t++)
            pthread_create(&threads[t], NULL, enc_batch_worker, &jobs[t]);
        for (t = 0; t < nthreads; t++) pthread_join(threads[t], NULL);
    }
}

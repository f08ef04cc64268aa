/* Native CELT decode-side symbol pass.
 *
 * Decodes whole CELT frames (packets -> symbol tensors) so that batched
 * stream decode is not bottlenecked by per-symbol Python dispatch: the
 * range decoder, energy/tf/allocation decisions, PVQ/CWRS decode and the
 * band recombination run here per stream; everything downstream
 * (denormalise, IMDCT, postfilter, deemphasis) is batched tensor math on
 * the TPU (opus_tpu/models/batched_celt.py).
 *
 * Semantics mirror opus_tpu/celt/{decoder,bands,alloc,cwrs,modes}.py
 * exactly (which are themselves verified against the reference
 * celt/celt_decoder.c pipeline); all float math is double to bit-match the
 * Python oracle.  The per-frame outputs are the normalized spectrum X, the
 * band energies at synthesis time, the comb-postfilter parameters and the
 * final range state.
 *
 * This is decode-direction, classic modes only (no QEXT extension stream,
 * no custom modes beyond what the mode tables describe); those paths stay
 * on the scalar Python driver.
 */

#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "entropy.h"

#define BITRES 3
#define MAXB 25           /* max band count we support (standard: 21) */
#define MAXLM 3
#define MAX_FINE_BITS 8
#define FINE_OFFSET 21
#define QTHETA_OFFSET 4
#define QTHETA_OFFSET_TWOPHASE 16
#define LOG_MAX_PSEUDO 6
#define ALLOC_STEPS 6
#define NORM_SCALING 1.0
#define EPSILON 1e-15
#define SPREAD_NONE 0
#define SPREAD_AGGRESSIVE 3

/* ------------------------------------------------------------------ */
/* mode tables, marshaled once from Python (opus_tpu/celt/modes.py)   */

typedef struct {
    int32_t Fs, overlap, nbEBands, effEBands, maxLM, shortMdctSize,
        nbAllocVectors;
    int16_t eBands[MAXB + 2];
    int16_t logN[MAXB];
    uint8_t allocVectors[11 * MAXB];
    int16_t cache_index[(MAXLM + 2) * MAXB];
    uint8_t *cache_bits;
    int32_t cache_size;
    uint8_t cache_caps[(MAXLM + 1) * 2 * MAXB];
    uint8_t e_prob[4][2][42];
} CeltModeC;

void *celt_mode_new(int32_t Fs, int32_t overlap, int32_t nbEBands,
                    int32_t effEBands, int32_t maxLM, int32_t shortMdctSize,
                    int32_t nbAllocVectors, const int16_t *eBands,
                    const int16_t *logN, const uint8_t *allocVectors,
                    const int16_t *cache_index, const uint8_t *cache_bits,
                    int32_t cache_size, const uint8_t *cache_caps,
                    const uint8_t *e_prob /* [4*2*42] */) {
    CeltModeC *m = (CeltModeC *)calloc(1, sizeof(CeltModeC));
    if (!m) return NULL;
    m->Fs = Fs;
    m->overlap = overlap;
    m->nbEBands = nbEBands;
    m->effEBands = effEBands;
    m->maxLM = maxLM;
    m->shortMdctSize = shortMdctSize;
    m->nbAllocVectors = nbAllocVectors;
    memcpy(m->eBands, eBands, (nbEBands + 1) * sizeof(int16_t));
    memcpy(m->logN, logN, nbEBands * sizeof(int16_t));
    memcpy(m->allocVectors, allocVectors, nbAllocVectors * nbEBands);
    memcpy(m->cache_index, cache_index,
           (maxLM + 2) * nbEBands * sizeof(int16_t));
    m->cache_bits = (uint8_t *)malloc(cache_size);
    memcpy(m->cache_bits, cache_bits, cache_size);
    m->cache_size = cache_size;
    memcpy(m->cache_caps, cache_caps, (maxLM + 1) * 2 * nbEBands);
    memcpy(m->e_prob, e_prob, 4 * 2 * 42);
    return m;
}

void celt_mode_free(void *mode) {
    CeltModeC *m = (CeltModeC *)mode;
    if (m) {
        free(m->cache_bits);
        free(m);
    }
}

/* ------------------------------------------------------------------ */
/* CWRS pulse enumeration (opus_tpu/celt/cwrs.py)                     */

#define U_LO 135
#define U_HI 213

static uint32_t u_tab[U_LO][U_HI];
static pthread_once_t u_once = PTHREAD_ONCE_INIT;

static uint32_t pvq_u(int n, int k) {
    int lo = n < k ? n : k, hi = n < k ? k : n;
    return u_tab[lo][hi];
}

static void build_u_table(void) {
    int n, k;
    memset(u_tab, 0, sizeof(u_tab));
    u_tab[0][0] = 1;
    for (k = 1; k < U_HI; k++) u_tab[1][k] = 1;
    /* U(n,k) = U(n-1,k) + U(n,k-1) + U(n-1,k-1); values used in decode all
       fit 32 bits by construction (the pulse cache gates K); larger
       entries wrap but are never consulted. */
    for (n = 2; n < U_LO; n++)
        for (k = n; k < U_HI; k++)
            u_tab[n][k] = pvq_u(n - 1, k) + pvq_u(n, k - 1)
                + pvq_u(n - 1, k - 1);
}

static uint32_t pvq_v(int n, int k) { return pvq_u(n, k) + pvq_u(n, k + 1); }

/* index -> pulse vector (reference: cwrsi celt/cwrs.c:467) */
static void cwrsi(int n, int k, uint32_t i, int *y) {
    int idx = 0;
    while (n > 2) {
        uint32_t p, q;
        int s, k0, val;
        if (k >= n) {
            p = pvq_u(n, k + 1);
            s = i >= p;
            if (s) i -= p;
            k0 = k;
            q = pvq_u(n, n);
            if (q > i) {
                k = n;
                do { k--; p = pvq_u(k, n); } while (p > i);
            } else {
                for (;;) {
                    p = pvq_u(k, n);
                    if (p <= i) break;
                    k--;
                }
            }
            i -= p;
            val = k0 - k;
            y[idx++] = s ? -val : val;
        } else {
            p = pvq_u(k, n);
            q = pvq_u(k + 1, n);
            if (p <= i && i < q) {
                i -= p;
                y[idx++] = 0;
            } else {
                s = i >= q;
                if (s) i -= q;
                k0 = k;
                do { k--; p = pvq_u(k, n); } while (p > i);
                i -= p;
                val = k0 - k;
                y[idx++] = s ? -val : val;
            }
        }
        n--;
    }
    /* n == 2 */
    {
        uint32_t p = 2 * (uint32_t)k + 1;
        int s = i >= p;
        int k0, val;
        if (s) i -= p;
        k0 = k;
        k = (int)((i + 1) >> 1);
        if (k) i -= 2 * (uint32_t)k - 1;
        val = k0 - k;
        y[idx++] = s ? -val : val;
    }
    /* n == 1 */
    y[idx] = i ? -k : k;
}

static void decode_pulses(ecdec *d, int n, int k, int *y) {
    cwrsi(n, k, ecd_dec_uint(d, pvq_v(n, k)), y);
}

/* ------------------------------------------------------------------ */
/* Laplace decode (opus_tpu/bitstream/laplace.py)                     */

#define LAPLACE_MINP 1
#define LAPLACE_NMIN 16

static int laplace_get_freq1(int fs0, int decay) {
    int ft = 32768 - LAPLACE_MINP * (2 * LAPLACE_NMIN) - fs0;
    return (ft * (16384 - decay)) >> 15;
}

static int laplace_decode(ecdec *d, int fs, int decay) {
    int val = 0;
    int fl = 0;
    int fm = (int)ecd_decode_bin(d, 15);
    if (fm >= fs) {
        val++;
        fl = fs;
        fs = laplace_get_freq1(fs, decay) + LAPLACE_MINP;
        while (fs > LAPLACE_MINP && fm >= fl + 2 * fs) {
            fs *= 2;
            fl += fs;
            fs = ((fs - 2 * LAPLACE_MINP) * decay) >> 15;
            fs += LAPLACE_MINP;
            val++;
        }
        if (fs <= LAPLACE_MINP) {
            int di = (fm - fl) >> 1;
            val += di;
            fl += 2 * di * LAPLACE_MINP;
        }
        if (fm < fl + fs) val = -val;
        else fl += fs;
    }
    {
        uint32_t fh = (uint32_t)(fl + fs);
        if (fh > 32768u) fh = 32768u;
        ecd_update(d, (uint32_t)fl, fh, 32768u);
    }
    return val;
}

/* ------------------------------------------------------------------ */
/* energy decode (opus_tpu/celt/decoder.py + celt/tables.py)          */

static const double PRED_COEF[4] = {29440 / 32768., 26112 / 32768.,
                                    21248 / 32768., 16384 / 32768.};
static const double BETA_COEF[4] = {30147 / 32768., 22282 / 32768.,
                                    12124 / 32768., 6554 / 32768.};
static const double BETA_INTRA = 4915 / 32768.;
static const unsigned char SMALL_ENERGY_ICDF[3] = {2, 1, 0};
static const unsigned char TRIM_ICDF[11] = {126, 124, 119, 109, 87, 41,
                                            19, 9, 4, 2, 0};
static const unsigned char SPREAD_ICDF[4] = {25, 23, 2, 0};
static const unsigned char TAPSET_ICDF[3] = {2, 1, 0};
static const int TF_SELECT_TABLE[4][8] = {
    {0, -1, 0, -1, 0, -1, 0, -1},
    {0, -1, 0, -2, 1, 0, 1, -1},
    {0, -2, 0, -3, 2, 0, 1, -1},
    {0, -2, 0, -3, 3, 0, 1, -1},
};
static const int LOG2_FRAC_TABLE[24] = {0, 8, 13, 16, 19, 21, 23, 24, 26,
                                        27, 28, 29, 30, 31, 32, 32, 33, 34,
                                        34, 35, 36, 36, 37, 37};

static void unquant_coarse_energy(const CeltModeC *m, int start, int end,
                                  double *oldEBands, int intra, ecdec *d,
                                  int C, int LM) {
    const uint8_t *prob = m->e_prob[LM][intra ? 1 : 0];
    double coef, beta;
    double prev[2] = {0.0, 0.0};
    int budget = d->storage * 8;
    int i, ch;
    if (intra) {
        coef = 0.0;
        beta = BETA_INTRA;
    } else {
        beta = BETA_COEF[LM];
        coef = PRED_COEF[LM];
    }
    for (i = start; i < end; i++) {
        for (ch = 0; ch < C; ch++) {
            int tell = ecd_tell(d);
            int qi;
            if (budget - tell >= 15) {
                int pi = 2 * (i < 20 ? i : 20);
                qi = laplace_decode(d, prob[pi] << 7, prob[pi + 1] << 6);
            } else if (budget - tell >= 2) {
                qi = ecd_dec_icdf(d, SMALL_ENERGY_ICDF, 2);
                qi = (qi >> 1) ^ -(qi & 1);
            } else if (budget - tell >= 1) {
                qi = -ecd_dec_bit_logp(d, 1);
            } else {
                qi = -1;
            }
            {
                double q = (double)qi;
                double old = oldEBands[ch * m->nbEBands + i];
                if (old < -9.0) old = -9.0;
                oldEBands[ch * m->nbEBands + i] = coef * old + prev[ch] + q;
                prev[ch] = prev[ch] + q - beta * q;
            }
        }
    }
}

static void unquant_fine_energy(const CeltModeC *m, int start, int end,
                                double *oldEBands, const int *fine_quant,
                                ecdec *d, int C) {
    int i, ch;
    for (i = start; i < end; i++) {
        int extra = fine_quant[i];
        if (extra <= 0) continue;
        if (ecd_tell(d) + C * extra > d->storage * 8) continue;
        for (ch = 0; ch < C; ch++) {
            int q2 = (int)ecd_dec_bits(d, extra);
            double offset =
                (q2 + 0.5) * (double)(1 << (14 - extra)) / 16384.0 - 0.5;
            oldEBands[ch * m->nbEBands + i] += offset;
        }
    }
}

static void unquant_energy_finalise(const CeltModeC *m, int start, int end,
                                    double *oldEBands, const int *fine_quant,
                                    const int *fine_priority, int bits_left,
                                    ecdec *d, int C) {
    int prio, i, ch;
    for (prio = 0; prio < 2; prio++) {
        for (i = start; i < end && bits_left >= C; i++) {
            if (fine_quant[i] >= MAX_FINE_BITS || fine_priority[i] != prio)
                continue;
            for (ch = 0; ch < C; ch++) {
                int q2 = (int)ecd_dec_bits(d, 1);
                double offset = (q2 - 0.5)
                    * (double)(1 << (14 - fine_quant[i] - 1)) / 16384.0;
                oldEBands[ch * m->nbEBands + i] += offset;
                bits_left--;
            }
        }
    }
}

static void tf_decode(int start, int end, int is_transient, int *tf_res,
                      int LM, ecdec *d) {
    int budget = d->storage * 8;
    int tell = ecd_tell(d);
    int logp = is_transient ? 2 : 4;
    int tf_select_rsv = (LM > 0 && tell + logp + 1 <= budget) ? 1 : 0;
    int tf_changed = 0, curr = 0, tf_select = 0, i;
    budget -= tf_select_rsv;
    for (i = start; i < end; i++) {
        if (tell + logp <= budget) {
            curr ^= ecd_dec_bit_logp(d, logp);
            tell = ecd_tell(d);
            tf_changed |= curr;
        }
        tf_res[i] = curr;
        logp = is_transient ? 4 : 5;
    }
    if (tf_select_rsv
        && TF_SELECT_TABLE[LM][4 * is_transient + 0 + tf_changed]
            != TF_SELECT_TABLE[LM][4 * is_transient + 2 + tf_changed])
        tf_select = ecd_dec_bit_logp(d, 1);
    for (i = start; i < end; i++)
        tf_res[i] =
            TF_SELECT_TABLE[LM][4 * is_transient + 2 * tf_select + tf_res[i]];
}

/* ------------------------------------------------------------------ */
/* bit allocation (opus_tpu/celt/alloc.py)                            */

static void init_caps(const CeltModeC *m, int *cap, int LM, int C) {
    int i;
    for (i = 0; i < m->nbEBands; i++) {
        int n = (m->eBands[i + 1] - m->eBands[i]) << LM;
        cap[i] = (m->cache_caps[m->nbEBands * (2 * LM + C - 1) + i] + 64)
            * C * n >> 2;
    }
}

static int bits2pulses(const CeltModeC *m, int band, int LM, int bits) {
    int lo = 0, hi, i;
    const uint8_t *cache =
        m->cache_bits + m->cache_index[(LM + 1) * m->nbEBands + band];
    hi = cache[0];
    bits--;
    for (i = 0; i < LOG_MAX_PSEUDO; i++) {
        int mid = (lo + hi + 1) >> 1;
        if ((int)cache[mid] >= bits) hi = mid;
        else lo = mid;
    }
    if (bits - (lo == 0 ? -1 : (int)cache[lo]) <= (int)cache[hi] - bits)
        return lo;
    return hi;
}

static int pulses2bits(const CeltModeC *m, int band, int LM, int pulses) {
    const uint8_t *cache =
        m->cache_bits + m->cache_index[(LM + 1) * m->nbEBands + band];
    return pulses == 0 ? 0 : cache[pulses] + 1;
}

static int get_pulses(int i) {
    return i < 8 ? i : (8 + (i & 7)) << ((i >> 3) - 1);
}

static int interp_bits2pulses(const CeltModeC *m, int start, int end,
                              int skip_start, const int *bits1,
                              const int *bits2, const int *thresh,
                              const int *cap, int total, int *balance_out,
                              int skip_rsv, int *intensity,
                              int intensity_rsv, int *dual_stereo,
                              int dual_stereo_rsv, int *bits, int *ebits,
                              int *fine_priority, int C, int LM, ecdec *ec,
                              ecenc *enc, int encode, int prev,
                              int signal_bandwidth) {
    int alloc_floor = C << BITRES;
    int stereo = C > 1 ? 1 : 0;
    int logM = LM << BITRES;
    const int16_t *eBands = m->eBands;
    int lo = 0, hi = 1 << ALLOC_STEPS;
    int i, j, psum, done, coded_bands, balance, left, percoeff;

    for (i = 0; i < ALLOC_STEPS; i++) {
        int mid = (lo + hi) >> 1;
        psum = 0;
        done = 0;
        for (j = end - 1; j >= start; j--) {
            int tmp = bits1[j] + (mid * bits2[j] >> ALLOC_STEPS);
            if (tmp >= thresh[j] || done) {
                done = 1;
                psum += tmp < cap[j] ? tmp : cap[j];
            } else if (tmp >= alloc_floor)
                psum += alloc_floor;
        }
        if (psum > total) hi = mid;
        else lo = mid;
    }
    psum = 0;
    done = 0;
    for (j = end - 1; j >= start; j--) {
        int tmp = bits1[j] + (lo * bits2[j] >> ALLOC_STEPS);
        if (tmp < thresh[j] && !done)
            tmp = tmp >= alloc_floor ? alloc_floor : 0;
        else
            done = 1;
        if (tmp > cap[j]) tmp = cap[j];
        bits[j] = tmp;
        psum += tmp;
    }
    coded_bands = end;
    for (;;) {
        int band_width, band_bits, rem;
        j = coded_bands - 1;
        if (j <= skip_start) {
            total += skip_rsv;
            break;
        }
        left = total - psum;
        percoeff = left / (eBands[coded_bands] - eBands[start]);
        left -= (eBands[coded_bands] - eBands[start]) * percoeff;
        rem = left - (eBands[j] - eBands[start]);
        if (rem < 0) rem = 0;
        band_width = eBands[coded_bands] - eBands[j];
        band_bits = bits[j] + percoeff * band_width + rem;
        {
            int th = thresh[j] > alloc_floor + (1 << BITRES)
                ? thresh[j] : alloc_floor + (1 << BITRES);
            if (band_bits >= th) {
                if (encode) {
                    /* encoder skip decision (celt/rate.c:371-391) */
                    int depth_threshold;
                    if (coded_bands > 17)
                        depth_threshold = j < prev ? 7 : 9;
                    else
                        depth_threshold = 0;
                    if (coded_bands <= start + 2
                        || (band_bits > ((depth_threshold * band_width
                                          << LM << BITRES) >> 4)
                            && j <= signal_bandwidth)) {
                        ece_enc_bit_logp(enc, 1, 1);
                        break;
                    }
                    ece_enc_bit_logp(enc, 0, 1);
                } else if (ecd_dec_bit_logp(ec, 1)) {
                    break;
                }
                psum += 1 << BITRES;
                band_bits -= 1 << BITRES;
            }
        }
        psum -= bits[j] + intensity_rsv;
        if (intensity_rsv > 0)
            intensity_rsv = LOG2_FRAC_TABLE[j - start];
        psum += intensity_rsv;
        if (band_bits >= alloc_floor) {
            psum += alloc_floor;
            bits[j] = alloc_floor;
        } else {
            bits[j] = 0;
        }
        coded_bands--;
    }
    if (intensity_rsv > 0) {
        if (encode) {
            if (*intensity > coded_bands) *intensity = coded_bands;
            ece_enc_uint(enc, *intensity - start, coded_bands + 1 - start);
        } else {
            *intensity = start + (int)ecd_dec_uint(ec,
                                                   coded_bands + 1 - start);
        }
    } else {
        *intensity = 0;
    }
    if (*intensity <= start) {
        total += dual_stereo_rsv;
        dual_stereo_rsv = 0;
    }
    if (dual_stereo_rsv > 0) {
        if (encode) ece_enc_bit_logp(enc, *dual_stereo, 1);
        else *dual_stereo = ecd_dec_bit_logp(ec, 1);
    } else {
        *dual_stereo = 0;
    }

    left = total - psum;
    percoeff = left / (eBands[coded_bands] - eBands[start]);
    left -= (eBands[coded_bands] - eBands[start]) * percoeff;
    for (j = start; j < coded_bands; j++)
        bits[j] += percoeff * (eBands[j + 1] - eBands[j]);
    for (j = start; j < coded_bands; j++) {
        int tmp = left < eBands[j + 1] - eBands[j]
            ? left : eBands[j + 1] - eBands[j];
        bits[j] += tmp;
        left -= tmp;
    }
    balance = 0;
    for (j = start; j < coded_bands; j++) {
        int n0 = eBands[j + 1] - eBands[j];
        int n = n0 << LM;
        int bit = bits[j] + balance;
        int excess = 0;
        if (n > 1) {
            int den, nclogn, offset;
            excess = bit - cap[j];
            if (excess < 0) excess = 0;
            bits[j] = bit - excess;
            den = C * n + ((C == 2 && n > 2 && !*dual_stereo
                            && j < *intensity) ? 1 : 0);
            nclogn = den * (m->logN[j] + logM);
            offset = (nclogn >> 1) - den * FINE_OFFSET;
            if (n == 2) offset += den << BITRES >> 2;
            if (bits[j] + offset < (den * 2 << BITRES))
                offset += nclogn >> 2;
            else if (bits[j] + offset < (den * 3 << BITRES))
                offset += nclogn >> 3;
            ebits[j] = bits[j] + offset + (den << (BITRES - 1));
            if (ebits[j] < 0) ebits[j] = 0;
            ebits[j] = (ebits[j] / den) >> BITRES;
            if (C * ebits[j] > (bits[j] >> BITRES))
                ebits[j] = bits[j] >> stereo >> BITRES;
            if (ebits[j] > MAX_FINE_BITS) ebits[j] = MAX_FINE_BITS;
            fine_priority[j] =
                ebits[j] * (den << BITRES) >= bits[j] + offset ? 1 : 0;
            bits[j] -= C * ebits[j] << BITRES;
        } else {
            excess = bit - (C << BITRES);
            if (excess < 0) excess = 0;
            bits[j] = bit - excess;
            ebits[j] = 0;
            fine_priority[j] = 1;
        }
        if (excess > 0) {
            int extra_fine = excess >> (stereo + BITRES);
            int extra_bits;
            if (extra_fine > MAX_FINE_BITS - ebits[j])
                extra_fine = MAX_FINE_BITS - ebits[j];
            ebits[j] += extra_fine;
            extra_bits = extra_fine * C << BITRES;
            fine_priority[j] = extra_bits >= excess - balance ? 1 : 0;
            excess -= extra_bits;
        }
        balance = excess;
    }
    for (j = coded_bands; j < end; j++) {
        ebits[j] = bits[j] >> stereo >> BITRES;
        bits[j] = 0;
        fine_priority[j] = ebits[j] < 1 ? 1 : 0;
    }
    *balance_out = balance;
    return coded_bands;
}

static int compute_allocation(const CeltModeC *m, int start, int end,
                              const int *offsets, const int *cap,
                              int alloc_trim, int *intensity,
                              int *dual_stereo, int total, int *balance,
                              int *pulses, int *ebits, int *fine_priority,
                              int C, int LM, ecdec *ec, ecenc *enc,
                              int encode, int prev, int signal_bandwidth) {
    const int16_t *eBands = m->eBands;
    int skip_start = start;
    int skip_rsv, intensity_rsv = 0, dual_stereo_rsv = 0;
    int thresh[MAXB], trim_offset[MAXB], bits1[MAXB], bits2[MAXB];
    int lo, hi, j;

    if (total < 0) total = 0;
    skip_rsv = total >= 1 << BITRES ? 1 << BITRES : 0;
    total -= skip_rsv;
    if (C == 2) {
        intensity_rsv = LOG2_FRAC_TABLE[end - start];
        if (intensity_rsv > total)
            intensity_rsv = 0;
        else {
            total -= intensity_rsv;
            dual_stereo_rsv = total >= 1 << BITRES ? 1 << BITRES : 0;
            total -= dual_stereo_rsv;
        }
    }
    for (j = start; j < end; j++) {
        int t = (3 * (eBands[j + 1] - eBands[j]) << LM << BITRES) >> 4;
        thresh[j] = t > (C << BITRES) ? t : (C << BITRES);
        trim_offset[j] = (C * (eBands[j + 1] - eBands[j])
                          * (alloc_trim - 5 - LM) * (end - j - 1)
                          * (1 << (LM + BITRES))) >> 6;
        if ((eBands[j + 1] - eBands[j]) << LM == 1)
            trim_offset[j] -= C << BITRES;
    }
    lo = 1;
    hi = m->nbAllocVectors - 1;
    for (;;) {
        int done = 0, psum = 0;
        int mid = (lo + hi) >> 1;
        for (j = end - 1; j >= start; j--) {
            int n = eBands[j + 1] - eBands[j];
            int bitsj = C * n * m->allocVectors[mid * m->nbEBands + j]
                << LM >> 2;
            if (bitsj > 0) {
                bitsj += trim_offset[j];
                if (bitsj < 0) bitsj = 0;
            }
            bitsj += offsets[j];
            if (bitsj >= thresh[j] || done) {
                done = 1;
                psum += bitsj < cap[j] ? bitsj : cap[j];
            } else if (bitsj >= C << BITRES)
                psum += C << BITRES;
        }
        if (psum > total) hi = mid - 1;
        else lo = mid + 1;
        if (lo > hi) break;
    }
    hi = lo;
    lo--;
    for (j = start; j < end; j++) {
        int n = eBands[j + 1] - eBands[j];
        int bits1j = C * n * m->allocVectors[lo * m->nbEBands + j]
            << LM >> 2;
        int bits2j = hi >= m->nbAllocVectors
            ? cap[j]
            : C * n * m->allocVectors[hi * m->nbEBands + j] << LM >> 2;
        if (bits1j > 0) {
            bits1j += trim_offset[j];
            if (bits1j < 0) bits1j = 0;
        }
        if (bits2j > 0) {
            bits2j += trim_offset[j];
            if (bits2j < 0) bits2j = 0;
        }
        if (lo > 0) bits1j += offsets[j];
        bits2j += offsets[j];
        if (offsets[j] > 0) skip_start = j;
        bits2j -= bits1j;
        if (bits2j < 0) bits2j = 0;
        bits1[j] = bits1j;
        bits2[j] = bits2j;
    }
    return interp_bits2pulses(m, start, end, skip_start, bits1, bits2,
                              thresh, cap, total, balance, skip_rsv,
                              intensity, intensity_rsv, dual_stereo,
                              dual_stereo_rsv, pulses, ebits, fine_priority,
                              C, LM, ec, enc, encode, prev,
                              signal_bandwidth);
}

/* ------------------------------------------------------------------ */
/* band shapes (opus_tpu/celt/bands.py, decode direction)             */

static const int ORDERY2[2] = {1, 0};
static const int ORDERY4[4] = {3, 0, 2, 1};
static const int ORDERY8[8] = {7, 0, 4, 3, 6, 1, 5, 2};
static const int ORDERY16[16] = {15, 0, 8, 7, 12, 3, 11, 4,
                                 14, 1, 9, 6, 13, 2, 10, 5};
static const int BIT_INTERLEAVE_TABLE[16] = {0, 1, 1, 1, 2, 3, 3, 3,
                                             2, 3, 3, 3, 2, 3, 3, 3};
static const int BIT_DEINTERLEAVE_TABLE[16] = {
    0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
    0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF};
static const int EXP2_TABLE8[8] = {16384, 17866, 19483, 21247,
                                   23170, 25267, 27554, 30048};

static uint32_t celt_lcg_rand(uint32_t seed) {
    return 1664525u * seed + 1013904223u;
}

static int frac_mul16(int a, int b) { return (16384 + a * b) >> 15; }

static int bitexact_cos(int x) {
    int tmp = (4096 + x * x) >> 13;
    int x2 = tmp;
    x2 = (32767 - x2)
        + frac_mul16(x2, -7651 + frac_mul16(x2, 8277 + frac_mul16(-626, x2)));
    return 1 + x2;
}

static int bitexact_log2tan(int isin, int icos) {
    int lc = ec_ilog((uint32_t)icos);
    int ls = ec_ilog((uint32_t)isin);
    icos <<= 15 - lc;
    isin <<= 15 - ls;
    return ((ls - lc) * (1 << 11)
            + frac_mul16(isin, frac_mul16(isin, -2597) + 7932)
            - frac_mul16(icos, frac_mul16(icos, -2597) + 7932));
}

static void haar1(double *x, int n0, int stride) {
    int i, j;
    const double s = 0.70710678118654752440;
    n0 >>= 1;
    for (i = 0; i < stride; i++) {
        for (j = 0; j < n0; j++) {
            double t1 = s * x[stride * 2 * j + i];
            double t2 = s * x[stride * 2 * j + i + stride];
            x[stride * 2 * j + i] = t1 + t2;
            x[stride * 2 * j + i + stride] = t1 - t2;
        }
    }
}

static const int *ordery_table(int stride) {
    switch (stride) {
    case 2: return ORDERY2;
    case 4: return ORDERY4;
    case 8: return ORDERY8;
    default: return ORDERY16;
    }
}

static void deinterleave_hadamard(double *x, int n0, int stride,
                                  int hadamard, double *scratch) {
    int n = n0 * stride, i, j;
    if (hadamard) {
        const int *ordery = ordery_table(stride);
        for (i = 0; i < stride; i++)
            for (j = 0; j < n0; j++)
                scratch[ordery[i] * n0 + j] = x[j * stride + i];
    } else {
        for (i = 0; i < stride; i++)
            for (j = 0; j < n0; j++)
                scratch[i * n0 + j] = x[j * stride + i];
    }
    memcpy(x, scratch, n * sizeof(double));
}

static void interleave_hadamard(double *x, int n0, int stride, int hadamard,
                                double *scratch) {
    int n = n0 * stride, i, j;
    if (hadamard) {
        const int *ordery = ordery_table(stride);
        for (i = 0; i < stride; i++)
            for (j = 0; j < n0; j++)
                scratch[j * stride + i] = x[ordery[i] * n0 + j];
    } else {
        for (i = 0; i < stride; i++)
            for (j = 0; j < n0; j++)
                scratch[j * stride + i] = x[i * n0 + j];
    }
    memcpy(x, scratch, n * sizeof(double));
}

static int compute_qn(int n, int b, int offset, int pulse_cap, int stereo) {
    int n2 = 2 * n - 1;
    int qn, qb;
    if (stereo && n == 2) n2--;
    qb = (b + n2 * offset) / n2;   /* C truncating division */
    if (qb > b - pulse_cap - (4 << BITRES)) qb = b - pulse_cap - (4 << BITRES);
    if (qb > 8 << BITRES) qb = 8 << BITRES;
    if (qb < (1 << BITRES >> 1)) {
        qn = 1;
    } else {
        qn = EXP2_TABLE8[qb & 0x7] >> (14 - (qb >> BITRES));
        qn = ((qn + 1) >> 1) << 1;
    }
    return qn;
}

static void exp_rotation1(double *x, int len, int stride, double c,
                          double s) {
    int i;
    double ms = -s;
    for (i = 0; i < len - stride; i++) {
        double x1 = x[i];
        double x2 = x[i + stride];
        x[i + stride] = c * x2 + s * x1;
        x[i] = c * x1 + ms * x2;
    }
    for (i = len - 2 * stride - 1; i >= 0; i--) {
        double x1 = x[i];
        double x2 = x[i + stride];
        x[i + stride] = c * x2 + s * x1;
        x[i] = c * x1 + ms * x2;
    }
}

static void exp_rotation(double *x, int len, int dir, int stride, int k,
                         int spread) {
    static const int SPREAD_FACTOR[3] = {15, 10, 5};
    int i, factor, stride2 = 0;
    double gain, theta, c, s;
    if (2 * k >= len || spread == SPREAD_NONE) return;
    factor = SPREAD_FACTOR[spread - 1];
    gain = 1.0 * len / (len + factor * k);
    theta = 0.5 * gain * gain;
    c = cos(0.5 * M_PI * theta);
    s = cos(0.5 * M_PI * (1.0 - theta));
    if (len >= 8 * stride) {
        stride2 = 1;
        while ((stride2 * stride2 + stride2) * stride + (stride >> 2) < len)
            stride2++;
    }
    len /= stride;
    for (i = 0; i < stride; i++) {
        if (dir < 0) {
            if (stride2) exp_rotation1(x + i * len, len, stride2, s, c);
            exp_rotation1(x + i * len, len, 1, c, s);
        } else {
            exp_rotation1(x + i * len, len, 1, c, -s);
            if (stride2) exp_rotation1(x + i * len, len, stride2, s, -c);
        }
    }
}

static int extract_collapse_mask(const int *iy, int n, int b) {
    int mask = 0, i, j;
    if (b <= 1) return 1;
    {
        int n0 = n / b;
        for (i = 0; i < b; i++) {
            int tmp = 0;
            for (j = 0; j < n0; j++) tmp |= iy[i * n0 + j] != 0;
            mask |= tmp << i;
        }
    }
    return mask;
}

static void normalise_residual(const int *iy, double *x, int n, double ryy,
                               double gain) {
    double g = gain / sqrt(ryy);
    int i;
    for (i = 0; i < n; i++) x[i] = iy[i] * g;
}

static void renormalise_vector(double *x, int n, double gain) {
    double e = EPSILON;
    double g;
    int i;
    for (i = 0; i < n; i++) e += x[i] * x[i];
    g = gain / sqrt(e);
    for (i = 0; i < n; i++) x[i] *= g;
}

static int alg_unquant(double *x, int n, int k, int spread, int b, ecdec *d,
                       double gain, int *iy_scratch) {
    int *iy = iy_scratch;
    double ryy = 0.0;
    int i;
    decode_pulses(d, n, k, iy);
    for (i = 0; i < n; i++) ryy += (double)iy[i] * iy[i];
    normalise_residual(iy, x, n, ryy, gain);
    exp_rotation(x, n, -1, b, k, spread);
    return extract_collapse_mask(iy, n, b);
}

static void stereo_merge(double *x, double *y, double mid, int n) {
    double xp = 0.0, side = 0.0, el, er, lgain, rgain;
    int j;
    for (j = 0; j < n; j++) {
        xp += y[j] * x[j];
        side += y[j] * y[j];
    }
    xp = mid * xp;
    el = mid * mid + side - 2 * xp;
    er = mid * mid + side + 2 * xp;
    if (er < 6e-4 || el < 6e-4) {
        memcpy(y, x, n * sizeof(double));
        return;
    }
    lgain = 1.0 / sqrt(el);
    rgain = 1.0 / sqrt(er);
    for (j = 0; j < n; j++) {
        double l = mid * x[j];
        double r = y[j];
        x[j] = lgain * (l - r);
        y[j] = rgain * (l + r);
    }
}

/* integer sqrt exact for the small triangular-pdf arguments */
static int isqrt32(uint32_t v) {
    int r = (int)sqrt((double)v);
    while ((uint32_t)r * r > v) r--;
    while ((uint32_t)(r + 1) * (r + 1) <= v) r++;
    return r;
}

typedef struct {
    const CeltModeC *m;
    int i;
    int intensity;
    int spread;
    int tf_change;
    ecdec *ec;
    int32_t remaining_bits;
    uint32_t seed;
    int disable_inv;
    int avoid_split_noise;   /* unused in decode, kept for parity */
    double *scratch;         /* hadamard scratch, size >= max band N */
    int *iy_scratch;
} bandctx;

typedef struct {
    int inv, imid, iside, delta, itheta, qalloc;
} splitctx;

static void compute_theta(bandctx *ctx, splitctx *sctx, double *x, double *y,
                          int n, int *b, int bb, int b0, int LM, int stereo,
                          int *fill) {
    int itheta = 0, inv = 0, imid, iside, delta, qalloc;
    const CeltModeC *m = ctx->m;
    int i = ctx->i;
    ecdec *ec = ctx->ec;
    int pulse_cap = m->logN[i] + LM * (1 << BITRES);
    int offset = (pulse_cap >> 1)
        - (stereo && n == 2 ? QTHETA_OFFSET_TWOPHASE : QTHETA_OFFSET);
    int qn = compute_qn(n, *b, offset, pulse_cap, stereo);
    int tell;
    if (stereo && i >= ctx->intensity) qn = 1;
    tell = (int)ecd_tell_frac(ec);
    if (qn != 1) {
        if (stereo && n > 2) {
            int p0 = 3;
            int x0 = qn / 2;
            int ft = p0 * (x0 + 1) + x0;
            int fs = (int)ecd_decode(ec, ft);
            int xq, fl, fh;
            if (fs < (x0 + 1) * p0) xq = fs / p0;
            else xq = x0 + 1 + (fs - (x0 + 1) * p0);
            fl = xq <= x0 ? p0 * xq : (xq - 1 - x0) + (x0 + 1) * p0;
            fh = xq <= x0 ? p0 * (xq + 1) : (xq - x0) + (x0 + 1) * p0;
            ecd_update(ec, fl, fh, ft);
            itheta = xq;
        } else if (b0 > 1 || stereo) {
            itheta = (int)ecd_dec_uint(ec, qn + 1);
        } else {
            int ft = ((qn >> 1) + 1) * ((qn >> 1) + 1);
            int fm = (int)ecd_decode(ec, ft);
            int fs, fl;
            if (fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1)) {
                itheta = (isqrt32(8 * (uint32_t)fm + 1) - 1) >> 1;
                fs = itheta + 1;
                fl = itheta * (itheta + 1) >> 1;
            } else {
                itheta =
                    (2 * (qn + 1) - isqrt32(8 * (uint32_t)(ft - fm - 1) + 1))
                    >> 1;
                fs = qn + 1 - itheta;
                fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1);
            }
            ecd_update(ec, fl, fl + fs, ft);
        }
        itheta = itheta * 16384 / qn;
    } else if (stereo) {
        if (*b > 2 << BITRES && ctx->remaining_bits > 2 << BITRES)
            inv = ecd_dec_bit_logp(ec, 2);
        else
            inv = 0;
        if (ctx->disable_inv) inv = 0;
        itheta = 0;
    }
    qalloc = (int)ecd_tell_frac(ec) - tell;
    *b -= qalloc;

    if (itheta == 0) {
        imid = 32767;
        iside = 0;
        *fill &= (1 << bb) - 1;
        delta = -16384;
    } else if (itheta == 16384) {
        imid = 0;
        iside = 32767;
        *fill &= ((1 << bb) - 1) << bb;
        delta = 16384;
    } else {
        imid = bitexact_cos(itheta);
        iside = bitexact_cos(16384 - itheta);
        delta = frac_mul16((n - 1) << 7, bitexact_log2tan(iside, imid));
    }
    sctx->inv = inv;
    sctx->imid = imid;
    sctx->iside = iside;
    sctx->delta = delta;
    sctx->itheta = itheta;
    sctx->qalloc = qalloc;
}

static int quant_band_n1(bandctx *ctx, double *x, double *y,
                         double *lowband_out) {
    double *v[2];
    int nv = y ? 2 : 1, c;
    v[0] = x;
    v[1] = y;
    for (c = 0; c < nv; c++) {
        int sign = 0;
        if (ctx->remaining_bits >= 1 << BITRES) {
            sign = (int)ecd_dec_bits(ctx->ec, 1);
            ctx->remaining_bits -= 1 << BITRES;
        }
        v[c][0] = sign ? -NORM_SCALING : NORM_SCALING;
    }
    if (lowband_out) lowband_out[0] = x[0];
    return 1;
}

static int quant_partition(bandctx *ctx, double *x, int n, int b, int bb,
                           double *lowband, int LM, double gain, int fill) {
    const CeltModeC *m = ctx->m;
    int i = ctx->i;
    ecdec *ec = ctx->ec;
    int b0 = bb;
    int cm = 0;
    int cache_off = m->cache_index[(LM + 1) * m->nbEBands + i];
    const uint8_t *cache = m->cache_bits + cache_off;

    if (LM != -1 && b > (int)cache[cache[0]] + 12 && n > 2) {
        int mbits, sbits, rebalance;
        double *y;
        splitctx sctx;
        double mid, side;
        int itheta, delta, qalloc;
        n >>= 1;
        y = x + n;
        LM--;
        if (bb == 1) fill = (fill & 1) | (fill << 1);
        bb = (bb + 1) >> 1;
        compute_theta(ctx, &sctx, x, y, n, &b, bb, b0, LM, 0, &fill);
        itheta = sctx.itheta;
        delta = sctx.delta;
        qalloc = sctx.qalloc;
        mid = sctx.imid / 32768.0;
        side = sctx.iside / 32768.0;
        if (b0 > 1 && (itheta & 0x3fff)) {
            if (itheta > 8192)
                delta -= delta >> (4 - LM);
            else {
                int d2 = delta + (n << BITRES >> (5 - LM));
                delta = d2 < 0 ? d2 : 0;
            }
        }
        mbits = (b - delta) / 2;
        if (mbits > b) mbits = b;
        if (mbits < 0) mbits = 0;
        sbits = b - mbits;
        ctx->remaining_bits -= qalloc;
        {
            double *next_lowband2 = lowband ? lowband + n : NULL;
            rebalance = ctx->remaining_bits;
            if (mbits >= sbits) {
                cm = quant_partition(ctx, x, n, mbits, bb, lowband, LM,
                                     gain * mid, fill);
                rebalance = mbits - (rebalance - ctx->remaining_bits);
                if (rebalance > 3 << BITRES && itheta != 0)
                    sbits += rebalance - (3 << BITRES);
                cm |= quant_partition(ctx, y, n, sbits, bb, next_lowband2,
                                      LM, gain * side, fill >> bb)
                    << (b0 >> 1);
            } else {
                cm = quant_partition(ctx, y, n, sbits, bb, next_lowband2, LM,
                                     gain * side, fill >> bb) << (b0 >> 1);
                rebalance = sbits - (rebalance - ctx->remaining_bits);
                if (rebalance > 3 << BITRES && itheta != 16384)
                    mbits += rebalance - (3 << BITRES);
                cm |= quant_partition(ctx, x, n, mbits, bb, lowband, LM,
                                      gain * mid, fill);
            }
        }
    } else {
        int q = bits2pulses(m, i, LM, b);
        int curr_bits = pulses2bits(m, i, LM, q);
        ctx->remaining_bits -= curr_bits;
        while (ctx->remaining_bits < 0 && q > 0) {
            ctx->remaining_bits += curr_bits;
            q--;
            curr_bits = pulses2bits(m, i, LM, q);
            ctx->remaining_bits -= curr_bits;
        }
        if (q != 0) {
            int k = get_pulses(q);
            cm = alg_unquant(x, n, k, ctx->spread, bb, ec, gain,
                             ctx->iy_scratch);
        } else {
            int cm_mask = (1 << bb) - 1;
            int j;
            fill &= cm_mask;
            if (!fill) {
                memset(x, 0, n * sizeof(double));
            } else {
                if (lowband == NULL) {
                    for (j = 0; j < n; j++) {
                        ctx->seed = celt_lcg_rand(ctx->seed);
                        x[j] = (double)((int32_t)ctx->seed >> 20);
                    }
                    cm = cm_mask;
                } else {
                    for (j = 0; j < n; j++) {
                        double tmp;
                        ctx->seed = celt_lcg_rand(ctx->seed);
                        tmp = (ctx->seed & 0x8000) ? (1.0 / 256) : -(1.0 / 256);
                        x[j] = lowband[j] + tmp;
                    }
                    cm = fill;
                }
                renormalise_vector(x, n, gain);
            }
        }
    }
    return cm;
}

static int quant_band(bandctx *ctx, double *x, int n, int b, int bb,
                      double *lowband, int LM, double *lowband_out,
                      double gain, double *lowband_scratch, int fill) {
    int n0 = n;
    int n_b = n;
    int n_b0;
    int b0 = bb;
    int time_divide = 0;
    int recombine = 0;
    int long_blocks = b0 == 1;
    int cm = 0, k;
    int tf_change = ctx->tf_change;
    n_b /= bb;

    if (n == 1) return quant_band_n1(ctx, x, NULL, lowband_out);

    if (tf_change > 0) recombine = tf_change;
    if (lowband_scratch && lowband
        && (recombine || ((n_b & 1) == 0 && tf_change < 0) || b0 > 1)) {
        memcpy(lowband_scratch, lowband, n * sizeof(double));
        lowband = lowband_scratch;
    }
    for (k = 0; k < recombine; k++) {
        if (lowband) haar1(lowband, n >> k, 1 << k);
        fill = BIT_INTERLEAVE_TABLE[fill & 0xF]
            | BIT_INTERLEAVE_TABLE[fill >> 4] << 2;
    }
    bb >>= recombine;
    n_b <<= recombine;
    while ((n_b & 1) == 0 && tf_change < 0) {
        if (lowband) haar1(lowband, n_b, bb);
        fill |= fill << bb;
        bb <<= 1;
        n_b >>= 1;
        time_divide++;
        tf_change++;
    }
    b0 = bb;
    n_b0 = n_b;
    if (b0 > 1 && lowband)
        deinterleave_hadamard(lowband, n_b >> recombine, b0 << recombine,
                              long_blocks, ctx->scratch);

    cm = quant_partition(ctx, x, n, b, bb, lowband, LM, gain, fill);

    /* decode always resynthesizes */
    if (b0 > 1)
        interleave_hadamard(x, n_b >> recombine, b0 << recombine,
                            long_blocks, ctx->scratch);
    n_b = n_b0;
    bb = b0;
    for (k = 0; k < time_divide; k++) {
        bb >>= 1;
        n_b <<= 1;
        cm |= cm >> bb;
        haar1(x, n_b, bb);
    }
    for (k = 0; k < recombine; k++) {
        cm = BIT_DEINTERLEAVE_TABLE[cm];
        haar1(x, n0 >> k, 1 << k);
    }
    bb <<= recombine;
    if (lowband_out) {
        int j;
        double nrm = sqrt((double)n0);
        for (j = 0; j < n0; j++) lowband_out[j] = nrm * x[j];
    }
    cm &= (1 << bb) - 1;
    return cm;
}

static int quant_band_stereo(bandctx *ctx, double *x, double *y, int n,
                             int b, int bb, double *lowband, int LM,
                             double *lowband_out, double *lowband_scratch,
                             int fill) {
    int cm = 0;
    splitctx sctx;
    int orig_fill = fill;
    int inv, itheta, delta, qalloc;
    double mid, side;
    int mbits, sbits;
    ecdec *ec = ctx->ec;

    if (n == 1) return quant_band_n1(ctx, x, y, lowband_out);

    compute_theta(ctx, &sctx, x, y, n, &b, bb, bb, LM, 1, &fill);
    inv = sctx.inv;
    itheta = sctx.itheta;
    delta = sctx.delta;
    qalloc = sctx.qalloc;
    mid = sctx.imid / 32768.0;
    side = sctx.iside / 32768.0;

    if (n == 2) {
        int c, sign = 0;
        double *x2, *y2;
        mbits = b;
        sbits = 0;
        if (itheta != 0 && itheta != 16384) sbits = 1 << BITRES;
        mbits -= sbits;
        c = itheta > 8192;
        ctx->remaining_bits -= qalloc + sbits;
        x2 = c ? y : x;
        y2 = c ? x : y;
        if (sbits) sign = (int)ecd_dec_bits(ec, 1);
        sign = 1 - 2 * sign;
        cm = quant_band(ctx, x2, n, mbits, bb, lowband, LM, lowband_out,
                        1.0, lowband_scratch, orig_fill);
        y2[0] = -sign * x2[1];
        y2[1] = sign * x2[0];
        {
            double tmp;
            x[0] *= mid;
            x[1] *= mid;
            y[0] *= side;
            y[1] *= side;
            tmp = x[0];
            x[0] = tmp - y[0];
            y[0] = tmp + y[0];
            tmp = x[1];
            x[1] = tmp - y[1];
            y[1] = tmp + y[1];
        }
    } else {
        int rebalance;
        mbits = (b - delta) / 2;
        if (mbits > b) mbits = b;
        if (mbits < 0) mbits = 0;
        sbits = b - mbits;
        ctx->remaining_bits -= qalloc;
        rebalance = ctx->remaining_bits;
        if (mbits >= sbits) {
            cm = quant_band(ctx, x, n, mbits, bb, lowband, LM, lowband_out,
                            1.0, lowband_scratch, fill);
            rebalance = mbits - (rebalance - ctx->remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 0)
                sbits += rebalance - (3 << BITRES);
            cm |= quant_band(ctx, y, n, sbits, bb, NULL, LM, NULL, side,
                             NULL, fill >> bb);
        } else {
            cm = quant_band(ctx, y, n, sbits, bb, NULL, LM, NULL, side,
                            NULL, fill >> bb);
            rebalance = sbits - (rebalance - ctx->remaining_bits);
            if (rebalance > 3 << BITRES && itheta != 16384)
                mbits += rebalance - (3 << BITRES);
            cm |= quant_band(ctx, x, n, mbits, bb, lowband, LM, lowband_out,
                             1.0, lowband_scratch, fill);
        }
    }
    if (n != 2) stereo_merge(x, y, mid, n);
    if (inv) {
        int j;
        for (j = 0; j < n; j++) y[j] = -y[j];
    }
    return cm;
}

static void special_hybrid_folding(const CeltModeC *m, double *norm,
                                   double *norm2, int start, int M,
                                   int dual_stereo) {
    const int16_t *eb = m->eBands;
    int n1 = M * (eb[start + 1] - eb[start]);
    int n2 = M * (eb[start + 2] - eb[start + 1]);
    memmove(norm + n1, norm + 2 * n1 - n2, (n2 - n1) * sizeof(double));
    if (dual_stereo)
        memmove(norm2 + n1, norm2 + 2 * n1 - n2, (n2 - n1) * sizeof(double));
}

static uint32_t quant_all_bands(const CeltModeC *m, int start, int end,
                                double *x_, double *y_,
                                uint8_t *collapse_masks, const int *pulses,
                                int shortBlocks, int spread,
                                int dual_stereo, int intensity,
                                const int *tf_res, int32_t total_bits,
                                int32_t balance, ecdec *ec, int LM,
                                int coded_bands, uint32_t seed,
                                int disable_inv, double *norm_buf,
                                double *scratch, int *iy_scratch) {
    const int16_t *eBands = m->eBands;
    int M = 1 << LM;
    int B = shortBlocks ? M : 1;
    int norm_offset = M * eBands[start];
    int c = y_ ? 2 : 1;
    int norm_total = M * eBands[m->nbEBands - 1] - norm_offset;
    double *norm = norm_buf;
    double *norm2 = c == 2 ? norm_buf + norm_total : NULL;
    double *lowband_scratch = x_ + M * eBands[m->effEBands - 1];
    int lowband_offset = 0;
    int update_lowband = 1;
    int i;
    bandctx ctx;

    memset(norm_buf, 0, (size_t)c * norm_total * sizeof(double));
    ctx.m = m;
    ctx.i = 0;
    ctx.intensity = intensity;
    ctx.spread = spread;
    ctx.tf_change = 0;
    ctx.ec = ec;
    ctx.remaining_bits = 0;
    ctx.seed = seed;
    ctx.disable_inv = disable_inv;
    ctx.avoid_split_noise = B > 1;
    ctx.scratch = scratch;
    ctx.iy_scratch = iy_scratch;

    for (i = start; i < end; i++) {
        int last = i == end - 1;
        double *x = x_ + M * eBands[i];
        double *y = y_ ? y_ + M * eBands[i] : NULL;
        int n = M * eBands[i + 1] - M * eBands[i];
        int32_t tell = (int32_t)ecd_tell_frac(ec);
        int b, tf_change, x_cm, y_cm;
        int effective_lowband = -1;
        double *this_scratch = lowband_scratch;
        int32_t remaining_bits;

        ctx.i = i;
        if (i != start) balance -= tell;
        remaining_bits = total_bits - tell - 1;
        ctx.remaining_bits = remaining_bits;
        if (i <= coded_bands - 1) {
            int32_t curr_balance =
                balance / (coded_bands - i < 3 ? coded_bands - i : 3);
            int32_t bb = remaining_bits + 1;
            if (bb > pulses[i] + curr_balance) bb = pulses[i] + curr_balance;
            if (bb > 16383) bb = 16383;
            if (bb < 0) bb = 0;
            b = (int)bb;
        } else {
            b = 0;
        }
        if ((M * eBands[i] - n >= M * eBands[start] || i == start + 1)
            && (update_lowband || lowband_offset == 0))
            lowband_offset = i;
        if (i == start + 1)
            special_hybrid_folding(m, norm, norm2, start, M, dual_stereo);

        tf_change = tf_res[i];
        ctx.tf_change = tf_change;
        if (i >= m->effEBands) {
            x = norm;
            if (y_) y = norm2;
            this_scratch = NULL;
        }
        if (last) this_scratch = NULL;

        if (lowband_offset != 0
            && (spread != SPREAD_AGGRESSIVE || B > 1 || tf_change < 0)) {
            int fold_start, fold_end, fold_i;
            effective_lowband = M * eBands[lowband_offset] - norm_offset - n;
            if (effective_lowband < 0) effective_lowband = 0;
            fold_start = lowband_offset;
            while (M * eBands[--fold_start] >
                   effective_lowband + norm_offset);
            fold_end = lowband_offset - 1;
            while (++fold_end < i
                   && M * eBands[fold_end]
                       < effective_lowband + norm_offset + n);
            x_cm = y_cm = 0;
            fold_i = fold_start;
            do {
                x_cm |= collapse_masks[fold_i * c + 0];
                y_cm |= collapse_masks[fold_i * c + c - 1];
            } while (++fold_i < fold_end);
        } else {
            x_cm = y_cm = (1 << B) - 1;
        }
        if (dual_stereo && i == intensity) {
            int j;
            dual_stereo = 0;
            for (j = 0; j < M * eBands[i] - norm_offset; j++)
                norm[j] = 0.5 * (norm[j] + norm2[j]);
        }
        {
            double *lowband =
                effective_lowband != -1 ? norm + effective_lowband : NULL;
            double *lowband2 =
                (effective_lowband != -1 && norm2)
                    ? norm2 + effective_lowband : NULL;
            double *lowband_out =
                last ? NULL : norm + M * eBands[i] - norm_offset;
            double *lowband_out2 =
                (last || !norm2) ? NULL : norm2 + M * eBands[i] - norm_offset;

            if (dual_stereo) {
                x_cm = quant_band(&ctx, x, n, b / 2, B, lowband, LM,
                                  lowband_out, 1.0, this_scratch, x_cm);
                y_cm = quant_band(&ctx, y, n, b / 2, B, lowband2, LM,
                                  lowband_out2, 1.0, this_scratch, y_cm);
            } else {
                if (y) {
                    x_cm = quant_band_stereo(&ctx, x, y, n, b, B, lowband,
                                             LM, lowband_out, this_scratch,
                                             x_cm | y_cm);
                } else {
                    x_cm = quant_band(&ctx, x, n, b, B, lowband, LM,
                                      lowband_out, 1.0, this_scratch,
                                      x_cm | y_cm);
                }
                y_cm = x_cm;
            }
        }
        collapse_masks[i * c + 0] = (uint8_t)(x_cm & 0xFF);
        collapse_masks[i * c + c - 1] = (uint8_t)(y_cm & 0xFF);
        balance += pulses[i] + tell;
        update_lowband = b > (n << BITRES);
        ctx.avoid_split_noise = 0;
    }
    return ctx.seed;
}

static uint32_t anti_collapse(const CeltModeC *m, double *x_,
                              const uint8_t *collapse_masks, int LM, int C,
                              int size, int start, int end,
                              const double *logE, const double *prev1logE,
                              const double *prev2logE, const int *pulses,
                              uint32_t seed) {
    int i, ch, k, j;
    for (i = start; i < end; i++) {
        int n0 = m->eBands[i + 1] - m->eBands[i];
        int depth = ((1 + pulses[i]) / n0) >> LM;
        double thresh = 0.5 * exp2(-0.125 * depth);
        double sqrt_1 = 1.0 / sqrt((double)(n0 << LM));
        for (ch = 0; ch < C; ch++) {
            double prev1 = prev1logE[ch * m->nbEBands + i];
            double prev2 = prev2logE[ch * m->nbEBands + i];
            double ediff, r;
            double *x;
            int renormalize = 0;
            if (C == 1) {
                if (prev1logE[m->nbEBands + i] > prev1)
                    prev1 = prev1logE[m->nbEBands + i];
                if (prev2logE[m->nbEBands + i] > prev2)
                    prev2 = prev2logE[m->nbEBands + i];
            }
            ediff = logE[ch * m->nbEBands + i]
                - (prev1 < prev2 ? prev1 : prev2);
            if (ediff < 0.0) ediff = 0.0;
            r = 2.0 * exp2(-ediff);
            if (LM == 3) r *= 1.41421356;
            if (r > thresh) r = thresh;
            r = r * sqrt_1;
            x = x_ + ch * size + (m->eBands[i] << LM);
            for (k = 0; k < 1 << LM; k++) {
                if (!(collapse_masks[i * C + ch] & (1 << k))) {
                    for (j = 0; j < n0; j++) {
                        seed = celt_lcg_rand(seed);
                        x[(j << LM) + k] = (seed & 0x8000) ? r : -r;
                    }
                    renormalize = 1;
                }
            }
            if (renormalize) renormalise_vector(x, n0 << LM, 1.0);
        }
    }
    return seed;
}

/* ------------------------------------------------------------------ */
/* per-stream decoder state + frame driver                             */

typedef struct {
    double oldEBands[2 * MAXB];
    double oldLogE[2 * MAXB];
    double oldLogE2[2 * MAXB];
    double backgroundLogE[2 * MAXB];
    uint32_t rng;
    int32_t loss_duration;
    int32_t postfilter_period, postfilter_period_old;
    double postfilter_gain, postfilter_gain_old;
    int32_t postfilter_tapset, postfilter_tapset_old;
} symstate;

typedef struct {
    int32_t silence, is_transient, intra, anti_collapse_on, error;
    /* comb-filter call parameters for the TPU postfilter:
       block 0 (first shortMdctSize samples): t0/t1/g0/g1/ts0/ts1;
       rest of frame (LM>0): t1b/g1b/ts1b with t0=t1,g0=g1,ts0=ts1 */
    int32_t pf_t0, pf_t1, pf_t1b;
    double pf_g0, pf_g1, pf_g1b;
    int32_t pf_ts0, pf_ts1, pf_ts1b;
    uint32_t rng;
} symout;

void celt_state_init(symstate *st) {
    int i;
    memset(st, 0, sizeof(*st));
    for (i = 0; i < 2 * MAXB; i++) {
        st->oldLogE[i] = -28.0;
        st->oldLogE2[i] = -28.0;
        st->backgroundLogE[i] = -28.0;
    }
}

#define COMBFILTER_MINPERIOD 15

/* Decode one frame's symbols.  X_out: [C*N] doubles (normalized band
 * shapes); eBands_out: [2*nbEBands] energies as used by synthesis.
 * Returns 0 on success, negative on error (mirrors decode_with_ec's
 * data path; reference: celt_decode_with_ec celt/celt_decoder.c:1619). */
int celt_decode_symbols(const void *mode, symstate *st,
                        const unsigned char *data, int32_t len, int32_t LM,
                        int32_t C, int32_t start, int32_t end,
                        int32_t disable_inv, float *Xf_out,
                        double *eBands_out, symout *out, double *work) {
    const CeltModeC *m = (const CeltModeC *)mode;
    ecdec dec;
    int nbEBands = m->nbEBands;
    int M = 1 << LM;
    int N = M * m->shortMdctSize;
    int total_bits, tell, silence, is_transient, intra_ener;
    int postfilter_gain_i = 0, postfilter_pitch = 0, postfilter_tapset = 0;
    double postfilter_gain = 0.0;
    int tf_res[MAXB];
    int cap[MAXB], offsets[MAXB];
    int pulses[MAXB], fine_quant[MAXB], fine_priority[MAXB];
    int intensity = 0, dual_stereo = 0;
    int alloc_trim, spread_decision;
    int32_t bits, balance = 0;
    int anti_collapse_rsv, anti_collapse_on = 0;
    int coded_bands, i, ch, eff_end;
    uint8_t collapse_masks[2 * MAXB];
    double *oldBandE = st->oldEBands;
    double *oldLogE = st->oldLogE;
    double *oldLogE2 = st->oldLogE2;
    double *backgroundLogE = st->backgroundLogE;
    /* workspace layout: X [2*N], norm [2 * M*eBands[nb-1]], scratch [N],
       iy [N] (as doubles) */
    double *X_out = work;
    double *norm_buf = X_out + 2 * N;
    double *scratch = norm_buf + 2 * (M * m->eBands[nbEBands - 1]);
    int *iy_scratch = (int *)(scratch + N);

    memset(out, 0, sizeof(*out));
    pthread_once(&u_once, build_u_table);
    if (len <= 1 || data == NULL) return -1; /* PLC handled elsewhere */
    ecd_init(&dec, data, len);

    if (C == 1)
        for (i = 0; i < nbEBands; i++)
            if (oldBandE[nbEBands + i] > oldBandE[i])
                oldBandE[i] = oldBandE[nbEBands + i];

    total_bits = len * 8;
    tell = ecd_tell(&dec);
    if (tell >= total_bits) silence = 1;
    else if (tell == 1) silence = ecd_dec_bit_logp(&dec, 15);
    else silence = 0;
    if (silence) {
        tell = len * 8;
        dec.nbits_total += tell - ecd_tell(&dec);
    }
    if (start == 0 && tell + 16 <= total_bits) {
        if (ecd_dec_bit_logp(&dec, 1)) {
            int octave = (int)ecd_dec_uint(&dec, 6);
            postfilter_pitch =
                (16 << octave) + (int)ecd_dec_bits(&dec, 4 + octave) - 1;
            postfilter_gain_i = (int)ecd_dec_bits(&dec, 3);
            if (ecd_tell(&dec) + 2 <= total_bits)
                postfilter_tapset = ecd_dec_icdf(&dec, TAPSET_ICDF, 2);
            postfilter_gain = 0.09375 * (postfilter_gain_i + 1);
        }
        tell = ecd_tell(&dec);
    }
    if (LM > 0 && tell + 3 <= total_bits) {
        is_transient = ecd_dec_bit_logp(&dec, 3);
        tell = ecd_tell(&dec);
    } else {
        is_transient = 0;
    }
    intra_ener = tell + 3 <= total_bits ? ecd_dec_bit_logp(&dec, 3) : 0;

    if (!intra_ener && st->loss_duration != 0) {
        /* energy decay for the first frame after loss
           (reference: celt_decoder.c:1360-1383) */
        for (ch = 0; ch < 2; ch++) {
            double safety = 0.0;
            int missing = st->loss_duration >> LM;
            if (missing > 10) missing = 10;
            if (LM == 0) safety = 1.5;
            else if (LM == 1) safety = 0.5;
            for (i = start; i < end; i++) {
                int k = ch * nbEBands + i;
                double m1 = oldLogE[k] > oldLogE2[k] ? oldLogE[k]
                                                     : oldLogE2[k];
                if (oldBandE[k] < m1) {
                    double e0 = oldBandE[k];
                    double slope = oldLogE[k] - e0;
                    double s2 = 0.5 * (oldLogE2[k] - e0);
                    if (s2 > slope) slope = s2;
                    if (slope > 2.0) slope = 2.0;
                    e0 -= (1 + missing) * slope > 0.0
                        ? (1 + missing) * slope : 0.0;
                    oldBandE[k] = e0 > -20.0 ? e0 : -20.0;
                } else {
                    double mn = oldBandE[k];
                    if (oldLogE[k] < mn) mn = oldLogE[k];
                    if (oldLogE2[k] < mn) mn = oldLogE2[k];
                    oldBandE[k] = mn;
                }
                oldBandE[k] -= safety;
            }
        }
    }

    unquant_coarse_energy(m, start, end, oldBandE, intra_ener, &dec, C, LM);
    memset(tf_res, 0, sizeof(tf_res));
    tf_decode(start, end, is_transient, tf_res, LM, &dec);

    tell = ecd_tell(&dec);
    spread_decision = 2; /* SPREAD_NORMAL */
    if (tell + 4 <= total_bits)
        spread_decision = ecd_dec_icdf(&dec, SPREAD_ICDF, 5);

    init_caps(m, cap, LM, C);
    memset(offsets, 0, sizeof(offsets));
    {
        int dynalloc_logp = 6;
        int32_t total_bits8 = (int32_t)total_bits << BITRES;
        int32_t tellf = (int32_t)ecd_tell_frac(&dec);
        for (i = start; i < end; i++) {
            int width, quanta, dynalloc_loop_logp, boost;
            width = C * (m->eBands[i + 1] - m->eBands[i]) << LM;
            quanta = width << BITRES;
            if (quanta > (6 << BITRES > width ? 6 << BITRES : width))
                quanta = 6 << BITRES > width ? 6 << BITRES : width;
            dynalloc_loop_logp = dynalloc_logp;
            boost = 0;
            while (tellf + (dynalloc_loop_logp << BITRES) < total_bits8
                   && boost < cap[i]) {
                int flag = ecd_dec_bit_logp(&dec, dynalloc_loop_logp);
                tellf = (int32_t)ecd_tell_frac(&dec);
                if (!flag) break;
                boost += quanta;
                total_bits8 -= quanta;
                dynalloc_loop_logp = 1;
            }
            offsets[i] = boost;
            if (boost > 0)
                dynalloc_logp = dynalloc_logp - 1 > 2 ? dynalloc_logp - 1 : 2;
        }
        alloc_trim = tellf + (6 << BITRES) <= total_bits8
            ? ecd_dec_icdf(&dec, TRIM_ICDF, 7) : 5;
    }

    bits = ((int32_t)len * 8 << BITRES) - (int32_t)ecd_tell_frac(&dec) - 1;
    anti_collapse_rsv =
        (is_transient && LM >= 2 && bits >= (LM + 2) << BITRES)
            ? 1 << BITRES : 0;
    bits -= anti_collapse_rsv;

    coded_bands = compute_allocation(m, start, end, offsets, cap,
                                     alloc_trim, &intensity, &dual_stereo,
                                     bits, &balance, pulses, fine_quant,
                                     fine_priority, C, LM, &dec, NULL, 0,
                                     0, 0);

    unquant_fine_energy(m, start, end, oldBandE, fine_quant, &dec, C);

    memset(X_out, 0, (size_t)C * N * sizeof(double));
    memset(collapse_masks, 0, sizeof(collapse_masks));
    st->rng = quant_all_bands(m, start, end, X_out,
                              C == 2 ? X_out + N : NULL, collapse_masks,
                              pulses, is_transient ? M : 0, spread_decision,
                              dual_stereo, intensity, tf_res,
                              (int32_t)len * (8 << BITRES)
                                  - anti_collapse_rsv,
                              balance, &dec, LM, coded_bands, st->rng,
                              disable_inv, norm_buf, scratch, iy_scratch);

    if (anti_collapse_rsv > 0) anti_collapse_on = (int)ecd_dec_bits(&dec, 1);

    unquant_energy_finalise(m, start, end, oldBandE, fine_quant,
                            fine_priority, len * 8 - ecd_tell(&dec), &dec,
                            C);

    if (anti_collapse_on)
        st->rng = anti_collapse(m, X_out, collapse_masks, LM, C, N, start,
                                end, oldBandE, oldLogE, oldLogE2, pulses,
                                st->rng);

    if (silence)
        for (i = 0; i < 2 * nbEBands; i++) oldBandE[i] = -28.0;

    /* energies as the synthesis stage must see them */
    memcpy(eBands_out, oldBandE, 2 * nbEBands * sizeof(double));

    /* postfilter parameters for the TPU comb filter, mirroring the state
       rotation in decode_with_ec (opus_tpu/celt/decoder.py:567-595) */
    {
        int pp = st->postfilter_period > COMBFILTER_MINPERIOD
            ? st->postfilter_period : COMBFILTER_MINPERIOD;
        int ppo = st->postfilter_period_old > COMBFILTER_MINPERIOD
            ? st->postfilter_period_old : COMBFILTER_MINPERIOD;
        out->pf_t0 = ppo;
        out->pf_t1 = pp;
        out->pf_g0 = st->postfilter_gain_old;
        out->pf_g1 = st->postfilter_gain;
        out->pf_ts0 = st->postfilter_tapset_old;
        out->pf_ts1 = st->postfilter_tapset;
        out->pf_t1b = postfilter_pitch;
        out->pf_g1b = postfilter_gain;
        out->pf_ts1b = postfilter_tapset;
        st->postfilter_period = pp;
        st->postfilter_period_old = ppo;
        st->postfilter_period_old = st->postfilter_period;
        st->postfilter_gain_old = st->postfilter_gain;
        st->postfilter_tapset_old = st->postfilter_tapset;
        st->postfilter_period = postfilter_pitch;
        st->postfilter_gain = postfilter_gain;
        st->postfilter_tapset = postfilter_tapset;
        if (LM != 0) {
            st->postfilter_period_old = st->postfilter_period;
            st->postfilter_gain_old = st->postfilter_gain;
            st->postfilter_tapset_old = st->postfilter_tapset;
        }
    }

    if (C == 1)
        memcpy(oldBandE + nbEBands, oldBandE, nbEBands * sizeof(double));

    if (!is_transient) {
        memcpy(oldLogE2, oldLogE, 2 * nbEBands * sizeof(double));
        memcpy(oldLogE, oldBandE, 2 * nbEBands * sizeof(double));
    } else {
        for (i = 0; i < 2 * nbEBands; i++)
            if (oldBandE[i] < oldLogE[i]) oldLogE[i] = oldBandE[i];
    }
    {
        double max_bg = (st->loss_duration + M < 160
                         ? st->loss_duration + M : 160) * 0.001;
        for (i = 0; i < 2 * nbEBands; i++) {
            double v = backgroundLogE[i] + max_bg;
            backgroundLogE[i] = v < oldBandE[i] ? v : oldBandE[i];
        }
    }
    for (ch = 0; ch < 2; ch++) {
        for (i = 0; i < start; i++) {
            oldBandE[ch * nbEBands + i] = 0;
            oldLogE[ch * nbEBands + i] = -28.0;
            oldLogE2[ch * nbEBands + i] = -28.0;
        }
        for (i = end; i < nbEBands; i++) {
            oldBandE[ch * nbEBands + i] = 0;
            oldLogE[ch * nbEBands + i] = -28.0;
            oldLogE2[ch * nbEBands + i] = -28.0;
        }
    }
    st->rng = dec.rng;
    st->loss_duration = 0;

    out->silence = silence;
    out->is_transient = is_transient;
    out->intra = intra_ener;
    out->anti_collapse_on = anti_collapse_on;
    out->rng = st->rng;
    eff_end = end < m->effEBands ? end : m->effEBands;
    (void)eff_end;
    for (i = 0; i < C * N; i++) Xf_out[i] = (float)X_out[i];
    if (ecd_tell(&dec) > 8 * len) {
        out->error = -3;
        return -3;
    }
    if (dec.error) out->error = 1;
    return 0;
}

int32_t celt_sym_state_size(void) { return (int32_t)sizeof(symstate); }
int32_t celt_sym_out_size(void) { return (int32_t)sizeof(symout); }

/* workspace doubles needed per thread for a given mode/LM */
int32_t celt_work_size(const void *mode, int32_t LM) {
    const CeltModeC *m = (const CeltModeC *)mode;
    int M = 1 << LM;
    int N = M * m->shortMdctSize;
    /* X (2 ch) + norm (2 ch) + scratch + iy (int array fits in N doubles) */
    return 2 * N + 2 * (M * m->eBands[m->nbEBands - 1]) + N + N;
}

/* ------------------------------------------------------------------ */
/* batch driver with a simple pthread fan-out                          */

typedef struct {
    const void *mode;
    symstate *states;
    const unsigned char *buf;
    const int64_t *offsets;
    const int32_t *lens;
    int32_t lm, C, start, end, disable_inv;
    float *X_out;        /* [ns, C*N] */
    float *e_out;        /* [ns, C, nb] */
    double *pf_out;      /* [ns, 6]: t0,t1,t1b,g0,g1,g1b */
    int32_t *flag_out;   /* [ns, 8]: silence,transient,intra,anti_collapse,
                            error,ts0,ts1,ts1b */
    symout *outs;
    int32_t nstreams;
    int32_t xstride, estride;
    int32_t *rets;
    /* work partition */
    int32_t begin, step;
    double *work;
} batchjob;

static void *batch_worker(void *arg) {
    batchjob *j = (batchjob *)arg;
    const CeltModeC *m = (const CeltModeC *)j->mode;
    int32_t s;
    int i, ch;
    double ebuf[2 * MAXB];
    for (s = j->begin; s < j->nstreams; s += j->step) {
        symout *o = j->outs + s;
        j->rets[s] = celt_decode_symbols(
            j->mode, j->states + s, j->buf + j->offsets[s], j->lens[s],
            j->lm, j->C, j->start, j->end, j->disable_inv,
            j->X_out + (size_t)s * j->xstride, ebuf, o, j->work);
        for (ch = 0; ch < j->C; ch++)
            for (i = 0; i < m->nbEBands; i++)
                j->e_out[(size_t)s * j->estride + ch * m->nbEBands + i] =
                    (float)ebuf[ch * m->nbEBands + i];
        j->pf_out[s * 6 + 0] = o->pf_t0;
        j->pf_out[s * 6 + 1] = o->pf_t1;
        j->pf_out[s * 6 + 2] = o->pf_t1b;
        j->pf_out[s * 6 + 3] = o->pf_g0;
        j->pf_out[s * 6 + 4] = o->pf_g1;
        j->pf_out[s * 6 + 5] = o->pf_g1b;
        j->flag_out[s * 8 + 0] = o->silence;
        j->flag_out[s * 8 + 1] = o->is_transient;
        j->flag_out[s * 8 + 2] = o->intra;
        j->flag_out[s * 8 + 3] = o->anti_collapse_on;
        j->flag_out[s * 8 + 4] = o->error;
        j->flag_out[s * 8 + 5] = o->pf_ts0;
        j->flag_out[s * 8 + 6] = o->pf_ts1;
        j->flag_out[s * 8 + 7] = o->pf_ts1b;
    }
    return NULL;
}

void celt_decode_symbols_batch(const void *mode, int32_t nstreams,
                               symstate *states, const unsigned char *buf,
                               const int64_t *offsets, const int32_t *lens,
                               int32_t lm, int32_t C, int32_t start,
                               int32_t end, int32_t disable_inv,
                               float *X_out, float *e_out, double *pf_out,
                               int32_t *flag_out, symout *outs,
                               int32_t *rets, int32_t nthreads) {
    const CeltModeC *m = (const CeltModeC *)mode;
    int32_t wsz = celt_work_size(mode, lm);
    int32_t N = (1 << lm) * m->shortMdctSize;
    int t;
    pthread_once(&u_once, build_u_table);
    if (nthreads < 1) nthreads = 1;
    if (nthreads > nstreams) nthreads = nstreams;
    {
        pthread_t threads[64];
        batchjob jobs[64];
        double *work = (double *)malloc((size_t)nthreads * wsz
                                        * sizeof(double));
        if (nthreads > 64) nthreads = 64;
        for (t = 0; t < nthreads; t++) {
            jobs[t].mode = mode;
            jobs[t].states = states;
            jobs[t].buf = buf;
            jobs[t].offsets = offsets;
            jobs[t].lens = lens;
            jobs[t].lm = lm;
            jobs[t].C = C;
            jobs[t].start = start;
            jobs[t].end = end;
            jobs[t].disable_inv = disable_inv;
            jobs[t].X_out = X_out;
            jobs[t].e_out = e_out;
            jobs[t].pf_out = pf_out;
            jobs[t].flag_out = flag_out;
            jobs[t].outs = outs;
            jobs[t].nstreams = nstreams;
            jobs[t].xstride = C * N;
            jobs[t].estride = C * m->nbEBands;
            jobs[t].rets = rets;
            jobs[t].begin = t;
            jobs[t].step = nthreads;
            jobs[t].work = work + (size_t)t * wsz;
        }
        if (nthreads == 1) {
            batch_worker(&jobs[0]);
        } else {
            for (t = 0; t < nthreads; t++)
                pthread_create(&threads[t], NULL, batch_worker, &jobs[t]);
            for (t = 0; t < nthreads; t++) pthread_join(threads[t], NULL);
        }
        free(work);
    }
}

/* Native SILK symbol pass: whole-packet decode to symbol tensors.
 *
 * Turns one SILK-only mono packet per stream into the tensors the batched
 * TPU synthesis stage (opus_tpu/models/batched_silk.py) consumes:
 * excitation exc_Q14, per-subframe gains (+ derived gain_adj / inv-gain /
 * whitening gains), LPC and LTP coefficients, pitch lags and flags.
 * Everything downstream of the range decoder that is *sequential symbol
 * work* lives here; everything that is *parallel sample math* (LTP/LPC
 * synthesis, whitening FIR) runs batched on the TPU in int32-exact form.
 *
 * Reference behavior: silk/dec_API.c:135 (silk_Decode), decode_frame.c,
 * decode_indices.c, decode_pulses.c, shell_coder.c, code_signs.c,
 * decode_parameters.c, decode_pitch.c, gain_quant.c (silk_gains_dequant),
 * NLSF_decode.c, NLSF_unpack.c, NLSF_stabilize.c, NLSF2A.c, LPC_fit.c,
 * LPC_inv_pred_gain.c, log2lin.c, Inlines.h.  The scalar Python decoder
 * (opus_tpu/silk/decoder.py) is the bit-exact oracle these outputs are
 * tested against (tests/test_native_silk.py).
 */

#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <pthread.h>

#include "entropy.h"
#include "silk_tables.h"

/* ------------------------------------------------------------------ */
/* constants (silk/define.h)                                           */

#define MAX_NB_SUBFR 4
#define SUB_FRAME_LENGTH_MS 5
#define LTP_MEM_LENGTH_MS 20
#define LTP_ORDER 5
#define MIN_LPC_ORDER 10
#define MAX_LPC_ORDER 16
#define SHELL_FRAME 16
#define LOG2_SHELL_FRAME 4
#define SILK_MAX_PULSES 16
#define N_RATE_LEVELS 10
#define MIN_DELTA_GAIN_QUANT (-4)
#define MAX_DELTA_GAIN_QUANT 36
#define N_LEVELS_QGAIN 64
#define QUANT_LEVEL_ADJUST_Q10 80
#define NLSF_QUANT_MAX_AMPLITUDE 4
#define NLSF_QUANT_LEVEL_ADJ_Q10 102   /* SILK_FIX_CONST(0.1, 10) */
#define MAX_LPC_STABILIZE_ITERATIONS 16
#define PE_MIN_LAG_MS 2
#define PE_MAX_LAG_MS 18
#define TYPE_NO_VOICE_ACTIVITY 0
#define TYPE_UNVOICED 1
#define TYPE_VOICED 2
#define CODE_INDEPENDENTLY 0
#define CODE_INDEPENDENTLY_NO_LTP_SCALING 1
#define CODE_CONDITIONALLY 2
#define MAX_FRAMES_PER_PACKET 3
#define MAX_FRAME_LEN (MAX_NB_SUBFR * SUB_FRAME_LENGTH_MS * 16)  /* 320 */

#define I32_MAX 2147483647
#define I32_MIN (-2147483647 - 1)

/* ------------------------------------------------------------------ */
/* fixed-point helpers (silk/SigProc_FIX.h, macros.h, Inlines.h)       */

static inline int32_t silk_SMULWB(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * (int16_t)b) >> 16);
}
static inline int32_t silk_SMLAWB(int32_t a, int32_t b, int32_t c) {
    return a + (int32_t)(((int64_t)b * (int16_t)c) >> 16);
}
static inline int32_t silk_SMULWW(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * b) >> 16);
}
static inline int32_t silk_SMLAWW(int32_t a, int32_t b, int32_t c) {
    return a + (int32_t)(((int64_t)b * c) >> 16);
}
static inline int32_t silk_SMULBB(int32_t a, int32_t b) {
    return (int32_t)(int16_t)a * (int16_t)b;
}
static inline int32_t silk_SMMUL(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * b) >> 32);
}
static inline int32_t silk_RSHIFT_ROUND(int32_t a, int shift) {
    return shift == 1 ? (a >> 1) + (a & 1) : ((a >> (shift - 1)) + 1) >> 1;
}
static inline int64_t silk_RSHIFT_ROUND64(int64_t a, int shift) {
    return shift == 1 ? (a >> 1) + (a & 1) : ((a >> (shift - 1)) + 1) >> 1;
}
static inline int32_t silk_SAT16(int32_t a) {
    return a > 32767 ? 32767 : (a < -32768 ? -32768 : a);
}
static inline int32_t silk_SAT32(int64_t a) {
    return a > I32_MAX ? I32_MAX : (a < I32_MIN ? I32_MIN : (int32_t)a);
}
static inline int32_t silk_ADD_SAT32(int32_t a, int32_t b) {
    return silk_SAT32((int64_t)a + b);
}
static inline int32_t silk_LSHIFT_SAT32(int32_t a, int shift) {
    return silk_SAT32((int64_t)a << shift);
}
static inline int silk_CLZ32(int32_t x) {
    uint32_t u = (uint32_t)x;
    int n = 0;
    if (!u) return 32;
    while (!(u & 0x80000000u)) { n++; u <<= 1; }
    return n;
}
static inline int32_t silk_DIV32_16(int32_t a, int32_t b) { return a / b; }

static inline int32_t silk_INVERSE32_varQ(int32_t b32, int qres) {
    /* (reference: silk/Inlines.h:139) */
    int b_headrm = silk_CLZ32(b32 > 0 ? b32 : -b32) - 1;
    int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
    int32_t b32_inv = silk_DIV32_16(I32_MAX >> 2, (int16_t)(b32_nrm >> 16));
    int32_t result = (int32_t)((uint32_t)b32_inv << 16);
    int32_t err_q32 = (int32_t)((uint32_t)((1 << 29)
                                - silk_SMULWB(b32_nrm, b32_inv)) << 3);
    int lshift;
    result = silk_SMLAWW(result, err_q32, b32_inv);
    lshift = 61 - b_headrm - qres;
    if (lshift <= 0) return silk_LSHIFT_SAT32(result, -lshift);
    if (lshift < 32) return result >> lshift;
    return 0;
}

static inline int32_t silk_DIV32_varQ(int32_t a32, int32_t b32, int qres) {
    /* (reference: silk/Inlines.h:93) */
    int a_headrm = silk_CLZ32(a32 > 0 ? a32 : -a32) - 1;
    int32_t a32_nrm = (int32_t)((uint32_t)a32 << a_headrm);
    int b_headrm = silk_CLZ32(b32 > 0 ? b32 : -b32) - 1;
    int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
    int32_t b32_inv = silk_DIV32_16(I32_MAX >> 2, (int16_t)(b32_nrm >> 16));
    int32_t result = silk_SMULWB(a32_nrm, b32_inv);
    int lshift;
    a32_nrm -= (int32_t)((uint32_t)silk_SMMUL(b32_nrm, result) << 3);
    result = silk_SMLAWB(result, a32_nrm, b32_inv);
    lshift = 29 + a_headrm - b_headrm - qres;
    if (lshift < 0) return silk_LSHIFT_SAT32(result, -lshift);
    if (lshift < 32) return result >> lshift;
    return 0;
}

static inline int32_t silk_log2lin(int32_t in_log_q7) {
    /* (reference: silk/log2lin.c) */
    int32_t out, frac_q7;
    if (in_log_q7 < 0) return 0;
    if (in_log_q7 >= 3967) return I32_MAX;
    out = 1 << (in_log_q7 >> 7);
    frac_q7 = in_log_q7 & 0x7F;
    if (in_log_q7 < 2048)
        out += (out * silk_SMLAWB(frac_q7,
                                  silk_SMULBB(frac_q7, 128 - frac_q7),
                                  -174)) >> 7;
    else
        out += (out >> 7) * silk_SMLAWB(frac_q7,
                                        silk_SMULBB(frac_q7, 128 - frac_q7),
                                        -174);
    return out;
}

static inline int32_t silk_RAND(int32_t seed) {
    return (int32_t)(907633515u + (uint32_t)seed * 196314165u);
}

/* ------------------------------------------------------------------ */
/* NLSF codebook descriptors (silk/structs.h NLSF_CB_struct)           */

typedef struct {
    int nVectors, order;
    int32_t quantStepSize_Q16;
    const uint8_t *CB1_NLSF_Q8;
    const int16_t *CB1_Wght_Q9;
    const uint8_t *CB1_iCDF;
    const uint8_t *pred_Q8;
    const uint8_t *ec_sel;
    const uint8_t *ec_iCDF;
    const int16_t *deltaMin_Q15;
} nlsf_cb;

static const nlsf_cb CB_NB_MB = {
    32, 10, 11796, silk_NLSF_CB1_NB_MB_Q8, silk_NLSF_CB1_Wght_NB_MB_Q9,
    silk_NLSF_CB1_iCDF_NB_MB, silk_NLSF_PRED_NB_MB_Q8,
    silk_NLSF_CB2_SELECT_NB_MB, silk_NLSF_CB2_iCDF_NB_MB,
    silk_NLSF_DELTA_MIN_NB_MB_Q15,
};
static const nlsf_cb CB_WB = {
    32, 16, 9830, silk_NLSF_CB1_WB_Q8, silk_NLSF_CB1_Wght_WB_Q9,
    silk_NLSF_CB1_iCDF_WB, silk_NLSF_PRED_WB_Q8,
    silk_NLSF_CB2_SELECT_WB, silk_NLSF_CB2_iCDF_WB,
    silk_NLSF_DELTA_MIN_WB_Q15,
};

/* ------------------------------------------------------------------ */
/* per-stream decoder state (ctypes mirror in silk_symbols.py)         */

typedef struct {
    int32_t fs_khz;
    int32_t nb_subfr;
    int32_t first_frame_after_reset;
    int32_t LastGainIndex;
    int32_t ec_prevSignalType;
    int32_t ec_prevLagIndex;
    int32_t prev_gain_Q16;
    int32_t nFramesDecoded;
    int16_t prevNLSF_Q15[MAX_LPC_ORDER];
} silk_symstate;

/* per-frame symbol outputs (ctypes mirror) */
typedef struct {
    int32_t error;
    int32_t signal_type;
    int32_t quant_offset_type;
    int32_t nlsf_interp_flag;    /* 1 when NLSFInterpCoef_Q2 < 4 */
    int32_t ltp_scale_q14;
    int32_t rewhiten0;           /* voiced: rewhiten at subframe 0 */
    int32_t rewhiten2;           /* voiced && interp: rewhiten at subframe 2 */
    int32_t seed;
    int32_t pitchL[MAX_NB_SUBFR];
    int32_t gains_q16[MAX_NB_SUBFR];
    int32_t gain_q10[MAX_NB_SUBFR];
    int32_t gain_adj_q16[MAX_NB_SUBFR];
    int32_t whiten_gain_q31[MAX_NB_SUBFR];  /* used at rewhiten points */
    int16_t a_q12[2][MAX_LPC_ORDER];
    int16_t b_q14[MAX_NB_SUBFR][LTP_ORDER];
} silk_symout;

void silk_sym_state_init(silk_symstate *st, int32_t fs_khz,
                         int32_t nb_subfr) {
    memset(st, 0, sizeof(*st));
    st->fs_khz = fs_khz;
    st->nb_subfr = nb_subfr;
    st->first_frame_after_reset = 1;
    st->LastGainIndex = 10;
    st->ec_prevSignalType = TYPE_NO_VOICE_ACTIVITY;
    st->prev_gain_Q16 = 1 << 16;
}

int32_t silk_sym_state_size(void) { return (int32_t)sizeof(silk_symstate); }
int32_t silk_sym_out_size(void) { return (int32_t)sizeof(silk_symout); }

/* ------------------------------------------------------------------ */
/* NLSF -> LPC (silk/NLSF2A.c, LPC_fit.c, LPC_inv_pred_gain.c,         */
/* bwexpander_32.c)                                                    */

static void bwexpander_32(int32_t *ar, int d, int32_t chirp_q16) {
    int32_t chirp_minus_one = chirp_q16 - 65536;
    int i;
    for (i = 0; i < d - 1; i++) {
        ar[i] = silk_SMULWW(chirp_q16, ar[i]);
        chirp_q16 += silk_RSHIFT_ROUND(
            (int32_t)((int64_t)chirp_q16 * chirp_minus_one >> 0), 16);
    }
    ar[d - 1] = silk_SMULWW(chirp_q16, ar[d - 1]);
}

#define QA24 24
#define A_LIMIT 16773022   /* SILK_FIX_CONST(0.99975, 24) */

static int32_t lpc_inverse_pred_gain_qa(int32_t *a_qa, int order) {
    int32_t inv_gain_q30 = 1 << 30;
    int k, n;
    for (k = order - 1; k > 0; k--) {
        int32_t rc_q31, rc_mult1_q30, rc_mult2;
        int mult2q;
        if (a_qa[k] > A_LIMIT || a_qa[k] < -A_LIMIT) return 0;
        rc_q31 = -(int32_t)((uint32_t)a_qa[k] << (31 - QA24));
        rc_mult1_q30 = (1 << 30) - silk_SMMUL(rc_q31, rc_q31);
        inv_gain_q30 = (int32_t)((uint32_t)silk_SMMUL(inv_gain_q30,
                                                      rc_mult1_q30) << 2);
        if (inv_gain_q30 < 107374 /* SILK_FIX_CONST(1/1e4, 30) */) return 0;
        mult2q = 32 - silk_CLZ32(rc_mult1_q30 > 0 ? rc_mult1_q30
                                                  : -rc_mult1_q30);
        rc_mult2 = silk_INVERSE32_varQ(rc_mult1_q30, mult2q + 30);
        for (n = 0; n < (k + 1) >> 1; n++) {
            int64_t t64;
            int32_t tmp1 = a_qa[n], tmp2 = a_qa[k - n - 1];
            t64 = silk_RSHIFT_ROUND64(
                (int64_t)silk_SAT32(tmp1
                    - (int32_t)(((int64_t)tmp2 * rc_q31) >> 31)) * rc_mult2,
                mult2q);
            if (t64 > I32_MAX || t64 < I32_MIN) return 0;
            a_qa[n] = (int32_t)t64;
            t64 = silk_RSHIFT_ROUND64(
                (int64_t)silk_SAT32(tmp2
                    - (int32_t)(((int64_t)tmp1 * rc_q31) >> 31)) * rc_mult2,
                mult2q);
            if (t64 > I32_MAX || t64 < I32_MIN) return 0;
            a_qa[k - n - 1] = (int32_t)t64;
        }
    }
    {
        int32_t rc_q31, rc_mult1_q30;
        if (a_qa[0] > A_LIMIT || a_qa[0] < -A_LIMIT) return 0;
        rc_q31 = -(int32_t)((uint32_t)a_qa[0] << (31 - QA24));
        rc_mult1_q30 = (1 << 30) - silk_SMMUL(rc_q31, rc_q31);
        inv_gain_q30 = (int32_t)((uint32_t)silk_SMMUL(inv_gain_q30,
                                                      rc_mult1_q30) << 2);
        if (inv_gain_q30 < 107374) return 0;
    }
    return inv_gain_q30;
}

static int32_t lpc_inverse_pred_gain(const int16_t *a_q12, int order) {
    int32_t a_qa[MAX_LPC_ORDER];
    int32_t dc_resp = 0;
    int k;
    for (k = 0; k < order; k++) {
        dc_resp += a_q12[k];
        a_qa[k] = (int32_t)a_q12[k] << (QA24 - 12);
    }
    if (dc_resp >= 4096) return 0;
    return lpc_inverse_pred_gain_qa(a_qa, order);
}

static void silk_lpc_fit(int16_t *a_out, int32_t *a_qin, int qout, int qin,
                         int d) {
    int i, k;
    for (i = 0; i < 10; i++) {
        int32_t maxabs = 0;
        int idx = 0;
        for (k = 0; k < d; k++) {
            int32_t absval = a_qin[k] > 0 ? a_qin[k] : -a_qin[k];
            if (absval > maxabs) { maxabs = absval; idx = k; }
        }
        maxabs = silk_RSHIFT_ROUND(maxabs, qin - qout);
        if (maxabs > 32767) {
            int32_t chirp_q16;
            maxabs = maxabs < 163838 ? maxabs : 163838;
            chirp_q16 = 65470 /* 0.999 Q16 */
                - ((int32_t)((uint32_t)(maxabs - 32767) << 14))
                      / ((maxabs * (idx + 1)) >> 2);
            bwexpander_32(a_qin, d, chirp_q16);
        } else {
            break;
        }
    }
    if (i == 10) {
        for (k = 0; k < d; k++) {
            a_out[k] = (int16_t)silk_SAT16(
                silk_RSHIFT_ROUND(a_qin[k], qin - qout));
            a_qin[k] = (int32_t)((uint32_t)a_out[k] << (qin - qout));
        }
    } else {
        for (k = 0; k < d; k++)
            a_out[k] = (int16_t)silk_SAT16(
                silk_RSHIFT_ROUND(a_qin[k], qin - qout));
    }
}

static void nlsf2a(int16_t *a_q12, const int16_t *nlsf_q15, int d) {
    static const uint8_t ord16[16] =
        {0, 15, 8, 7, 4, 11, 12, 3, 2, 13, 10, 5, 6, 9, 14, 1};
    static const uint8_t ord10[10] = {0, 9, 6, 3, 4, 5, 8, 1, 2, 7};
    const uint8_t *ordering = d == 16 ? ord16 : ord10;
    const int qa = 16;
    int32_t cos_lsf_qa[MAX_LPC_ORDER];
    int32_t p[MAX_LPC_ORDER / 2 + 1], q[MAX_LPC_ORDER / 2 + 1];
    int32_t a32_qa1[MAX_LPC_ORDER];
    int k, n, dd = d >> 1, iter;
    for (k = 0; k < d; k++) {
        int f_int = nlsf_q15[k] >> (15 - 7);
        int f_frac = nlsf_q15[k] - (f_int << (15 - 7));
        int32_t cos_val = silk_LSFCosTab_FIX_Q12[f_int];
        int32_t delta = silk_LSFCosTab_FIX_Q12[f_int + 1] - cos_val;
        cos_lsf_qa[ordering[k]] = silk_RSHIFT_ROUND(
            (int32_t)((uint32_t)cos_val << 8) + delta * f_frac, 20 - qa);
    }
    /* find roots polynomials P and Q (silk_NLSF2A_find_poly) */
    {
        int off;
        int32_t *out;
        for (off = 0; off < 2; off++) {
            out = off == 0 ? p : q;
            out[0] = 1 << qa;
            out[1] = -cos_lsf_qa[off];
            for (k = 1; k < dd; k++) {
                int32_t ftmp = cos_lsf_qa[2 * k + off];
                out[k + 1] = (int32_t)((uint32_t)out[k - 1] << 1)
                    - (int32_t)silk_RSHIFT_ROUND64((int64_t)ftmp * out[k], qa);
                for (n = k; n > 1; n--)
                    out[n] += out[n - 2]
                        - (int32_t)silk_RSHIFT_ROUND64(
                              (int64_t)ftmp * out[n - 1], qa);
                out[1] -= ftmp;
            }
        }
    }
    for (k = 0; k < dd; k++) {
        int32_t ptmp = p[k + 1] + p[k];
        int32_t qtmp = q[k + 1] - q[k];
        a32_qa1[k] = -qtmp - ptmp;
        a32_qa1[d - k - 1] = qtmp - ptmp;
    }
    silk_lpc_fit(a_q12, a32_qa1, 12, qa + 1, d);
    for (iter = 0; lpc_inverse_pred_gain(a_q12, d) == 0
                   && iter < MAX_LPC_STABILIZE_ITERATIONS; iter++) {
        bwexpander_32(a32_qa1, d, 65536 - (2 << iter));
        for (k = 0; k < d; k++)
            a_q12[k] = (int16_t)silk_SAT16(
                silk_RSHIFT_ROUND(a32_qa1[k], qa + 1 - 12));
    }
}

/* ------------------------------------------------------------------ */
/* NLSF decode (silk/NLSF_decode.c, NLSF_unpack.c, NLSF_stabilize.c)   */

static void nlsf_unpack(int16_t *ec_ix, uint8_t *pred_q8, const nlsf_cb *cb,
                        int cb1_index) {
    int i;
    const uint8_t *sel = cb->ec_sel + cb1_index * cb->order / 2;
    for (i = 0; i < cb->order; i += 2) {
        uint8_t entry = sel[i / 2];
        ec_ix[i] = (int16_t)(((entry >> 1) & 7)
                             * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1));
        pred_q8[i] = cb->pred_Q8[i + (entry & 1) * (cb->order - 1)];
        ec_ix[i + 1] = (int16_t)(((entry >> 5) & 7)
                                 * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1));
        pred_q8[i + 1] = cb->pred_Q8[i + ((entry >> 4) & 1)
                                     * (cb->order - 1) + 1];
    }
}

static void nlsf_stabilize(int16_t *nlsf, const int16_t *dmin, int L) {
    int i, loops, I = 0;
    for (loops = 0; loops < 20; loops++) {
        int32_t min_diff = nlsf[0] - dmin[0];
        int32_t diff;
        I = 0;
        for (i = 1; i < L; i++) {
            diff = nlsf[i] - (nlsf[i - 1] + dmin[i]);
            if (diff < min_diff) { min_diff = diff; I = i; }
        }
        diff = (1 << 15) - (nlsf[L - 1] + dmin[L]);
        if (diff < min_diff) { min_diff = diff; I = L; }
        if (min_diff >= 0) return;
        if (I == 0) {
            nlsf[0] = dmin[0];
        } else if (I == L) {
            nlsf[L - 1] = (int16_t)((1 << 15) - dmin[L]);
        } else {
            int32_t min_center = dmin[I] >> 1, max_center;
            int32_t center;
            for (i = 0; i < I; i++) min_center += dmin[i];
            max_center = (1 << 15) - (dmin[I] >> 1);
            for (i = I + 1; i <= L; i++) max_center -= dmin[i];
            center = silk_RSHIFT_ROUND(nlsf[I - 1] + nlsf[I], 1);
            if (center < min_center) center = min_center;
            if (center > max_center) center = max_center;
            nlsf[I - 1] = (int16_t)(center - (dmin[I] >> 1));
            nlsf[I] = (int16_t)(nlsf[I - 1] + dmin[I]);
        }
    }
    /* fallback: sort and force minimum distances */
    {
        int16_t tmp;
        int j;
        for (i = 1; i < L; i++)           /* insertion sort */
            for (j = i; j > 0 && nlsf[j] < nlsf[j - 1]; j--) {
                tmp = nlsf[j]; nlsf[j] = nlsf[j - 1]; nlsf[j - 1] = tmp;
            }
        if (nlsf[0] < dmin[0]) nlsf[0] = dmin[0];
        for (i = 1; i < L; i++) {
            int32_t lo = nlsf[i - 1] + dmin[i];
            if (lo > 32767) lo = 32767;
            if (nlsf[i] < lo) nlsf[i] = (int16_t)lo;
        }
        if (nlsf[L - 1] > (1 << 15) - dmin[L])
            nlsf[L - 1] = (int16_t)((1 << 15) - dmin[L]);
        for (i = L - 2; i >= 0; i--)
            if (nlsf[i] > nlsf[i + 1] - dmin[i + 1])
                nlsf[i] = (int16_t)(nlsf[i + 1] - dmin[i + 1]);
    }
}

static void nlsf_decode(int16_t *nlsf, const int8_t *indices,
                        const nlsf_cb *cb) {
    int16_t ec_ix[MAX_LPC_ORDER];
    uint8_t pred_q8[MAX_LPC_ORDER];
    int32_t res_q10[MAX_LPC_ORDER];
    int i;
    int32_t out = 0;
    nlsf_unpack(ec_ix, pred_q8, cb, indices[0]);
    for (i = cb->order - 1; i >= 0; i--) {
        int32_t pred = (out * pred_q8[i]) >> 8;
        out = (int32_t)indices[i + 1] << 10;
        if (out > 0) out -= NLSF_QUANT_LEVEL_ADJ_Q10;
        else if (out < 0) out += NLSF_QUANT_LEVEL_ADJ_Q10;
        out = silk_SMLAWB(pred, out, cb->quantStepSize_Q16);
        res_q10[i] = out;
    }
    for (i = 0; i < cb->order; i++) {
        int32_t tmp = silk_DIV32_16(
            (int32_t)((uint32_t)res_q10[i] << 14),
            cb->CB1_Wght_Q9[indices[0] * cb->order + i])
            + ((int32_t)cb->CB1_NLSF_Q8[indices[0] * cb->order + i] << 7);
        if (tmp < 0) tmp = 0;
        if (tmp > 32767) tmp = 32767;
        nlsf[i] = (int16_t)tmp;
    }
    nlsf_stabilize(nlsf, cb->deltaMin_Q15, cb->order);
}

/* ------------------------------------------------------------------ */
/* gains (silk/gain_quant.c silk_gains_dequant)                        */

static void gains_dequant(int32_t *gains_q16, const int8_t *ind,
                          int32_t *prev_ind, int conditional, int nb_subfr) {
    int k;
    for (k = 0; k < nb_subfr; k++) {
        if (k == 0 && !conditional) {
            if (*prev_ind - 16 > ind[k]) *prev_ind = *prev_ind - 16;
            else *prev_ind = ind[k];
        } else {
            int32_t ind_tmp = ind[k] + MIN_DELTA_GAIN_QUANT;
            int32_t dst = 2 * MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN
                          + *prev_ind;
            if (ind_tmp > dst) *prev_ind += (ind_tmp << 1) - dst;
            else *prev_ind += ind_tmp;
        }
        if (*prev_ind < 0) *prev_ind = 0;
        if (*prev_ind > N_LEVELS_QGAIN - 1) *prev_ind = N_LEVELS_QGAIN - 1;
        {
            int32_t lg = silk_SMULWB(SILK_GAIN_INV_SCALE_Q16, *prev_ind)
                         + SILK_GAIN_OFFSET;
            if (lg > 3967) lg = 3967;
            gains_q16[k] = silk_log2lin(lg);
        }
    }
}

/* ------------------------------------------------------------------ */
/* pitch lags (silk/decode_pitch.c)                                    */

static void decode_pitch(int32_t *pitch_lags, int16_t lag_index,
                         int8_t contour_index, int fs_khz, int nb_subfr) {
    const int8_t *cb;
    int stride, k;
    int min_lag = PE_MIN_LAG_MS * fs_khz;
    int max_lag = PE_MAX_LAG_MS * fs_khz;
    int lag = min_lag + lag_index;
    if (fs_khz == 8) {
        if (nb_subfr == MAX_NB_SUBFR) { cb = silk_CB_lags_stage2; stride = 11; }
        else { cb = silk_CB_lags_stage2_10_ms; stride = 3; }
    } else {
        if (nb_subfr == MAX_NB_SUBFR) { cb = silk_CB_lags_stage3; stride = 34; }
        else { cb = silk_CB_lags_stage3_10_ms; stride = 12; }
    }
    for (k = 0; k < nb_subfr; k++) {
        int l = lag + cb[k * stride + contour_index];
        pitch_lags[k] = l < min_lag ? min_lag : (l > max_lag ? max_lag : l);
    }
}

/* ------------------------------------------------------------------ */
/* side-info indices (silk/decode_indices.c)                           */

typedef struct {
    int8_t GainsIndices[MAX_NB_SUBFR];
    int8_t LTPIndex[MAX_NB_SUBFR];
    int8_t NLSFIndices[MAX_LPC_ORDER + 1];
    int16_t lagIndex;
    int8_t contourIndex;
    int8_t signalType;
    int8_t quantOffsetType;
    int8_t NLSFInterpCoef_Q2;
    int8_t PERIndex;
    int8_t LTP_scaleIndex;
    int8_t Seed;
} sideinfo;

static void decode_indices(silk_symstate *st, ecdec *dec, sideinfo *ind,
                           int vad_flag, int decode_lbrr, int cond_coding) {
    int i, k, ix;
    const nlsf_cb *cb = st->fs_khz >= 16 ? &CB_WB : &CB_NB_MB;
    if (decode_lbrr || vad_flag)
        ix = ecd_dec_icdf(dec, silk_type_offset_VAD_iCDF, 8) + 2;
    else
        ix = ecd_dec_icdf(dec, silk_type_offset_no_VAD_iCDF, 8);
    ind->signalType = (int8_t)(ix >> 1);
    ind->quantOffsetType = (int8_t)(ix & 1);

    if (cond_coding == CODE_CONDITIONALLY) {
        ind->GainsIndices[0] = (int8_t)ecd_dec_icdf(dec, silk_delta_gain_iCDF,
                                                    8);
    } else {
        ind->GainsIndices[0] = (int8_t)(ecd_dec_icdf(
            dec, silk_gain_iCDF + ind->signalType * 8, 8) << 3);
        ind->GainsIndices[0] += (int8_t)ecd_dec_icdf(dec, silk_uniform8_iCDF,
                                                     8);
    }
    for (i = 1; i < st->nb_subfr; i++)
        ind->GainsIndices[i] = (int8_t)ecd_dec_icdf(dec, silk_delta_gain_iCDF,
                                                    8);

    ind->NLSFIndices[0] = (int8_t)ecd_dec_icdf(
        dec, cb->CB1_iCDF + (ind->signalType >> 1) * cb->nVectors, 8);
    {
        int16_t ec_ix[MAX_LPC_ORDER];
        uint8_t pred_q8[MAX_LPC_ORDER];
        nlsf_unpack(ec_ix, pred_q8, cb, ind->NLSFIndices[0]);
        for (i = 0; i < cb->order; i++) {
            ix = ecd_dec_icdf(dec, cb->ec_iCDF + ec_ix[i], 8);
            if (ix == 0)
                ix -= ecd_dec_icdf(dec, silk_NLSF_EXT_iCDF, 8);
            else if (ix == 2 * NLSF_QUANT_MAX_AMPLITUDE)
                ix += ecd_dec_icdf(dec, silk_NLSF_EXT_iCDF, 8);
            ind->NLSFIndices[i + 1] = (int8_t)(ix - NLSF_QUANT_MAX_AMPLITUDE);
        }
    }

    if (st->nb_subfr == MAX_NB_SUBFR)
        ind->NLSFInterpCoef_Q2 = (int8_t)ecd_dec_icdf(
            dec, silk_NLSF_interpolation_factor_iCDF, 8);
    else
        ind->NLSFInterpCoef_Q2 = 4;

    if (ind->signalType == TYPE_VOICED) {
        int decode_absolute = 1;
        const uint8_t *contour_icdf;
        if (cond_coding == CODE_CONDITIONALLY
            && st->ec_prevSignalType == TYPE_VOICED) {
            int delta = ecd_dec_icdf(dec, silk_pitch_delta_iCDF, 8);
            if (delta > 0) {
                ind->lagIndex = (int16_t)(st->ec_prevLagIndex + (delta - 9));
                decode_absolute = 0;
            }
        }
        if (decode_absolute) {
            const uint8_t *low_icdf =
                st->fs_khz == 16 ? silk_uniform8_iCDF
                : (st->fs_khz == 12 ? silk_uniform6_iCDF : silk_uniform4_iCDF);
            ind->lagIndex = (int16_t)(ecd_dec_icdf(dec, silk_pitch_lag_iCDF, 8)
                                      * (st->fs_khz >> 1));
            ind->lagIndex += (int16_t)ecd_dec_icdf(dec, low_icdf, 8);
        }
        st->ec_prevLagIndex = ind->lagIndex;
        if (st->fs_khz == 8)
            contour_icdf = st->nb_subfr == MAX_NB_SUBFR
                ? silk_pitch_contour_NB_iCDF : silk_pitch_contour_10_ms_NB_iCDF;
        else
            contour_icdf = st->nb_subfr == MAX_NB_SUBFR
                ? silk_pitch_contour_iCDF : silk_pitch_contour_10_ms_iCDF;
        ind->contourIndex = (int8_t)ecd_dec_icdf(dec, contour_icdf, 8);

        ind->PERIndex = (int8_t)ecd_dec_icdf(dec, silk_LTP_per_index_iCDF, 8);
        for (k = 0; k < st->nb_subfr; k++) {
            const uint8_t *gain_icdf =
                ind->PERIndex == 0 ? silk_LTP_gain_iCDF_0
                : (ind->PERIndex == 1 ? silk_LTP_gain_iCDF_1
                                      : silk_LTP_gain_iCDF_2);
            ind->LTPIndex[k] = (int8_t)ecd_dec_icdf(dec, gain_icdf, 8);
        }
        if (cond_coding == CODE_INDEPENDENTLY)
            ind->LTP_scaleIndex = (int8_t)ecd_dec_icdf(dec, silk_LTPscale_iCDF,
                                                       8);
        else
            ind->LTP_scaleIndex = 0;
    } else {
        ind->lagIndex = 0;
        ind->contourIndex = 0;
        ind->PERIndex = 0;
        ind->LTP_scaleIndex = 0;
    }
    st->ec_prevSignalType = ind->signalType;
    ind->Seed = (int8_t)ecd_dec_icdf(dec, silk_uniform4_iCDF, 8);
}

/* ------------------------------------------------------------------ */
/* excitation (silk/decode_pulses.c, shell_coder.c, code_signs.c)      */

static void shell_decoder(int16_t *pulses, ecdec *dec, int pulses4) {
    int16_t p3[2], p2[4], p1[8];
#define SPLIT(c1, c2, p, table)                                            \
    do {                                                                   \
        if ((p) > 0) {                                                     \
            (c1) = (int16_t)ecd_dec_icdf(                                  \
                dec, table + silk_shell_code_table_offsets[(p)], 8);       \
            (c2) = (int16_t)((p) - (c1));                                  \
        } else { (c1) = 0; (c2) = 0; }                                     \
    } while (0)
    SPLIT(p3[0], p3[1], pulses4, silk_shell_code_table3);
    SPLIT(p2[0], p2[1], p3[0], silk_shell_code_table2);
    SPLIT(p1[0], p1[1], p2[0], silk_shell_code_table1);
    SPLIT(pulses[0], pulses[1], p1[0], silk_shell_code_table0);
    SPLIT(pulses[2], pulses[3], p1[1], silk_shell_code_table0);
    SPLIT(p1[2], p1[3], p2[1], silk_shell_code_table1);
    SPLIT(pulses[4], pulses[5], p1[2], silk_shell_code_table0);
    SPLIT(pulses[6], pulses[7], p1[3], silk_shell_code_table0);
    SPLIT(p2[2], p2[3], p3[1], silk_shell_code_table2);
    SPLIT(p1[4], p1[5], p2[2], silk_shell_code_table1);
    SPLIT(pulses[8], pulses[9], p1[4], silk_shell_code_table0);
    SPLIT(pulses[10], pulses[11], p1[5], silk_shell_code_table0);
    SPLIT(p1[6], p1[7], p2[3], silk_shell_code_table1);
    SPLIT(pulses[12], pulses[13], p1[6], silk_shell_code_table0);
    SPLIT(pulses[14], pulses[15], p1[7], silk_shell_code_table0);
#undef SPLIT
}

static void decode_pulses(ecdec *dec, int16_t *pulses, int signal_type,
                          int quant_offset_type, int frame_length) {
    int i, j, k;
    int rate_level_index = ecd_dec_icdf(
        dec, silk_rate_levels_iCDF + (signal_type >> 1) * 9, 8);
    int niter = frame_length >> LOG2_SHELL_FRAME;
    int sum_pulses[MAX_FRAME_LEN / SHELL_FRAME];
    int n_lshifts[MAX_FRAME_LEN / SHELL_FRAME];
    if (niter * SHELL_FRAME < frame_length) niter++;
    for (i = 0; i < niter; i++) {
        n_lshifts[i] = 0;
        sum_pulses[i] = ecd_dec_icdf(
            dec, silk_pulses_per_block_iCDF + rate_level_index * 18, 8);
        while (sum_pulses[i] == SILK_MAX_PULSES + 1) {
            n_lshifts[i]++;
            sum_pulses[i] = ecd_dec_icdf(
                dec, silk_pulses_per_block_iCDF + (N_RATE_LEVELS - 1) * 18
                     + (n_lshifts[i] == 10 ? 1 : 0), 8);
        }
    }
    for (i = 0; i < niter; i++) {
        if (sum_pulses[i] > 0)
            shell_decoder(pulses + i * SHELL_FRAME, dec, sum_pulses[i]);
        else
            memset(pulses + i * SHELL_FRAME, 0,
                   SHELL_FRAME * sizeof(int16_t));
    }
    for (i = 0; i < niter; i++) {
        if (n_lshifts[i] > 0) {
            int nls = n_lshifts[i];
            for (k = 0; k < SHELL_FRAME; k++) {
                int32_t abs_q = pulses[i * SHELL_FRAME + k];
                for (j = 0; j < nls; j++)
                    abs_q = (abs_q << 1)
                            + ecd_dec_icdf(dec, silk_lsb_iCDF, 8);
                pulses[i * SHELL_FRAME + k] = (int16_t)abs_q;
            }
            sum_pulses[i] |= nls << 5;
        }
    }
    /* signs (silk/code_signs.c silk_decode_signs) */
    {
        int i0 = 7 * (quant_offset_type + (signal_type << 1));
        uint8_t icdf[2] = {0, 0};
        int nblocks = (frame_length + SHELL_FRAME / 2) >> LOG2_SHELL_FRAME;
        int q = 0;
        for (i = 0; i < nblocks; i++) {
            int p = sum_pulses[i];
            if (p > 0) {
                int pm = p & 0x1F;
                icdf[0] = silk_sign_iCDF[i0 + (pm < 6 ? pm : 6)];
                for (j = 0; j < SHELL_FRAME; j++)
                    if (pulses[q + j] > 0)
                        pulses[q + j] = (int16_t)(pulses[q + j]
                            * (2 * ecd_dec_icdf(dec, icdf, 8) - 1));
            }
            q += SHELL_FRAME;
        }
    }
}

/* ------------------------------------------------------------------ */
/* one frame -> symbol tensors (decode_frame.c + decode_parameters.c   */
/* + the decode_core.c excitation construction, core.c:80-96)          */

static void decode_frame_symbols(silk_symstate *st, ecdec *dec,
                                 int vad_flag, int cond_coding,
                                 int32_t *exc_q14, silk_symout *out) {
    sideinfo ind;
    int16_t pulses[MAX_FRAME_LEN + SHELL_FRAME];
    int16_t nlsf[MAX_LPC_ORDER];
    int lpc_order = st->fs_khz >= 16 ? MAX_LPC_ORDER : MIN_LPC_ORDER;
    int subfr_length = SUB_FRAME_LENGTH_MS * st->fs_khz;
    int frame_length = st->nb_subfr * subfr_length;
    const nlsf_cb *cb = st->fs_khz >= 16 ? &CB_WB : &CB_NB_MB;
    int i, k;

    memset(out, 0, sizeof(*out));
    decode_indices(st, dec, &ind, vad_flag, 0, cond_coding);
    decode_pulses(dec, pulses, ind.signalType, ind.quantOffsetType,
                  frame_length);

    /* --- decode_parameters.c --- */
    {
        int32_t last_gain = st->LastGainIndex;
        gains_dequant(out->gains_q16, ind.GainsIndices, &last_gain,
                      cond_coding == CODE_CONDITIONALLY, st->nb_subfr);
        st->LastGainIndex = last_gain;
    }
    nlsf_decode(nlsf, ind.NLSFIndices, cb);
    nlsf2a(out->a_q12[1], nlsf, lpc_order);

    if (st->first_frame_after_reset) ind.NLSFInterpCoef_Q2 = 4;
    if (ind.NLSFInterpCoef_Q2 < 4) {
        int16_t nlsf0[MAX_LPC_ORDER];
        for (i = 0; i < lpc_order; i++)
            nlsf0[i] = (int16_t)(st->prevNLSF_Q15[i]
                + ((ind.NLSFInterpCoef_Q2
                    * (nlsf[i] - st->prevNLSF_Q15[i])) >> 2));
        nlsf2a(out->a_q12[0], nlsf0, lpc_order);
    } else {
        memcpy(out->a_q12[0], out->a_q12[1],
               lpc_order * sizeof(int16_t));
    }
    memcpy(st->prevNLSF_Q15, nlsf, lpc_order * sizeof(int16_t));
    /* lossCnt is always 0 in the batched path (losses fall back to the
     * scalar decoder), so the BWE_AFTER_LOSS expansion never applies */

    if (ind.signalType == TYPE_VOICED) {
        const int8_t *vq = ind.PERIndex == 0 ? silk_LTP_vq_0_Q7
            : (ind.PERIndex == 1 ? silk_LTP_vq_1_Q7 : silk_LTP_vq_2_Q7);
        decode_pitch(out->pitchL, ind.lagIndex, ind.contourIndex, st->fs_khz,
                     st->nb_subfr);
        for (k = 0; k < st->nb_subfr; k++)
            for (i = 0; i < LTP_ORDER; i++)
                out->b_q14[k][i] =
                    (int16_t)((int32_t)vq[ind.LTPIndex[k] * LTP_ORDER + i]
                              << 7);
        out->ltp_scale_q14 = silk_LTPScales_table_Q14[ind.LTP_scaleIndex];
    } else {
        out->ltp_scale_q14 = 0;
    }

    /* --- excitation (decode_core.c:80-96) --- */
    {
        int32_t rand_seed = ind.Seed;
        int offset_q10 = silk_Quantization_Offsets_Q10[
            (ind.signalType >> 1) * 2 + ind.quantOffsetType];
        for (i = 0; i < frame_length; i++) {
            int32_t exc;
            rand_seed = silk_RAND(rand_seed);
            exc = (int32_t)((uint32_t)pulses[i] << 14);
            if (exc > 0) exc -= QUANT_LEVEL_ADJUST_Q10 << 4;
            else if (exc < 0) exc += QUANT_LEVEL_ADJUST_Q10 << 4;
            exc += offset_q10 << 4;
            if (rand_seed < 0) exc = -exc;
            exc_q14[i] = exc;
            rand_seed = (int32_t)((uint32_t)rand_seed + pulses[i]);
        }
    }

    /* --- derived per-subframe gain terms for the TPU synthesis --- */
    for (k = 0; k < st->nb_subfr; k++) {
        int32_t g = out->gains_q16[k];
        out->gain_q10[k] = g >> 6;
        if (g != st->prev_gain_Q16)
            out->gain_adj_q16[k] = silk_DIV32_varQ(st->prev_gain_Q16, g, 16);
        else
            out->gain_adj_q16[k] = 1 << 16;
        st->prev_gain_Q16 = g;
        {
            int32_t inv = silk_INVERSE32_varQ(g, 47);
            if (k == 0)
                inv = (int32_t)((uint32_t)silk_SMULWB(
                    inv, out->ltp_scale_q14) << 2);
            out->whiten_gain_q31[k] = inv;
        }
    }

    out->signal_type = ind.signalType;
    out->quant_offset_type = ind.quantOffsetType;
    out->nlsf_interp_flag = ind.NLSFInterpCoef_Q2 < 4 ? 1 : 0;
    out->seed = ind.Seed;
    out->rewhiten0 = ind.signalType == TYPE_VOICED;
    out->rewhiten2 = ind.signalType == TYPE_VOICED
                     && ind.NLSFInterpCoef_Q2 < 4;
    st->first_frame_after_reset = 0;
    out->error = dec->error;
}

/* ------------------------------------------------------------------ */
/* packet driver (silk/dec_API.c silk_Decode, mono normal decode)      */

int32_t silk_decode_symbols(silk_symstate *st, const unsigned char *data,
                            int32_t len, int32_t nframes,
                            int32_t *exc_q14, silk_symout *outs) {
    ecdec dec;
    int vad_flags[MAX_FRAMES_PER_PACKET];
    int lbrr_flags[MAX_FRAMES_PER_PACKET] = {0, 0, 0};
    int lbrr_flag, i, f;
    int subfr_length = SUB_FRAME_LENGTH_MS * st->fs_khz;
    int frame_length = st->nb_subfr * subfr_length;
    if (nframes < 1 || nframes > MAX_FRAMES_PER_PACKET) return -1;
    ecd_init(&dec, data, len);

    /* header flags (dec_API.c:252-263) */
    for (i = 0; i < nframes; i++) vad_flags[i] = ecd_dec_bit_logp(&dec, 1);
    lbrr_flag = ecd_dec_bit_logp(&dec, 1);
    if (lbrr_flag) {
        if (nframes == 1) {
            lbrr_flags[0] = 1;
        } else {
            int sym = ecd_dec_icdf(
                &dec, nframes == 2 ? silk_LBRR_flags_2_iCDF
                                   : silk_LBRR_flags_3_iCDF, 8) + 1;
            for (i = 0; i < nframes; i++) lbrr_flags[i] = (sym >> i) & 1;
        }
        /* skip LBRR data (dec_API.c:266-285): decode and discard */
        for (i = 0; i < nframes; i++) {
            if (lbrr_flags[i]) {
                sideinfo ind;
                int16_t pulses[MAX_FRAME_LEN + SHELL_FRAME];
                int cond = (i > 0 && lbrr_flags[i - 1])
                           ? CODE_CONDITIONALLY : CODE_INDEPENDENTLY;
                decode_indices(st, &dec, &ind, 1, 1, cond);
                decode_pulses(&dec, pulses, ind.signalType,
                              ind.quantOffsetType, frame_length);
            }
        }
    }

    st->nFramesDecoded = 0;
    for (f = 0; f < nframes; f++) {
        int cond = st->nFramesDecoded <= 0 ? CODE_INDEPENDENTLY
                                           : CODE_CONDITIONALLY;
        decode_frame_symbols(st, &dec, vad_flags[f], cond,
                             exc_q14 + f * frame_length, &outs[f]);
        st->nFramesDecoded++;
        if (dec.error) return -2;
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* batch driver with a pthread fan-out (mirrors celt_dec.c)            */

typedef struct {
    silk_symstate *states;
    const unsigned char *buf;
    const int64_t *offsets;
    const int32_t *lens;
    int32_t nframes;
    int32_t frame_length;
    int32_t *exc_out;
    silk_symout *outs;
    int32_t *rets;
    int32_t nstreams;
    int begin, step;
} silk_batchjob;

static void *silk_batch_worker(void *arg) {
    silk_batchjob *j = (silk_batchjob *)arg;
    int s;
    for (s = j->begin; s < j->nstreams; s += j->step)
        j->rets[s] = silk_decode_symbols(
            &j->states[s], j->buf + j->offsets[s], j->lens[s], j->nframes,
            j->exc_out + (size_t)s * j->nframes * j->frame_length,
            j->outs + (size_t)s * j->nframes);
    return NULL;
}

void silk_decode_symbols_batch(int32_t nstreams, silk_symstate *states,
                               const unsigned char *buf,
                               const int64_t *offsets, const int32_t *lens,
                               int32_t nframes, int32_t *exc_out,
                               silk_symout *outs, int32_t *rets,
                               int32_t nthreads) {
    pthread_t threads[64];
    silk_batchjob jobs[64];
    int t;
    int frame_length = states[0].nb_subfr * SUB_FRAME_LENGTH_MS
                       * states[0].fs_khz;
    if (nthreads < 1) nthreads = 1;
    if (nthreads > nstreams) nthreads = nstreams;
    if (nthreads > 64) nthreads = 64;
    for (t = 0; t < nthreads; t++) {
        jobs[t].states = states;
        jobs[t].buf = buf;
        jobs[t].offsets = offsets;
        jobs[t].lens = lens;
        jobs[t].nframes = nframes;
        jobs[t].frame_length = frame_length;
        jobs[t].exc_out = exc_out;
        jobs[t].outs = outs;
        jobs[t].rets = rets;
        jobs[t].nstreams = nstreams;
        jobs[t].begin = t;
        jobs[t].step = nthreads;
    }
    if (nthreads == 1) {
        silk_batch_worker(&jobs[0]);
    } else {
        for (t = 0; t < nthreads; t++)
            pthread_create(&threads[t], NULL, silk_batch_worker, &jobs[t]);
        for (t = 0; t < nthreads; t++) pthread_join(threads[t], NULL);
    }
}

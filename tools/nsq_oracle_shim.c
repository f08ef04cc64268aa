/* Oracle shim for silk_NSQ_c / silk_NSQ_del_dec_c with caller-controlled
 * state: differential-tests opus_tpu/silk/nsq_del_dec.py (and the
 * single-state NSQ) against the reference quantizers on identical inputs.
 * Test-only; nothing from here ships. */
#include "main.h"
#include <string.h>

/* Runs the reference NSQ on one frame.  All arrays caller-provided.
 * nsq_blob is a silk_nsq_state-sized opaque buffer owned by the caller so
 * state carries across calls exactly like the Python side. */
int oracle_nsq_size(void) { return (int)sizeof(silk_nsq_state); }

void oracle_nsq_init(unsigned char *nsq_blob) {
    silk_nsq_state *nsq = (silk_nsq_state *)nsq_blob;
    memset(nsq, 0, sizeof(*nsq));
    nsq->prev_gain_Q16 = 65536;
}

void oracle_nsq_run(
    int use_del_dec, int n_states, int warping_q16,
    int fs_khz, int nb_subfr, int predict_order, int shaping_order,
    unsigned char *nsq_blob,
    int signal_type, int quant_offset_type, int seed, int nlsf_interp_q2,
    const opus_int16 *x16,                /* [frame_length] */
    opus_int8 *pulses,                    /* [frame_length] out */
    const opus_int16 *pred_coef_q12,      /* [2*MAX_LPC_ORDER] */
    const opus_int16 *ltp_coef_q14,       /* [LTP_ORDER*MAX_NB_SUBFR] */
    const opus_int16 *ar_q13,             /* [MAX_NB_SUBFR*MAX_SHAPE_LPC_ORDER] */
    const int *harm_shape_gain_q14,       /* [MAX_NB_SUBFR] */
    const int *tilt_q14,                  /* [MAX_NB_SUBFR] */
    const opus_int32 *lf_shp_q14,         /* [MAX_NB_SUBFR] */
    const opus_int32 *gains_q16,          /* [MAX_NB_SUBFR] */
    const int *pitch_l,                   /* [MAX_NB_SUBFR] */
    int lambda_q10, int ltp_scale_q14,
    int *seed_out)
{
    silk_encoder_state enc;
    SideInfoIndices ind;
    silk_nsq_state *nsq = (silk_nsq_state *)nsq_blob;

    memset(&enc, 0, sizeof(enc));
    memset(&ind, 0, sizeof(ind));
    enc.nStatesDelayedDecision = n_states;
    enc.warping_Q16 = warping_q16;
    enc.fs_kHz = fs_khz;
    enc.nb_subfr = nb_subfr;
    enc.subfr_length = SUB_FRAME_LENGTH_MS * fs_khz;
    enc.frame_length = enc.subfr_length * nb_subfr;
    enc.ltp_mem_length = LTP_MEM_LENGTH_MS * fs_khz;
    enc.predictLPCOrder = predict_order;
    enc.shapingLPCOrder = shaping_order;
    enc.arch = 0;

    ind.signalType = (opus_int8)signal_type;
    ind.quantOffsetType = (opus_int8)quant_offset_type;
    ind.Seed = (opus_int8)seed;
    ind.NLSFInterpCoef_Q2 = (opus_int8)nlsf_interp_q2;

    if (use_del_dec)
        silk_NSQ_del_dec_c(&enc, nsq, &ind, x16, pulses, pred_coef_q12,
                           ltp_coef_q14, ar_q13, harm_shape_gain_q14,
                           tilt_q14, lf_shp_q14, gains_q16, pitch_l,
                           lambda_q10, ltp_scale_q14);
    else
        silk_NSQ_c(&enc, nsq, &ind, x16, pulses, pred_coef_q12,
                   ltp_coef_q14, ar_q13, harm_shape_gain_q14, tilt_q14,
                   lf_shp_q14, gains_q16, pitch_l, lambda_q10,
                   ltp_scale_q14);
    *seed_out = ind.Seed;
}

/* Accessors so the Python side can compare carried state. */
void oracle_nsq_get_xq(const unsigned char *nsq_blob, opus_int16 *out,
                       int n) {
    const silk_nsq_state *nsq = (const silk_nsq_state *)nsq_blob;
    memcpy(out, nsq->xq, n * sizeof(opus_int16));
}

void oracle_nsq_get_shp(const unsigned char *nsq_blob, opus_int32 *out,
                        int n) {
    const silk_nsq_state *nsq = (const silk_nsq_state *)nsq_blob;
    memcpy(out, nsq->sLTP_shp_Q14, n * sizeof(opus_int32));
}

void oracle_nsq_get_scalars(const unsigned char *nsq_blob, opus_int32 *out) {
    const silk_nsq_state *nsq = (const silk_nsq_state *)nsq_blob;
    out[0] = nsq->sLF_AR_shp_Q14;
    out[1] = nsq->sDiff_shp_Q14;
    out[2] = nsq->lagPrev;
    out[3] = nsq->sLTP_buf_idx;
    out[4] = nsq->sLTP_shp_buf_idx;
    out[5] = nsq->rand_seed;
    out[6] = nsq->prev_gain_Q16;
    out[7] = nsq->rewhite_flag;
}

void oracle_nsq_get_slpc(const unsigned char *nsq_blob, opus_int32 *out) {
    const silk_nsq_state *nsq = (const silk_nsq_state *)nsq_blob;
    memcpy(out, nsq->sLPC_Q14, NSQ_LPC_BUF_LENGTH * sizeof(opus_int32));
}

void oracle_nsq_get_sar2(const unsigned char *nsq_blob, opus_int32 *out) {
    const silk_nsq_state *nsq = (const silk_nsq_state *)nsq_blob;
    memcpy(out, nsq->sAR2_Q14, MAX_SHAPE_LPC_ORDER * sizeof(opus_int32));
}

/* Load caller state into the blob (for replaying captured call sequences
 * whose state was checkpointed by the encoder's rate loop). */
void oracle_nsq_set(unsigned char *nsq_blob, const opus_int16 *xq, int nxq,
                    const opus_int32 *shp, int nshp,
                    const opus_int32 *slpc, const opus_int32 *sar2,
                    const opus_int32 *scalars) {
    silk_nsq_state *nsq = (silk_nsq_state *)nsq_blob;
    memset(nsq, 0, sizeof(*nsq));
    memcpy(nsq->xq, xq, nxq * sizeof(opus_int16));
    memcpy(nsq->sLTP_shp_Q14, shp, nshp * sizeof(opus_int32));
    memcpy(nsq->sLPC_Q14, slpc, NSQ_LPC_BUF_LENGTH * sizeof(opus_int32));
    memcpy(nsq->sAR2_Q14, sar2, MAX_SHAPE_LPC_ORDER * sizeof(opus_int32));
    nsq->sLF_AR_shp_Q14 = scalars[0];
    nsq->sDiff_shp_Q14 = scalars[1];
    nsq->lagPrev = scalars[2];
    nsq->sLTP_buf_idx = scalars[3];
    nsq->sLTP_shp_buf_idx = scalars[4];
    nsq->rand_seed = scalars[5];
    nsq->prev_gain_Q16 = scalars[6];
    nsq->rewhite_flag = scalars[7];
}

/* Oracle wrappers for SILK float-analysis primitives, for differential
 * testing of the Python reimplementations. */
#include "main_FLP.h"

float oracle_schur_flp(float *rc, const float *ac, int order)
{
    return silk_schur_FLP(rc, ac, order);
}

void oracle_k2a_flp(float *a, const float *rc, int order)
{
    silk_k2a_FLP(a, rc, order);
}

void oracle_warped_autocorr_flp(float *corr, const float *input,
                                float warping, int length, int order)
{
    silk_warped_autocorrelation_FLP(corr, input, warping, length, order);
}

void oracle_apply_sine_window_flp(float *out, const float *in, int wintype,
                                  int length)
{
    silk_apply_sine_window_FLP(out, in, wintype, length);
}

float oracle_burg_flp(float *a, const float *x, float min_inv_gain,
                      int subfr_length, int nb_subfr, int order)
{
    return silk_burg_modified_FLP(a, x, min_inv_gain, subfr_length,
                                  nb_subfr, order, 0);
}

void oracle_autocorr_flp(float *results, const float *input, int n,
                         int count)
{
    silk_autocorrelation_FLP(results, input, n, count, 0);
}

float oracle_lpc_inv_pred_gain_flp(const float *a, int order)
{
    return silk_LPC_inverse_pred_gain_FLP(a, order);
}

#include "tables.h"
void oracle_vq_wmat_ec(opus_int8 *ind, opus_int32 *res, opus_int32 *rd,
                       opus_int *gain, const opus_int32 *XX_Q17,
                       const opus_int32 *xX_Q17, int k_cbk, int subfr_len,
                       opus_int32 max_gain_q7)
{
    silk_VQ_WMat_EC_c(ind, res, rd, gain, XX_Q17, xX_Q17,
                      silk_LTP_vq_ptrs_Q7[k_cbk],
                      silk_LTP_vq_gain_ptrs_Q7[k_cbk],
                      silk_LTP_gain_BITS_Q5_ptrs[k_cbk], subfr_len,
                      max_gain_q7, silk_LTP_vq_sizes[k_cbk]);
}

/* Oracle for silk_noise_shape_analysis_FLP + silk_process_gains_FLP with
 * caller-controlled state, to pinpoint divergences in the gain pipeline. */
#include "main_FLP.h"
#include <string.h>

/* Returns Gains[4] (after process_gains), GainsUnq pre-quant via out_pre,
 * Lambda via out_lambda, and AR coefs via out_ar. */
int oracle_noise_shape_and_gains(
    const float *x,              /* frame + la_shape lookahead, at x[0]==frame start */
    const float *pitch_res,
    int fs_khz, int nb_subfr, int shaping_order, int warping_q16,
    int snr_db_q7, int speech_activity_q8, int input_tilt_q15,
    const int *quality_q15,     /* [4] */
    int signal_type, int use_cbr,
    float ltp_corr, float pred_gain, float ltp_pred_cod_gain,
    const int *pitch_l,         /* [4] */
    float harm_shape_gain_smth, float tilt_smth,
    int last_gain_index, int cond_coding,
    float *out_gains, float *out_pre, float *out_lambda, float *out_ar,
    int *out_gains_ind, int *out_quant_offset)
{
    silk_encoder_state_FLP enc;
    silk_encoder_control_FLP ctrl;
    int i;
    float x_buf[ MAX_FRAME_LENGTH + LA_SHAPE_MAX ];

    memset(&enc, 0, sizeof(enc));
    memset(&ctrl, 0, sizeof(ctrl));

    enc.sCmn.fs_kHz = fs_khz;
    enc.sCmn.nb_subfr = nb_subfr;
    enc.sCmn.subfr_length = SUB_FRAME_LENGTH_MS * fs_khz;
    enc.sCmn.frame_length = enc.sCmn.subfr_length * nb_subfr;
    enc.sCmn.la_shape = LA_SHAPE_MS * fs_khz;
    enc.sCmn.shapeWinLength = SUB_FRAME_LENGTH_MS * fs_khz + 2 * enc.sCmn.la_shape;
    enc.sCmn.shapingLPCOrder = shaping_order;
    enc.sCmn.warping_Q16 = warping_q16;
    enc.sCmn.SNR_dB_Q7 = snr_db_q7;
    enc.sCmn.speech_activity_Q8 = speech_activity_q8;
    enc.sCmn.input_tilt_Q15 = input_tilt_q15;
    for (i = 0; i < 4; i++)
        enc.sCmn.input_quality_bands_Q15[i] = quality_q15[i];
    enc.sCmn.indices.signalType = signal_type;
    enc.sCmn.useCBR = use_cbr;
    enc.sCmn.nStatesDelayedDecision = 1;
    enc.LTPCorr = ltp_corr;
    enc.sShape.HarmShapeGain_smth = harm_shape_gain_smth;
    enc.sShape.Tilt_smth = tilt_smth;
    enc.sShape.LastGainIndex = last_gain_index;

    ctrl.predGain = pred_gain;
    ctrl.LTPredCodGain = ltp_pred_cod_gain;
    for (i = 0; i < 4; i++)
        ctrl.pitchL[i] = pitch_l[i];

    /* x points at frame start; analysis reads back to x - la_shape */
    memcpy(x_buf, x, (enc.sCmn.frame_length + 2 * enc.sCmn.la_shape) * sizeof(float));

    silk_noise_shape_analysis_FLP(&enc, &ctrl, pitch_res,
                                  x_buf + enc.sCmn.la_shape);
    for (i = 0; i < nb_subfr; i++)
        out_pre[i] = ctrl.Gains[i];

    silk_process_gains_FLP(&enc, &ctrl, cond_coding);

    for (i = 0; i < nb_subfr; i++) {
        out_gains[i] = ctrl.Gains[i];
        out_gains_ind[i] = enc.sCmn.indices.GainsIndices[i];
    }
    *out_lambda = ctrl.Lambda;
    *out_quant_offset = enc.sCmn.indices.quantOffsetType;
    memcpy(out_ar, ctrl.AR, nb_subfr * MAX_SHAPE_LPC_ORDER * sizeof(float));
    return enc.sShape.LastGainIndex;
}

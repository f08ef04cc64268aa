/* Stage-by-stage SILK frame decode dump for differential debugging. */
#include <string.h>
#include "main.h"
#include "API.h"
#include "stack_alloc.h"

/* Decodes the FIRST silk frame of a payload at the given internal rate and
 * dumps intermediates. Returns frame_length or negative error. */
int oracle_silk_frame_debug(const unsigned char *payload, int nbytes,
                            int internal_rate, int payload_ms,
                            opus_int16 *pulses_out, opus_int32 *gains_out,
                            opus_int16 *a0_out, opus_int16 *a1_out,
                            opus_int32 *pitch_out, opus_int16 *ltp_out,
                            opus_int32 *misc_out, opus_int32 *exc_out,
                            opus_int16 *xq_out)
{
    ec_dec dec;
    char state_mem[40000];
    silk_decoder_state *st = (silk_decoder_state *)state_mem;
    silk_decoder_control ctrl;
    opus_int16 pulses[MAX_FRAME_LENGTH + 16];
    opus_int16 xq[MAX_FRAME_LENGTH];
    int i, fs_khz;
    ALLOC_STACK;

    if (sizeof(silk_decoder_state) > sizeof(state_mem)) return -99;
    silk_init_decoder(st);
    fs_khz = (internal_rate >> 10) + 1;
    st->nFramesDecoded = 0;
    st->nFramesPerPacket = payload_ms <= 20 ? 1 : payload_ms / 20;
    st->nb_subfr = payload_ms == 10 ? 2 : 4;
    silk_decoder_set_fs(st, fs_khz, internal_rate);

    ec_dec_init(&dec, (unsigned char *)payload, nbytes);
    /* VAD + LBRR flags */
    for (i = 0; i < st->nFramesPerPacket; i++)
        st->VAD_flags[i] = ec_dec_bit_logp(&dec, 1);
    st->LBRR_flag = ec_dec_bit_logp(&dec, 1);
    if (st->LBRR_flag) return -98; /* keep the test simple */

    memset(&ctrl, 0, sizeof(ctrl));
    silk_decode_indices(st, &dec, 0, 0, CODE_INDEPENDENTLY);
    silk_decode_pulses(&dec, pulses, st->indices.signalType,
                       st->indices.quantOffsetType, st->frame_length);
    silk_decode_parameters(st, &ctrl, CODE_INDEPENDENTLY);
    silk_decode_core(st, &ctrl, xq, pulses, 0);

    for (i = 0; i < st->frame_length; i++) pulses_out[i] = pulses[i];
    for (i = 0; i < st->nb_subfr; i++) gains_out[i] = ctrl.Gains_Q16[i];
    for (i = 0; i < st->LPC_order; i++) a0_out[i] = ctrl.PredCoef_Q12[0][i];
    for (i = 0; i < st->LPC_order; i++) a1_out[i] = ctrl.PredCoef_Q12[1][i];
    for (i = 0; i < st->nb_subfr; i++) pitch_out[i] = ctrl.pitchL[i];
    for (i = 0; i < LTP_ORDER * st->nb_subfr; i++) ltp_out[i] = ctrl.LTPCoef_Q14[i];
    misc_out[0] = st->indices.signalType;
    misc_out[1] = st->indices.quantOffsetType;
    misc_out[2] = st->indices.Seed;
    misc_out[3] = ctrl.LTP_scale_Q14;
    misc_out[4] = st->indices.NLSFInterpCoef_Q2;
    misc_out[5] = ec_tell(&dec);
    for (i = 0; i < st->frame_length; i++) exc_out[i] = st->exc_Q14[i];
    for (i = 0; i < st->frame_length; i++) xq_out[i] = xq[i];
    RESTORE_STACK;
    return st->frame_length;
}

/* Test-only shim exposing SILK decoder internals for differential tests. */
#include <string.h>
#include "main.h"
#include "API.h"
#include "stack_alloc.h"

int oracle_gains_dequant(opus_int32 *gains_q16, const opus_int8 *ind,
                         opus_int8 prev_ind, int conditional, int nb_subfr,
                         opus_int8 *prev_out)
{
    opus_int8 p = prev_ind;
    silk_gains_dequant(gains_q16, ind, &p, conditional, nb_subfr);
    *prev_out = p;
    return 0;
}

int oracle_nlsf_decode(opus_int16 *nlsf_q15, opus_int16 *a_q12,
                       const opus_int8 *indices, int wb)
{
    const silk_NLSF_CB_struct *cb = wb ? &silk_NLSF_CB_WB : &silk_NLSF_CB_NB_MB;
    silk_NLSF_decode(nlsf_q15, (opus_int8 *)indices, cb);
    silk_NLSF2A(a_q12, nlsf_q15, cb->order, 0);
    return 0;
}

int oracle_silk_decode(const unsigned char *payload, int nbytes,
                       int n_channels, int api_rate, int internal_rate,
                       int payload_ms, opus_res *out, int max_out)
{
    silk_DecControlStruct ctl;
    ec_dec dec;
    opus_int32 n_samples = 0, total = 0;
    int first = 1, ret;
    char state[16384 * 4];
    opus_int32 size = 0;
    ALLOC_STACK;

    silk_Get_Decoder_Size(&size);
    if (size > (opus_int32)sizeof(state)) return -99;
    silk_InitDecoder(state);
    memset(&ctl, 0, sizeof(ctl));
    ctl.nChannelsAPI = n_channels;
    ctl.nChannelsInternal = n_channels;
    ctl.API_sampleRate = api_rate;
    ctl.internalSampleRate = internal_rate;
    ctl.payloadSize_ms = payload_ms;

    ec_dec_init(&dec, (unsigned char *)payload, nbytes);
    {
        int target = payload_ms * api_rate / 1000;
        while (total < target) {
            ret = silk_Decode(state, &ctl, 0, first, &dec,
                              out + total * n_channels, &n_samples,
#ifdef ENABLE_DEEP_PLC
                              NULL,
#endif
                              0);
            if (ret) return -ret;
            first = 0;
            total += n_samples;
            if (total * n_channels > max_out) return -98;
            if (n_samples <= 0) break;
        }
    }
    RESTORE_STACK;
    return total;
}

/* Test-only shim: persistent SILK decoder with loss control + PLC state
   peek, for differential burst-concealment tests. */
#include <string.h>
#include <stdlib.h>
#include "main.h"
#include "API.h"
#include "structs.h"
#include "stack_alloc.h"

/* mirror of the decoder super struct (silk/dec_API.c:47); test-only
   peek, layout must match the build flags used for libopus.a */
typedef struct {
    silk_decoder_state channel_state[DECODER_NUM_CHANNELS];
    stereo_dec_state sStereo;
    opus_int nChannelsAPI;
    opus_int nChannelsInternal;
    opus_int prev_decode_only_middle;
} silk_decoder;

typedef struct {
    char *state;
    silk_DecControlStruct ctl;
    int first;
} oracle_silk_dec;

void *oracle_silk_dec_create(int n_channels, int api_rate,
                             int internal_rate, int payload_ms)
{
    opus_int32 size = 0;
    oracle_silk_dec *d = malloc(sizeof(*d));
    silk_Get_Decoder_Size(&size);
    d->state = malloc(size);
    silk_InitDecoder(d->state);
    memset(&d->ctl, 0, sizeof(d->ctl));
    d->ctl.nChannelsAPI = n_channels;
    d->ctl.nChannelsInternal = n_channels;
    d->ctl.API_sampleRate = api_rate;
    d->ctl.internalSampleRate = internal_rate;
    d->ctl.payloadSize_ms = payload_ms;
    d->first = 1;
    return d;
}

/* lost_flag: 0 normal, 1 lost (payload ignored), 2 decode LBRR */
int oracle_silk_dec_decode(void *h, const unsigned char *payload,
                           int nbytes, int lost_flag, opus_res *out,
                           int max_out)
{
    oracle_silk_dec *d = h;
    ec_dec dec;
    opus_int32 n_samples = 0, total = 0;
    int target = d->ctl.payloadSize_ms * d->ctl.API_sampleRate / 1000;
    int ret, first = 1;
    ALLOC_STACK;
    if (lost_flag != 1)
        ec_dec_init(&dec, (unsigned char *)payload, nbytes);
    while (total < target) {
        ret = silk_Decode(d->state, &d->ctl, lost_flag, first,
                          lost_flag == 1 ? NULL : &dec,
                          out + total * d->ctl.nChannelsAPI, &n_samples,
#ifdef ENABLE_DEEP_PLC
                          NULL,
#endif
                          0);
        if (ret) { RESTORE_STACK; return -ret; }
        first = 0;
        total += n_samples;
        if (total * d->ctl.nChannelsAPI > max_out) {
            RESTORE_STACK; return -98;
        }
        if (n_samples <= 0) break;
    }
    RESTORE_STACK;
    return total;
}

/* Dump channel-0 PLC + synthesis state for differential comparison.
   Layout (int32): [0..15] prevLPC_Q12, [16..20] LTPCoef_Q14,
   [21] pitchL_Q8, [22] randScale_Q14, [23] rand_seed, [24] lossCnt,
   [25] prevGain_Q16[0], [26] prevGain_Q16[1], [27] conc_energy,
   [28] conc_energy_shift, [29] last_frame_lost, [30] LastGainIndex,
   [31] lagPrev, [32..47] sLPC_Q14_buf, [48] prevSignalType,
   [49] prevLTP_scale_Q14, [50..65] prevNLSF_Q15 */
int oracle_silk_dec_peek(void *h, opus_int32 *out)
{
    oracle_silk_dec *d = h;
    silk_decoder *s = (silk_decoder *)d->state;
    silk_decoder_state *c = &s->channel_state[0];
    int i;
    for (i = 0; i < MAX_LPC_ORDER; i++) out[i] = c->sPLC.prevLPC_Q12[i];
    for (i = 0; i < LTP_ORDER; i++) out[16 + i] = c->sPLC.LTPCoef_Q14[i];
    out[21] = c->sPLC.pitchL_Q8;
    out[22] = c->sPLC.randScale_Q14;
    out[23] = c->sPLC.rand_seed;
    out[24] = c->lossCnt;
    out[25] = c->sPLC.prevGain_Q16[0];
    out[26] = c->sPLC.prevGain_Q16[1];
    out[27] = c->sPLC.conc_energy;
    out[28] = c->sPLC.conc_energy_shift;
    out[29] = c->sPLC.last_frame_lost;
    out[30] = c->LastGainIndex;
    out[31] = c->lagPrev;
    for (i = 0; i < MAX_LPC_ORDER; i++) out[32 + i] = c->sLPC_Q14_buf[i];
    out[48] = c->prevSignalType;
    out[49] = c->sPLC.prevLTP_scale_Q14;
    for (i = 0; i < MAX_LPC_ORDER; i++) out[50 + i] = c->prevNLSF_Q15[i];
    return 0;
}

void oracle_silk_dec_destroy(void *h)
{
    oracle_silk_dec *d = h;
    free(d->state);
    free(d);
}

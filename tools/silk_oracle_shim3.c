/* Stateful SILK decoder oracle: create once, decode packet-by-packet.
 * Used to diff our decoder against silk_Decode with persistent state. */
#include "main.h"
#include "API.h"
#include "stack_alloc.h"
#include <string.h>
#include <stdlib.h>

typedef struct {
    char *state;
    silk_DecControlStruct ctl;
    int first;
} oracle_silk_st;

void *oracle_silk_create(int n_channels, int api_rate, int internal_rate,
                         int payload_ms)
{
    opus_int32 size = 0;
    oracle_silk_st *st = malloc(sizeof(*st));
    silk_Get_Decoder_Size(&size);
    st->state = malloc(size);
    silk_InitDecoder(st->state);
    memset(&st->ctl, 0, sizeof(st->ctl));
    st->ctl.nChannelsAPI = n_channels;
    st->ctl.nChannelsInternal = n_channels;
    st->ctl.API_sampleRate = api_rate;
    st->ctl.internalSampleRate = internal_rate;
    st->ctl.payloadSize_ms = payload_ms;
    st->first = 1;
    return st;
}

int oracle_silk_decode_packet(void *handle, const unsigned char *payload,
                              int nbytes, opus_res *out, int max_out)
{
    oracle_silk_st *st = handle;
    ec_dec dec;
    opus_int32 n_samples = 0, total = 0;
    int ret, first = 1;
    int target = st->ctl.payloadSize_ms * st->ctl.API_sampleRate / 1000;
    ALLOC_STACK;
    ec_dec_init(&dec, (unsigned char *)payload, nbytes);
    while (total < target) {
        ret = silk_Decode(st->state, &st->ctl, 0, first, &dec,
                          out + total * st->ctl.nChannelsAPI, &n_samples,
#ifdef ENABLE_DEEP_PLC
                          NULL,
#endif
                          0);
        if (ret) { RESTORE_STACK; return -ret; }
        first = 0;
        total += n_samples;
        if (total * st->ctl.nChannelsAPI > max_out) { RESTORE_STACK; return -98; }
        if (n_samples <= 0) break;
    }
    RESTORE_STACK;
    return total;
}

void oracle_silk_destroy(void *handle)
{
    oracle_silk_st *st = handle;
    free(st->state);
    free(st);
}

/* Stateful SILK VAD oracle: wraps silk_VAD_GetSA_Q8_c on a minimal
 * silk_encoder_state so the Python reimplementation can be diffed
 * frame-by-frame. */
#include "main.h"
#include <string.h>
#include <stdlib.h>

void *oracle_vad_create(void)
{
    silk_encoder_state *st = calloc(1, sizeof(silk_encoder_state));
    silk_VAD_Init(&st->sVAD);
    return st;
}

/* returns speech_activity_Q8; writes tilt/quality through pointers */
int oracle_vad_run(void *handle, const opus_int16 *pin, int frame_length,
                   int fs_khz, int *tilt_q15, int *quality_q15)
{
    silk_encoder_state *st = handle;
    int i;
    st->frame_length = frame_length;
    st->fs_kHz = fs_khz;
    silk_VAD_GetSA_Q8_c(st, pin);
    *tilt_q15 = st->input_tilt_Q15;
    for (i = 0; i < 4; i++)
        quality_q15[i] = st->input_quality_bands_Q15[i];
    return st->speech_activity_Q8;
}

void oracle_vad_destroy(void *handle) { free(handle); }

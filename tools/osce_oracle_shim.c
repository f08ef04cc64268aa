/* Test shim for the reference OSCE enhancers (dnn/osce.c).  Includes
 * osce.c as a single translation unit so the static
 * lace_process_20ms_frame / nolace_process_20ms_frame are callable;
 * layer dims come from the stand-in headers in tools/osce_oracle_inc/
 * (values derived from the in-tree training code). */

#include <stdlib.h>

#include "osce.c"

#define L(field, name, nin, nout) \
  if (linear_init(&layers->field, arrays, name "_bias", NULL, NULL, \
      name "_weights_float", NULL, NULL, NULL, nin, nout)) return 1;
#define LNB(field, name, nin, nout) \
  if (linear_init(&layers->field, arrays, NULL, NULL, NULL, \
      name "_weights_float", NULL, NULL, NULL, nin, nout)) return 1;

static int init_fnet_common(LinearLayer *conv1, LinearLayer *conv2,
  LinearLayer *tconv, LinearLayer *gru_in, LinearLayer *gru_rec,
  const WeightArray *arrays, const char *p, int cond)
{
  char name[64];
  LinearLayer *ls[5] = {conv1, conv2, tconv, gru_in, gru_rec};
  const char *suff[5] = {"fnet_conv1", "fnet_conv2", "fnet_tconv",
                         "fnet_gru_input", "fnet_gru_recurrent"};
  int nin[5] = {173, 2*4*96, 0, 0, 0};
  int nout[5] = {96, 0, 0, 0, 0};
  nout[1] = cond; nin[2] = cond; nout[2] = 4*cond;
  nin[3] = cond; nout[3] = 3*cond; nin[4] = cond; nout[4] = 3*cond;
  int i;
  for (i = 0; i < 5; i++) {
    char wname[96], bname[96];
    snprintf(name, sizeof(name), "%s_%s", p, suff[i]);
    snprintf(wname, sizeof(wname), "%s_weights_float", name);
    snprintf(bname, sizeof(bname), "%s_bias", name);
    if (linear_init(ls[i], arrays, bname, NULL, NULL, wname, NULL,
                    NULL, NULL, nin[i], nout[i])) return 1;
  }
  return 0;
}

int init_lacelayers(LACELayers *layers, const WeightArray *arrays)
{
  LNB(lace_pitch_embedding, "lace_pitch_embedding", 64, 301)
  if (init_fnet_common(&layers->lace_fnet_conv1,
      &layers->lace_fnet_conv2, &layers->lace_fnet_tconv,
      &layers->lace_fnet_gru_input, &layers->lace_fnet_gru_recurrent,
      arrays, "lace", LACE_COND_DIM)) return 1;
  L(lace_cf1_kernel, "lace_cf1_kernel", 128, 16)
  L(lace_cf1_gain, "lace_cf1_gain", 128, 1)
  L(lace_cf1_global_gain, "lace_cf1_global_gain", 128, 1)
  L(lace_cf2_kernel, "lace_cf2_kernel", 128, 16)
  L(lace_cf2_gain, "lace_cf2_gain", 128, 1)
  L(lace_cf2_global_gain, "lace_cf2_global_gain", 128, 1)
  L(lace_af1_kernel, "lace_af1_kernel", 128, 16)
  L(lace_af1_gain, "lace_af1_gain", 128, 1)
  return 0;
}

int init_nolacelayers(NOLACELayers *layers, const WeightArray *arrays)
{
  LNB(nolace_pitch_embedding, "nolace_pitch_embedding", 64, 301)
  if (init_fnet_common(&layers->nolace_fnet_conv1,
      &layers->nolace_fnet_conv2, &layers->nolace_fnet_tconv,
      &layers->nolace_fnet_gru_input,
      &layers->nolace_fnet_gru_recurrent, arrays, "nolace", NOLACE_COND_DIM)) return 1;
  L(nolace_cf1_kernel, "nolace_cf1_kernel", 256, 16)
  L(nolace_cf1_gain, "nolace_cf1_gain", 256, 1)
  L(nolace_cf1_global_gain, "nolace_cf1_global_gain", 256, 1)
  L(nolace_cf2_kernel, "nolace_cf2_kernel", 256, 16)
  L(nolace_cf2_gain, "nolace_cf2_gain", 256, 1)
  L(nolace_cf2_global_gain, "nolace_cf2_global_gain", 256, 1)
  L(nolace_af1_kernel, "nolace_af1_kernel", 256, 32)
  L(nolace_af1_gain, "nolace_af1_gain", 256, 2)
  L(nolace_af2_kernel, "nolace_af2_kernel", 256, 64)
  L(nolace_af2_gain, "nolace_af2_gain", 256, 2)
  L(nolace_af3_kernel, "nolace_af3_kernel", 256, 64)
  L(nolace_af3_gain, "nolace_af3_gain", 256, 2)
  L(nolace_af4_kernel, "nolace_af4_kernel", 256, 32)
  L(nolace_af4_gain, "nolace_af4_gain", 256, 1)
  L(nolace_tdshape1_alpha1_f, "nolace_tdshape1_alpha1_f", 512, 80)
  L(nolace_tdshape1_alpha1_t, "nolace_tdshape1_alpha1_t", 42, 80)
  L(nolace_tdshape1_alpha2, "nolace_tdshape1_alpha2", 160, 80)
  L(nolace_tdshape2_alpha1_f, "nolace_tdshape2_alpha1_f", 512, 80)
  L(nolace_tdshape2_alpha1_t, "nolace_tdshape2_alpha1_t", 42, 80)
  L(nolace_tdshape2_alpha2, "nolace_tdshape2_alpha2", 160, 80)
  L(nolace_tdshape3_alpha1_f, "nolace_tdshape3_alpha1_f", 512, 80)
  L(nolace_tdshape3_alpha1_t, "nolace_tdshape3_alpha1_t", 42, 80)
  L(nolace_tdshape3_alpha2, "nolace_tdshape3_alpha2", 160, 80)
  L(nolace_post_cf1, "nolace_post_cf1", 512, 256)
  L(nolace_post_cf2, "nolace_post_cf2", 512, 256)
  L(nolace_post_af1, "nolace_post_af1", 512, 256)
  L(nolace_post_af2, "nolace_post_af2", 512, 256)
  L(nolace_post_af3, "nolace_post_af3", 512, 256)
  return 0;
}

typedef struct {
  LACE lace;
  LACEState state;
  WeightArray *arrays;
} LaceHandle;

typedef struct {
  NoLACE nolace;
  NoLACEState state;
  WeightArray *arrays;
} NoLaceHandle;

void *lace_oracle_create(const void *blob, int len)
{
  LaceHandle *h = calloc(1, sizeof(*h));
  if (parse_weights(&h->arrays, blob, len) < 0) { free(h); return NULL; }
  if (init_lace(&h->lace, h->arrays)) { free(h); return NULL; }
  /* state is zero-initialized by calloc */
  return h;
}

void lace_oracle_process(void *hp, float *x_out, const float *x_in,
                         const float *features, const float *numbits,
                         const int *periods)
{
  LaceHandle *h = (LaceHandle *)hp;
  lace_process_20ms_frame(&h->lace, &h->state, x_out, x_in, features,
                          numbits, periods, 0);
}

void *nolace_oracle_create(const void *blob, int len)
{
  NoLaceHandle *h = calloc(1, sizeof(*h));
  if (parse_weights(&h->arrays, blob, len) < 0) { free(h); return NULL; }
  if (init_nolace(&h->nolace, h->arrays)) { free(h); return NULL; }
  /* state is zero-initialized by calloc */
  return h;
}

void nolace_oracle_process(void *hp, float *x_out, const float *x_in,
                           const float *features, const float *numbits,
                           const int *periods)
{
  NoLaceHandle *h = (NoLaceHandle *)hp;
  nolace_process_20ms_frame(&h->nolace, &h->state, x_out, x_in,
                            features, numbits, periods, 0);
}

/* --- feature helper wrappers (static fns from osce_features.c, same
 * TU via include below) --- */
#include "osce_features.c"

void osce_oracle_logspec(float *out, const opus_int16 *a_q12, int order)
{
  calculate_log_spectrum_from_lpc(out, (opus_int16 *)a_q12, order);
}

void osce_oracle_cepstrum(float *out, float *signal320)
{
  calculate_cepstrum(out, signal320);
}

void osce_oracle_acorr(float *out, float *signal_frame, int lag)
{
  calculate_acorr(out, signal_frame, lag);
}

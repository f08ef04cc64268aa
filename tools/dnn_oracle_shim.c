/* Test shim exposing the reference LPCNet feature extractor
 * (dnn/lpcnet_enc.c), pitch DNN (dnn/pitchdnn.c) and FARGAN vocoder
 * (dnn/fargan.c) through flat C APIs for ctypes, with models loaded
 * from weight blobs.  Layer dims come from the in-tree training code;
 * see the stand-in headers in tools/dnn_oracle_inc/. */

#include <stdlib.h>

#include "nnet.h"
#include "pitchdnn.h"
#include "fargan.h"
#include "lpcnet.h"
#include "lpcnet_private.h"

#define L(field, name, nin, nout) \
  if (linear_init(&model->field, arrays, name "_bias", NULL, NULL, \
      name "_weights_float", NULL, NULL, NULL, nin, nout)) return 1;
#define LNB(field, name, nin, nout) \
  if (linear_init(&model->field, arrays, NULL, NULL, NULL, \
      name "_weights_float", NULL, NULL, NULL, nin, nout)) return 1;
#define C2D(field, name, ic, oc, kt, kh) \
  if (conv2d_init(&model->field, arrays, name "_bias", \
      name "_weights_float", ic, oc, kt, kh)) return 1;

int init_pitchdnn(struct PitchDNN *model, const WeightArray *arrays)
{
  L(dense_if_upsampler_1, "dense_if_upsampler_1", 88, 64)
  L(dense_if_upsampler_2, "dense_if_upsampler_2", 64, 64)
  L(dense_downsampler, "dense_downsampler", 288, 64)
  L(dense_final_upsampler, "dense_final_upsampler", 64, 192)
  L(gru_1_input, "gru_1_input", 64, 192)
  L(gru_1_recurrent, "gru_1_recurrent", 64, 192)
  C2D(conv2d_1, "conv2d_1", 1, 4, 3, 3)
  C2D(conv2d_2, "conv2d_2", 4, 1, 3, 3)
  return 0;
}

int init_plcmodel(PLCModel *model, const WeightArray *arrays)
{
  L(plc_dense_in, "plc_dense_in", 57, 128)
  L(plc_gru1_input, "plc_gru1_input", 128, 384)
  L(plc_gru1_recurrent, "plc_gru1_recurrent", 128, 384)
  L(plc_gru2_input, "plc_gru2_input", 128, 384)
  L(plc_gru2_recurrent, "plc_gru2_recurrent", 128, 384)
  L(plc_dense_out, "plc_dense_out", 128, 20)
  return 0;
}

int init_fargan(FARGAN *model, const WeightArray *arrays)
{
  LNB(cond_net_pembed, "cond_net_pembed", 12, 224)
  LNB(cond_net_fdense1, "cond_net_fdense1", 32, 64)
  LNB(cond_net_fconv1, "cond_net_fconv1", 192, 128)
  LNB(cond_net_fdense2, "cond_net_fdense2", 128, 320)
  L(sig_net_cond_gain_dense, "sig_net_cond_gain_dense", 80, 1)
  LNB(sig_net_fwc0_conv, "sig_net_fwc0_conv", 328, 192)
  LNB(sig_net_fwc0_glu_gate, "sig_net_fwc0_glu_gate", 192, 192)
  L(sig_net_gain_dense_out, "sig_net_gain_dense_out", 192, 4)
  LNB(sig_net_gru1_input, "sig_net_gru1_input", 272, 480)
  LNB(sig_net_gru1_recurrent, "sig_net_gru1_recurrent", 160, 480)
  LNB(sig_net_gru2_input, "sig_net_gru2_input", 240, 384)
  LNB(sig_net_gru2_recurrent, "sig_net_gru2_recurrent", 128, 384)
  LNB(sig_net_gru3_input, "sig_net_gru3_input", 208, 384)
  LNB(sig_net_gru3_recurrent, "sig_net_gru3_recurrent", 128, 384)
  LNB(sig_net_gru1_glu_gate, "sig_net_gru1_glu_gate", 160, 160)
  LNB(sig_net_gru2_glu_gate, "sig_net_gru2_glu_gate", 128, 128)
  LNB(sig_net_gru3_glu_gate, "sig_net_gru3_glu_gate", 128, 128)
  LNB(sig_net_skip_dense, "sig_net_skip_dense", 688, 128)
  LNB(sig_net_skip_glu_gate, "sig_net_skip_glu_gate", 128, 128)
  LNB(sig_net_sig_dense_out, "sig_net_sig_dense_out", 128, 40)
  return 0;
}

/* --- feature extractor wrappers --- */

void *feat_oracle_create(const void *blob, int len)
{
  LPCNetEncState *st = lpcnet_encoder_create();
  if (!st) return NULL;
  if (lpcnet_encoder_load_model(st, blob, len)) {
    lpcnet_encoder_destroy(st);
    return NULL;
  }
  return st;
}

void feat_oracle_frame(void *st, const float *pcm, float *features)
{
  lpcnet_compute_single_frame_features_float((LPCNetEncState *)st, pcm,
                                             features, 0);
}

/* --- FARGAN wrappers --- */

void *fargan_oracle_create(const void *blob, int len)
{
  FARGANState *st = calloc(1, sizeof(FARGANState));
  if (fargan_load_model(st, blob, len)) { free(st); return NULL; }
  return st;
}

void fargan_oracle_cont(void *st, const float *pcm0,
                        const float *features0)
{
  fargan_cont((FARGANState *)st, pcm0, features0);
}

void fargan_oracle_synthesize(void *st, float *pcm,
                              const float *features)
{
  fargan_synthesize((FARGANState *)st, pcm, features);
}

/* --- deep PLC wrappers --- */

void *plc_oracle_create(const void *blob, int len)
{
  LPCNetPLCState *st = calloc(1, sizeof(LPCNetPLCState));
  if (lpcnet_plc_init(st)) { free(st); return NULL; }
  if (lpcnet_plc_load_model(st, blob, len)) { free(st); return NULL; }
  return st;
}

void plc_oracle_update(void *st, short *pcm)
{
  lpcnet_plc_update((LPCNetPLCState *)st, pcm);
}

void plc_oracle_conceal(void *st, short *pcm)
{
  lpcnet_plc_conceal((LPCNetPLCState *)st, pcm);
}

void plc_oracle_fec_add(void *st, const float *features)
{
  lpcnet_plc_fec_add((LPCNetPLCState *)st, features);
}

/* --- nndsp wrappers (adaconv / adacomb / adashape) --- */

#include "nndsp.h"

typedef struct {
  AdaConvState conv;
  AdaCombState comb;
  AdaShapeState shape;
  LinearLayer kernel_layer, gain_layer, global_gain_layer;
  LinearLayer alpha1f, alpha1t, alpha2;
  float window[ADACONV_MAX_OVERLAP_SIZE];
  WeightArray *arrays;
} NndspHandle;

void *nndsp_oracle_create(const void *blob, int len, int feature_dim,
                          int kernel_out, int gain_out, int overlap_size,
                          int shape_frame_size, int shape_tenv)
{
  NndspHandle *h = calloc(1, sizeof(*h));
  if (parse_weights(&h->arrays, blob, len) < 0) { free(h); return NULL; }
  if (linear_init(&h->kernel_layer, h->arrays, "kernel_bias", NULL, NULL,
      "kernel_weights_float", NULL, NULL, NULL, feature_dim, kernel_out))
    { free(h); return NULL; }
  if (linear_init(&h->gain_layer, h->arrays, "gain_bias", NULL, NULL,
      "gain_weights_float", NULL, NULL, NULL, feature_dim, gain_out))
    { free(h); return NULL; }
  if (linear_init(&h->global_gain_layer, h->arrays, "ggain_bias", NULL,
      NULL, "ggain_weights_float", NULL, NULL, NULL, feature_dim, 1))
    { free(h); return NULL; }
  if (linear_init(&h->alpha1f, h->arrays, "alpha1f_bias", NULL, NULL,
      "alpha1f_weights_float", NULL, NULL, NULL, 2*feature_dim,
      shape_frame_size)) { free(h); return NULL; }
  if (linear_init(&h->alpha1t, h->arrays, "alpha1t_bias", NULL, NULL,
      "alpha1t_weights_float", NULL, NULL, NULL, 2*(shape_tenv+1),
      shape_frame_size)) { free(h); return NULL; }
  if (linear_init(&h->alpha2, h->arrays, "alpha2_bias", NULL, NULL,
      "alpha2_weights_float", NULL, NULL, NULL, 2*shape_frame_size,
      shape_frame_size)) { free(h); return NULL; }
  init_adaconv_state(&h->conv);
  init_adacomb_state(&h->comb);
  init_adashape_state(&h->shape);
  compute_overlap_window(h->window, overlap_size);
  return h;
}

void nndsp_oracle_adaconv(void *hp, float *x_out, const float *x_in,
                          const float *features, int feature_dim,
                          int frame_size, int overlap, int in_ch,
                          int out_ch, int ksize, float ga, float gb)
{
  NndspHandle *h = (NndspHandle *)hp;
  adaconv_process_frame(&h->conv, x_out, x_in, features,
                        &h->kernel_layer, &h->gain_layer, feature_dim,
                        frame_size, overlap, in_ch, out_ch, ksize,
                        ksize - 1, ga, gb, 1.f, h->window, 0);
}

void nndsp_oracle_adacomb(void *hp, float *x_out, const float *x_in,
                          const float *features, int pitch_lag,
                          int feature_dim, int frame_size, int overlap,
                          int ksize, int left_padding, float ga,
                          float gb, float log_gain_limit)
{
  NndspHandle *h = (NndspHandle *)hp;
  adacomb_process_frame(&h->comb, x_out, x_in, features,
                        &h->kernel_layer, &h->gain_layer,
                        &h->global_gain_layer, pitch_lag, feature_dim,
                        frame_size, overlap, ksize, left_padding, ga,
                        gb, log_gain_limit, h->window, 0);
}

void nndsp_oracle_adashape(void *hp, float *x_out, const float *x_in,
                           const float *features, int feature_dim,
                           int frame_size, int avg_pool_k)
{
  NndspHandle *h = (NndspHandle *)hp;
  adashape_process_frame(&h->shape, x_out, x_in, features, &h->alpha1f,
                         &h->alpha1t, &h->alpha2, feature_dim,
                         frame_size, avg_pool_k, 1, 0);
}

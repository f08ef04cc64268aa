/* Test shim exposing the reference RDOVAE encoder/decoder inference
 * (dnn/dred_rdovae_enc.c, dnn/dred_rdovae_dec.c) through a flat C API
 * for ctypes, with models loaded from a weight blob via parse_weights.
 * Layer dims come from the in-tree training code
 * (dnn/torch/rdovae/rdovae/rdovae.py); see the stand-in headers in
 * tools/rdovae_oracle_inc/. */

#include <stdlib.h>
#include <string.h>

#include "nnet.h"
#include "dred_rdovae_enc.h"
#include "dred_rdovae_dec.h"
#include "dred_rdovae_constants.h"

#define L(field, name, nin, nout) \
  if (linear_init(&model->field, arrays, name "_bias", NULL, NULL, \
      name "_weights_float", NULL, NULL, NULL, nin, nout)) return 1;
#define LNB(field, name, nin, nout) \
  if (linear_init(&model->field, arrays, NULL, NULL, NULL, \
      name "_weights_float", NULL, NULL, NULL, nin, nout)) return 1;

int init_rdovaeenc(struct RDOVAEEnc *model, const WeightArray *arrays)
{
  L(enc_dense1, "enc_dense1", 2*DRED_NUM_FEATURES, ENC_DENSE1_OUT_SIZE)
  L(enc_gru1_input, "enc_gru1_input", 64, 96)
  L(enc_gru1_recurrent, "enc_gru1_recurrent", 32, 96)
  L(enc_gru2_input, "enc_gru2_input", 160, 96)
  L(enc_gru2_recurrent, "enc_gru2_recurrent", 32, 96)
  L(enc_gru3_input, "enc_gru3_input", 256, 96)
  L(enc_gru3_recurrent, "enc_gru3_recurrent", 32, 96)
  L(enc_gru4_input, "enc_gru4_input", 352, 96)
  L(enc_gru4_recurrent, "enc_gru4_recurrent", 32, 96)
  L(enc_gru5_input, "enc_gru5_input", 448, 96)
  L(enc_gru5_recurrent, "enc_gru5_recurrent", 32, 96)
  L(enc_conv_dense1, "enc_conv_dense1", 96, 64)
  L(enc_conv_dense2, "enc_conv_dense2", 192, 64)
  L(enc_conv_dense3, "enc_conv_dense3", 288, 64)
  L(enc_conv_dense4, "enc_conv_dense4", 384, 64)
  L(enc_conv_dense5, "enc_conv_dense5", 480, 64)
  L(enc_conv1, "enc_conv1", 128, 64)
  L(enc_conv2, "enc_conv2", 128, 64)
  L(enc_conv3, "enc_conv3", 128, 64)
  L(enc_conv4, "enc_conv4", 128, 64)
  L(enc_conv5, "enc_conv5", 128, 64)
  L(enc_zdense, "enc_zdense", 544, DRED_PADDED_LATENT_DIM)
  L(gdense1, "gdense1", 544, GDENSE1_OUT_SIZE)
  L(gdense2, "gdense2", GDENSE1_OUT_SIZE, DRED_PADDED_STATE_DIM)
  return 0;
}

int init_rdovaedec(struct RDOVAEDec *model, const WeightArray *arrays)
{
  L(dec_dense1, "dec_dense1", DRED_LATENT_DIM+1, DEC_DENSE1_OUT_SIZE)
  L(dec_gru1_input, "dec_gru1_input", 96, 192)
  L(dec_gru1_recurrent, "dec_gru1_recurrent", 64, 192)
  L(dec_gru2_input, "dec_gru2_input", 192, 192)
  L(dec_gru2_recurrent, "dec_gru2_recurrent", 64, 192)
  L(dec_gru3_input, "dec_gru3_input", 288, 192)
  L(dec_gru3_recurrent, "dec_gru3_recurrent", 64, 192)
  L(dec_gru4_input, "dec_gru4_input", 384, 192)
  L(dec_gru4_recurrent, "dec_gru4_recurrent", 64, 192)
  L(dec_gru5_input, "dec_gru5_input", 480, 192)
  L(dec_gru5_recurrent, "dec_gru5_recurrent", 64, 192)
  LNB(dec_glu1, "dec_glu1", 64, 64)
  LNB(dec_glu2, "dec_glu2", 64, 64)
  LNB(dec_glu3, "dec_glu3", 64, 64)
  LNB(dec_glu4, "dec_glu4", 64, 64)
  LNB(dec_glu5, "dec_glu5", 64, 64)
  L(dec_conv_dense1, "dec_conv_dense1", 160, 32)
  L(dec_conv_dense2, "dec_conv_dense2", 256, 32)
  L(dec_conv_dense3, "dec_conv_dense3", 352, 32)
  L(dec_conv_dense4, "dec_conv_dense4", 448, 32)
  L(dec_conv_dense5, "dec_conv_dense5", 544, 32)
  L(dec_conv1, "dec_conv1", 64, 32)
  L(dec_conv2, "dec_conv2", 64, 32)
  L(dec_conv3, "dec_conv3", 64, 32)
  L(dec_conv4, "dec_conv4", 64, 32)
  L(dec_conv5, "dec_conv5", 64, 32)
  L(dec_output, "dec_output", 576, 4*DRED_NUM_FEATURES)
  L(dec_hidden_init, "dec_hidden_init", DRED_STATE_DIM,
    DEC_HIDDEN_INIT_OUT_SIZE)
  L(dec_gru_init, "dec_gru_init", DEC_HIDDEN_INIT_OUT_SIZE,
    DEC_GRU_INIT_OUT_SIZE)
  return 0;
}

typedef struct {
  struct RDOVAEEnc model;
  RDOVAEEncState state;
  WeightArray *arrays;
} EncHandle;

typedef struct {
  struct RDOVAEDec model;
  RDOVAEDecState state;
  WeightArray *arrays;
} DecHandle;

void *rdovae_oracle_enc_create(const void *blob, int len)
{
  EncHandle *h = calloc(1, sizeof(*h));
  if (parse_weights(&h->arrays, blob, len) < 0) { free(h); return NULL; }
  if (init_rdovaeenc(&h->model, h->arrays)) { free(h); return NULL; }
  return h;
}

void rdovae_oracle_encode(void *hp, float *latents, float *initial_state,
                          const float *input)
{
  EncHandle *h = (EncHandle *)hp;
  dred_rdovae_encode_dframe(&h->state, &h->model, latents, initial_state,
                            input, 0);
}

void *rdovae_oracle_dec_create(const void *blob, int len)
{
  DecHandle *h = calloc(1, sizeof(*h));
  if (parse_weights(&h->arrays, blob, len) < 0) { free(h); return NULL; }
  if (init_rdovaedec(&h->model, h->arrays)) { free(h); return NULL; }
  return h;
}

void rdovae_oracle_dec_init(void *hp, const float *initial_state)
{
  DecHandle *h = (DecHandle *)hp;
  dred_rdovae_dec_init_states(&h->state, &h->model, initial_state, 0);
}

void rdovae_oracle_decode_qframe(void *hp, float *qframe, const float *z)
{
  DecHandle *h = (DecHandle *)hp;
  dred_rdovae_decode_qframe(&h->state, &h->model, qframe, z, 0);
}

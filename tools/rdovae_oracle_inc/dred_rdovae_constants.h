/* Stand-in for the tarball-generated constants header, dims taken from
   the in-tree training code (dnn/torch/rdovae/rdovae/rdovae.py:360-580):
   CoreEncoder/CoreDecoder layer sizes, FRAMES_PER_STEP 2/4,
   STATE_HIDDEN=128, latent 80, state 24, features 20. */
#ifndef DRED_RDOVAE_CONSTANTS_H
#define DRED_RDOVAE_CONSTANTS_H

#define DRED_NUM_FEATURES 20
#define DRED_LATENT_DIM 80
#define DRED_STATE_DIM 24
#define DRED_PADDED_LATENT_DIM 80
#define DRED_PADDED_STATE_DIM 24
#define DRED_NUM_QUANTIZATION_LEVELS 16
#define DRED_MAX_RNN_NEURONS 1536
#define DRED_MAX_CONV_INPUTS 2048

#endif
